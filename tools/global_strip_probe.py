"""Probe ladder for the round-4 IN-KERNEL GLOBAL SEARCH mega-kernel variant.

The round-3 mega kernel cannot score full-frame strips, so any frame whose
state machine enters a global branch (tracker_ghc/src/main.cpp:399-446)
POISONS the chunk and the driver re-runs it on the scan path — measured
catastrophically slow under occlusion-heavy workloads (results.json
occl_* rows, round-4 VERDICT item 2).  The fix scores the full map INSIDE
the kernel as a strip grid: the same slab geometry visited by nested
fori_loops under pl.when(global), with an SMEM-carried lexicographic
argmax combine.  This relay's Mosaic build is older than the client and
rejects valid constructs unpredictably (catalogue in
pvot/ops/ncc_pallas.py), so each new ingredient is probed on the real
chip first:

  when_fori_dma    nested STATIC-bound fori_loops inside pl.when, whose
                   body DMAs an aligned uint8 slab from HBM at
                   loop-dependent offsets, converts, rolls by a
                   loop-dependent TRACED amount, runs an MXU dot, and
                   lexicographically folds (max, y, x) into SMEM scratch
                   — the exact global-strip structure
  dyn_fori_dma     the same body under fori_loops with TRACED trip
                   counts (no pl.when) — the alternative structure if
                   when_fori_dma fails
  when_refetch     a second conditional DMA into the SAME slab scratch
                   after the loop, overwriting it at a data-dependent
                   origin (the global template-patch re-fetch)

Run on the real TPU:
  nohup python tools/global_strip_probe.py > /tmp/gsp.log 2>&1 &

Verdict (TPU v5e relay, 2026-08-19, /tmp/gsp.log):
  when_fori_dma  PASS  — the kernel uses exactly this structure
  dyn_fori_dma   PASS  — fallback not needed
  when_refetch   FAIL  — but for an INCIDENTAL reason: the probe drives
                 its condition from `slab_ref[0, 0]`, and this Mosaic
                 rejects extracting an i8 scalar from a vector
                 ("unsupported 8-bit extract"); the conditional-refetch
                 construct itself is fine when the condition/origin are
                 SMEM scalars, which is what the real kernel does (its
                 post-strip main-slab fetch origin comes from the SMEM
                 argmax fold) — proven end to end by the on-chip
                 mega_supported(inkernel_global=True) numerics probe.
"""

from __future__ import annotations

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TX = 128
SLAB_H, SLAB_W = 64, 256
PAD_H, PAD_W = 256, 512  # 3x2 strip grid + roll-residual slack rows
NY, NX = 3, 2
DY_MAX = SLAB_H - 16  # scored rows per strip (keeps roll wraparound out)
BIG = 2**30


def _run(name, fn):
    print(f"--- probe: {name}", flush=True)
    try:
        fn()
        print(f"PASS {name}", flush=True)
        return True
    except Exception as e:
        msg = traceback.format_exc(limit=25)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:2000]}")
        tail = "\n".join(msg.splitlines()[-15:])
        print(tail, flush=True)
        return False


def _scores_np(fr, sy, sx):
    """Host oracle for one strip: the kernel's 8x8 box-sum scores.

    The kernel DMAs the aligned slab at (sy*SLAB_H, sx*SLAB_W) and rolls
    rows so row 0 is logical origin y0 = sy*SLAB_H + (sy & 7); scores are
    score(dy, dx) = sum of the 8x8 box at (y0+dy, x0+dx), dy < DY_MAX.
    """
    y0 = sy * SLAB_H + (sy & 7)
    x0 = sx * SLAB_W
    win = fr[y0 : y0 + DY_MAX + 7, x0 : x0 + SLAB_W].astype(np.float64)
    win = win / 255.0
    out = np.zeros((DY_MAX, TX), np.float64)
    c = win.cumsum(axis=0).cumsum(axis=1)
    cp = np.zeros((win.shape[0] + 1, win.shape[1] + 1))
    cp[1:, 1:] = c
    for dy in range(DY_MAX):
        for dx in range(TX):
            out[dy, dx] = (
                cp[dy + 8, dx + 8] - cp[dy, dx + 8] - cp[dy + 8, dx] + cp[dy, dx]
            )
    return out


def _oracle_best(fr, strips):
    best = None
    for sy, sx in strips:
        sc = _scores_np(fr, sy, sx)
        v = sc.max()
        pos = np.argwhere(sc == v)[0]
        ay = sy * SLAB_H + (sy & 7) + pos[0]
        ax = sx * SLAB_W + pos[1]
        cand = (-v, ay, ax)
        if best is None or cand < best:
            best = cand
    return (-best[0], best[1], best[2])


def _kernel_factory(dynamic_trip: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ones_toe = np.zeros((SLAB_W, TX), np.float32)
    for j in range(TX):
        ones_toe[j : j + 8, j] = 1.0

    def strip_body(frames_hbm, box_ref, slab_ref, sem, t, sy, sx,
                   sf_ref, si_ref):
        ya = sy * SLAB_H
        xa = sx * SLAB_W
        r = sy & 7  # loop-dependent traced roll residual
        cp = pltpu.make_async_copy(
            frames_hbm.at[t, pl.ds(ya, SLAB_H), pl.ds(xa, SLAB_W)],
            slab_ref,
            sem,
        )
        cp.start()
        cp.wait()
        slab = (
            slab_ref[:, :].astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / 255.0)
        )
        slab = pltpu.roll(slab, SLAB_H - r, 0)
        acc = jnp.zeros((DY_MAX, SLAB_W), jnp.float32)
        for p in range(8):
            acc = acc + slab[p : p + DY_MAX, :]
        scores = lax.dot_general(
            acc, box_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        dy_iota = lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        dx_iota = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        val_t = jnp.max(scores)
        is_best = scores == val_t
        bdy = jnp.min(jnp.where(is_best, dy_iota, BIG))
        bdx = jnp.min(jnp.where(is_best & (dy_iota == bdy), dx_iota, BIG))
        ay = ya + r + bdy
        ax = xa + bdx
        bv, by, bx = sf_ref[0], si_ref[0], si_ref[1]
        better = (val_t > bv) | (
            (val_t == bv) & ((ay < by) | ((ay == by) & (ax < bx)))
        )
        sf_ref[0] = jnp.where(better, val_t, bv)
        si_ref[0] = jnp.where(better, ay, by)
        si_ref[1] = jnp.where(better, ax, bx)

    def kernel(frames_hbm, box_ref, o_ref, slab_ref, sf_ref, si_ref, sem):
        t = pl.program_id(0)
        sf_ref[0] = jnp.float32(-jnp.inf)
        si_ref[0] = jnp.int32(BIG)
        si_ref[1] = jnp.int32(BIG)
        is_global = (t & 1) == 1

        if dynamic_trip:
            ny = jnp.where(is_global, NY, 1)
            nx = jnp.where(is_global, NX, 1)

            def body_y(sy, _):
                def body_x(sx, _):
                    strip_body(
                        frames_hbm, box_ref, slab_ref, sem, t, sy, sx,
                        sf_ref, si_ref,
                    )
                    return 0

                return lax.fori_loop(0, nx, body_x, 0)

            lax.fori_loop(0, ny, body_y, 0)
        else:
            # Straight-line "local" strip first (always runs; discarded
            # for global frames by the -inf re-seed below — the real
            # kernel seeds -inf only when global, keeping the local
            # result otherwise).
            strip_body(
                frames_hbm, box_ref, slab_ref, sem, t, jnp.int32(0),
                jnp.int32(0), sf_ref, si_ref,
            )

            @pl.when(is_global)
            def _():
                sf_ref[0] = jnp.float32(-jnp.inf)
                si_ref[0] = jnp.int32(BIG)
                si_ref[1] = jnp.int32(BIG)

                def body_y(sy, _):
                    def body_x(sx, _):
                        strip_body(
                            frames_hbm, box_ref, slab_ref, sem, t, sy, sx,
                            sf_ref, si_ref,
                        )
                        return 0

                    return lax.fori_loop(0, NX, body_x, 0)

                lax.fori_loop(0, NY, body_y, 0)

        lane = lax.broadcasted_iota(jnp.int32, (8, TX), 1)
        o_ref[:, :] = (
            jnp.where(lane == 0, sf_ref[0], 0.0)
            + jnp.where(lane == 1, si_ref[0].astype(jnp.float32), 0.0)
            + jnp.where(lane == 2, si_ref[1].astype(jnp.float32), 0.0)
        )

    def run():
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (2, PAD_H, PAD_W), np.uint8)
        out = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (8, TX), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((16, TX), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((SLAB_H, SLAB_W), jnp.uint8),
                pltpu.SMEM((4,), jnp.float32),
                pltpu.SMEM((4,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(jnp.asarray(frames), jnp.asarray(ones_toe))
        host = np.asarray(out).reshape(2, 8, TX)[:, 0, :]
        for t in range(2):
            strips = (
                [(sy, sx) for sy in range(NY) for sx in range(NX)]
                if t % 2 == 1
                else [(0, 0)]
            )
            v, ay, ax = _oracle_best(frames[t], strips)
            np.testing.assert_allclose(host[t, 0], v, rtol=1e-5)
            assert int(host[t, 1]) == ay, (t, host[t, :3], (v, ay, ax))
            assert int(host[t, 2]) == ax, (t, host[t, :3], (v, ay, ax))

    return run


def probe_when_fori_dma():
    _kernel_factory(dynamic_trip=False)()


def probe_dyn_fori_dma():
    _kernel_factory(dynamic_trip=True)()


def probe_when_refetch():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(frames_hbm, o_ref, slab_ref, sem):
        t = pl.program_id(0)
        cp = pltpu.make_async_copy(
            frames_hbm.at[t, pl.ds(0, SLAB_H), pl.ds(0, SLAB_W)],
            slab_ref, sem,
        )
        cp.start()
        cp.wait()
        s0 = jnp.sum(slab_ref[:, :].astype(jnp.int32).astype(jnp.float32))
        # Data-dependent conditional refetch at a data-dependent aligned
        # origin (parity of the first byte picks the strip).
        cond = (slab_ref[0, 0].astype(jnp.int32) & 1) == 1
        ya = jnp.where(cond, SLAB_H, 0)

        @pl.when(cond)
        def _():
            cp2 = pltpu.make_async_copy(
                frames_hbm.at[t, pl.ds(ya, SLAB_H), pl.ds(SLAB_W, SLAB_W)],
                slab_ref, sem,
            )
            cp2.start()
            cp2.wait()

        s1 = jnp.sum(slab_ref[:, :].astype(jnp.int32).astype(jnp.float32))
        lane = lax.broadcasted_iota(jnp.int32, (8, TX), 1)
        o_ref[:, :] = (
            jnp.where(lane == 0, s0, 0.0) + jnp.where(lane == 1, s1, 0.0)
        )

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (2, PAD_H, PAD_W), np.uint8)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, TX), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((16, TX), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SLAB_H, SLAB_W), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray(frames))
    host = np.asarray(out).reshape(2, 8, TX)[:, 0, :]
    for t in range(2):
        a = frames[t, :SLAB_H, :SLAB_W].astype(np.float64).sum()
        np.testing.assert_allclose(host[t, 0], a, rtol=1e-4)
        if frames[t, 0, 0] % 2 == 1:
            b = frames[
                t, SLAB_H : 2 * SLAB_H, SLAB_W : 2 * SLAB_W
            ].astype(np.float64).sum()
        else:
            b = a
        np.testing.assert_allclose(host[t, 1], b, rtol=1e-4)


if __name__ == "__main__":
    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    results = {}
    for name, fn in [
        ("when_fori_dma", probe_when_fori_dma),
        ("dyn_fori_dma", probe_dyn_fori_dma),
        ("when_refetch", probe_when_refetch),
    ]:
        results[name] = _run(name, fn)
    print({k: ("PASS" if v else "FAIL") for k, v in results.items()})
