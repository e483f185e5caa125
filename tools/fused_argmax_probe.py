"""Probe ladder for the round-3 fused argmax+confidence Pallas kernel.

The north-star design (BASELINE.json, SURVEY.md §7 step 4) wants the masked
argmax + confidence reduction INSIDE the NCC kernel so only (best_val, x, y)
leaves the chip.  This environment's relay runs a Mosaic build months older
than the client and rejects several valid constructs (catalogue in
pvot/ops/ncc_pallas.py), so each ingredient is probed on the real chip
before the kernel is built on it:

  reduce_max      jnp.max over a (128,128) VMEM tile, broadcast to an
                  (8,128) output tile
  argmax_tiebreak masked row-major first-occurrence argmax: iota flat
                  index, where(s==max, idx, BIG), jnp.min
  two_outputs     pallas_call with (f32 tile, i32 tile) output tuple
  smem_i32_in     (1, 8) i32 SMEM scalar input (window bounds)
  fused_region    the full fused region kernel: NCC compute (phase-
                  concatenated Toeplitz matmuls) + in-kernel masked argmax,
                  80x80 template / 121x121 span, vs the matmul engine +
                  masked_region_argmax oracle
  fused_multitile the same at span 321 (r160): per-tile partials + XLA
                  combine
  vmap_fused      jax.vmap over the fused kernel (multi-stream serving)
  dot_high_emul   in-kernel 3-pass bf16 hi/lo matmul (precision=HIGH
                  emulation; Mosaic rejects Precision.HIGH natively)
  dot_rhs_lane    dot contracting over the RHS lane dim (A @ B^T) — the
                  shear-transposed operator-build consumer
  scratch_carry   scratch state persisting across sequential grid steps
  dyn_hbm_dma     in-kernel DMA from HBM at a data-dependent offset
                  written by the previous grid step
  when_heavy      pl.when-gated matmul on a flip-flopping scratch scalar

The last three are the MEGA-KERNEL ladder: if they pass, an entire
tracking chunk (frames x the full local-mode state machine) can run inside
ONE pallas_call — state in scratch, per-frame search regions DMA'd from
HBM at bbox-dependent offsets — removing the per-step XLA glue and launch
overhead that dominate the fused step (tools/region_step_breakdown.py).

Run on the real TPU:  nohup python tools/fused_argmax_probe.py > /tmp/fap.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TX = 128


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


def probe_reduce_max():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        m = jnp.max(x_ref[:, :])
        o_ref[:, :] = jnp.full((8, TX), m, jnp.float32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 128), np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, TX), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(x).max(),
                               rtol=1e-6)


def probe_argmax_tiebreak():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        s = x_ref[:, :]
        rows = lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, s.shape, 1)
        flat = rows * TX + cols
        m = jnp.max(s)
        cand = jnp.where(s >= m, flat, jnp.int32(2**30))
        idx = jnp.min(cand)
        o_ref[:, :] = jnp.full((8, TX), idx.astype(jnp.float32), jnp.float32)

    rng = np.random.default_rng(1)
    x = rng.random((128, 128)).astype(np.float32)
    # Force a tie: two positions share the max.
    x[3, 7] = 2.0
    x[90, 2] = 2.0
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, TX), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    got = int(np.asarray(out)[0, 0])
    assert got == 3 * TX + 7, f"tie-break wrong: {got} != {3 * TX + 7}"


def probe_two_outputs():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, val_ref, idx_ref):
        m = jnp.max(x_ref[:, :])
        val_ref[:, :] = jnp.full((8, TX), m, jnp.float32)
        idx_ref[:, :] = jnp.full((8, TX), 42, jnp.int32)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((128, 128), np.float32))
    val, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, TX), jnp.float32),
            jax.ShapeDtypeStruct((8, TX), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(x)
    np.testing.assert_allclose(np.asarray(val)[0, 0], np.asarray(x).max(),
                               rtol=1e-6)
    assert int(np.asarray(idx)[0, 0]) == 42


def probe_smem_i32_in():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(b_ref, x_ref, o_ref):
        lo = b_ref[0, 0]
        o_ref[:, :] = x_ref[:, :] + lo.astype(jnp.float32)

    b = jnp.asarray([[7, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    x = jnp.ones((8, TX), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, TX), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(b, x)
    np.testing.assert_allclose(np.asarray(out), 8.0)


def _oracle_region(img, templ, bounds, x0, y0):
    """matmul engine + masked_region_argmax: the semantics to match."""
    import jax.numpy as jnp

    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.search import masked_region_argmax

    scores = ncc_map_matmul(img, templ)
    return masked_region_argmax(scores, x0, y0, bounds)


def _fused_case(span, templ_px, seed):
    """Correctness of ncc_region_argmax_pallas at one geometry."""
    import jax.numpy as jnp

    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.ops.search import WindowBounds

    rng = np.random.default_rng(seed)
    th = tw = templ_px
    region = jnp.asarray(
        rng.random((span + th - 1, span + tw - 1), np.float32)
    )
    templ = jnp.asarray(rng.random((th, tw), np.float32))
    x0 = jnp.int32(rng.integers(0, 500))
    y0 = jnp.int32(rng.integers(0, 300))
    # A clamped window strictly inside the span, plus the all-inside case.
    for (ax0, ax1, ay0, ay1) in [
        (0, span - 1, 0, span - 1),
        (5, span - 7, 11, span - 3),
        (span // 2, span // 2, span // 2, span // 2),
    ]:
        bounds = WindowBounds(
            x0 + ax0, x0 + ax1, y0 + ay0, y0 + ay1
        )
        want = _oracle_region(region, templ, bounds, x0, y0)
        got = ncc_region_argmax_pallas(region, templ, bounds, x0, y0)
        w = [np.asarray(v) for v in want]
        g = [np.asarray(v) for v in got]
        assert abs(g[0] - w[0]) < 2e-5, f"val {g[0]} vs {w[0]}"
        assert g[1] == w[1] and g[2] == w[2], (
            f"loc ({g[1]},{g[2]}) vs ({w[1]},{w[2]}) window {ax0,ax1,ay0,ay1}"
        )


def probe_fused_region():
    _fused_case(121, 80, 10)


def probe_fused_multitile():
    _fused_case(321, 80, 11)


def probe_vmap_fused():
    import jax
    import jax.numpy as jnp

    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.ops.search import WindowBounds

    rng = np.random.default_rng(12)
    span, t = 121, 80
    S = 4
    regions = jnp.asarray(
        rng.random((S, span + t - 1, span + t - 1), np.float32)
    )
    templs = jnp.asarray(rng.random((S, t, t), np.float32))
    x0 = jnp.arange(S, dtype=jnp.int32) * 3
    y0 = jnp.arange(S, dtype=jnp.int32) * 5
    bounds = WindowBounds(x0 + 1, x0 + span - 2, y0 + 2, y0 + span - 4)

    def one(region, templ, b, xx, yy):
        return ncc_region_argmax_pallas(region, templ, b, xx, yy)

    vals, xs, ys = jax.vmap(one)(regions, templs, bounds, x0, y0)
    for s in range(S):
        b = WindowBounds(x0[s] + 1, x0[s] + span - 2, y0[s] + 2,
                         y0[s] + span - 4)
        want = _oracle_region(regions[s], templs[s], b, x0[s], y0[s])
        assert abs(float(vals[s]) - float(want[0])) < 2e-5
        assert int(xs[s]) == int(want[1]) and int(ys[s]) == int(want[2])


def probe_dot_high_emul():
    """3-pass bf16 hi/lo matmul inside a kernel vs f32 HIGH outside."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, bh_ref, bl_ref, o_ref):
        a = a_ref[:, :]
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot(x, y):
            return lax.dot_general(
                x, y, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        o_ref[:, :] = (
            dot(ah, bh_ref[:, :]) + dot(ah, bl_ref[:, :]) + dot(al, bh_ref[:, :])
        )

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((128, 256), np.float32))
    b = jnp.asarray(rng.random((256, 128), np.float32))
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, bh, bl)
    want = lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGH,
    )
    err = float(jnp.max(jnp.abs(out - want)))
    rel = err / float(jnp.max(jnp.abs(want)))
    print(f"  high-emulation max abs err {err:.3e} (rel {rel:.3e})")
    # Measured on-chip 2026-08-17: rel 8.8e-6 vs XLA's HIGH — the hi/lo
    # 3-pass emulation is HIGH-*like* (same dropped lo@lo term) but not
    # bit-identical to XLA's pairing; same order as the HIGH-vs-HIGHEST
    # drift itself (8.6e-6, tools/perf_ab.py).  A fast Pallas variant
    # would need trajectory-level validation, not bitwise HIGH equality.
    assert rel < 1e-4, rel


def probe_dot_rhs_lane():
    """In-kernel dot contracting over the RHS's LANE dim (A @ B^T shape):
    dimension_numbers (((1,), (1,)), ((), ())).  The reshape-shear Toeplitz
    build (tools/toeplitz_build_bench.py build_shear_T) produces the
    operator TRANSPOSED — one fused broadcast+trim copy, no stacking — but
    consuming it requires Mosaic to accept this contraction.

    CHIP VERDICT (2026-08-17): MISCOMPILES — compiles fine but returns
    single-pass-bf16 accuracy (5.4e-2 abs) despite precision=HIGHEST, i.e.
    the precision request is silently dropped when the RHS is a REF-LOADED
    operand of a lane-contracting dot.  The same contraction with the RHS
    built as a rolled broadcast VALUE keeps full HIGHEST accuracy
    (shear_dot rung, rel 3.5e-7).  Production shear kernels must therefore
    roll-and-consume in registers, never stage the transposed operator
    through a ref — and their self-probe tolerance must be tight enough
    (<=1e-4) to catch a silent precision drop."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = lax.dot_general(
            a_ref[:, :], b_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.random((136, 256), np.float32))
    b = jnp.asarray(rng.random((1024, 256), np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((136, 1024), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    want = a @ b.T
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"  rhs-lane contraction max abs err {err:.3e}")
    assert err < 1e-4, err


def probe_scratch_carry():
    """State carried in scratch ACROSS sequential grid steps — the
    mega-kernel ingredient: TPU grid iterations run sequentially on one
    core and scratch persists, so a whole tracking chunk can live inside
    one pallas_call with (bbox, template stats, lost count) in scratch.
    Accumulate a running sum in VMEM scratch + an i32 counter in SMEM
    scratch over grid=(8,), emit per-step outputs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, acc_ref, cnt_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            cnt_ref[0] = 0

        acc_ref[:, :] += x_ref[:, :]
        cnt_ref[0] += 2
        o_ref[:, :] = acc_ref[:, :] + jnp.float32(cnt_ref[0])

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((8 * 8, 128), np.float32))
    out = pl.pallas_call(
        kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(x)
    xs = np.asarray(x).reshape(8, 8, 128)
    want = np.cumsum(xs, axis=0) + (
        2.0 * (np.arange(1, 9, dtype=np.float32))[:, None, None]
    )
    err = float(np.max(np.abs(np.asarray(out).reshape(8, 8, 128) - want)))
    print(f"  scratch-carry max abs err {err:.3e}")
    assert err < 1e-5, err


def probe_dyn_hbm_dma():
    """In-kernel DMA from an HBM-resident input at a DATA-DEPENDENT row
    offset held in SMEM scratch (written by the PREVIOUS grid step) — the
    mega-kernel's frame-region fetch: step t's search window origin comes
    from step t-1's argmax, so the copy offset cannot be a BlockSpec index
    map.  Chain: o_{t+1} = o_t + int(value loaded at step t)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, rows = 4, 8

    def kernel(x_hbm, o_ref, buf_ref, off_ref, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            off_ref[0] = 0

        # Offset kept in UNITS OF 8 ROWS and multiplied by 8 at use: Mosaic
        # must statically prove HBM row offsets divisible by the (8, 128)
        # tiling (first attempt with raw offsets failed to compile even
        # though every runtime value was a multiple of 8).
        off = off_ref[0] * 8
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(off, rows), :], buf_ref, sem
        )
        cp.start()
        cp.wait()
        o_ref[:, :] = buf_ref[:, :]
        # next offset = this block's [0,0] value (planted integers)
        off_ref[0] = off_ref[0] + buf_ref[0, 0].astype(jnp.int32)

    rng = np.random.default_rng(11)
    x = rng.random((1024, 256), np.float32)
    # plant the offset chain in UNITS OF 8 ROWS: rows 0 -> 16 -> 48 -> 112
    # (unit deltas 2, 4, 8 planted at each landing row)
    offs = [0]
    for d in (16, 32, 64):
        offs.append(offs[-1] + d)
    for o, d in zip(offs, (2, 4, 8, 999)):
        x[o, 0] = float(d)
    xj = jnp.asarray(x)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((rows, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * rows, 256), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, 256), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(xj)
    got = np.asarray(out).reshape(steps, rows, 256)
    want = np.stack([x[o:o + rows] for o in offs])
    err = float(np.max(np.abs(got - want)))
    print(f"  dyn-offset HBM DMA max abs err {err:.3e} (offsets {offs})")
    assert err < 1e-6, err


def probe_when_heavy():
    """pl.when gating a matmul on a scratch-scalar condition that flips
    per grid step — the mega-kernel's rare-branch structure (e.g. template
    restat after EMA, or skip-work-when-lost)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref, flag_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            flag_ref[0] = 1

        o_ref[:, :] = jnp.zeros_like(o_ref)

        @pl.when(flag_ref[0] == 1)
        def _():
            # precision=HIGHEST required: the first chip run omitted it and
            # "failed" at exactly single-pass-bf16 error — probe bug, not a
            # Mosaic one.
            o_ref[:, :] = lax.dot_general(
                a_ref[:, :], b_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )

        flag_ref[0] = 1 - flag_ref[0]

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((128, 128), np.float32))
    b = jnp.asarray(rng.random((128, 128), np.float32))
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * 128, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(a, b)
    got = np.asarray(out).reshape(4, 128, 128)
    ab = np.asarray(a) @ np.asarray(b)
    want = np.stack([ab, np.zeros_like(ab), ab, np.zeros_like(ab)])
    err = float(np.max(np.abs(got - want)))
    print(f"  when-heavy max abs err {err:.3e}")
    assert err < 1e-4, err


def probe_roll_static():
    """Plain pltpu.roll with a static shift along lanes.  Round-1 catalogue
    says this Mosaic rejected static-shift rolls — re-probed because several
    round-1 rejections (reduce, argmax, two outputs, vmap) later PASSED."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], 5, 1)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((8, 256), np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = np.roll(np.asarray(x), 5, axis=1)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"  static roll max abs err {err:.3e}")
    assert err == 0.0, err


def probe_roll_strided():
    """pltpu.roll with stride=1 over sublanes — row i lane-rolled by i.
    THE shear primitive: broadcast a padded template row v (1, M) to
    (TX, M), strided-roll, trim to L lanes => the TRANSPOSED Toeplitz
    block toep_T[dx, l] = v[(l - dx) mod M] built entirely in-kernel,
    no HBM operator, no build pass."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 384

    def kernel(v_ref, o_ref):
        b = jnp.broadcast_to(v_ref[0:1, :], (TX, M))
        o_ref[:, :] = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)

    rng = np.random.default_rng(6)
    v = np.zeros((8, M), np.float32)
    v[0, :80] = rng.random(80, dtype=np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TX, M), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(v))
    want = np.stack([np.roll(v[0], dx) for dx in range(TX)])
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"  strided roll max abs err {err:.3e}")
    assert err == 0.0, err


def probe_shear_dot():
    """The full operator-free correlation rung: per (k, p) template row,
    broadcast+strided-roll builds the transposed Toeplitz block in
    registers and an rhs-lane dot consumes it immediately — no operator
    in HBM or scratch.  Checks one k-group (8 rows) against the XLA
    slice-stack operator's result."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, ty, tw = 256, 128, 80
    M = L + TX

    def kernel(w_ref, t_ref, o_ref):
        acc = jnp.zeros((ty, TX), jnp.float32)
        w = w_ref[:, :]
        for p in range(8):
            b = jnp.broadcast_to(t_ref[p : p + 1, :], (TX, M))
            tt = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)[:, :L]
            t1 = lax.dot_general(
                w, tt,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            acc = acc + t1[p : p + ty, :]
        o_ref[:, :] = acc

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.random((ty + 8, L), np.float32))
    t = np.zeros((8, M), np.float32)
    t[:, :tw] = rng.random((8, tw), dtype=np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ty, TX), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, jnp.asarray(t))
    # reference: acc[y, dx] = sum_p sum_j t[p, j] * w[y + p, j + dx]
    wn = np.asarray(w)
    want = np.zeros((ty, TX), np.float32)
    for p in range(8):
        for dx in range(TX):
            want[:, dx] += wn[p : p + ty, dx : dx + tw] @ t[p, :tw]
    err = float(np.max(np.abs(np.asarray(out) - want)))
    rel = err / float(np.max(np.abs(want)))
    print(f"  shear-dot max abs err {err:.3e} (rel {rel:.3e})")
    assert rel < 1e-5, rel


def probe_shear_dot_val():
    """shear_dot with VALUE-level row slicing: the ref-level
    t_ref[p : p + 1] slice at an arbitrary sublane offset is the construct
    this Mosaic historically rejects ("cannot statically prove ... multiple
    of 8"); here the whole (8, M) group loads once and rows are sliced as
    VALUES (the pattern the production kernel's t1[p:p+ty] already proves
    works)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, ty, tw = 256, 128, 80
    M = L + TX

    def kernel(w_ref, t_ref, o_ref):
        acc = jnp.zeros((ty, TX), jnp.float32)
        w = w_ref[:, :]
        tval = t_ref[:, :]
        for p in range(8):
            b = jnp.broadcast_to(tval[p : p + 1, :], (TX, M))
            tt = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)[:, :L]
            t1 = lax.dot_general(
                w, tt,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            acc = acc + t1[p : p + ty, :]
        o_ref[:, :] = acc

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.random((ty + 8, L), np.float32))
    t = np.zeros((8, M), np.float32)
    t[:, :tw] = rng.random((8, tw), dtype=np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ty, TX), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, jnp.asarray(t))
    wn = np.asarray(w)
    want = np.zeros((ty, TX), np.float32)
    for p in range(8):
        for dx in range(TX):
            want[:, dx] += wn[p : p + ty, dx : dx + tw] @ t[p, :tw]
    err = float(np.max(np.abs(np.asarray(out) - want)))
    rel = err / float(np.max(np.abs(want)))
    print(f"  shear-dot(val) max abs err {err:.3e} (rel {rel:.3e})")
    assert rel < 1e-5, rel


def probe_roll_traced():
    """pltpu.roll with a TRACED (SMEM-scalar) shift on both axes — the
    mega-kernel's slab aligner: HBM DMA offsets must be provably 8-row /
    128-lane aligned (dma_dyn_2d chip verdict), so the kernel fetches an
    aligned superset and rolls it into place by the data-dependent
    residual.  Round-1 catalogue claims traced rolls fail under nested
    fori; this probes the flat form."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, x_ref, o_ref):
        dy = s_ref[0]
        dx = s_ref[1]
        r = pltpu.roll(x_ref[:, :], dy, 0)
        o_ref[:, :] = pltpu.roll(r, dx, 1)

    rng = np.random.default_rng(21)
    x = rng.random((64, 256), np.float32)
    s = jnp.asarray([61, 213], jnp.int32)  # i.e. roll UP 3 rows, LEFT 43
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
    )(s, jnp.asarray(x))
    want = np.roll(np.roll(x, 61, axis=0), 213, axis=1)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"  traced roll max abs err {err:.3e}")
    assert err == 0.0, err


def probe_u8_convert():
    """uint8 VMEM load + f32 convert + scale in-kernel — the wire-dtype
    frame slab converted on-chip (mega-kernel ingredient; today the
    u8->f32 convert is XLA glue)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        # Direct u8->f32 is an unsupported Mosaic cast (first chip run);
        # try the two-step u8 -> i32 -> f32 ladder.
        xi = x_ref[:, :].astype(jnp.int32)
        o_ref[:, :] = xi.astype(jnp.float32) * jnp.float32(1 / 255)

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.integers(0, 256, (32, 256), np.uint8))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = np.asarray(x).astype(np.float32) * np.float32(1 / 255)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"  u8 convert max abs err {err:.3e}")
    assert err == 0.0, err


def probe_dma_dyn_2d():
    """DMA from HBM with DYNAMIC offsets in BOTH dims (row and lane) —
    the mega-kernel's frame-slab and EMA-patch fetch: the search-region
    origin is data-dependent in x and y."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, off_ref, o_ref, buf_ref, sem):
        ro = off_ref[0] * 8  # rows: provably 8-aligned (Mosaic requires it)
        co = off_ref[1]  # lanes: deliberately unaligned
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(ro, 16), pl.ds(co, 128)], buf_ref, sem
        )
        cp.start()
        cp.wait()
        o_ref[:, :] = buf_ref[:, :]

    rng = np.random.default_rng(13)
    x = rng.random((512, 1280), np.float32)
    offs = jnp.asarray([5, 411], jnp.int32)  # rows 5*8=40; lanes unaligned
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray(x), offs)
    want = x[40:56, 411:539]
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"  dyn-2d DMA max abs err {err:.3e}")
    assert err < 1e-6, err


def probe_dma_3d_lead():
    """DMA from a 3D HBM array with a TRACED leading (frame) index plus
    aligned dynamic row/lane offsets — the mega-kernel's per-grid-step
    frame-slab fetch from the (F, H, W) chunk."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, off_ref, o_ref, buf_ref, sem):
        t = pl.program_id(0)
        ro = off_ref[0] * 8
        co = off_ref[1] * 128
        cp = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(ro, 16), pl.ds(co, 128)], buf_ref, sem
        )
        cp.start()
        cp.wait()
        o_ref[:, :] = buf_ref[:, :]

    rng = np.random.default_rng(17)
    x = rng.random((3, 128, 512), np.float32)
    offs = jnp.asarray([5, 2], jnp.int32)  # rows 40, lanes 256
    out = pl.pallas_call(
        kernel,
        grid=(3,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((16, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * 16, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray(x), offs)
    want = x[:, 40:56, 256:384].reshape(3 * 16, 128)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"  3d-lead DMA max abs err {err:.3e}")
    assert err < 1e-6, err


def probe_dma_u8_slab():
    """uint8 slab DMA from a 3D HBM frame stack (traced leading index,
    32-aligned rows — the u8 HBM tiling is (32, 128) — 128-aligned lanes)
    into u8 VMEM scratch, converted in-kernel via the u8 -> i32 -> f32
    ladder.  The mega-kernel's wire-dtype frame path."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, off_ref, o_ref, buf_ref, sem):
        t = pl.program_id(0)
        ro = off_ref[0] * 32
        co = off_ref[1] * 128
        cp = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(ro, 64), pl.ds(co, 256)], buf_ref, sem
        )
        cp.start()
        cp.wait()
        o_ref[:, :] = (
            buf_ref[:, :].astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1 / 255)
        )

    rng = np.random.default_rng(19)
    x = rng.integers(0, 256, (2, 256, 640), np.uint8)
    offs = jnp.asarray([3, 1], jnp.int32)  # rows 96, lanes 128
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((64, 256), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * 64, 256), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((64, 256), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray(x), offs)
    want = (
        x[:, 96:160, 128:384].reshape(2 * 64, 256).astype(np.float32)
        * np.float32(1 / 255)
    )
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"  u8 slab DMA+convert max abs err {err:.3e}")
    assert err == 0.0, err


def probe_scalar_align():
    """Bit ops on SMEM-scalar i32 values: shift-based and mask-based
    align-down (the mega-kernel computes its DMA offsets ya = y0 & ~31,
    xa = x0 & ~127 from bbox state; Mosaic rejects in-kernel integer
    DIVISION, so alignment must come from shifts/ands)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, o_ref):
        y0 = s_ref[0]
        x0 = s_ref[1]
        ya_shift = (y0 >> 5) << 5
        xa_mask = x0 & jnp.int32(~127)
        ry = y0 - ya_shift
        rx = x0 - xa_mask
        vec = (
            ya_shift * (lax_iota() == 0)
            + xa_mask * (lax_iota() == 1)
            + ry * (lax_iota() == 2)
            + rx * (lax_iota() == 3)
        )
        o_ref[:, :] = vec

    import jax.numpy as jnp
    from jax import lax

    def lax_iota():
        return lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    s = jnp.asarray([517, 1233], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(s)
    got = np.asarray(out)[0, :4]
    want = np.array([512, 1152, 5, 81], np.int32)
    print(f"  scalar-align got {got.tolist()} want {want.tolist()}")
    assert (got == want).all(), got


def probe_when_dma():
    """HBM->VMEM slab DMA *inside* a pl.when gated on a scratch scalar —
    the mega-kernel skips the fetch entirely once a chunk is poisoned
    (global-search fallback) or past the valid tail."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, buf_ref, flag_ref, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            flag_ref[0] = 1

        o_ref[:, :] = jnp.zeros_like(o_ref)

        @pl.when(flag_ref[0] == 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[t, pl.ds(8, 16), pl.ds(128, 128)], buf_ref, sem
            )
            cp.start()
            cp.wait()
            o_ref[:, :] = buf_ref[:, :]

        flag_ref[0] = 1 - flag_ref[0]

    rng = np.random.default_rng(23)
    x = rng.random((4, 64, 384), np.float32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((16, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * 16, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray(x))
    want = x[:, 8:24, 128:256].copy()
    want[1] = 0.0
    want[3] = 0.0
    err = float(np.max(np.abs(np.asarray(out).reshape(4, 16, 128) - want)))
    print(f"  when-gated DMA max abs err {err:.3e}")
    assert err < 1e-6, err


PROBES = [
    ("reduce_max", probe_reduce_max),
    ("argmax_tiebreak", probe_argmax_tiebreak),
    ("two_outputs", probe_two_outputs),
    ("smem_i32_in", probe_smem_i32_in),
    ("fused_region", probe_fused_region),
    ("fused_multitile", probe_fused_multitile),
    ("vmap_fused", probe_vmap_fused),
    ("dot_high_emul", probe_dot_high_emul),
    ("dot_rhs_lane", probe_dot_rhs_lane),
    ("scratch_carry", probe_scratch_carry),
    ("dyn_hbm_dma", probe_dyn_hbm_dma),
    ("when_heavy", probe_when_heavy),
    ("roll_static", probe_roll_static),
    ("roll_strided", probe_roll_strided),
    ("roll_traced", probe_roll_traced),
    ("shear_dot", probe_shear_dot),
    ("shear_dot_val", probe_shear_dot_val),
    ("u8_convert", probe_u8_convert),
    ("dma_dyn_2d", probe_dma_dyn_2d),
    ("dma_3d_lead", probe_dma_3d_lead),
    ("dma_u8_slab", probe_dma_u8_slab),
    ("scalar_align", probe_scalar_align),
    ("when_dma", probe_when_dma),
]


def main():
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    names = sys.argv[1:]
    results = {}
    for name, fn in PROBES:
        if names and name not in names:
            continue
        results[name] = _run(name, fn)
    print({k: ("PASS" if v else "FAIL") for k, v in results.items()})


if __name__ == "__main__":
    main()
