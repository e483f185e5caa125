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


PROBES = [
    ("reduce_max", probe_reduce_max),
    ("argmax_tiebreak", probe_argmax_tiebreak),
    ("two_outputs", probe_two_outputs),
    ("smem_i32_in", probe_smem_i32_in),
    ("fused_region", probe_fused_region),
    ("fused_multitile", probe_fused_multitile),
    ("vmap_fused", probe_vmap_fused),
    ("dot_high_emul", probe_dot_high_emul),
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
