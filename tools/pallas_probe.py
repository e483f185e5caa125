"""Diagnose WHY the Pallas NCC kernel fails on the current backend.

Runs a ladder of probes from trivial to the full kernel, printing the exact
exception (or numeric mismatch) for each.  Run on the real TPU:

    python tools/pallas_probe.py            # full ladder
    python tools/pallas_probe.py trivial    # one rung

Round-1 established that the relay's Mosaic build rejects several valid
constructs (catalogue in pvot/ops/ncc_pallas.py); this script identifies
which rung the CURRENT kernel dies on so the rework targets the right thing.
"""

from __future__ import annotations

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(name, fn):
    print(f"--- probe: {name}")
    try:
        fn()
        print(f"PASS {name}")
        return True
    except Exception as e:
        msg = traceback.format_exc(limit=25)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:2000]}")
        tail = "\n".join(msg.splitlines()[-15:])
        print(tail)
        return False


def probe_trivial():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def probe_grid_blockspec():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + 1.0

    x = jnp.arange(32 * 256, dtype=jnp.float32).reshape(32, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 256), jnp.float32),
        grid=(4, 2),
        in_specs=[pl.BlockSpec((8, 128), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j)),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 1.0)


def probe_matmul():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(
            a_ref[:, :], b_ref[:, :], preferred_element_type=jnp.float32
        )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((8, 256), np.float32))
    b = jnp.asarray(rng.random((256, 128), np.float32))
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(a, b)
    # Default precision = one bf16 pass on the MXU (~1e-3 relative).
    np.testing.assert_allclose(np.asarray(out), np.asarray(a) @ np.asarray(b), rtol=3e-3)


def _matmul_precision_probe(precision, rtol):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = lax.dot_general(
            a_ref[:, :], b_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((8, 2048), np.float32))
    b = jnp.asarray(rng.random((2048, 128), np.float32))
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(a, b)
    want = (np.asarray(a, np.float64) @ np.asarray(b, np.float64)).astype(np.float32)
    err = np.max(np.abs(np.asarray(out) / want - 1.0))
    print(f"  max rel err = {err:.3e}")
    np.testing.assert_allclose(np.asarray(out), want, rtol=rtol)


def probe_dot_highest():
    """In-kernel f32 matmul at precision=HIGHEST (bf16x6): the parity path."""
    from jax import lax

    _matmul_precision_probe(lax.Precision.HIGHEST, 1e-5)


def probe_dot_high():
    """precision=HIGH (bf16x3)."""
    from jax import lax

    _matmul_precision_probe(lax.Precision.HIGH, 1e-4)


def probe_scratch_copy_dot():
    """The reworked NCC kernel shape: stage per-row bands into a VMEM
    scratch at static lane offsets (relayout on store), then ONE big dot
    from the scratch — avoids tpu.concatenate entirely."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, L = 8, 256

    def kernel(x_ref, b_ref, o_ref, big_ref):
        i = pl.program_id(0)
        for r in range(TH):  # bands at shifting sublane offsets
            big_ref[:, r * L : (r + 1) * L] = x_ref[pl.ds(i * 8 + r, 8), :]
        o_ref[:, :] = lax.dot_general(
            big_ref[:, :], b_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((24, L), np.float32))
    b = jnp.asarray(rng.random((TH * L, 128), np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        grid=(2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((8, TH * L), jnp.float32)],
    )(x, b)
    xs = np.asarray(x)
    want = np.stack([
        np.concatenate([xs[i * 8 + r : i * 8 + r + 8] for r in range(TH)], axis=1)
        @ np.asarray(b)
        for i in range(2)
    ]).reshape(16, 128)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4)


def probe_unrolled_dots():
    """Alternative shape: statically-unrolled per-row dots with an
    accumulator (no concat, no scratch)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, L = 8, 256

    def kernel(x_ref, b_ref, o_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in range(TH):
            band = x_ref[pl.ds(i * 8 + r, 8), :]
            acc = acc + lax.dot_general(
                band, b_ref[pl.ds(r * L, L), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
        o_ref[:, :] = acc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((24, L), np.float32))
    b = jnp.asarray(rng.random((TH * L, 128), np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        grid=(2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
    )(x, b)
    xs = np.asarray(x)
    want = np.stack([
        sum(
            xs[i * 8 + r : i * 8 + r + 8] @ np.asarray(b)[r * L : (r + 1) * L]
            for r in range(TH)
        )
        for i in range(2)
    ]).reshape(16, 128)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4)


def probe_big_matmul():
    """The headline kernel's 80-row geometry: (8, 20480) @ (20480, 128)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(
            a_ref[:, :], b_ref[:, :], preferred_element_type=jnp.float32
        )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((8, 80 * 256), np.float32))
    b = jnp.asarray(rng.random((80 * 256, 128), np.float32))
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(a, b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(a) @ np.asarray(b), rtol=1e-4
    )


def probe_dyn_sublane_read():
    """Unaligned dynamic sublane base: img_ref[pl.ds(ty0 + r, 8), ...]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in range(3):  # static unroll, dynamic base
            acc = acc + x_ref[pl.ds(i * 8 + r, 8), pl.ds(0, 128)]
        o_ref[:, :] = acc

    x = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
    )(x)
    want = np.stack(
        [
            sum(np.asarray(x)[i * 8 + r : i * 8 + r + 8] for r in range(3))
            for i in range(2)
        ]
    ).reshape(16, 128)
    np.testing.assert_allclose(np.asarray(out), want)


def probe_concat_lanes():
    """jnp.concatenate of many (8, 256) bands along lanes, as the kernel does."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        bands = [x_ref[pl.ds(r, 8), :] for r in range(8)]
        big = jnp.concatenate(bands, axis=1)  # (8, 8*256)
        o_ref[:, :] = big[:, : o_ref.shape[1]]

    x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:8])


def probe_smem_scalars():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, s_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * s_ref[0, 1]

    x = jnp.ones((8, 128), jnp.float32)
    s = jnp.asarray([[2.0, 3.0, 4.0, 5.0]], jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)
    np.testing.assert_allclose(np.asarray(out), 3.0)


def probe_small_ncc():
    """The actual kernel at tiny geometry (8x8 template, 64x256 img)."""
    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_pallas import ncc_map_pallas
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((64, 256), np.float32))
    templ = jnp.asarray(rng.random((8, 8), np.float32))
    got = np.asarray(ncc_map_pallas(img, templ))
    want = np.asarray(ncc_map_matmul(img, templ))
    err = np.max(np.abs(got - want))
    print(f"  max abs err = {err:.3e}")
    assert err < 1e-3, f"numerics mismatch: {err}"


def probe_headline_ncc():
    """The actual kernel at headline geometry (80x80 template)."""
    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_pallas import ncc_map_pallas
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((200, 200), np.float32))
    templ = jnp.asarray(rng.random((80, 80), np.float32))
    got = np.asarray(ncc_map_pallas(img, templ))
    want = np.asarray(ncc_map_matmul(img, templ))
    err = np.max(np.abs(got - want))
    print(f"  max abs err = {err:.3e}")
    assert err < 1e-3, f"numerics mismatch: {err}"


PROBES = {
    "trivial": probe_trivial,
    "grid": probe_grid_blockspec,
    "matmul": probe_matmul,
    "big_matmul": probe_big_matmul,
    "dyn_sublane": probe_dyn_sublane_read,
    "concat_lanes": probe_concat_lanes,
    "smem": probe_smem_scalars,
    "dot_highest": probe_dot_highest,
    "dot_high": probe_dot_high,
    "scratch_copy_dot": probe_scratch_copy_dot,
    "unrolled_dots": probe_unrolled_dots,
    "small_ncc": probe_small_ncc,
    "headline_ncc": probe_headline_ncc,
}


def main():
    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    names = sys.argv[1:] or list(PROBES)
    results = {}
    for name in names:
        results[name] = _run(name, PROBES[name])
    print("\nsummary:", {k: ("PASS" if v else "FAIL") for k, v in results.items()})




def probe_aligned_dyn16():
    """(16, 256) ref load at base 8*(i+k): provably aligned dynamic base."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((16, 256), jnp.float32)
        for k in range(2):
            acc = acc + x_ref[pl.ds(8 * (i + k), 16), :]
        o_ref[:, :] = acc[:8, :128]

    x = jnp.arange(40 * 256, dtype=jnp.float32).reshape(40, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
    )(x)
    xs = np.asarray(x)
    want = np.stack(
        [(xs[8 * i : 8 * i + 16] + xs[8 * (i + 1) : 8 * (i + 1) + 16])[:8, :128]
         for i in range(2)]
    ).reshape(16, 128)
    np.testing.assert_allclose(np.asarray(out), want)


def probe_slice16_add():
    """Static sublane slices [p:p+8] of a 16-row VALUE, summed."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        v = x_ref[:, :]  # (16, 128)
        acc = jnp.zeros((8, 128), jnp.float32)
        for p in range(8):
            acc = acc + v[p : p + 8, :]
        o_ref[:, :] = acc

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    xs = np.asarray(x)
    want = sum(xs[p : p + 8] for p in range(8))
    np.testing.assert_allclose(np.asarray(out), want)


def probe_selector_dot():
    """Fallback phase-combine: constant (8, 16) selector matmul."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, s_ref, o_ref):
        o_ref[:, :] = lax.dot_general(
            s_ref[:, :], x_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 128), np.float32))
    sel = np.zeros((8, 16), np.float32)
    for ty in range(8):
        sel[ty, ty + 3] = 1.0  # shift-by-3 selector
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.asarray(sel))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[3:11], rtol=1e-6)


def probe_new_ncc_mini():
    """The full aligned-window NCC formulation at 16x16 template, on-chip,
    vs the MXU matmul engine."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_reference import template_stats

    TH, TW = 16, 16
    L = 256  # tile lanes for TX=128, tw=16 -> 128+15 -> 256
    TX = 128
    K = TH // 8  # aligned 16-row windows

    def kernel(img_ref, toep_ref, box_ref, scal_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ty0 = i * 8
        tx0 = j * TX
        acc = jnp.zeros((8, TX), jnp.float32)
        bsum = jnp.zeros((8, L), jnp.float32)
        bsq = jnp.zeros((8, L), jnp.float32)
        for k in range(K):
            w = img_ref[pl.ds(8 * (i + k), 16), pl.ds(tx0, L)]
            t1 = lax.dot_general(
                w, toep_ref[pl.ds(k * L, L), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )  # (16, 8*TX)
            for p in range(8):
                acc = acc + t1[p : p + 8, p * TX : (p + 1) * TX]
                bsum = bsum + w[p : p + 8, :]
                bsq = bsq + w[p : p + 8, :] * w[p : p + 8, :]
        t_std_in = scal_ref[0, 1]
        sum_tc = scal_ref[0, 2]
        n = scal_ref[0, 3]
        wsum = lax.dot_general(
            bsum, box_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        wssq = lax.dot_general(
            bsq, box_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        mean = wsum / n
        var = wssq / n - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 1e-6))
        cov = acc - mean * sum_tc
        o_ref[:, :] = cov / ((std + 1e-6) * (t_std_in + 1e-6) * n)

    rng = np.random.default_rng(0)
    img = rng.random((64, 200), np.float32)
    templ = rng.random((TH, TW), np.float32)
    t_mean, t_std = template_stats(jnp.asarray(templ))
    tc = templ - np.float32(t_mean)

    # toep_cat[k*L + l, p*TX + dx] = tc[8k+p, j] where j = l - dx in [0, TW)
    toep = np.zeros((K * L, 8 * TX), np.float32)
    for r in range(TH):
        k, p = divmod(r, 8)
        for dx in range(TX):
            toep[k * L + dx : k * L + dx + TW, p * TX + dx] = tc[r]
    box = np.zeros((L, TX), np.float32)
    for dx in range(TX):
        box[dx : dx + TW, dx] = 1.0

    out_h, out_w = 64 - TH + 1, 200 - TW + 1
    gh = -(-out_h // 8)
    gw = -(-out_w // TX)
    # pad img so every load is in bounds: rows gh*8 + 8*(K-1) + 16, lanes gw*TX + L
    img_pad = np.zeros((gh * 8 + 8 * (K - 1) + 16, (gw - 1) * TX + L), np.float32)
    img_pad[:64, :200] = img
    scal = np.array([[float(t_mean), float(t_std), float(tc.sum()), TH * TW]], np.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((gh * 8, gw * TX), jnp.float32),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, TX), lambda i, j: (i, j)),
    )(jnp.asarray(img_pad), jnp.asarray(toep), jnp.asarray(box), jnp.asarray(scal))
    got = np.asarray(out)[:out_h, :out_w]
    want = np.asarray(ncc_map_matmul(jnp.asarray(img), jnp.asarray(templ)))
    err = np.max(np.abs(got - want))
    print(f"  max abs err vs matmul engine = {err:.3e}")
    assert err < 1e-4, err


PROBES["aligned_dyn16"] = probe_aligned_dyn16
PROBES["slice16_add"] = probe_slice16_add
PROBES["selector_dot"] = probe_selector_dot
PROBES["new_ncc_mini"] = probe_new_ncc_mini


if __name__ == "__main__":
    main()
