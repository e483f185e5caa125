"""Pallas TPU kernels for NCC template matching.

TPU-native equivalents of the reference's five CUDA kernels (SURVEY.md §2b
K1-K5, tracker_ghc/src/baseline_kernel.cu).  On TPU there is no separate
shared/constant memory: the template lives in VMEM for the kernel's lifetime
(the --shared/--const analog), and the frame is consumed in VMEM tiles by a
grid over output blocks (the --const_tiled analog).  One kernel therefore
covers all the reference's memory-hierarchy variants; the reference's
*batched* kernel (K3, blockIdx.z over frames) maps to `jax.vmap` over the
pallas_call.

Math and epsilon structure match baseline_kernel.cu:17-47 exactly (see
pvot.ops.ncc_reference).  The covariance accumulates against the centered
template with an exact correction term, so results agree with the oracle to
f32 rounding:

    cov = sum_f (f * (t - mu_t)) - mu_f * sum(t - mu_t)

Each grid step owns a (TY, TX)=(8, 128) output tile (one VPU register shape)
and walks the template rows with a fori_loop, accumulating window sum,
sum-of-squares, and covariance in registers — everything from gray pixels to
the final NCC score fuses in one kernel with zero HBM round-trips for
intermediates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvot.ops.ncc_reference import template_stats

TY = 8  # output tile rows  (f32 sublane)
TX = 128  # output tile cols (lane width)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ncc_kernel(
    img_ref,  # (imgH_pad, imgW_pad) f32, whole image in VMEM
    tc_ref,  # (th_pad, tw_pad) f32, centered template (zero padded)
    scal_ref,  # (4,) f32 in SMEM: [t_mean_unused, t_std_in, sum_tc, n]
    out_ref,  # (TY, TX) f32 tile
    *,
    th: int,
    tw: int,
):
    ty0 = pl.program_id(0) * TY
    tx0 = pl.program_id(1) * TX
    tile_w = TX + tw - 1
    # Pull the (TY + th - 1, TX + tw - 1) halo tile once.
    tile = img_ref[pl.ds(ty0, TY + th - 1), pl.ds(tx0, tile_w)]

    def row_body(r, carry):
        acc_sum, acc_ssq, acc_cov = carry
        band = jax.lax.dynamic_slice(tile, (r, 0), (TY, tile_w))
        for c in range(tw):  # static unroll over template columns
            win = jax.lax.slice(band, (0, c), (TY, c + TX))
            tv = tc_ref[r, c]
            acc_sum = acc_sum + win
            acc_ssq = acc_ssq + win * win
            acc_cov = acc_cov + win * tv
        return acc_sum, acc_ssq, acc_cov

    zeros = jnp.zeros((TY, TX), jnp.float32)
    acc_sum, acc_ssq, acc_cov = lax.fori_loop(
        0, th, row_body, (zeros, zeros, zeros)
    )

    t_std_in = scal_ref[1]
    sum_tc = scal_ref[2]
    n = scal_ref[3]
    mean = acc_sum / n
    var = acc_ssq / n - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 1e-6))
    cov = acc_cov - mean * sum_tc  # exact centered-template correction
    out_ref[:, :] = cov / ((std + 1e-6) * (t_std_in + 1e-6) * n)


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def _ncc_pallas_padded(
    img_pad: jax.Array,
    t_centered_pad: jax.Array,
    scalars: jax.Array,
    th: int,
    tw: int,
    interpret: bool = False,
) -> jax.Array:
    """img_pad already padded so every tile's halo read stays in bounds."""
    gh = (img_pad.shape[0] - (th - 1)) // TY
    gw = (img_pad.shape[1] - (tw - 1)) // TX
    kernel = functools.partial(_ncc_kernel, th=th, tw=tw)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((gh * TY, gw * TX), jnp.float32),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(img_pad, t_centered_pad, scalars)


def ncc_map_pallas(
    img: jax.Array,
    templ: jax.Array,
    t_mean: jax.Array | None = None,
    t_std: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Full valid-mode NCC map via the fused Pallas kernel.

    img (H, W) f32, templ (th, tw) f32 -> (H-th+1, W-tw+1) f32 with the
    reference's exact epsilon semantics.
    """
    img = img.astype(jnp.float32)
    templ = templ.astype(jnp.float32)
    if t_mean is None or t_std is None:
        t_mean, t_std = template_stats(templ)
    th, tw = templ.shape
    h, w = img.shape
    out_h, out_w = h - th + 1, w - tw + 1
    gh = _round_up(out_h, TY) // TY
    gw = _round_up(out_w, TX) // TX
    img_pad = jnp.pad(
        img, ((0, gh * TY + th - 1 - h), (0, gw * TX + tw - 1 - w))
    )
    t_centered = templ - t_mean
    scalars = jnp.stack(
        [t_mean, t_std, jnp.sum(t_centered), jnp.float32(th * tw)]
    )
    out = _ncc_pallas_padded(img_pad, t_centered, scalars, th, tw, interpret)
    return out[:out_h, :out_w]


def ncc_map_pallas_batched(
    frames: jax.Array, templ: jax.Array, interpret: bool = False
) -> jax.Array:
    """K3 equivalent: one dispatch scoring N frames against one template
    snapshot (vmap replaces blockIdx.z, baseline_kernel.cu:100-144)."""
    t_mean, t_std = template_stats(templ)
    return jax.vmap(
        lambda f: ncc_map_pallas(f, templ, t_mean, t_std, interpret=interpret)
    )(frames)


def pallas_full_fn(frame_shape: Tuple[int, int], templ_shape: Tuple[int, int]):
    """Backend adapter: full-map callable (frame, templ, t_mean, t_std)."""
    del frame_shape, templ_shape

    def full_fn(frame, templ, t_mean, t_std):
        return ncc_map_pallas(frame, templ, t_mean, t_std)

    return full_fn


def pallas_region_fn(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    span_shape: Tuple[int, int],
):
    """Backend adapter: fused local-search region scorer."""
    span_y, span_x = span_shape

    def region_fn(frame, templ, t_mean, t_std, x0, y0):
        th, tw = templ.shape
        region = lax.dynamic_slice(
            frame, (y0, x0), (span_y + th - 1, span_x + tw - 1)
        )
        return ncc_map_pallas(region, templ, t_mean, t_std)

    return region_fn
