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

Each grid step owns a (ty<=128, TX=128) output tile and walks the template's
aligned 8-row groups; per group, the correlations of all 8 row phases are
ONE MXU matmul with a precomputed phase-concatenated Toeplitz operator, and
window sum / sum-of-squares collapse into two more matmuls — everything
from pixels to the final NCC score fuses in one kernel with zero HBM
round-trips for intermediates.
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


def _dot_f32(a, b):
    """In-kernel f32 matmul at parity precision.

    precision=HIGHEST (bf16x6 on the MXU) keeps the Pallas engine's scores
    within f32 rounding of the matmul engine, which uses the same setting;
    the default single-bf16-pass dot costs ~1e-3 relative error (measured
    on-chip, tools/pallas_probe.py 'matmul' rung)."""
    return lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _dot_hl3(a, bh, bl):
    """In-kernel 3-pass bf16 hi/lo matmul — the precision=HIGH analog.

    Mosaic rejects precision=HIGH inside kernels (tools/pallas_probe.py
    'dot_high' rung), so the 3-pass decomposition is explicit: split both
    operands into bf16 hi + bf16 lo residual and drop the lo@lo term —
    the same structure XLA's HIGH uses.  Measured on-chip 8.8e-6 relative
    vs XLA HIGH (tools/fused_argmax_probe.py 'dot_high_emul' rung), the
    same order as the HIGH-vs-HIGHEST drift itself.  The RHS (the
    Toeplitz operator) arrives PRE-SPLIT as a bf16 pair: the XLA-side
    build then writes — and the kernel DMAs — half the bytes of the f32
    operator, the fast tier's second win besides the halved MXU passes.
    Used only by the opt-in fast Pallas engine (backends 'pallas_fast');
    every reference-parity mode keeps _dot_f32."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return lax.dot_general(
            x, y,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _score_tile(
    img_ref, toep_ref, box_ref, scal_ref, th, tw, ty, highest=True,
    shear=False,
):
    """Compute this grid step's (ty, TX) NCC score tile from VMEM refs.

    Shared by _ncc_kernel (writes the tile to the output map) and
    _ncc_argmax_kernel (reduces it on-chip so only (val, idx) leaves).
    See _ncc_kernel's docstring for the aligned-window MXU formulation and
    the Mosaic-constraint rationale.

    highest=False runs the dominant correlation matmul with the 3-pass
    hi/lo bf16 decomposition (_dot_hl3) instead of HIGHEST's 6 passes —
    the fast-engine analog; the box-sum matmuls stay HIGHEST (they are
    ~1% of the FLOPs and feed the variance denominator).

    shear=True is the round-3 OPERATOR-FREE formulation: toep_ref then
    holds the raw zero-padded centered template rows (8K, M = L + TX,
    ~123 KB) instead of the 10.5 MB phase-concatenated Toeplitz operator.
    Per template row, a strided pltpu.roll of the broadcast row builds the
    TRANSPOSED Toeplitz block tt[dx, l] = t_c[r, (l - dx) mod M] in
    registers — the M - tw zero tail makes every wrapped index hit zero,
    which IS the operator's 0-outside-[0,tw) semantics — and the
    correlation consumes it immediately with a lane-contracting dot.
    Nothing operator-sized ever touches HBM: no XLA build pass (16 us/frame
    in-scan) and no operator DMA (~13 us/frame), measured in
    tools/region_step_breakdown.py.  CAUTION (chip-verified,
    tools/fused_argmax_probe.py dot_rhs_lane vs shear_dot): the same
    lane-contracting dot with a REF-loaded RHS silently drops
    precision=HIGHEST to single-pass bf16; the RHS must stay a rolled
    VALUE.  shear currently implies highest=True.
    """
    i = pl.program_id(0)
    tx0 = pl.program_id(1) * TX
    tile_lanes = _round_up(TX + tw - 1, 128)
    k_blocks = -(-th // 8)
    M = tile_lanes + TX

    acc = jnp.zeros((ty, TX), jnp.float32)
    bsum = jnp.zeros((ty, tile_lanes), jnp.float32)
    bsq = jnp.zeros((ty, tile_lanes), jnp.float32)
    for k in range(k_blocks):  # static unroll
        w = img_ref[pl.ds(ty * i + 8 * k, ty + 8), pl.ds(tx0, tile_lanes)]
        wsq = w * w
        if shear:  # operator-free: roll-and-consume per template row
            t8 = toep_ref[pl.ds(8 * k, 8), :]
            t1 = None
        elif highest:  # f32 operator, 6-pass parity dot
            t1 = _dot_f32(w, toep_ref[pl.ds(k * tile_lanes, tile_lanes), :])
        else:  # bf16 hi/lo operator pair stacked on sublanes (hi block
            # first, lo block after all K hi blocks), 3-pass dot
            t1 = _dot_hl3(
                w,
                toep_ref[pl.ds(k * tile_lanes, tile_lanes), :],
                toep_ref[
                    pl.ds((k_blocks + k) * tile_lanes, tile_lanes), :
                ],
            )
        for p in range(8):
            if 8 * k + p >= th:  # zero-padded template rows: skip statically
                break
            if shear:
                b = jnp.broadcast_to(t8[p : p + 1, :], (TX, M))
                tt = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
                t1p = lax.dot_general(
                    w,
                    tt[:, :tile_lanes],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                acc = acc + t1p[p : p + ty, :]
            else:
                acc = acc + t1[p : p + ty, p * TX : (p + 1) * TX]
            bsum = bsum + w[p : p + ty, :]
            bsq = bsq + wsq[p : p + ty, :]
    acc_sum = _dot_f32(bsum, box_ref[:, :])
    acc_ssq = _dot_f32(bsq, box_ref[:, :])

    t_std_in = scal_ref[0, 1]
    sum_tc = scal_ref[0, 2]
    n = scal_ref[0, 3]
    mean = acc_sum / n
    var = acc_ssq / n - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 1e-6))
    cov = acc - mean * sum_tc  # centered-template correction
    return cov / ((std + 1e-6) * (t_std_in + 1e-6) * n)


def _ncc_kernel(
    img_ref,  # (imgH_pad, imgW_pad) f32, image (strip) in VMEM
    toep_ref,  # (K * tile_lanes, 8 * TX) f32: phase-concatenated Toeplitz
    box_ref,  # (tile_lanes, TX) f32: 0/1 Toeplitz of a ones row (box sums)
    scal_ref,  # (1, 4) f32 in SMEM: [t_mean_unused, t_std_in, sum_tc, n]
    out_ref,  # (ty, TX) f32 tile
    *,
    th: int,
    tw: int,
    ty: int,
    highest: bool = True,
    shear: bool = False,
):
    """Aligned-window MXU formulation.

    Template rows are grouped as r = 8k + p (K = ceil(th/8) aligned
    8-row groups x 8 phases).  Per group k the kernel loads ONE
    (ty+8)-row window W_k = img[ty*i + 8k : ty*i + 8k + ty + 8] — base
    ty*i + 8k is *provably* a multiple of 8 (ty is) — and computes all 8
    phase correlations in one matmul against the phase-concatenated
    operator:

        T1_k = W_k @ toep_k         # (ty+8, L) @ (L, 8*TX) -> (ty+8, 8*TX)
        toep_k[l, p*TX + dx] = t_centered[8k + p, l - dx]   (0 outside [0,tw))

    The contribution of template row 8k+p to output row oy lives at
    T1_k[oy + p, p*TX + tx], so the combine is 8 STATIC value slices
    T1_k[p:p+ty, p*TX:(p+1)*TX] summed on the VPU.  Window sum / sum of
    squares reuse the same sliced windows and two small matmuls against
    the ones-row Toeplitz.

    ty (the output-tile height) is the MXU-utilization knob: the matmul
    LHS has ty+8 rows, so ty=8 (the original tile) runs 16-row matmuls
    at ~12% MXU row occupancy while ty=128 runs 136-row matmuls at full
    occupancy AND halves the total FLOPs (fewer overlapping window
    loads).  Measured on-chip: 27x end-to-end tracking speedup
    (tools/pallas_ty_bench.py; 190 -> 5k+ FPS).

    Why this exact shape (each alternative verified failing on-chip via
    tools/pallas_probe.py): per-band loads at base 8i + r die in this
    environment's Mosaic with "cannot statically prove that index in
    dimension 0 is a multiple of 8" ('scratch_copy_dot'/'unrolled_dots'
    rungs); concatenating bands as values dies with "tpu.concatenate:
    result/input offset mismatch" ('concat_lanes'); precision=HIGH is
    unsupported, HIGHEST works ('dot_high'/'dot_highest').  Also rejected
    by this Mosaic (round-1 repros): value-level dynamic_slice,
    lane-unaligned slices, static-shift pltpu.roll, in-kernel integer
    division, traced rolls under nested fori, cross-grid-step ref
    accumulation, jnp.dot inside fori_loop.
    """
    out_ref[:, :] = _score_tile(
        img_ref, toep_ref, box_ref, scal_ref, th, tw, ty, highest, shear
    )


def _ncc_argmax_kernel(
    img_ref,  # (imgH_pad, imgW_pad) f32, candidate region in VMEM
    toep_ref,  # (K * tile_lanes, 8 * TX) f32: phase-concatenated Toeplitz
    box_ref,  # (tile_lanes, TX) f32: ones-row Toeplitz (box sums)
    scal_ref,  # (1, 4) f32 SMEM: [t_mean_unused, t_std_in, sum_tc, n]
    win_ref,  # (1, 4) i32 SMEM: region-relative window [rx0, rx1, ry0, ry1]
    val_ref,  # (8, TX) f32: this tile's masked max, broadcast
    idx_ref,  # (8, TX) i32: its first-occurrence flat index, broadcast
    *,
    th: int,
    tw: int,
    ty: int,
    highest: bool = True,
    shear: bool = False,
):
    """The north-star fused reduction (SURVEY.md §7 step 4): NCC scores,
    window masking, and the cv::minMaxLoc-compatible argmax all happen
    on-chip; only (best_val, flat_idx) leaves the kernel — the score map
    never touches HBM.

    Masking replicates pvot.ops.search.masked_region_argmax: positions
    outside the clamped window (given region-relative, inclusive) score
    -inf.  Tie-break is row-major first occurrence over GLOBAL region
    coordinates: flat = dy * (gw*TX) + dx is strictly increasing in
    (dy, dx) row-major, so min-of-candidates == first occurrence, including
    across grid tiles (the caller reduces per-tile partials with the same
    rule).  An all-masked tile yields (-inf, 0) and is discarded either by
    the cross-tile combine or — for a collapsed window — by the tracker
    step, which routes collapsed windows to global search
    (tracker_ghc/src/main.cpp:439-446 semantics).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    gw = pl.num_programs(1)
    s = _score_tile(
        img_ref, toep_ref, box_ref, scal_ref, th, tw, ty, highest, shear
    )
    dy = ty * i + lax.broadcasted_iota(jnp.int32, (ty, TX), 0)
    dx = TX * j + lax.broadcasted_iota(jnp.int32, (ty, TX), 1)
    mask = (
        (dx >= win_ref[0, 0])
        & (dx <= win_ref[0, 1])
        & (dy >= win_ref[0, 2])
        & (dy <= win_ref[0, 3])
    )
    masked = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(masked)
    flat = dy * (gw * TX) + dx
    cand = jnp.where(masked == m, flat, jnp.int32(2**30))
    idx = jnp.min(cand)
    val_ref[:, :] = jnp.full((8, TX), m, jnp.float32)
    idx_ref[:, :] = jnp.full((8, TX), idx, jnp.int32)


def _toeplitz_operators(t_centered: jax.Array, tile_lanes: int):
    """Build the phase-concatenated correlation operators (outside the
    kernel, plain XLA; rebuilt whenever the template changes — i.e. on
    every EMA-update frame, so construction cost is on the hot path).

    toep[k*L + l, p*TX + dx] = t_centered[8k + p, l - dx] for
    0 <= l - dx < tw, else 0 — one (L, 8*TX) operator per aligned 8-row
    template group, stacked along sublanes.

    Round-3 build: direct slice-stack into the final memory order.  The
    TINY padded template relayouts to (K, L, 8) (<= 100 KB), is front-
    padded along l, and TX shifted middle-axis slices stack on a new last
    (lane) axis — (K, L, 8, TX) is then the target layout and the
    (K*L, 8*TX) reshape is a free view.  One ~10.5 MB fused write, no big
    relayouts, no wraparound constraint.  Measured on-chip 58 vs 82
    us/build for round-2's Hankel tile-reshape (whose `tiled` intermediate
    is ~21 MB plus flip/transpose relayouts); element-exact against the
    roll construction (tests/test_ncc_pallas.py) and the Hankel build
    (tools/toeplitz_build_bench.py).  This build is the Pallas engine's
    dominant per-frame fixed cost (the EMA fires nearly every frame), so
    its cost IS the engine's headline-geometry handicap; see
    docs/PERFORMANCE.md "Engine crossover".

    box is the same operator from a ones row (shared by all templates of
    this geometry).
    """
    th, tw = t_centered.shape
    k_blocks = -(-th // 8)
    L = tile_lanes
    padded = jnp.pad(
        t_centered, ((0, 8 * k_blocks - th), (0, L - tw))
    )  # (8K, L)
    # (8K, L) -> (K, 8, L) -> (K, L, 8): tiny relayout, then shift-stack.
    klp = padded.reshape(k_blocks, 8, L).transpose(0, 2, 1)
    vpad = jnp.pad(klp, ((0, 0), (TX - 1, 0), (0, 0)))
    cols = [vpad[:, TX - 1 - dx : TX - 1 - dx + L, :] for dx in range(TX)]
    win = jnp.stack(cols, axis=-1)  # (K, L, 8, TX): [k, l, p, dx]
    return win.reshape(k_blocks * L, 8 * TX)


def _templ_rows(t_centered: jax.Array, tile_lanes: int) -> jax.Array:
    """The shear kernel's template input: raw centered rows zero-padded to
    (8*ceil(th/8), tile_lanes + TX) — ~123 KB at 80x80 vs the 10.5 MB
    operator.  The M - tw zero tail doubles as the roll's wraparound
    absorber (see _score_tile shear notes)."""
    th, tw = t_centered.shape
    k_blocks = -(-th // 8)
    M = tile_lanes + TX
    return jnp.pad(t_centered, ((0, 8 * k_blocks - th), (0, M - tw)))


def _toeplitz_for(t_centered: jax.Array, tile_lanes: int, highest: bool):
    """The kernel's operator input at the requested precision tier.

    highest: the f32 operator as built.  fast: the bf16 hi/lo pair,
    stacked on the sublane axis (all K hi blocks, then all K lo blocks) —
    half the build-write and kernel-DMA bytes; XLA fuses the split into
    the build's single pass."""
    toep = _toeplitz_operators(t_centered, tile_lanes)
    if highest:
        return toep
    hi = toep.astype(jnp.bfloat16)
    lo = (toep - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)


@functools.lru_cache(maxsize=8)
def _box_operator(tile_lanes: int, tw: int):
    """0/1 ones-row Toeplitz as NUMPY (an eager device constant here would be
    captured by jit and re-fetched per call on the remote TPU runtime)."""
    import numpy as _np

    box = _np.zeros((tile_lanes, TX), _np.float32)
    for dx in range(TX):
        box[dx : dx + tw, dx] = 1.0
    return box


@functools.partial(
    jax.jit,
    static_argnames=("th", "tw", "ty", "interpret", "highest", "shear"),
)
def _ncc_pallas_padded(
    img_pad: jax.Array,
    toep: jax.Array,
    scalars: jax.Array,
    th: int,
    tw: int,
    ty: int = TY,
    interpret: bool = False,
    highest: bool = True,
    shear: bool = False,
) -> jax.Array:
    """img_pad already padded so every tile's window read stays in bounds.

    Padding contract (see ncc_map_pallas): H_pad = ty*gh + 8*ceil(th/8),
    W_pad = (gw - 1)*TX + tile_lanes — the last grid row's last aligned
    window reads rows [ty*(gh-1) + 8*(K-1), +ty+8).
    """
    tile_lanes = _round_up(TX + tw - 1, 128)
    k_blocks = -(-th // 8)
    gh = (img_pad.shape[0] - 8 * k_blocks) // ty
    gw = (img_pad.shape[1] - tile_lanes) // TX + 1
    box = jnp.asarray(_box_operator(tile_lanes, tw))
    kernel = functools.partial(
        _ncc_kernel, th=th, tw=tw, ty=ty, highest=highest, shear=shear
    )
    # The phase-concatenated operator alone is K*L*8*TX*4 bytes (10.5 MB at
    # 80x80); with the image strip, per-k intermediates, and the enclosing
    # program's scoped buffers the default 16 MB scoped-VMEM limit can be
    # exceeded by a hair (observed on-chip: 16.25 MB for a 121x121 region
    # search inside a chunk-128 scan).  v5e VMEM is far larger than the
    # default limit; budget explicitly from the operand sizes.
    vmem_budget = (
        4 * (img_pad.size + toep.size + box.size)
        + 4 * (ty + 8) * (8 * TX) * (k_blocks + 2)  # t1 intermediates
        + 8 * 1024 * 1024  # slack for acc/bsum/bsq + compiler temporaries
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((gh * ty, gw * TX), jnp.float32),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (ty, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(img_pad, toep, box, scalars)


def ncc_map_pallas(
    img: jax.Array,
    templ: jax.Array,
    t_mean: jax.Array | None = None,
    t_std: jax.Array | None = None,
    interpret: bool = False,
    strip_rows: int = 256,
    highest: bool = True,
    shear: bool = False,
) -> jax.Array:
    """Full valid-mode NCC map via the fused Pallas kernel.

    img (H, W) f32, templ (th, tw) f32 -> (H-th+1, W-tw+1) f32 with the
    reference's exact epsilon semantics.  Large images are processed in
    y-strips of `strip_rows` output rows so strip + Toeplitz operators stay
    inside VMEM (the operators cost th * tile_lanes * TX * 4 bytes, ~10.5 MB
    for an 80x80 template).
    """
    from pvot.io.gray import ensure_gray_f32

    if shear and not highest:
        raise ValueError("shear kernel is HIGHEST-only (see _score_tile)")
    img = ensure_gray_f32(img)
    templ = templ.astype(jnp.float32)
    if t_mean is None or t_std is None:
        t_mean, t_std = template_stats(templ)
    th, tw = templ.shape
    h, w = img.shape
    out_h, out_w = h - th + 1, w - tw + 1
    tile_lanes = _round_up(TX + tw - 1, 128)

    t_centered = templ - t_mean
    if shear:
        toep = _templ_rows(t_centered, tile_lanes)
    else:
        toep = _toeplitz_for(t_centered, tile_lanes, highest)
    scalars = jnp.stack(
        [t_mean, t_std, jnp.sum(t_centered), jnp.float32(th * tw)]
    ).reshape(1, 4)

    k_blocks = -(-th // 8)

    def one_strip(strip_img):
        sh = strip_img.shape[0]
        s_out_h = sh - th + 1
        # Output-tile height: as tall as the strip allows, up to 128 rows
        # (full MXU sublane occupancy for the in-kernel matmuls; see
        # _ncc_kernel's ty note).  Always a multiple of 8.
        ty = min(128, _round_up(s_out_h, 8))
        gh = _round_up(s_out_h, ty) // ty
        gw = _round_up(out_w, TX) // TX
        img_pad = jnp.pad(
            strip_img,
            (
                (0, ty * gh + 8 * k_blocks - sh),
                (0, (gw - 1) * TX + tile_lanes - w),
            ),
        )
        out = _ncc_pallas_padded(
            img_pad, toep, scalars, th, tw, ty, interpret, highest, shear
        )
        return out[:s_out_h, :out_w]

    if strip_rows and out_h > strip_rows:
        pieces = []
        for dy0 in range(0, out_h, strip_rows):
            rows = min(strip_rows, out_h - dy0)
            pieces.append(
                one_strip(lax.slice(img, (dy0, 0), (dy0 + rows + th - 1, w)))
            )
        return jnp.concatenate(pieces, axis=0)
    return one_strip(img)


@functools.partial(
    jax.jit,
    static_argnames=("th", "tw", "ty", "interpret", "highest", "shear"),
)
def _ncc_argmax_padded(
    img_pad: jax.Array,
    toep: jax.Array,
    scalars: jax.Array,
    win: jax.Array,
    th: int,
    tw: int,
    ty: int,
    interpret: bool = False,
    highest: bool = True,
    shear: bool = False,
):
    """Fused score+argmax over a padded candidate region.

    Same padding contract as _ncc_pallas_padded; returns per-tile partials
    (vals (gh, gw) f32 broadcast into (gh*8, gw*TX) blocks, idxs i32)."""
    tile_lanes = _round_up(TX + tw - 1, 128)
    k_blocks = -(-th // 8)
    gh = (img_pad.shape[0] - 8 * k_blocks) // ty
    gw = (img_pad.shape[1] - tile_lanes) // TX + 1
    box = jnp.asarray(_box_operator(tile_lanes, tw))
    kernel = functools.partial(
        _ncc_argmax_kernel, th=th, tw=tw, ty=ty, highest=highest, shear=shear
    )
    vmem_budget = (
        4 * (img_pad.size + toep.size + box.size)
        + 4 * (ty + 8) * (8 * TX) * (k_blocks + 2)
        + 8 * 1024 * 1024
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((gh * 8, gw * TX), jnp.float32),
            jax.ShapeDtypeStruct((gh * 8, gw * TX), jnp.int32),
        ),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(img_pad, toep, box, scalars, win)


def ncc_region_argmax_pallas(
    region: jax.Array,
    templ: jax.Array,
    bounds,
    x0: jax.Array,
    y0: jax.Array,
    t_mean: jax.Array | None = None,
    t_std: jax.Array | None = None,
    interpret: bool = False,
    highest: bool = True,
    shear: bool = False,
):
    """Fused local-search scorer+argmax: returns ONLY (best_val, x, y).

    Drop-in replacement for region_fn + pvot.ops.search.masked_region_argmax
    (identical semantics incl. row-major first-occurrence tie-break), with
    the score map never leaving the chip — the reduction the reference's
    kernel ladder stops short of (baseline_kernel.cu:185-252 ends at the
    tiled map write; cv::minMaxLoc runs on host, main.cpp:436).

    region (span_y + th - 1, span_x + tw - 1) u8/f32; bounds a WindowBounds
    in MAP coordinates; (x0, y0) the region origin in map coordinates.
    """
    from pvot.io.gray import ensure_gray_f32

    if shear and not highest:
        raise ValueError("shear kernel is HIGHEST-only (see _score_tile)")
    region = ensure_gray_f32(region)
    templ = templ.astype(jnp.float32)
    if t_mean is None or t_std is None:
        t_mean, t_std = template_stats(templ)
    th, tw = templ.shape
    h, w = region.shape
    span_y, span_x = h - th + 1, w - tw + 1
    tile_lanes = _round_up(TX + tw - 1, 128)
    k_blocks = -(-th // 8)

    t_centered = templ - t_mean
    if shear:
        toep = _templ_rows(t_centered, tile_lanes)
    else:
        toep = _toeplitz_for(t_centered, tile_lanes, highest)
    scalars = jnp.stack(
        [t_mean, t_std, jnp.sum(t_centered), jnp.float32(th * tw)]
    ).reshape(1, 4)
    win = jnp.stack(
        [
            bounds.min_tx - x0,
            bounds.max_tx - x0,
            bounds.min_ty - y0,
            bounds.max_ty - y0,
        ]
    ).astype(jnp.int32).reshape(1, 4)

    ty = min(128, _round_up(span_y, 8))
    gh = _round_up(span_y, ty) // ty
    gw = _round_up(span_x, TX) // TX
    img_pad = jnp.pad(
        region,
        ((0, ty * gh + 8 * k_blocks - h), (0, (gw - 1) * TX + tile_lanes - w)),
    )
    vals, idxs = _ncc_argmax_padded(
        img_pad, toep, scalars, win, th, tw, ty, interpret, highest, shear
    )
    # Per-tile partials -> global (val, x, y); same tie-break rule (the flat
    # index is row-major over global region coordinates).
    v = vals.reshape(gh, 8, gw, TX)[:, 0, :, 0]
    ix = idxs.reshape(gh, 8, gw, TX)[:, 0, :, 0]
    m = jnp.max(v)
    flat = jnp.min(jnp.where(v == m, ix, jnp.int32(2**30)))
    ry = flat // (gw * TX)
    rx = flat % (gw * TX)
    return m, x0 + rx.astype(jnp.int32), y0 + ry.astype(jnp.int32)


def ncc_map_pallas_batched(
    frames: jax.Array, templ: jax.Array, interpret: bool = False
) -> jax.Array:
    """K3 equivalent: one dispatch scoring N frames against one template
    snapshot (vmap replaces blockIdx.z, baseline_kernel.cu:100-144)."""
    t_mean, t_std = template_stats(templ)
    return jax.vmap(
        lambda f: ncc_map_pallas(f, templ, t_mean, t_std, interpret=interpret)
    )(frames)


_SUPPORT_CACHE: dict = {}


def _probe_one(
    img_shape, templ_shape, seed: int = 0, highest: bool = True,
    shear: bool = False,
) -> None:
    """Compile + numerics check of the fused kernel at EXACTLY this
    geometry; raises on failure (caller records the verdict).

    Tolerance 1e-4, NOT 1e-3: this Mosaic can silently drop a dot's
    precision request to single-pass bf16 (~1e-3 score error — chip repro
    in tools/fused_argmax_probe.py dot_rhs_lane), and the probe must fail
    that case.  HIGHEST agrees with the matmul engine to ~1e-6 and the
    hi/lo fast tier to ~1e-5, so 1e-4 keeps real engines passing."""
    import numpy as _np

    rng = _np.random.default_rng(seed)
    img = jnp.asarray(rng.random(img_shape, dtype=_np.float32))
    templ = jnp.asarray(rng.random(templ_shape, dtype=_np.float32))
    got = ncc_map_pallas(img, templ, highest=highest, shear=shear)
    from pvot.ops.ncc_matmul import ncc_map_matmul

    want = ncc_map_matmul(img, templ)
    err = float(jnp.max(jnp.abs(got - want)))
    if not err < 1e-4:  # also rejects NaN
        raise ValueError(
            f"numerics: max abs err {err} at {img_shape}/{templ_shape}"
        )


def _probe_argmax(
    templ_shape, span_shape, seed: int = 0, highest: bool = True,
    shear: bool = False,
) -> None:
    """Compile + numerics check of the fused argmax kernel at the served
    region geometry; raises on failure."""
    import numpy as _np

    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.search import WindowBounds, masked_region_argmax

    rng = _np.random.default_rng(seed)
    th, tw = templ_shape
    span_y, span_x = span_shape
    region = jnp.asarray(
        rng.random((span_y + th - 1, span_x + tw - 1), dtype=_np.float32)
    )
    templ = jnp.asarray(rng.random(templ_shape, dtype=_np.float32))
    x0, y0 = jnp.int32(3), jnp.int32(5)
    bounds = WindowBounds(
        x0 + 1, x0 + span_x - 2, y0 + 2, y0 + span_y - 1
    )
    want = masked_region_argmax(ncc_map_matmul(region, templ), x0, y0, bounds)
    got = ncc_region_argmax_pallas(
        region, templ, bounds, x0, y0, highest=highest, shear=shear
    )
    if not (
        abs(float(got[0]) - float(want[0])) < 1e-4
        and int(got[1]) == int(want[1])
        and int(got[2]) == int(want[2])
    ):
        raise ValueError(
            f"fused argmax mismatch at {templ_shape}/{span_shape}: "
            f"{[float(got[0]), int(got[1]), int(got[2])]} vs "
            f"{[float(want[0]), int(want[1]), int(want[2])]}"
        )


def pallas_supported(
    frame_shape=None,
    templ_shape=None,
    span_shape=None,
    strip_rows: int = 256,
    highest: bool = True,
    shear: bool = False,
) -> bool:
    """Probe whether the fused kernel compiles AND computes correctly on the
    current backend — at the geometry it will actually serve.

    Needed because this build environment tunnels to a remote TPU whose
    Mosaic build is months older than the client (libtpu version skew):
    several valid kernels fail its compile helper with an opaque HTTP 500,
    and some pltpu.roll patterns compile but return wrong values.  The probe
    checks numerics against the oracle, not just compilation — and it is
    keyed/evaluated PER GEOMETRY (round-2 verdict: an 8x8/64x256 smoke probe
    would pass while an 80x80/720p VMEM or Mosaic failure exploded mid-run).

    With no arguments this is the cheap smoke probe (8x8 template on a
    64x256 image).  Given (frame_shape, templ_shape[, span_shape]) it
    additionally compiles and checks:
      * the fused local-search region geometry (span + templ - 1), and
      * one full-map strip geometry (min(out rows, strip_rows) + th - 1, W)
        — the shape the global-search/full path dispatches.
    Probe compiles hit the persistent compile cache on re-runs, and they
    are the same programs production would compile at first use anyway.
    """
    key = (
        jax.default_backend(), frame_shape, templ_shape, span_shape, highest,
        shear,
    )
    if key not in _SUPPORT_CACHE:
        try:
            # smoke: kernel works at all (at the requested precision)
            _probe_one((64, 256), (8, 8), highest=highest, shear=shear)
            if templ_shape is not None:
                th, tw = templ_shape
                if span_shape is not None:
                    span_y, span_x = span_shape
                    _probe_one(
                        (span_y + th - 1, span_x + tw - 1),
                        templ_shape,
                        highest=highest,
                        shear=shear,
                    )
                    _probe_argmax(
                        templ_shape, span_shape, highest=highest, shear=shear
                    )
                if frame_shape is not None:
                    fh, fw = frame_shape
                    rows = min(fh - th + 1, strip_rows) + th - 1
                    _probe_one(
                        (rows, fw), templ_shape, highest=highest, shear=shear
                    )
            ok = True
        except Exception:  # stash for diagnosis (tools/pallas_probe.py)
            import traceback

            _SUPPORT_CACHE["last_error"] = traceback.format_exc()
            ok = False
        if not ok:
            import sys

            print(
                "pvot: Pallas NCC kernel unavailable on this backend at "
                f"geometry frame={frame_shape} templ={templ_shape} "
                f"span={span_shape} (Mosaic compile/numerics probe failed); "
                "--shared/--const/--const_tiled fall back to the MXU matmul "
                "formulation",
                file=sys.stderr,
            )
        _SUPPORT_CACHE[key] = ok
    return _SUPPORT_CACHE[key]


def pallas_full_fn(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    highest: bool = True,
    shear: bool = False,
):
    """Backend adapter: full-map callable (frame, templ, t_mean, t_std)."""
    del frame_shape, templ_shape

    def full_fn(frame, templ, t_mean, t_std):
        return ncc_map_pallas(
            frame, templ, t_mean, t_std, highest=highest, shear=shear
        )

    return full_fn


def pallas_region_fn(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    span_shape: Tuple[int, int],
    highest: bool = True,
    shear: bool = False,
):
    """Backend adapter: fused local-search region scorer."""
    span_y, span_x = span_shape

    def region_fn(frame, templ, t_mean, t_std, x0, y0):
        th, tw = templ.shape
        region = lax.dynamic_slice(
            frame, (y0, x0), (span_y + th - 1, span_x + tw - 1)
        )
        return ncc_map_pallas(
            region, templ, t_mean, t_std, highest=highest, shear=shear
        )

    return region_fn


def pallas_region_argmax_fn(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    span_shape: Tuple[int, int],
    highest: bool = True,
    shear: bool = False,
):
    """Backend adapter: fused region scorer + on-chip masked argmax.

    (frame, templ, t_mean, t_std, x0, y0, bounds) -> (best_val, x, y) in map
    coordinates — replaces region_fn + search.masked_region_argmax with the
    score map never leaving the chip."""
    span_y, span_x = span_shape

    def region_argmax_fn(frame, templ, t_mean, t_std, x0, y0, bounds):
        th, tw = templ.shape
        region = lax.dynamic_slice(
            frame, (y0, x0), (span_y + th - 1, span_x + tw - 1)
        )
        return ncc_region_argmax_pallas(
            region, templ, bounds, x0, y0, t_mean, t_std,
            highest=highest, shear=shear,
        )

    return region_argmax_fn
