"""The MEGA-KERNEL: an entire tracking chunk inside ONE pallas_call.

Every engine so far runs the per-frame state machine as XLA glue around a
per-frame Pallas kernel inside a lax.scan.  tools/region_step_breakdown.py
measured that glue + per-step dispatch at ~32 us/frame (chunk 256) — about
half the shear engine's 63 us/frame total at the headline geometry.  This
module moves the WHOLE local-mode tracking loop on-chip:

    grid = (frames,)   — TPU grid steps run sequentially on one core, so
                         scratch memory IS the loop carry (chip-verified:
                         tools/fused_argmax_probe.py scratch_carry)
    state              — bbox/lost/flags in SMEM scratch, adaptive template
                         in VMEM scratch
    per frame          — the kernel computes the clamped search window from
                         its own bbox state, DMAs an aligned uint8 slab of
                         the frame out of HBM (dma_u8_slab probe), aligns it
                         with a traced two-axis pltpu.roll (roll_traced
                         probe), scores it with the operator-free shear
                         formulation (ncc_pallas._score_tile shear notes),
                         reduces the masked argmax on-chip, applies the
                         confidence gate + bbox update + template EMA, and
                         emits one (8, 128) output row-tile
    leaves the chip    — 4 KB of per-frame scalars per 8-row tile and the
                         final template.  Frames enter as uint8; no score
                         map, no operator, and no f32 frame copy ever touch
                         HBM.

Global search (round 4, inkernel_global=True) runs IN here too: a global
frame scores the full map as a strip grid of the same slab geometry —
nested static fori_loops under pl.when whose body DMAs at loop-dependent
origins (chip-proven: tools/global_strip_probe.py when_fori_dma) — folding
per-strip argmaxes into SMEM in absolute coordinates (_lex_better), then
re-fetches the main slab at the winner's clamped origin so the template-EMA
patch extraction reuses the local path's rolls.  Local frames pay only the
dormant branch (~nothing, tools/global_overhead_ab.py).  The older
poison-mode kernel (inkernel_global=False) remains the fallback where only
it compiles: global branches POISON the chunk — a sticky flag freezes
state, the remaining grid steps emit tombstones, and the host driver
(pvot.tracker.mega) transactionally re-runs the chunk through the XLA scan
path.  Either way the semantics stay exactly the reference's
(tracker_ghc/src/main.cpp:399-467).

Parity note: scores are computed by the same shear math as the pallas_shear
engine (bit-equal given equal inputs — the MXU contraction sees the same
nonzero lanes in the same order regardless of the slab's roll alignment,
and 0.0 contributions are exact).  The in-kernel template-stats recompute
(mean/std/sum_tc after an EMA hit) necessarily uses a different f32
reduction ORDER than XLA's template_stats, so trajectory identity vs the
per-frame engines is a measured per-clip property (like the fast engines'),
guarded by the driver-level numerics probe and the fuzz tests.  Chunk
boundaries re-canonicalize: the driver recomputes stats from the final
template bits via template_stats, so chunk-start states match the XLA path
bit-for-bit whenever the trajectory agrees.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvot.config import TrackerConfig
from pvot.ops.ncc_pallas import TX, _box_operator, _round_up

ROW_ALIGN = 32  # uint8 HBM tile is (32, 128): row DMA offsets align to 32
LANE_ALIGN = 128
BIG = 2**30

# Output row-tile lane layout (row 0 of each frame's (8, TX) tile).
# O_GUSED (round 4): whether this frame's argmax ran over the FULL map —
# the in-kernel global-search variant commits global frames instead of
# poisoning, so StepOutput.used_global must come back from the kernel.
(
    O_BX, O_BY, O_BW, O_BH, O_SCORE, O_UPDATED, O_POISON, O_LOST, O_USEG,
    O_GUSED,
) = range(10)


class MegaGeometry:
    """Static shapes shared by the kernel and its driver.

    min_templ_shape (round 4, BUCKETED multi-object mode): when objects
    carry different template sizes, templ_shape is the shared zero-padded
    BUCKET (the element-wise max — pvot.parallel.multi
    .init_multi_state_bucketed) and min_templ_shape the element-wise MIN.
    All VMEM/slab statics size to the bucket; the out-map statics size to
    the min template (the LARGEST map any object scores — padding and
    strip-grid cover), and the kernel clamps/masks per object with TRACED
    extents read from the state's bbox_w/bbox_h (which by the reference's
    semantics always equal the template size, main.cpp:451-454)."""

    def __init__(self, frame_shape, templ_shape, config: TrackerConfig,
                 min_templ_shape=None):
        self.frame_h, self.frame_w = frame_shape
        self.th, self.tw = templ_shape
        self.min_th, self.min_tw = min_templ_shape or templ_shape
        if self.min_th > self.th or self.min_tw > self.tw:
            raise ValueError("min_templ_shape must fit in templ_shape")
        self.bucketed = (self.min_th, self.min_tw) != (self.th, self.tw)
        # Largest map extents (smallest template); the bucket's own map
        # extents (out_*_b) are the binding supported() constraint.
        self.out_h = self.frame_h - self.min_th + 1
        self.out_w = self.frame_w - self.min_tw + 1
        self.out_h_b = self.frame_h - self.th + 1
        self.out_w_b = self.frame_w - self.tw + 1
        self.span_x = 2 * config.search_radius_x + 1
        self.span_y = 2 * config.search_radius_y + 1
        self.k_blocks = -(-self.th // 8)
        self.rows8 = 8 * self.k_blocks
        self.tile_lanes = _round_up(TX + self.tw - 1, 128)
        self.m_lanes = self.tile_lanes + TX  # shear template width
        self.ty = _round_up(self.span_y, 8)
        # Span tiling (round 4): spans wider than one TX output tile run the
        # score pass nx times over shifted lane windows of the same slab,
        # with an exact cross-tile argmax combine — this is what admits the
        # blueprint's r160 configs (span 321 -> nx=3) that round 3 left on
        # the scan engines (BASELINE.json config 4).
        self.nx = -(-self.span_x // TX)
        self.score_lanes = (self.nx - 1) * TX + self.tile_lanes
        # Slab: the aligned uint8 superset the kernel DMAs per frame.  The
        # score pass reads ty + rows8 rows / score_lanes lanes after the
        # residual roll; alignment adds up to ROW_ALIGN-1 / LANE_ALIGN-1.
        self.slab_h = _round_up(self.ty + self.rows8 + ROW_ALIGN - 1, ROW_ALIGN)
        self.slab_w = _round_up(self.score_lanes + LANE_ALIGN - 1, LANE_ALIGN)
        # Padded frame extents so every aligned slab read is in bounds:
        # the largest aligned origin is align_down(out - span), and padding
        # may only ever ADD pixels (zeros) past the real frame.
        max_ya = ((self.out_h - self.span_y) // ROW_ALIGN) * ROW_ALIGN
        max_xa = ((self.out_w - self.span_x) // LANE_ALIGN) * LANE_ALIGN
        self.pad_h = max(self.frame_h, max_ya + self.slab_h)
        self.pad_w = max(self.frame_w, max_xa + self.slab_w)
        # Global-search strip grid (round 4): full-map frames score the
        # SAME slab geometry at strip origins tiling the map — stride ty
        # rows x (nx*TX) lanes, origins clamped to the local path's own
        # clamp bounds (so the padded extents above already cover every
        # strip's aligned DMA), edge strips overlapping exactly-rescored
        # positions (harmless: the absolute-coordinate lexicographic
        # combine is order- and overlap-invariant).
        self.stride_gx = self.nx * TX
        self.gy_strips = -(-self.out_h // self.ty)
        self.gx_strips = -(-self.out_w // self.stride_gx)

    def supported(self) -> bool:
        """Round-5 envelope: spans up to 4 output tiles / 512 rows (the
        blueprint's r160 stress configs run span 321), template up to
        256 px a side (two lane tiles / 32 row groups — round 4 capped at
        one lane tile / 16 row groups; the shear construct generalizes
        because tile_lanes/m_lanes grow with tw and the strided tt roll's
        shift range is TX, independent of tw — the analog of the
        reference's const-mem 4096-px cap it outgrew,
        baseline_kernel.cu:7,408).  Everything else stays on the scan
        engines.  The caps bound the kernel's VMEM working set (f32 slab +
        per-tile w/wsq/t1p slices) well under the chip's VMEM; the
        per-geometry compile+numerics probe remains the runtime gate."""
        return (
            self.span_x <= 4 * TX
            and self.ty <= 512
            and self.th <= 2 * TX
            and self.tw <= 2 * TX
            and self.out_h_b >= self.span_y
            and self.out_w_b >= self.span_x
        )


def _mega_kernel(
    # inputs
    frames_hbm,  # (S*F, pad_h, pad_w) uint8 in HBM/ANY (S=1 when not multi)
    tpl0_ref,  # (rows8, m_lanes) f32 VMEM: initial RAW template, zero-padded
    #            (multi: the per-stream block, index map (s, 0))
    box_ref,  # (tile_lanes, TX) f32 VMEM: ones-row Toeplitz (box sums)
    sf0_ref,  # (8,) f32 SMEM: [t_mean, t_std, sum_tc, ...]
    #           (multi: (1, 8) per-stream SMEM block)
    si0_ref,  # (8,) i32 SMEM: [bx, by, bw, bh, lost, use_global, n_valid, _]
    # outputs
    out_ref,  # (8, TX) f32 per frame: committed state + score/flags (row 0)
    tplout_ref,  # (rows8, m_lanes) f32: final template (written at t = F-1)
    # scratch
    slab_ref,  # (slab_h, slab_w) uint8 VMEM
    tpl_ref,  # (rows8, m_lanes) f32 VMEM: live template
    sf_ref,  # (4,) f32 SMEM: [t_mean, t_std, sum_tc, _]
    si_ref,  # (8,) i32 SMEM: [bx, by, bw, bh, lost, use_global, poison, _]
    sem,
    *,
    g: MegaGeometry,
    config: TrackerConfig,
    highest: bool = True,
    score_passes: int = 3,
    multi: bool = False,
    shared_frames: bool = False,
    batch: int = 1,
    inkernel_global: bool = False,
    unroll: int = 1,
):
    # multi=False: grid (F/unroll,) — one stream, scratch is the loop carry.
    # multi=True: grid (S, F/unroll), frame axis innermost — streams run
    # back to back on the sequential grid, so ONE set of scratch state
    # serves all streams: each stream re-initializes it at its own step 0
    # and flushes its template at the last step (the per-stream
    # input/output blocks rotate via their (s, 0) index maps).
    # shared_frames (with multi): the MULTI-OBJECT layout — all K trackers
    # consume the SAME (F, H, W) clip, so the frame index drops the
    # stream stride; each object still DMAs its own search-window slab
    # (objects sit at different positions in the shared frame).
    # unroll (round 5): process `unroll` consecutive frames per grid step
    # (out block grows to (8*unroll, TX)).  The round-5 attribution ladder
    # measured the sequential grid's PER-STEP floor at ~9.7 us — 56% of
    # the whole 2-pass kernel (tools/mega_breakdown.py `empty` rung, zero
    # work, no DMA); unrolling amortizes it.  The sub-frames run strictly
    # sequentially (frame u+1 reads the scratch state frame u committed),
    # so semantics are IDENTICAL to unroll=1 — the driver requires
    # F % unroll == 0; the batch cadence mask uses the GLOBAL frame index
    # t = step*unroll + u, so batch composes unchanged (chunks are already
    # sliced at batch boundaries by the drivers).
    if multi:
        s = pl.program_id(0)
        num_t = pl.num_programs(1) * unroll
        step = pl.program_id(1)
        num_steps = pl.num_programs(1)
        sf0 = lambda i: sf0_ref[s, i]  # noqa: E731
        si0 = lambda i: si0_ref[s, i]  # noqa: E731
        # Whole-array SMEM with a dynamic stream index: TPU lowering
        # rejects (1, 8) SMEM *blocks* (block dims must be divisible by
        # (8, 128) or equal the array), but scalar loads at a traced SMEM
        # index are fine.
    else:
        step = pl.program_id(0)
        num_steps = pl.num_programs(0)
        num_t = num_steps * unroll
        sf0 = lambda i: sf0_ref[i]  # noqa: E731
        si0 = lambda i: si0_ref[i]  # noqa: E731

    @pl.when(step == 0)
    def _():
        tpl_ref[:, :] = tpl0_ref[:, :]
        sf_ref[0] = sf0(0)
        sf_ref[1] = sf0(1)
        sf_ref[2] = sf0(2)
        for i in range(6):
            si_ref[i] = si0(i)
        si_ref[6] = 0  # poison
        si_ref[7] = 0

    n_valid = si0(6)

    for u in range(unroll):  # static unroll; u=0 is the classic kernel
        t = step * unroll + u
        if multi:
            frame_idx = t if shared_frames else s * num_t + t
        else:
            frame_idx = t
        # Re-read state AFTER the previous sub-frame's commit.
        bx, by = si_ref[0], si_ref[1]
        bw, bh = si_ref[2], si_ref[3]
        lost, useg = si_ref[4], si_ref[5]
        poisoned = si_ref[6]

        if batch > 1:
            # Batch (look-ahead) semantics, C10 / main.cpp:362-392: only
            # the LAST frame of each full batch is scored+committed; the
            # others emit the pre-batch bbox with score -1 and touch no
            # state.  The driver guarantees chunk_size % batch == 0
            # (cadence is relative to chunk start) and passes
            # n_full = (n_valid // batch) * batch in si0 slot 7 (Mosaic
            # rejects in-kernel division, so the power-of-two cadence
            # test is a mask and the full-batch bound is precomputed on
            # the host).  Frames past n_full are the reference's
            # end-of-video partial batch (leftover_tail).
            score_this = ((t & (batch - 1)) == (batch - 1)) & (t < si0(7))
        else:
            score_this = None

        def scored_frame(t=t, frame_idx=frame_idx, bx=bx, by=by, bw=bw,
                         bh=bh, lost=lost, useg=useg, poisoned=poisoned,
                         u=u):
            _scored_frame_body(
                frames_hbm, box_ref, out_ref, slab_ref, tpl_ref, sf_ref,
                si_ref, sem, g=g, config=config, highest=highest,
                score_passes=score_passes, t=t, frame_idx=frame_idx,
                bx=bx, by=by, bw=bw, bh=bh, lost=lost, useg=useg,
                poisoned=poisoned, n_valid=n_valid,
                inkernel_global=inkernel_global, out_row=8 * u,
            )

        if batch == 1:
            scored_frame()
        else:
            pl.when(score_this)(scored_frame)

            @pl.when(jnp.logical_not(score_this))
            def _(bx=bx, by=by, bw=bw, bh=bh, lost=lost, useg=useg,
                  poisoned=poisoned, u=u):
                # Look-ahead row: current (pre-batch) state, no score, no
                # update; poison stays sticky so the driver still sees it
                # on every row of a poisoned chunk's tail.
                lane = lax.broadcasted_iota(jnp.int32, (8, TX), 1)
                f32 = jnp.float32
                out_ref[pl.ds(8 * u, 8), :] = (
                    jnp.where(lane == O_BX, bx.astype(f32), 0.0)
                    + jnp.where(lane == O_BY, by.astype(f32), 0.0)
                    + jnp.where(lane == O_BW, bw.astype(f32), 0.0)
                    + jnp.where(lane == O_BH, bh.astype(f32), 0.0)
                    + jnp.where(lane == O_SCORE, f32(-1.0), 0.0)
                    + jnp.where(lane == O_POISON, poisoned.astype(f32), 0.0)
                    + jnp.where(lane == O_LOST, lost.astype(f32), 0.0)
                    + jnp.where(lane == O_USEG, useg.astype(f32), 0.0)
                )

    @pl.when(step == num_steps - 1)
    def _():
        tplout_ref[:, :] = tpl_ref[:, :]


def _shear_score_tiles(
    slab, box_ref, tpl_ref, t_mean, t_std_in, sum_tc,
    *, g, highest, score_passes, tw_e=None, th_e=None, n_e=None,
):
    """Per-tile shear NCC score maps [(ty, TX)] * g.nx from a converted,
    origin-rolled f32 slab — the round-3 score pass factored out so the
    round-4 in-kernel global strips run EXACTLY the same math at strip
    origins (scores are origin-invariant bit-for-bit: each MXU dot row sees
    the same nonzero lanes in the same order, and the vertical k/p
    accumulation order is fixed by the static unroll — the property the
    overlap-tolerant strip combine relies on; verified by the
    tests/test_mega.py global-parity tests and the per-geometry probe)."""
    th, tw, ty = g.th, g.tw, g.ty
    tile_lanes, m_lanes = g.tile_lanes, g.m_lanes
    # Bucketed mode (round 4): tw_e/th_e/n_e are the object's TRACED true
    # extents; the template is zero-padded to the (th, tw) bucket, so the
    # correlation rows beyond th_e contribute zero via the traced valid8
    # mask, and the box sums gate each bucket row on row_ok below.  In
    # homogeneous mode they are the static extents and every mask/gate
    # constant-folds to the round-3 kernel.
    if tw_e is None:
        tw_e, th_e, n_e = tw, th, float(th * tw)
    row8 = lax.broadcasted_iota(jnp.int32, (8, m_lanes), 0)
    col8 = lax.broadcasted_iota(jnp.int32, (8, m_lanes), 1)

    def dot_f32(a, b):
        return lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

    # Span tiles are STACKED along the dot's M axis — one MXU dot per
    # template row covers all nx tiles (w rows are independent in a
    # matmul, so per-tile scores are bit-identical to per-tile dots).
    # Per-tile dots were the round-4 first cut; they compiled on the fast
    # tier but crashed the relay's Mosaic at HIGHEST for ANY nx > 1
    # (tpu_compile_helper exit 1 at nx=2/3, while nx=1 compiles even at
    # ty=328 — /tmp/span_probe.log matrix).  Stacking keeps the HIGHEST
    # dot count identical to the proven nx=1 kernel and feeds the MXU
    # taller operands.
    # (A banded-MXU variant of the vertical box sums — one (ty, ty+rows8)
    # 0/1-band dot per tile instead of the p-loop VPU adds — was measured
    # in round 4: it LOSES at both the headline geometry (39.7 vs 38.3
    # us/frame) and the r160 multi-tile geometry (237 vs 231, on the
    # per-tile-dot kernel), so that lever was deleted.)
    nseg = ty + 8  # rows per stacked tile segment
    acc_l = [jnp.zeros((ty, TX), jnp.float32) for _ in range(g.nx)]
    bsum_l = [jnp.zeros((ty, tile_lanes), jnp.float32) for _ in range(g.nx)]
    bsq_l = [jnp.zeros((ty, tile_lanes), jnp.float32) for _ in range(g.nx)]
    for k in range(g.k_blocks):  # static unroll
        if g.nx == 1:
            w = slab[8 * k : 8 * k + ty + 8, :tile_lanes]
        else:
            w = jnp.concatenate(
                [
                    slab[8 * k : 8 * k + ty + 8,
                         xt * TX : xt * TX + tile_lanes]
                    for xt in range(g.nx)
                ],
                axis=0,
            )
        wsq = w * w
        valid8 = ((8 * k + row8) < th_e) & (col8 < tw_e)
        t8 = jnp.where(valid8, tpl_ref[pl.ds(8 * k, 8), :] - t_mean, 0.0)
        if not highest:
            # Fast tier: bf16 hi/lo decomposition of the shear dot (the
            # in-kernel precision=HIGH analog, same structure as
            # ncc_pallas._dot_hl3; hi/lo commutes with the roll, so the
            # roll stays f32 and the split happens on the rolled value —
            # keeping the RHS a VALUE, the shear precision caution).
            # score_passes: 3 = wh@tth + wh@ttl + wl@tth; 2 drops wl@tth
            # (round 4); 1 = wh@tth only (round 5 — BOTH operands plain
            # bf16; ~1e-3 score perturbation, adopted strictly under the
            # per-run trajectory guard like every tier).
            wh = w.astype(jnp.bfloat16)
            if score_passes == 3:
                wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        for p in range(8):
            if 8 * k + p >= th:
                break
            b = jnp.broadcast_to(t8[p : p + 1, :], (TX, m_lanes))
            tt = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
            if highest:
                t1p = lax.dot_general(
                    w,
                    tt[:, :tile_lanes],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            else:
                tv = tt[:, :tile_lanes]
                tth = tv.astype(jnp.bfloat16)
                if score_passes > 1:
                    ttl = (tv - tth.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )

                def d1(a_, b_):
                    return lax.dot_general(
                        a_, b_,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                if score_passes == 1:
                    # 1-pass tier (round 5): plain bf16 x bf16 — template
                    # low half dropped too (~1e-3 score perturbation).
                    t1p = d1(wh, tth)
                elif score_passes == 2:
                    # 2-pass tier (round 4): drop the wl@tth term — the
                    # window becomes effectively bf16 (its low half carries
                    # only the u8/255-quantization residue, |wl| <= 2^-9),
                    # while the EMA-evolved template keeps full hi+lo
                    # precision.  Expected score perturbation ~1e-4;
                    # adopted/rejected purely on the measured trajectory
                    # guard (tools/mega_fast_ab.py round-4 verdict in
                    # docs/PERFORMANCE.md).
                    t1p = d1(wh, tth) + d1(wh, ttl)
                else:
                    t1p = d1(wh, tth) + d1(wh, ttl) + d1(wl, tth)
            if isinstance(th_e, int):
                row_ok = None
            else:
                # Bucketed: window rows beyond the object's true template
                # height must not enter its box sums (the correlation acc
                # is already zero there via t8's traced mask).
                row_ok = (8 * k + p) < th_e
            for xt in range(g.nx):
                o = xt * nseg + p
                acc_l[xt] = acc_l[xt] + t1p[o : o + ty, :]
                if row_ok is None:
                    bsum_l[xt] = bsum_l[xt] + w[o : o + ty, :]
                    bsq_l[xt] = bsq_l[xt] + wsq[o : o + ty, :]
                else:
                    bsum_l[xt] = bsum_l[xt] + jnp.where(
                        row_ok, w[o : o + ty, :], 0.0
                    )
                    bsq_l[xt] = bsq_l[xt] + jnp.where(
                        row_ok, wsq[o : o + ty, :], 0.0
                    )

    s_l = []
    for xt in range(g.nx):  # per-tile normalization
        acc_sum = dot_f32(bsum_l[xt], box_ref[:, :])
        acc_ssq = dot_f32(bsq_l[xt], box_ref[:, :])
        mean = acc_sum / n_e
        var = acc_ssq / n_e - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 1e-6))
        cov = acc_l[xt] - mean * sum_tc
        s_l.append(cov / ((std + 1e-6) * (t_std_in + 1e-6) * n_e))
    return s_l


def _vmem_slack(g: MegaGeometry) -> int:
    """Scoped-VMEM slack for the mega kernels' compiler temporaries.

    The statically-unrolled score loop's liveness grows with span tiles
    and k-blocks: the flat 24 MB that served every round-4 geometry left
    the 1080p/t160/r160 kernel 16.6 MB short at compile ("Scoped
    allocation with size 51.58M and limit 34.99M exceeded", round-5
    compile log) — the budget is a CAP, so over-provisioning is safe and
    the per-geometry probe remains the runtime gate."""
    mb = 24 + 24 * (g.nx - 1) + (16 if g.k_blocks > 16 else 0)
    return min(mb, 100) * 1024 * 1024


def _lex_better(val_t, ay_t, ax_t, bval, bay, bax):
    """(value desc, y asc, x asc) — the total order whose fold reproduces
    row-major first-occurrence argmax over any cover of the score map
    (order- and overlap-invariant given positionally-identical scores)."""
    return (val_t > bval) | (
        (val_t == bval) & ((ay_t < bay) | ((ay_t == bay) & (ax_t < bax)))
    )


def _scored_frame_body(
    frames_hbm, box_ref, out_ref, slab_ref, tpl_ref, sf_ref, si_ref, sem,
    *, g, config, highest, score_passes, t, frame_idx,
    bx, by, bw, bh, lost, useg, poisoned, n_valid,
    inkernel_global=False, out_row=0,
):
    """One scored frame: mode selection, slab DMA, shear NCC, masked
    argmax, confidence gate + bbox commit, template EMA, record emit.
    Factored out of _mega_kernel so batch mode can gate it under pl.when
    (skipped look-ahead frames do none of this work).

    inkernel_global=True (round 4) scores GLOBAL-search frames inside the
    kernel instead of poisoning: under pl.when(global) a strip grid of the
    same slab geometry covers the full map (nested static fori_loops whose
    body DMAs at loop-dependent origins — the exact construct chip-proven
    by tools/global_strip_probe.py when_fori_dma), folding per-strip
    argmaxes into SMEM by _lex_better in absolute coordinates; the main
    slab then fetches at the winner's origin so the template-EMA patch
    extraction reuses the local path's rolls.  Semantics match
    pvot.tracker.step exactly: global threshold selection
    (main.cpp:449), use_global reset, used_global reporting."""
    th, tw, ty = g.th, g.tw, g.ty
    m_lanes = g.m_lanes
    lr = float(config.template_update_lr)
    rx, ry = int(config.search_radius_x), int(config.search_radius_y)
    # Effective (per-object) extents: TRACED in bucketed mode — the bbox
    # width/height ARE the template extents by the reference's semantics
    # (main.cpp:451-454; init_multi_state_bucketed docstring) — and the
    # static bucket extents otherwise, where every expression below
    # constant-folds to the round-3 kernel.
    if g.bucketed:
        tw_e, th_e = bw, bh
        n = (tw_e * th_e).astype(jnp.float32)
        out_w_e = g.frame_w - tw_e + 1
        out_h_e = g.frame_h - th_e + 1
    else:
        tw_e, th_e = tw, th
        n = float(th * tw)
        out_w_e, out_h_e = g.out_w, g.out_h
    half_w = tw_e >> 1
    half_h = th_e >> 1

    # --- Mode selection (pvot.tracker.step / main.cpp:399-413); >> 1
    # replaces // 2 (non-negative here; Mosaic rejects in-kernel division,
    # probe catalogue) ------------------------------------------------------
    cx = bx + (bw >> 1)
    cy = by + (bh >> 1)
    center_out = (cx < 0) | (cx >= g.frame_w) | (cy < 0) | (cy >= g.frame_h)
    box_out = (
        (bx + bw < 0) | (bx >= g.frame_w) | (by + bh < 0) | (by >= g.frame_h)
    )
    outside = center_out | box_out
    if config.enable_global_search:
        use_global = (
            (useg == 1)
            | outside
            | (lost >= int(config.lost_frame_threshold))
        )
    else:
        use_global = jnp.bool_(False)
    min_tx = jnp.maximum(0, cx - rx - half_w)
    max_tx = jnp.minimum(out_w_e - 1, cx + rx - half_w)
    min_ty = jnp.maximum(0, cy - ry - half_h)
    max_ty = jnp.minimum(out_h_e - 1, cy + ry - half_h)
    window_valid = (max_tx >= min_tx) & (max_ty >= min_ty)
    global_argmax = use_global | ~window_valid

    frame_valid = t < n_valid
    if inkernel_global:
        do_global = global_argmax & frame_valid
        poison_now = jnp.bool_(False)
        si_ref[6] = 0
        commit = frame_valid
    else:
        do_global = None
        poison_now = (poisoned == 1) | (global_argmax & frame_valid)
        si_ref[6] = poison_now.astype(jnp.int32)
        commit = frame_valid & ~poison_now

    t_mean, t_std_in, sum_tc = sf_ref[0], sf_ref[1], sf_ref[2]
    dy_iota = lax.broadcasted_iota(jnp.int32, (ty, TX), 0)
    dxl_iota = lax.broadcasted_iota(jnp.int32, (ty, TX), 1)
    x0 = jnp.minimum(min_tx, out_w_e - g.span_x)
    y0 = jnp.minimum(min_ty, out_h_e - g.span_y)

    def fetch_slab(y0_, x0_):
        """Aligned slab DMA + on-chip u8->f32 + residual rolls so slab
        row/lane 0 is map position (y0_, x0_) (probes: dma_u8_slab,
        scalar_align, roll_traced).

        Align-down as block-index * alignment: Mosaic's tile-divisibility
        proof tracks `idx * 32` but NOT `(idx >> 5) << 5` — the shift form
        fails to compile ("Failed to prove that a tile index in dimension 1
        is divisible by the tiling (8)", /tmp/mega_ab2.log repro) even
        though the dma_u8_slab probe's multiply form passes on the same
        chip.  The u8 -> i32 -> f32 ladder is exactly ensure_gray_f32's
        math (Mosaic has no direct u8 -> f32 cast); roll wraparound garbage
        lands beyond the rows/lanes any masked-in score position reads.
        (A rolled-before-convert uint8 variant — 4x less roll traffic — was
        measured in tools/mega_box_ab.py round 4: this relay's Mosaic
        rejects pltpu.roll on uint8 values, so the roll stays on f32.)"""
        ya_ = (y0_ >> 5) * ROW_ALIGN
        xa_ = (x0_ >> 7) * LANE_ALIGN
        cp = pltpu.make_async_copy(
            frames_hbm.at[
                frame_idx, pl.ds(ya_, g.slab_h), pl.ds(xa_, g.slab_w)
            ],
            slab_ref,
            sem,
        )
        cp.start()
        cp.wait()
        s_ = (
            slab_ref[:, :].astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / 255.0)
        )
        s_ = pltpu.roll(s_, g.slab_h - (y0_ - ya_), 0)
        return pltpu.roll(s_, g.slab_w - (x0_ - xa_), 1)

    if inkernel_global:
        # --- In-kernel global search (main.cpp:399-446 full-map argmax):
        # strip grid over the map, runs ONLY on global frames (pl.when;
        # local frames pay a handful of scalar ops).  Clamped edge strips
        # re-score overlapping positions — harmless, _lex_better's fold is
        # overlap-invariant on positionally-identical scores. ---------------
        sf_ref[3] = -jnp.inf
        si_ref[8] = BIG
        si_ref[9] = BIG

        @pl.when(do_global)
        def _():
            def strip(sy, sx):
                y0s = jnp.minimum(sy * ty, out_h_e - g.span_y)
                x0s = jnp.minimum(sx * g.stride_gx, out_w_e - g.span_x)
                s_l = _shear_score_tiles(
                    fetch_slab(y0s, x0s), box_ref, tpl_ref,
                    t_mean, t_std_in, sum_tc,
                    g=g, highest=highest, score_passes=score_passes,
                    tw_e=tw_e, th_e=th_e, n_e=n,
                )
                for xt in range(g.nx):
                    dxg = xt * TX + dxl_iota
                    mask = (dy_iota < out_h_e - y0s) & (dxg < out_w_e - x0s)
                    masked = jnp.where(mask, s_l[xt], -jnp.inf)
                    val_t = jnp.max(masked)
                    is_best = masked == val_t
                    bdy_t = jnp.min(jnp.where(is_best, dy_iota, BIG))
                    bdx_t = jnp.min(
                        jnp.where(is_best & (dy_iota == bdy_t), dxg, BIG)
                    )
                    ay_t = y0s + bdy_t
                    ax_t = x0s + bdx_t
                    bv, bay, bax = sf_ref[3], si_ref[8], si_ref[9]
                    better = _lex_better(val_t, ay_t, ax_t, bv, bay, bax)
                    sf_ref[3] = jnp.where(better, val_t, bv)
                    si_ref[8] = jnp.where(better, ay_t, bay)
                    si_ref[9] = jnp.where(better, ax_t, bax)

            def body_y(sy, c):
                def body_x(sx, c2):
                    strip(sy, sx)
                    return c2

                return lax.fori_loop(0, g.gx_strips, body_x, c)

            lax.fori_loop(0, g.gy_strips, body_y, 0)

        g_val, g_ay, g_ax = sf_ref[3], si_ref[8], si_ref[9]
        # Effective main-slab origin: the global winner's clamped patch
        # window (so the EMA patch extraction below reads this slab), the
        # local window otherwise.
        x0 = jnp.where(do_global, jnp.minimum(g_ax, out_w_e - g.span_x), x0)
        y0 = jnp.where(do_global, jnp.minimum(g_ay, out_h_e - g.span_y), y0)

    # --- Main slab + local-window NCC scores (on global frames the window
    # argmax below is garbage and overridden; running it anyway is the
    # overlay pattern — tools/cond_ab.py, pvot/tracker/step.py) -------------
    slab = fetch_slab(y0, x0)
    s_l = _shear_score_tiles(
        slab, box_ref, tpl_ref, t_mean, t_std_in, sum_tc,
        g=g, highest=highest, score_passes=score_passes,
        tw_e=tw_e, th_e=th_e, n_e=n,
    )
    best_val = jnp.float32(0.0)
    bdy = jnp.int32(0)
    bdx = jnp.int32(0)
    for xt in range(g.nx):  # per-tile masked argmax
        # Masked argmax, row-major first occurrence, division-free:
        # smallest dy among maxima, then smallest (global) dx within it.
        dxg = xt * TX + dxl_iota
        mask = (
            (dxg >= min_tx - x0)
            & (dxg <= max_tx - x0)
            & (dy_iota >= min_ty - y0)
            & (dy_iota <= max_ty - y0)
        )
        masked = jnp.where(mask, s_l[xt], -jnp.inf)
        val_t = jnp.max(masked)
        is_best = masked == val_t
        bdy_t = jnp.min(jnp.where(is_best, dy_iota, BIG))
        bdx_t = jnp.min(jnp.where(is_best & (dy_iota == bdy_t), dxg, BIG))
        if xt == 0:
            best_val, bdy, bdx = val_t, bdy_t, bdx_t
        else:
            # Exact cross-tile combine: row-major first occurrence is
            # dy-major, so lexicographic (value desc, dy asc, dx asc) over
            # per-tile winners reproduces the single-map argmax — each
            # tile's bdy_t is already the smallest dy of its own maxima,
            # and later tiles hold strictly larger dx.
            better = _lex_better(val_t, bdy_t, bdx_t, best_val, bdy, bdx)
            best_val = jnp.where(better, val_t, best_val)
            bdy = jnp.where(better, bdy_t, bdy)
            bdx = jnp.where(better, bdx_t, bdx)
    if inkernel_global:
        # Overlay the global winner; bdy/bdx become slab-relative patch
        # coordinates for the EMA extraction (the slab IS at the winner's
        # clamped origin on global frames).
        best_val = jnp.where(do_global, g_val, best_val)
        bdy = jnp.where(do_global, g_ay - y0, bdy)
        bdx = jnp.where(do_global, g_ax - x0, bdx)
    best_x = x0 + bdx
    best_y = y0 + bdy

    # --- Confidence gate + bbox commit (apply_update; threshold keys off
    # use_global — main.cpp:449 — not off which argmax ran) ------------------
    if inkernel_global:
        threshold = jnp.where(
            use_global,
            jnp.float32(config.global_confidence),
            jnp.float32(config.min_confidence),
        )
    else:
        # Only the local threshold can apply here — a global frame
        # poisoned above.
        threshold = jnp.float32(config.min_confidence)
    accept = commit & (best_val >= threshold)
    new_bx = jnp.where(accept, best_x, bx)
    new_by = jnp.where(accept, best_y, by)
    new_bw = jnp.where(accept, tw_e, bw)
    new_bh = jnp.where(accept, th_e, bh)
    new_lost = jnp.where(
        accept, 0, jnp.where(commit, lost + 1, lost)
    )
    si_ref[0] = new_bx
    si_ref[1] = new_by
    si_ref[2] = new_bw
    si_ref[3] = new_bh
    si_ref[4] = new_lost
    if inkernel_global:
        # use_global reset exactly as apply_update: clears only on an
        # accepted, in-frame bbox; otherwise this frame's computed flag
        # carries (sticky re-acquisition, main.cpp:451-456).
        ncx = new_bx + (new_bw >> 1)
        ncy = new_by + (new_bh >> 1)
        new_outside = (
            (ncx < 0) | (ncx >= g.frame_w) | (ncy < 0) | (ncy >= g.frame_h)
            | (new_bx + new_bw < 0) | (new_bx >= g.frame_w)
            | (new_by + new_bh < 0) | (new_by >= g.frame_h)
        )
        ug_i = jnp.asarray(use_global).astype(jnp.int32)
        si_ref[5] = jnp.where(
            frame_valid,
            jnp.where(accept & ~new_outside, 0, ug_i),
            useg,
        )
    else:
        # use_global stays 0 on the poison-mode mega path: a set flag
        # poisons the chunk before it could ever be consumed here.
        si_ref[5] = jnp.where(commit, 0, useg)

    # --- Template EMA + stats (apply_update / template_stats).  Overlay
    # style: always compute, select on `strong` (the cond-vs-overlay
    # measurement in pvot/tracker/step.py applies in-kernel too). -----------
    strong = accept & (best_val >= jnp.float32(config.strong_confidence))
    patch_rows = pltpu.roll(slab, g.slab_h - bdy, 0)
    patch_full = pltpu.roll(patch_rows, g.slab_w - bdx, 1)
    rowm = lax.broadcasted_iota(jnp.int32, (g.rows8, m_lanes), 0)
    colm = lax.broadcasted_iota(jnp.int32, (g.rows8, m_lanes), 1)
    tvalid = (rowm < th_e) & (colm < tw_e)
    patch = jnp.where(tvalid, patch_full[: g.rows8, :m_lanes], 0.0)
    tpl_old = tpl_ref[:, :]
    tpl_new = (1.0 - lr) * tpl_old + lr * patch
    tpl_upd = jnp.where(strong, tpl_new, tpl_old)
    tpl_ref[:, :] = tpl_upd
    total = jnp.sum(tpl_new)
    mean_new = total / n
    var_new = jnp.sum(tpl_new * tpl_new) / n - mean_new * mean_new
    std_new = jnp.sqrt(jnp.maximum(var_new, 0.0)) + 1e-6
    sum_tc_new = jnp.sum(jnp.where(tvalid, tpl_new - mean_new, 0.0))
    sf_ref[0] = jnp.where(strong, mean_new, t_mean)
    sf_ref[1] = jnp.where(strong, std_new, t_std_in)
    sf_ref[2] = jnp.where(strong, sum_tc_new, sum_tc)

    # --- Emit this frame's committed record ---------------------------------
    lane = lax.broadcasted_iota(jnp.int32, (8, TX), 1)
    f32 = jnp.float32
    outvec = (
        jnp.where(lane == O_BX, new_bx.astype(f32), 0.0)
        + jnp.where(lane == O_BY, new_by.astype(f32), 0.0)
        + jnp.where(lane == O_BW, new_bw.astype(f32), 0.0)
        + jnp.where(lane == O_BH, new_bh.astype(f32), 0.0)
        + jnp.where(lane == O_SCORE, best_val, 0.0)
        + jnp.where(lane == O_UPDATED, accept.astype(f32), 0.0)
        + jnp.where(lane == O_POISON, poison_now.astype(f32), 0.0)
        + jnp.where(lane == O_LOST, new_lost.astype(f32), 0.0)
        + jnp.where(lane == O_USEG, si_ref[5].astype(f32), 0.0)
    )
    if inkernel_global:
        # StepOutput.used_global parity (step.py emits global_argmax).
        outvec = outvec + jnp.where(
            lane == O_GUSED, jnp.asarray(do_global).astype(f32), 0.0
        )
    out_ref[pl.ds(out_row, 8), :] = outvec


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_shape", "templ_shape", "config", "interpret", "highest",
        "score_passes", "batch", "inkernel_global", "unroll",
    ),
)
def mega_track_chunk(
    frames_u8: jax.Array,  # (F, H, W) uint8
    bbox: jax.Array,  # (4,) i32
    template: jax.Array,  # (th, tw) f32
    t_mean: jax.Array,
    t_std: jax.Array,
    lost_count: jax.Array,
    use_global: jax.Array,
    n_valid: jax.Array,  # i32 scalar: frames beyond this index don't commit
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    highest: bool = True,
    score_passes: int = 3,
    batch: int = 1,
    inkernel_global: bool = False,
    unroll: int = 1,
):
    """Run one chunk through the mega-kernel.

    Returns (rows (F, TX) f32 — per-frame records, lane layout O_*;
    final template (th, tw) f32).  The caller derives the chunk-final
    TrackerState from the last row + template_stats(final template) and
    treats any O_POISON=1 row as "redo this chunk on the scan path".

    highest=False runs the dominant shear correlation as a 3-pass bf16
    hi/lo decomposition (the fast-tier analog — same trajectory-identity
    caveat as the other fast engines, guarded per-run by bench.py's
    ground-truth check).

    frames_u8 may arrive pre-padded to (F, g.pad_h, g.pad_w): staging the
    pad on the host moves its ~2 GB/chunk device copy out of the hot path
    (tools/mega_dispatch_ab.py attribution).

    batch > 1 (power of two; the in-kernel cadence is a mask) runs the
    reference's look-ahead batch semantics IN the kernel: only every
    batch-th frame is scored+committed, the rest emit the pre-batch bbox
    with score -1 at zero marginal cost (no slab DMA, no score loop).
    The caller must slice chunks at batch boundaries.

    unroll > 1 (round 5) processes that many consecutive frames per grid
    step, amortizing the sequential grid's measured ~9.7 us/frame
    per-step floor (tools/mega_breakdown.py round-5 ladder) — semantics
    identical (sub-frames run in order against the same scratch state).
    Requires F % unroll == 0 (the drivers pad chunks to chunk_size, so
    pick unroll dividing chunk_size).
    """
    if batch < 1 or (batch & (batch - 1)):
        raise ValueError(f"mega batch must be a power of two, got {batch}")
    if score_passes not in (1, 2, 3):
        raise ValueError(f"score_passes must be 1, 2 or 3, got {score_passes}")
    g = MegaGeometry(frame_shape, templ_shape, config)
    f = frames_u8.shape[0]
    if unroll < 1 or f % unroll:
        raise ValueError(f"unroll {unroll} must divide the chunk length {f}")
    if frames_u8.shape[1:] == (g.pad_h, g.pad_w):
        framesp = frames_u8
    else:
        framesp = jnp.pad(
            frames_u8,
            (
                (0, 0),
                (0, g.pad_h - g.frame_h),
                (0, g.pad_w - g.frame_w),
            ),
        )
    tpl0 = jnp.pad(
        template.astype(jnp.float32),
        ((0, g.rows8 - g.th), (0, g.m_lanes - g.tw)),
    )
    t_centered_sum = jnp.sum(template.astype(jnp.float32) - t_mean)
    sf0 = jnp.stack(
        [
            t_mean.astype(jnp.float32),
            t_std.astype(jnp.float32),
            t_centered_sum,
            jnp.float32(0), jnp.float32(0), jnp.float32(0),
            jnp.float32(0), jnp.float32(0),
        ]
    )
    nv = n_valid.astype(jnp.int32)
    si0 = jnp.stack(
        [
            bbox[0], bbox[1], bbox[2], bbox[3],
            lost_count.astype(jnp.int32),
            use_global.astype(jnp.int32),
            nv,
            (nv // batch) * batch,  # n_full: full-batch scored bound
        ]
    )
    box = jnp.asarray(_box_operator(g.tile_lanes, g.tw))
    kernel = functools.partial(
        _mega_kernel, g=g, config=config, highest=highest,
        score_passes=score_passes, batch=batch,
        inkernel_global=inkernel_global, unroll=unroll,
    )
    vmem_budget = (
        g.slab_h * g.slab_w * 5  # u8 slab + one f32 copy
        + 4 * 3 * g.rows8 * g.m_lanes  # template scratch/in/out + centered
        + 4 * g.tile_lanes * TX
        + 4 * (g.ty + 8) * g.m_lanes * 4 * g.nx  # w/wsq/t1p working set
        + _vmem_slack(g)  # acc/bsum/bsq + rolled slab copies + slack
    )
    rows, tplout = pl.pallas_call(
        kernel,
        grid=(f // unroll,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (8 * unroll, TX), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (g.rows8, g.m_lanes), lambda t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f * 8, TX), jnp.float32),
            jax.ShapeDtypeStruct((g.rows8, g.m_lanes), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g.slab_h, g.slab_w), jnp.uint8),
            pltpu.VMEM((g.rows8, g.m_lanes), jnp.float32),
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SMEM((12,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(framesp, tpl0, box, sf0, si0)
    rows = rows.reshape(f, 8, TX)[:, 0, :]
    return rows, tplout[: g.th, : g.tw]


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_shape", "templ_shape", "config", "interpret", "highest",
        "score_passes", "batch", "inkernel_global", "unroll",
    ),
)
def mega_track_chunk_multi(
    frames_u8: jax.Array,  # (S, F, H, W) uint8 (or pre-padded (S, F, ph, pw))
    bbox: jax.Array,  # (S, 4) i32
    template: jax.Array,  # (S, th, tw) f32
    t_mean: jax.Array,  # (S,)
    t_std: jax.Array,  # (S,)
    lost_count: jax.Array,  # (S,)
    use_global: jax.Array,  # (S,)
    n_valid: jax.Array,  # (S,) i32: per-stream valid-frame count
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    highest: bool = True,
    score_passes: int = 3,
    batch: int = 1,
    inkernel_global: bool = False,
    unroll: int = 1,
):
    """S independent streams through ONE pallas_call: grid (S, F), frame
    axis innermost, so stream s's frames run back to back and the kernel's
    scratch state is re-seeded per stream from the (s, 0)-indexed input
    blocks.  This is the serving layout's mega path: the vmapped scan
    engines pay constant per-stream HBM buffer traffic (aggregate FPS flat
    at ~8k for any S, docs/PERFORMANCE.md "Saturation point"), while here
    every stream runs at the single-stream mega rate — no score map,
    operator, or f32 frame ever in HBM, S*F frames per dispatch.

    Returns (rows (S, F, TX) f32 per-frame records, final templates
    (S, th, tw) f32).  Poison semantics are per stream: a stream whose
    state machine would go global freezes and tombstones its remaining
    frames; other streams are unaffected (the driver re-runs only the
    poisoned stream on the scan path — pvot.tracker.mega.track_streams_mega).
    """
    g = MegaGeometry(frame_shape, templ_shape, config)
    s_streams, f = frames_u8.shape[:2]
    if score_passes not in (1, 2, 3):
        raise ValueError(f"score_passes must be 1, 2 or 3, got {score_passes}")
    if unroll < 1 or f % unroll:
        raise ValueError(f"unroll {unroll} must divide the chunk length {f}")
    if frames_u8.shape[2:] == (g.pad_h, g.pad_w):
        framesp = frames_u8.reshape(s_streams * f, g.pad_h, g.pad_w)
    else:
        framesp = jnp.pad(
            frames_u8,
            (
                (0, 0),
                (0, 0),
                (0, g.pad_h - g.frame_h),
                (0, g.pad_w - g.frame_w),
            ),
        ).reshape(s_streams * f, g.pad_h, g.pad_w)
    tpl0 = jnp.pad(
        template.astype(jnp.float32),
        ((0, 0), (0, g.rows8 - g.th), (0, g.m_lanes - g.tw)),
    ).reshape(s_streams * g.rows8, g.m_lanes)
    t_centered_sum = jnp.sum(
        template.astype(jnp.float32) - t_mean[:, None, None], axis=(1, 2)
    )
    zeros = jnp.zeros((s_streams,), jnp.float32)
    sf0 = jnp.stack(
        [
            t_mean.astype(jnp.float32), t_std.astype(jnp.float32),
            t_centered_sum, zeros, zeros, zeros, zeros, zeros,
        ],
        axis=-1,
    )  # (S, 8)
    if batch < 1 or (batch & (batch - 1)):
        raise ValueError(f"mega batch must be a power of two, got {batch}")
    nv = n_valid.astype(jnp.int32)
    si0 = jnp.stack(
        [
            bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3],
            lost_count.astype(jnp.int32),
            use_global.astype(jnp.int32),
            nv,
            (nv // batch) * batch,  # per-stream n_full (batch semantics)
        ],
        axis=-1,
    )  # (S, 8)
    box = jnp.asarray(_box_operator(g.tile_lanes, g.tw))
    kernel = functools.partial(
        _mega_kernel, g=g, config=config, highest=highest,
        score_passes=score_passes, multi=True, batch=batch,
        inkernel_global=inkernel_global, unroll=unroll,
    )
    vmem_budget = (
        g.slab_h * g.slab_w * 5
        + 4 * 6 * g.rows8 * g.m_lanes  # double-buffered tpl in/out + scratch
        + 4 * g.tile_lanes * TX
        + 4 * (g.ty + 8) * g.m_lanes * 4 * g.nx
        + _vmem_slack(g)
    )
    rows, tplout = pl.pallas_call(
        kernel,
        grid=(s_streams, f // unroll),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (g.rows8, g.m_lanes), lambda s, t: (s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g.tile_lanes, TX), lambda s, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (8 * unroll, TX),
                lambda s, t, _fs=f // unroll: (s * _fs + t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g.rows8, g.m_lanes), lambda s, t: (s, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_streams * f * 8, TX), jnp.float32),
            jax.ShapeDtypeStruct(
                (s_streams * g.rows8, g.m_lanes), jnp.float32
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((g.slab_h, g.slab_w), jnp.uint8),
            pltpu.VMEM((g.rows8, g.m_lanes), jnp.float32),
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SMEM((12,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(framesp, tpl0, box, sf0, si0)
    rows = rows.reshape(s_streams, f, 8, TX)[:, :, 0, :]
    tplout = tplout.reshape(s_streams, g.rows8, g.m_lanes)
    return rows, tplout[:, : g.th, : g.tw]


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_shape", "templ_shape", "config", "interpret", "highest",
        "score_passes", "batch", "inkernel_global", "bucket_extents",
        "unroll",
    ),
)
def mega_track_chunk_objects(
    frames_u8: jax.Array,  # (F, H, W) uint8 (or pre-padded (F, ph, pw))
    bbox: jax.Array,  # (K, 4) i32
    template: jax.Array,  # (K, th, tw) f32
    t_mean: jax.Array,  # (K,)
    t_std: jax.Array,  # (K,)
    lost_count: jax.Array,  # (K,)
    use_global: jax.Array,  # (K,)
    n_valid: jax.Array,  # (K,) i32
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    highest: bool = True,
    score_passes: int = 3,
    batch: int = 1,
    inkernel_global: bool = False,
    bucket_extents: Tuple[Tuple[int, int], ...] = None,
    unroll: int = 1,
):
    """K independent trackers over ONE shared clip in ONE pallas_call —
    the MULTI-OBJECT mega path (the reference's never-implemented 150%
    stretch goal, SURVEY.md §2e).  Grid (K, F), frame axis innermost,
    exactly the multi-stream layout except every grid column reads the
    SAME frame (shared_frames index map); per-object state re-seeds from
    the (k, 0)-indexed blocks and each object DMAs its own aligned
    search-window slab out of the shared frame.  vs the vmapped scan
    engine (pvot.parallel.multi.make_multi_step): no per-object HBM
    score-map/im2col traffic and no per-frame scan glue.

    Returns (rows (K, F, TX), final templates (K, th, tw)); poison
    semantics per object (pvot.tracker.mega.track_objects_mega).

    bucket_extents (round 4, HETEROGENEOUS templates): the K per-object
    TRUE (th, tw) extents when templ_shape is a shared zero-padded BUCKET
    (pvot.parallel.multi.init_multi_state_bucketed layout).  The kernel
    then masks/clamps per object with traced extents (MegaGeometry
    docstring), and each object gets its OWN box-sum Toeplitz block built
    for its true template width."""
    if bucket_extents is not None:
        min_t = (
            min(e[0] for e in bucket_extents),
            min(e[1] for e in bucket_extents),
        )
        g = MegaGeometry(frame_shape, templ_shape, config, min_t)
    else:
        g = MegaGeometry(frame_shape, templ_shape, config)
    f = frames_u8.shape[0]
    k_objects = template.shape[0]
    if frames_u8.shape[1:] == (g.pad_h, g.pad_w):
        framesp = frames_u8
    else:
        framesp = jnp.pad(
            frames_u8,
            (
                (0, 0),
                (0, g.pad_h - g.frame_h),
                (0, g.pad_w - g.frame_w),
            ),
        )
    tpl0 = jnp.pad(
        template.astype(jnp.float32),
        ((0, 0), (0, g.rows8 - g.th), (0, g.m_lanes - g.tw)),
    ).reshape(k_objects * g.rows8, g.m_lanes)
    if bucket_extents is None:
        t_centered_sum = jnp.sum(
            template.astype(jnp.float32) - t_mean[:, None, None], axis=(1, 2)
        )
    else:
        # Bucket padding is zero, so sum over the true extent =
        # sum(bucketed template) - n_k * mean (n_k = true pixel count).
        n_k = jnp.asarray(
            [th_k * tw_k for th_k, tw_k in bucket_extents], jnp.float32
        )
        t_centered_sum = (
            jnp.sum(template.astype(jnp.float32), axis=(1, 2))
            - n_k * t_mean.astype(jnp.float32)
        )
    zeros = jnp.zeros((k_objects,), jnp.float32)
    sf0 = jnp.stack(
        [
            t_mean.astype(jnp.float32), t_std.astype(jnp.float32),
            t_centered_sum, zeros, zeros, zeros, zeros, zeros,
        ],
        axis=-1,
    )  # (K, 8)
    if batch < 1 or (batch & (batch - 1)):
        raise ValueError(f"mega batch must be a power of two, got {batch}")
    nv = n_valid.astype(jnp.int32)
    si0 = jnp.stack(
        [
            bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3],
            lost_count.astype(jnp.int32),
            use_global.astype(jnp.int32),
            nv,
            (nv // batch) * batch,  # per-object n_full (batch semantics)
        ],
        axis=-1,
    )  # (K, 8)
    if bucket_extents is None:
        box = jnp.asarray(_box_operator(g.tile_lanes, g.tw))
        box_spec = pl.BlockSpec(
            (g.tile_lanes, TX), lambda k, t: (0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        import numpy as _np

        box = jnp.asarray(_np.concatenate(
            [_box_operator(g.tile_lanes, tw_k) for _, tw_k in bucket_extents]
        ))  # (K * tile_lanes, TX): per-object box-sum Toeplitz blocks
        box_spec = pl.BlockSpec(
            (g.tile_lanes, TX), lambda k, t: (k, 0),
            memory_space=pltpu.VMEM,
        )
    if score_passes not in (1, 2, 3):
        raise ValueError(f"score_passes must be 1, 2 or 3, got {score_passes}")
    if unroll < 1 or f % unroll:
        raise ValueError(f"unroll {unroll} must divide the chunk length {f}")
    kernel = functools.partial(
        _mega_kernel, g=g, config=config, highest=highest,
        score_passes=score_passes, multi=True, shared_frames=True,
        batch=batch, inkernel_global=inkernel_global, unroll=unroll,
    )
    vmem_budget = (
        g.slab_h * g.slab_w * 5
        + 4 * 6 * g.rows8 * g.m_lanes
        + 4 * g.tile_lanes * TX
        + 4 * (g.ty + 8) * g.m_lanes * 4 * g.nx
        + _vmem_slack(g)
    )
    rows, tplout = pl.pallas_call(
        kernel,
        grid=(k_objects, f // unroll),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (g.rows8, g.m_lanes), lambda k, t: (k, 0),
                memory_space=pltpu.VMEM,
            ),
            box_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (8 * unroll, TX),
                lambda k, t, _fs=f // unroll: (k * _fs + t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g.rows8, g.m_lanes), lambda k, t: (k, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k_objects * f * 8, TX), jnp.float32),
            jax.ShapeDtypeStruct(
                (k_objects * g.rows8, g.m_lanes), jnp.float32
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((g.slab_h, g.slab_w), jnp.uint8),
            pltpu.VMEM((g.rows8, g.m_lanes), jnp.float32),
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SMEM((12,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(framesp, tpl0, box, sf0, si0)
    rows = rows.reshape(k_objects, f, 8, TX)[:, :, 0, :]
    tplout = tplout.reshape(k_objects, g.rows8, g.m_lanes)
    return rows, tplout[:, : g.th, : g.tw]
