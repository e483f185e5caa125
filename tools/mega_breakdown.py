"""Where do the mega-kernel's per-frame microseconds go?

Rung ladder ON THE REAL CHIP: variants of the mega kernel with stages
statically disabled, timed in-grid over a full chunk with the
stage/flip/time protocol.  Consecutive deltas attribute the per-frame
cost.  Round-5 ladder (the round-4 version lumped dma+convert+roll into
one rung and only measured the HIGHEST tier; the adopted 2-pass kernel's
~26 us/frame of non-MXU time was unattributed — VERDICT r4 weak #1):

  dma        — slab DMA only (u8 checksum consume; no convert, no rolls)
  convert    — + full-slab u8->i32->f32 convert
  roll       — + the two alignment rolls (slab-sized f32)
  score_box  — + the p-loop bsum/bsq VPU folds + box-operator dots +
               normalization (NO correlation: tt build + t1p dots + acc
               fold statically skipped; scores are box-stats only)
  score      — + the shear correlation (80 tt builds + MXU dots + acc
               folds) — i.e. the full score pass at the chosen tier
  argmax     — + masked argmax + confidence gate + bbox/state commit
  full       — + template EMA patch rolls + stats recompute (production)

Deltas: convert-dma = the u8->f32 convert; roll-convert = the alignment
rolls; score_box-roll = box sums; score-score_box = the correlation
(tt build + dots + acc); argmax-score; full-argmax = EMA+stats.

Each rung is a separate pallas_call build sharing _mega_kernel's geometry
and memory layout (kept in sync by hand; this is a measurement tool, not a
product path).  Inputs are perturbed per run to defeat LICM hoisting
(tools/README.md trap catalogue).

ROUND-5 FINDINGS (720p/80px, 2-pass tier, chunk 512, n_disp=16 — logs
/tmp/mega_bd_r5{c..i}.log, one fresh process each):

  production 2-pass kernel   ~17 us/frame device time (prod_poison /
                             prod_ikg / prodkernel rungs all agree +-1)
  `empty` grid floor         ~9-10 us/frame — 56%% of the kernel
  correlation (tt+dots+acc)  ~5.4-7.6 us
  box folds, argmax, EMA,    ~2 us combined (the round-4 VERDICT's
  DMA, convert, rolls        suspects — slab rolls, full-slab convert,
                             per-frame EMA stats — are all noise-level)

The floor is INVARIANT to every output/packing strategy tried (each a
dedicated rung, all ~9-11 us/frame): constant out values (empty_const),
SMEM scalar records (empty_smem), VMEM-scratch accumulation with one
final flush (empty_scratch), 4 frames per grid step (empty4), 8 records
packed per out tile via a revisited block + dynamic row store (empty8),
and — from tools/mega_chunk_scaling.py — chunk size 256/512/1024
(per-dispatch relay cost measured at only ~0.2 ms).  Conclusion: a
sequential-grid step on this chip carries ~9-10 us of pipeline cost that
neither amortizes nor moves; the kernel's remaining headroom is the
correlation dots, which are already 2 bf16 MXU passes.  (The round-4
"26 us/frame non-MXU overhead" estimate was relay-session measurement
artifact: single-dispatch regions saturate at the session's per-fetch
latency — see the timing-protocol note below.)

Usage:
  nohup python tools/mega_breakdown.py [--tier 2pass|3pass|highest] \
      > /tmp/mega_bd.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNGS = ["empty", "dma", "convert", "roll", "score_box", "score", "argmax",
         "full"]


def build_rung(rung: str, g, config, f: int, tier: str):
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pvot.ops.ncc_mega import BIG, ROW_ALIGN, LANE_ALIGN, _mega_kernel
    from pvot.ops.ncc_pallas import TX

    th, tw, ty = g.th, g.tw, g.ty
    tile_lanes, m_lanes = g.tile_lanes, g.m_lanes
    n = float(th * tw)
    lr = float(config.template_update_lr)
    half_w, half_h = tw // 2, th // 2
    rx, ry = int(config.search_radius_x), int(config.search_radius_y)
    level = RUNGS.index(rung) if rung in RUNGS else len(RUNGS)
    prod_body = rung in ("prodkernel", "prodkernel_ikg")

    def kernel(frames_hbm, tpl0_ref, box_ref, sf0_ref, si0_ref,
               out_ref, tplout_ref, slab_ref, tpl_ref, sf_ref, si_ref, sem,
               recs_ref=None):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            tpl_ref[:, :] = tpl0_ref[:, :]
            sf_ref[0] = sf0_ref[0]
            sf_ref[1] = sf0_ref[1]
            sf_ref[2] = sf0_ref[2]
            for i in range(6):
                si_ref[i] = si0_ref[i]

        bx, by = si_ref[0], si_ref[1]
        bw, bh = si_ref[2], si_ref[3]
        cx = bx + (bw >> 1)
        cy = by + (bh >> 1)
        min_tx = jnp.maximum(0, cx - rx - half_w)
        max_tx = jnp.minimum(g.out_w - 1, cx + rx - half_w)
        min_ty = jnp.maximum(0, cy - ry - half_h)
        max_ty = jnp.minimum(g.out_h - 1, cy + ry - half_h)

        x0 = jnp.minimum(min_tx, g.out_w - g.span_x)
        y0 = jnp.minimum(min_ty, g.out_h - g.span_y)

        lane = lax.broadcasted_iota(jnp.int32, (8, TX), 1)
        f32 = jnp.float32

        def walk(chk):
            # Keep state moving so every frame's DMA window differs like
            # production; consume `chk` so nothing is DCE'd.
            si_ref[0] = jnp.minimum(bx + 1, g.frame_w - tw - 1)
            si_ref[1] = jnp.minimum(by + (t & 1), g.frame_h - th - 1)
            out_ref[:, :] = jnp.where(lane == 4, chk, 0.0)

        if rung == "empty":
            # No DMA at all: pure sequential-grid cost — per-step scalar
            # work, the (8, TX) out-tile writeback, grid sequencing.
            walk((x0 + y0).astype(f32))
            return

        if rung == "empty4":
            # Same zero work but FOUR frames' out-tiles per grid step
            # (grid f/4, block (32, TX)): if the ~9.7 us/frame floor is
            # per-STEP overhead it should read ~1/4 of `empty`; if it is
            # per-frame writeback it stays flat.  Validates the
            # multi-frame-unroll lever before building it.
            si_ref[0] = jnp.minimum(bx + 1, g.frame_w - tw - 1)
            si_ref[1] = jnp.minimum(by + (t & 1), g.frame_h - th - 1)
            lane4 = lax.broadcasted_iota(jnp.int32, (32, TX), 1)
            out_ref[:, :] = jnp.where(lane4 == 4, (x0 + y0).astype(f32), 0.0)
            return

        if rung == "empty_const":
            # Like `empty` but the out value is a CONSTANT (no scalar
            # broadcast into the vector): isolates whether the ~9 us
            # floor is the dynamic-scalar -> vector insertion.
            si_ref[0] = jnp.minimum(bx + 1, g.frame_w - tw - 1)
            si_ref[1] = jnp.minimum(by + (t & 1), g.frame_h - th - 1)
            out_ref[:, :] = jnp.zeros((8, TX), jnp.float32)
            return

        if rung == "empty_smem":
            # Records as SMEM SCALARS (out array (f, 16) f32, whole-array
            # resident, two scalar stores per frame): no vector record
            # construction, no VMEM out block machinery at all.
            si_ref[0] = jnp.minimum(bx + 1, g.frame_w - tw - 1)
            si_ref[1] = jnp.minimum(by + (t & 1), g.frame_h - th - 1)
            out_ref[t, 4] = (x0 + y0).astype(f32)
            out_ref[t, 0] = bx.astype(f32)
            return

        if rung == "empty_scratch":
            # Records accumulate in a VMEM *scratch* row per frame (scratch
            # stores are fast — the EMA's 11-tile tpl_ref store costs
            # ~0.4 us, full-argmax delta) and flush to the whole-array out
            # ONCE at the last step.  If the ~9.5 us floor is the per-step
            # out-ref tile write, this kills it.
            si_ref[0] = jnp.minimum(bx + 1, g.frame_w - tw - 1)
            si_ref[1] = jnp.minimum(by + (t & 1), g.frame_h - th - 1)
            rec = jnp.where(lane == 4, (x0 + y0).astype(f32), 0.0)
            recs_ref[pl.ds(t * 8, 8), :] = rec

            @pl.when(t == pl.num_programs(0) - 1)
            def _():
                out_ref[:, :] = recs_ref[:, :]

            return

        if rung == "empty8":
            # PACKED records: 8 frames' records share ONE (8, TX) out tile
            # (out block index map t//8 — revisited 8 steps, written back
            # once; the kernel stores row t&7).  empty/empty4 measured the
            # writeback floor as BYTES-bound (~2.3 us/KB); this cuts
            # record bytes 8x -> expected ~1.2 us/frame floor.
            si_ref[0] = jnp.minimum(bx + 1, g.frame_w - tw - 1)
            si_ref[1] = jnp.minimum(by + (t & 1), g.frame_h - th - 1)
            row = jnp.where(lane == 4, (x0 + y0).astype(f32), 0.0)[:1]
            out_ref[pl.ds(t & 7, 1), :] = row
            return

        ya = (y0 >> 5) * ROW_ALIGN
        xa = (x0 >> 7) * LANE_ALIGN
        cp = pltpu.make_async_copy(
            frames_hbm.at[t, pl.ds(ya, g.slab_h), pl.ds(xa, g.slab_w)],
            slab_ref, sem,
        )
        cp.start()
        cp.wait()

        if rung == "dma":
            # u8 checksum: no convert.  (Cheap i32 row-sum of one row
            # block; cost negligible vs the DMA itself.)
            chk = jnp.sum(slab_ref[:8, :].astype(jnp.int32)).astype(f32)
            walk(chk)
            return

        slab = (
            slab_ref[:, :].astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / 255.0)
        )
        if rung == "convert":
            walk(jnp.sum(slab[:ty, :TX]))
            return

        slab = pltpu.roll(slab, g.slab_h - (y0 - ya), 0)
        slab = pltpu.roll(slab, g.slab_w - (x0 - xa), 1)
        if rung == "roll":
            walk(jnp.sum(slab[:ty, :TX]))
            return

        t_mean, t_std_in, sum_tc = sf_ref[0], sf_ref[1], sf_ref[2]
        row8 = lax.broadcasted_iota(jnp.int32, (8, m_lanes), 0)
        col8 = lax.broadcasted_iota(jnp.int32, (8, m_lanes), 1)
        with_corr = level >= RUNGS.index("score")
        acc = jnp.zeros((ty, TX), jnp.float32)
        bsum = jnp.zeros((ty, tile_lanes), jnp.float32)
        bsq = jnp.zeros((ty, tile_lanes), jnp.float32)
        for k in range(g.k_blocks):
            w_ = slab[8 * k : 8 * k + ty + 8, :tile_lanes]
            wsq = w_ * w_
            if with_corr:
                valid8 = ((8 * k + row8) < th) & (col8 < tw)
                t8 = jnp.where(
                    valid8, tpl_ref[pl.ds(8 * k, 8), :] - t_mean, 0.0
                )
                if tier != "highest":
                    wh = w_.astype(jnp.bfloat16)
                    if tier != "2pass":
                        wl = (w_ - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            for p in range(8):
                if 8 * k + p >= th:
                    break
                if with_corr:
                    b = jnp.broadcast_to(t8[p : p + 1, :], (TX, m_lanes))
                    tt = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
                    tv = tt[:, :tile_lanes]
                    if tier == "highest":
                        t1p = lax.dot_general(
                            w_, tv,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST,
                        )
                    else:
                        tth = tv.astype(jnp.bfloat16)
                        ttl = (tv - tth.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )

                        def d1(a_, b_):
                            return lax.dot_general(
                                a_, b_,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )

                        if tier == "2pass":
                            t1p = d1(wh, tth) + d1(wh, ttl)
                        else:
                            t1p = d1(wh, tth) + d1(wh, ttl) + d1(wl, tth)
                    acc = acc + t1p[p : p + ty, :]
                bsum = bsum + w_[p : p + ty, :]
                bsq = bsq + wsq[p : p + ty, :]

        def dot_f32(a, b):
            return lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )

        acc_sum = dot_f32(bsum, box_ref[:, :])
        acc_ssq = dot_f32(bsq, box_ref[:, :])
        mean = acc_sum / n
        var = acc_ssq / n - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 1e-6))
        cov = acc - mean * sum_tc
        s = cov / ((std + 1e-6) * (t_std_in + 1e-6) * n)

        if rung in ("score_box", "score"):
            walk(jnp.sum(s))
            return

        dy = lax.broadcasted_iota(jnp.int32, (ty, TX), 0)
        dx = lax.broadcasted_iota(jnp.int32, (ty, TX), 1)
        mask = (
            (dx >= min_tx - x0) & (dx <= max_tx - x0)
            & (dy >= min_ty - y0) & (dy <= max_ty - y0)
        )
        masked = jnp.where(mask, s, -jnp.inf)
        best_val = jnp.max(masked)
        is_best = masked == best_val
        bdy = jnp.min(jnp.where(is_best, dy, BIG))
        bdx = jnp.min(jnp.where(is_best & (dy == bdy), dx, BIG))
        best_x = x0 + bdx
        best_y = y0 + bdy

        accept = best_val >= jnp.float32(config.min_confidence)
        new_bx = jnp.where(accept, best_x, bx)
        new_by = jnp.where(accept, best_y, by)
        si_ref[0] = new_bx
        si_ref[1] = new_by
        si_ref[2] = jnp.where(accept, tw, bw)
        si_ref[3] = jnp.where(accept, th, bh)

        if rung == "argmax":
            out_ref[:, :] = (
                jnp.where(lane == 0, new_bx.astype(f32), 0.0)
                + jnp.where(lane == 4, best_val, 0.0)
            )
            return

        strong = accept & (best_val >= jnp.float32(config.strong_confidence))
        patch_rows = pltpu.roll(slab, g.slab_h - bdy, 0)
        patch_full = pltpu.roll(patch_rows, g.slab_w - bdx, 1)
        rowm = lax.broadcasted_iota(jnp.int32, (g.rows8, m_lanes), 0)
        colm = lax.broadcasted_iota(jnp.int32, (g.rows8, m_lanes), 1)
        tvalid = (rowm < th) & (colm < tw)
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
        rec = (
            jnp.where(lane == 0, new_bx.astype(f32), 0.0)
            + jnp.where(lane == 4, best_val, 0.0)
        )
        if rung == "full8":
            out_ref[pl.ds(t & 7, 1), :] = rec[:1]
        elif rung == "full_scratch":
            recs_ref[pl.ds(t * 8, 8), :] = rec

            @pl.when(t == pl.num_programs(0) - 1)
            def _():
                out_ref[:, :] = recs_ref[:, :]
        else:
            out_ref[:, :] = rec

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            tplout_ref[:, :] = tpl_ref[:, :]

    if prod_body:
        # The EXACT production kernel body inside the ladder's own
        # pallas_call — isolates kernel-body cost from driver-side cost
        # (eager arg prep, output reshape) with zero eager ops per call.
        kernel = functools.partial(
            _mega_kernel, g=g, config=config,
            highest=tier == "highest",
            score_passes={"2pass": 2, "3pass": 3, "highest": 3}[tier],
            batch=1, inkernel_global=rung == "prodkernel_ikg",
        )

    from pvot.ops.ncc_pallas import TX as TX_

    vmem_budget = (
        g.slab_h * g.slab_w * 5
        + 4 * 3 * g.rows8 * g.m_lanes
        + 4 * g.tile_lanes * TX_
        + 4 * (g.ty + 8) * g.m_lanes * 4
        + 24 * 1024 * 1024
    )

    packed = rung in ("empty8", "full8")
    smem_out = rung == "empty_smem"
    scratch_recs = rung in ("empty_scratch", "full_scratch")
    n_grid, out_rows = (f // 4, 32) if rung == "empty4" else (f, 8)
    total_out_rows = f if packed else f * 8
    out_idx = (lambda t: (t // 8, 0)) if packed else (lambda t: (t, 0))
    if smem_out:
        rec_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        rec_shape = jax.ShapeDtypeStruct((f, 16), jnp.float32)
    elif scratch_recs:
        # Whole-array VMEM out (2 MB at chunk 512), flushed once.
        rec_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        rec_shape = jax.ShapeDtypeStruct((f * 8, TX_), jnp.float32)
    else:
        rec_spec = pl.BlockSpec((out_rows, TX_), out_idx,
                                memory_space=pltpu.VMEM)
        rec_shape = jax.ShapeDtypeStruct((total_out_rows, TX_), jnp.float32)

    def call(framesp, tpl0, box, sf0, si0):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                rec_spec,
                pl.BlockSpec((g.rows8, g.m_lanes), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                rec_shape,
                jax.ShapeDtypeStruct((g.rows8, g.m_lanes), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((g.slab_h, g.slab_w), jnp.uint8),
                pltpu.VMEM((g.rows8, g.m_lanes), jnp.float32),
                pltpu.SMEM((4,), jnp.float32),
                pltpu.SMEM((12 if prod_body else 8,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ] + (
                [pltpu.VMEM((f * 8, TX_), jnp.float32)] if scratch_recs
                else []
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        )(framesp, tpl0, box, sf0, si0)

    import jax

    return jax.jit(call)


def main(width=1280, height=720, templ=80, chunk=512, tier="2pass"):
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_mega import MegaGeometry
    from pvot.ops.ncc_pallas import _box_operator

    config = TrackerConfig()
    g = MegaGeometry((height, width), (templ, templ), config)
    spec = SyntheticSpec(width=width, height=height, num_frames=chunk + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]

    framesp = jnp.pad(
        jnp.asarray(frames[1:]),
        ((0, 0), (0, g.pad_h - g.frame_h), (0, g.pad_w - g.frame_w)),
    )
    tpl0 = jnp.pad(jnp.asarray(template),
                   ((0, g.rows8 - g.th), (0, g.m_lanes - g.tw)))
    t_mean = float(np.mean(template))
    t_std = float(np.std(template)) + 1e-6
    sf0 = jnp.asarray([t_mean, t_std, float(np.sum(template - t_mean)),
                       0, 0, 0, 0, 0], jnp.float32)
    si0 = jnp.asarray([x, y, w, h, 0, 0, chunk, 0], jnp.int32)
    box = jnp.asarray(_box_operator(g.tile_lanes, g.tw))

    # ONE staged buffer shared by every rung (0.55 GB pre-padded at chunk
    # 512; 7 distinct buffers would breach the relay's ~2 GB guideline).
    staged = jax.device_put(framesp)
    fns = {}
    # prodkernel rungs: the exact production _mega_kernel body (poison /
    # in-kernel-global variants) under the ladder's harness — the gap to
    # the `full` rung is the cost of production's extra machinery (dormant
    # global branch, commit gating, 10-lane record emit), free of any
    # driver-side eager-op overhead.
    # The cumulative ladder plus the round-5 floor-hunt variants (each a
    # falsified hypothesis about the ~9-10 us/frame grid floor — see the
    # module docstring's findings table) and the production kernel bodies.
    all_rungs = RUNGS + [
        "empty_const", "empty_smem", "empty_scratch", "empty4", "empty8",
        "full8", "full_scratch", "prodkernel", "prodkernel_ikg",
    ]
    for r in all_rungs:
        fns[r] = build_rung(r, g, config, chunk, tier)
        out = fns[r](staged, tpl0, box, sf0, si0)
        jax.block_until_ready(out)
        print(f"compiled {r}", flush=True)

    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    # Timing (round-5 protocol): a timed region is N back-to-back
    # dispatches + ONE tiny packed fetch.  A single-dispatch region
    # saturates at the relay's per-FETCH round-trip latency (measured
    # ~50 ms in this session: a chunk-512 ladder read 98-109 us/frame on
    # EVERY rung, /tmp/mega_bd_r5.log — the fixed fetch cost, not device
    # time).  N*chunk frames put the compute far above the latency and
    # the common-mode fetch jitter shrinks to <1 us/frame in the deltas.
    n_disp = 16
    results = {}
    for r in all_rungs:
        best = float("inf")
        s = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            sums = []
            for _i in range(n_disp):
                rows, tplout = fns[r](staged, tpl0, box, sf0, si0)
                sums.append(jnp.sum(rows[:, 4]))
            s = float(jnp.stack(sums).sum().block_until_ready())
            best = min(best, time.perf_counter() - t0)
        results[r] = round(best / (chunk * n_disp) * 1e6, 2)
        print(json.dumps({r: {"us_per_frame": results[r], "chk": s}}),
              flush=True)
    deltas = {}
    prev = 0.0
    for r in [r for r in RUNGS if r in results]:
        deltas[r] = round(results[r] - prev, 2)
        prev = results[r]
    print(json.dumps(
        {"tier": tier, "mega_breakdown": results, "deltas": deltas,
         "n_dispatch": n_disp, "chunk": chunk}
    ), flush=True)

    # PRODUCTION kernels in the same session (directly comparable to the
    # `full` rung): the ladder kernel lacks the dormant in-kernel-global
    # branch, the batch gate, and the 10-lane record emit — this pins what
    # those cost on local-only frames.
    from pvot.ops.ncc_mega import mega_track_chunk

    highest = tier == "highest"
    sp = {"2pass": 2, "3pass": 3, "highest": 3}[tier]
    prod = {}
    # Hoist every arg to a ready device value: an eager op per timed call
    # is its own relay dispatch round trip (CLAUDE.md trap).
    p_bbox = jax.device_put(np.asarray([x, y, w, h], np.int32))
    p_tpl = jax.device_put(np.asarray(template, np.float32))
    p_mean = jax.device_put(np.float32(t_mean))
    p_std = jax.device_put(np.float32(t_std))
    p_zero = jax.device_put(np.int32(0))
    p_nv = jax.device_put(np.int32(chunk))
    jax.block_until_ready(p_nv)
    for name, ikg in (("prod_poison", False), ("prod_ikg", True)):
        def pcall():
            return mega_track_chunk(
                staged, p_bbox, p_tpl, p_mean, p_std, p_zero, p_zero,
                p_nv, (height, width), (templ, templ), config,
                highest=highest, score_passes=sp, inkernel_global=ikg,
            )

        rows, tpl_out = pcall()
        jax.block_until_ready(rows)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sums = []
            for _i in range(n_disp):
                rows, tpl_out = pcall()
                sums.append(jnp.sum(rows[:, 4]))
            s = float(jnp.stack(sums).sum().block_until_ready())
            best = min(best, time.perf_counter() - t0)
        prod[name] = round(best / (chunk * n_disp) * 1e6, 2)
        print(json.dumps({name: {"us_per_frame": prod[name], "chk": s}}),
              flush=True)
    print(json.dumps({"tier": tier, "production": prod,
                      "vs_full_rung": {
                          k: round(v - results["full"], 2)
                          for k, v in prod.items()
                      }}))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="2pass",
                    choices=["2pass", "3pass", "highest"])
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()
    main(chunk=args.chunk, tier=args.tier)
