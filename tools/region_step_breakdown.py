"""Where do the fused Pallas headline's ~84 us/frame go?

In-scan rung ladder on the real chip, decomposing the single-stream fused
local path (720p, 80x80 template, r60 span 121) into its three candidate
costs: the per-frame Toeplitz operator build (~10.5 MB write, rebuilt every
frame because the EMA updates the template), the fused score+argmax kernel
(which DMAs that operator back), and the tracker-state update (EMA + stats).

Rungs (all scanned over real synthetic frames, chunk 256):
  empty      — carry pass-through; the scan dispatch/fetch floor
  ema_only   — apply_update with a constant accepted argmax: EMA fires every
               frame + stats recompute, no NCC at all
  build_only — ema_only + the per-frame operator build, consumed by jnp.sum
               (never consume a slice: XLA slice-propagates + DCEs the build,
               see tools/toeplitz_build_bench.py)
  no_build   — the full fused step but with the operator built ONCE and
               threaded through the scan carry (STALE operator: trajectory is
               numerically wrong, timing-only rung)
  full       — the real headline step (build + kernel + EMA)
  glue_only  — ema_only + the region slice + u8->f32 convert + pad (the
               XLA ops that FEED the kernel), kernel skipped
  kernel_scan— a carry-free scan calling the bare fused pallas_call on ONE
               pre-staged (img_pad, toep, scalars, win) every step: the
               per-step cost of the kernel itself incl. launch + DMA

Interpretation: full - no_build ~= in-scan build cost; no_build - ema_only
~= kernel (incl. operator DMA) + region slice; build_only - ema_only is the
build cost measured additively (cross-check); glue_only - ema_only vs
kernel_scan - empty split the kernel+slice bucket into XLA feeding ops vs
the pallas_call proper.

First run (2026-08-17, 1024 frames chunk 256, /tmp/rsb.log): empty 32.4,
ema_only 34.4, build_only 87.9, no_build 79.3, full 95.5 us/frame =>
floor 32.4 | EMA+stats 2.0 | kernel+slice 44.9 | in-scan build 16.2.
The pallas_fast engine A/B (3-pass hi/lo dot, half the matmul passes and
operator-DMA bytes) moved the headline only 85.0 -> 82.3 us/frame, so the
44.9 us kernel+slice bucket is NOT matmul-pass-bound — hence these two
extra rungs.

Second run with the extra rungs (/tmp/rsb3.log): glue(glue_only-ema_only)
= 0.1-2.4 us — the XLA feeding ops are nearly free — and
bare_kernel(kernel_scan-empty) = 41.0 us.  NOTE the LICM trap: with
loop-invariant kernel inputs XLA hoists the whole pallas_call out of the
scan (first attempt measured kernel_scan BELOW the empty floor); the rung
perturbs the image by acc*1e-30 to force per-step execution.  So the
41-us pallas_call cost decomposes as ~13 us operator HBM->VMEM DMA
(10.5 MB at ~800 GB/s) + ~11 us HIGHEST 6-pass MXU compute + ~17 us
launch/entry/exit overhead.  Conclusion: the levers are (1) the shear
kernel (pltpu.roll stride trick builds the transposed Toeplitz in
registers from the raw 123 KB template — kills the build AND the operator
DMA; tools/fused_argmax_probe.py roll_strided/shear_dot rungs) and
(2) a chunk-level mega-kernel to amortize the launch overhead and the
scan dispatch floor.

Usage: nohup python tools/region_step_breakdown.py > /tmp/rsb.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(width=1280, height=720, templ=80, num_frames=1024, chunk=256,
         interpret=False):
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot.config import TrackerConfig
    from pvot.io.gray import ensure_gray_f32, gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops import search as search_ops
    from pvot.ops import ncc_pallas as npz
    from pvot.ops.backends import get_backend
    from pvot.tracker.state import init_state
    from pvot.tracker.step import apply_update, make_step

    config = TrackerConfig()
    span = 2 * config.search_radius_x + 1
    out_w = width - templ + 1
    out_h = height - templ + 1
    tile_lanes = npz._round_up(npz.TX + templ - 1, 128)

    spec = SyntheticSpec(width=width, height=height, num_frames=num_frames + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state = init_state(jnp.asarray(template), (x, y, w, h))

    full_fn, region_fn, argmax_fn = get_backend(
        "pallas", (height, width), (h, w), config
    )
    real_step = make_step(
        (height, width), (h, w), config,
        ncc_full_fn=full_fn, ncc_region_fn=region_fn, strategy="fused",
        ncc_region_argmax_fn=argmax_fn,
    )

    def window_and_origin(st):
        cx = st.bbox_x + st.bbox_w // 2
        cy = st.bbox_y + st.bbox_h // 2
        bounds = search_ops.local_window_bounds(
            cx, cy, templ, templ, out_w, out_h,
            config.search_radius_x, config.search_radius_y,
        )
        x0, y0 = search_ops.region_origin(bounds, out_w, out_h, span, span)
        return bounds, x0, y0

    def step_empty(st, frame):
        del frame
        return st, (jnp.stack([st.bbox_x, st.bbox_y]), jnp.float32(0.0))

    def step_ema_only(st, frame):
        # Constant accepted argmax at the current bbox: EMA fires every
        # frame (best_val=1.0 >= strong threshold) and stats recompute.
        st2, out = apply_update(
            st, frame, jnp.float32(1.0), st.bbox_x, st.bbox_y,
            jnp.bool_(False), jnp.bool_(False),
            (height, width), (templ, templ), config,
        )
        return st2, (out.bbox[:2], out.score)

    def step_build_only(st, frame):
        tc = st.template - st.t_mean
        toep = npz._toeplitz_for(tc, tile_lanes, True)
        # Consume the WHOLE build (sum), fold into best_val at ~1e-30 scale
        # so the EMA gate still accepts every frame.
        bv = jnp.float32(1.0) + jnp.sum(toep) * jnp.float32(1e-30)
        st2, out = apply_update(
            st, frame, bv, st.bbox_x, st.bbox_y,
            jnp.bool_(False), jnp.bool_(False),
            (height, width), (templ, templ), config,
        )
        return st2, (out.bbox[:2], out.score)

    # no_build: the fused local path with a FIXED operator from the initial
    # template, threaded through the carry (never rebuilt).  Trajectory is
    # numerically stale — timing-only.
    th_, tw_ = templ, templ
    k_blocks = -(-th_ // 8)
    ty = min(128, npz._round_up(span, 8))
    gh = npz._round_up(span, ty) // ty
    gw = npz._round_up(span, npz.TX) // npz.TX
    region_rows = span + th_ - 1
    region_cols = span + tw_ - 1

    def fused_argmax_fixed(toep, st, frame, bounds, x0, y0):
        region = lax.dynamic_slice(
            frame, (y0, x0), (region_rows, region_cols)
        )
        region = ensure_gray_f32(region)
        tc = st.template - st.t_mean
        scalars = jnp.stack(
            [st.t_mean, st.t_std, jnp.sum(tc), jnp.float32(th_ * tw_)]
        ).reshape(1, 4)
        win = jnp.stack(
            [bounds.min_tx - x0, bounds.max_tx - x0,
             bounds.min_ty - y0, bounds.max_ty - y0]
        ).astype(jnp.int32).reshape(1, 4)
        img_pad = jnp.pad(
            region,
            ((0, ty * gh + 8 * k_blocks - region_rows),
             (0, (gw - 1) * npz.TX + tile_lanes - region_cols)),
        )
        vals, idxs = npz._ncc_argmax_padded(
            img_pad, toep, scalars, win, th_, tw_, ty, interpret, True
        )
        v = vals.reshape(gh, 8, gw, npz.TX)[:, 0, :, 0]
        ix = idxs.reshape(gh, 8, gw, npz.TX)[:, 0, :, 0]
        m = jnp.max(v)
        flat = jnp.min(jnp.where(v == m, ix, jnp.int32(2**30)))
        ry = flat // (gw * npz.TX)
        rx = flat % (gw * npz.TX)
        return m, x0 + rx.astype(jnp.int32), y0 + ry.astype(jnp.int32)

    def step_no_build(carry, frame):
        st, toep = carry
        bounds, x0, y0 = window_and_origin(st)
        bv, bx, by = fused_argmax_fixed(toep, st, frame, bounds, x0, y0)
        st2, out = apply_update(
            st, frame, bv, bx, by, jnp.bool_(False), jnp.bool_(False),
            (height, width), (templ, templ), config,
        )
        return (st2, toep), (out.bbox[:2], out.score)

    def step_full(st, frame):
        st2, out = real_step(st, frame)
        return st2, (out.bbox[:2], out.score)

    def step_glue_only(st, frame):
        # Everything that feeds the kernel — slice, convert, pad, scalar
        # stacks — but no pallas_call; consume via jnp.sum at 1e-30 scale.
        bounds, x0, y0 = window_and_origin(st)
        region = lax.dynamic_slice(
            frame, (y0, x0), (region_rows, region_cols)
        )
        region = ensure_gray_f32(region)
        tc = st.template - st.t_mean
        scalars = jnp.stack(
            [st.t_mean, st.t_std, jnp.sum(tc), jnp.float32(th_ * tw_)]
        ).reshape(1, 4)
        win = jnp.stack(
            [bounds.min_tx - x0, bounds.max_tx - x0,
             bounds.min_ty - y0, bounds.max_ty - y0]
        ).astype(jnp.int32).reshape(1, 4)
        img_pad = jnp.pad(
            region,
            ((0, ty * gh + 8 * k_blocks - region_rows),
             (0, (gw - 1) * npz.TX + tile_lanes - region_cols)),
        )
        bv = (
            jnp.float32(1.0)
            + (jnp.sum(img_pad) + jnp.sum(scalars) + jnp.sum(win))
            * jnp.float32(1e-30)
        )
        st2, out = apply_update(
            st, frame, bv, st.bbox_x, st.bbox_y,
            jnp.bool_(False), jnp.bool_(False),
            (height, width), (templ, templ), config,
        )
        return st2, (out.bbox[:2], out.score)

    # kernel_scan: the bare fused pallas_call per step on ONE pre-staged
    # input set — no frame read, no glue, no state update.  Its per-frame
    # cost minus the empty floor is the pallas_call proper (launch +
    # operator DMA + compute + partial-combine).
    img_pad0 = jnp.pad(
        ensure_gray_f32(
            lax.dynamic_slice(
                jnp.asarray(frames[1]), (0, 0), (region_rows, region_cols)
            )
        ),
        ((0, ty * gh + 8 * k_blocks - region_rows),
         (0, (gw - 1) * npz.TX + tile_lanes - region_cols)),
    )
    scalars0 = jnp.stack(
        [state.t_mean, state.t_std, jnp.float32(0.0),
         jnp.float32(th_ * tw_)]
    ).reshape(1, 4)
    win0 = jnp.asarray([[0, span - 1, 0, span - 1]], jnp.int32)

    def step_kernel_scan(carry, frame):
        del frame
        acc, ip, tp, sc, wn = carry
        # Defeat loop-invariant code motion: without per-step variation XLA
        # hoists the whole pallas_call out of the scan (first run measured
        # kernel_scan BELOW the empty floor).  Perturb the small image
        # operand by the accumulator at 1e-30 scale — a data dependence on
        # the previous step that changes results by nothing and costs one
        # 53 KB elementwise pass.  The call then executes every step and
        # DMAs ALL its inputs (incl. the invariant 10.5 MB operator).
        ip = ip + acc * jnp.float32(1e-30)
        vals, idxs = npz._ncc_argmax_padded(
            ip, tp, sc, wn, th_, tw_, ty, interpret, True
        )
        v = vals.reshape(gh, 8, gw, npz.TX)[:, 0, :, 0]
        ix = idxs.reshape(gh, 8, gw, npz.TX)[:, 0, :, 0]
        m = jnp.max(v)
        flat = jnp.min(jnp.where(v == m, ix, jnp.int32(2**30)))
        acc = acc + m + flat.astype(jnp.float32) * jnp.float32(1e-9)
        return (acc, ip, tp, sc, wn), (
            jnp.stack([jnp.int32(0), jnp.int32(0)]), acc
        )

    tc0 = state.template - state.t_mean
    toep0 = jax.jit(
        lambda t: npz._toeplitz_for(t, tile_lanes, True)
    )(tc0)

    chunks = [
        jax.device_put(frames[1 + i : 1 + i + chunk])
        for i in range(0, num_frames, chunk)
    ]
    jax.block_until_ready(chunks[-1])

    def make_runner(step_fn, carry0):
        scan = jax.jit(lambda c, fs: lax.scan(step_fn, c, fs))

        def run(fetch=True):
            c = carry0
            outs = []
            for ch in chunks:
                c, out = scan(c, ch)
                outs.append(out)
            dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
            if fetch:
                for leaf in jax.tree.leaves(dev):
                    leaf.copy_to_host_async()
                return jax.tree.map(np.asarray, jax.device_get(dev))
            return dev

        return run

    rungs = {
        "empty": make_runner(step_empty, state),
        "ema_only": make_runner(step_ema_only, state),
        "build_only": make_runner(step_build_only, state),
        "no_build": make_runner(step_no_build, (state, toep0)),
        "full": make_runner(step_full, state),
        "glue_only": make_runner(step_glue_only, state),
        "kernel_scan": make_runner(
            step_kernel_scan,
            (jnp.float32(0.0), img_pad0, toep0, scalars0, win0),
        ),
    }
    for k, run in rungs.items():
        run(fetch=False)
        print(f"compiled {k}", flush=True)

    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results = {}
    for k, run in rungs.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            got = run()
            best = min(best, time.perf_counter() - t0)
        results[k] = {
            "us_per_frame": round(best / num_frames * 1e6, 1),
            "fps": round(num_frames / best, 1),
        }
        print(json.dumps({k: results[k]}), flush=True)
        del got

    f = {k: results[k]["us_per_frame"] for k in results}
    print(json.dumps({
        "region_step_breakdown": results,
        "derived_us": {
            "in_scan_build(full-no_build)": round(f["full"] - f["no_build"], 1),
            "build_additive(build_only-ema_only)": round(
                f["build_only"] - f["ema_only"], 1),
            "kernel+slice(no_build-ema_only)": round(
                f["no_build"] - f["ema_only"], 1),
            "ema+stats(ema_only-empty)": round(f["ema_only"] - f["empty"], 1),
            "glue(glue_only-ema_only)": round(
                f["glue_only"] - f["ema_only"], 1),
            "bare_kernel(kernel_scan-empty)": round(
                f["kernel_scan"] - f["empty"], 1),
        },
    }))


if __name__ == "__main__":
    if "--smoke" in sys.argv:  # CPU syntax/trace check (interpret-mode Pallas)
        import jax

        jax.config.update("jax_platforms", "cpu")
        main(width=320, height=240, templ=32, num_frames=8, chunk=4,
             interpret=True)
    else:
        main()
