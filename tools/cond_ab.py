"""A/B the global-search lax.cond structure in the single-stream step.

step_breakdown.py attributed +19 us/frame to the global-search cond.  Three
variants, same tracked clip (1024 frames, chunk 512, fast engine):

  branch  — the shipping step: cond selects do_global vs do_local
  overlay — do_local ALWAYS runs; cond(global, do_global, zeros) overlays
            the rare global result (the multi-object step's structure).
            Semantics identical: when global fires the local result is
            discarded by the where; when it doesn't, the cond's live branch
            is trivial.
  none    — enable_global_search=False (no cond at all): the lower bound.

Usage: nohup python tools/cond_ab.py > /tmp/cond_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(width: int = 1280, height: int = 720, templ: int = 80,
         num_frames: int = 1024, chunk: int = 512) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops import search as search_ops
    from pvot.ops.backends import get_backend
    from pvot.tracker.scan import _pack_outputs, fetch_outputs, make_masked_scan_fn
    from pvot.tracker.state import init_state, is_bbox_outside_frame
    from pvot.tracker.step import apply_update, make_step

    config = TrackerConfig()
    spec = SyntheticSpec(width=width, height=height, num_frames=num_frames + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state0 = init_state(jnp.asarray(template), (x, y, w, h))

    full_fn, region_fn = get_backend("fast", (height, width), (templ, templ), config)
    span_x = 2 * config.search_radius_x + 1
    span_y = 2 * config.search_radius_y + 1
    out_w = width - templ + 1
    out_h = height - templ + 1
    lost_threshold = int(config.lost_frame_threshold)

    def make_overlay_step():
        def step(state, frame):
            bbox_outside = is_bbox_outside_frame(
                state.bbox_x, state.bbox_y, state.bbox_w, state.bbox_h,
                width, height,
            )
            cx = state.bbox_x + state.bbox_w // 2
            cy = state.bbox_y + state.bbox_h // 2
            use_global = (
                state.use_global | bbox_outside
                | (state.lost_count >= lost_threshold)
            )
            bounds = search_ops.local_window_bounds(
                cx, cy, templ, templ, out_w, out_h,
                config.search_radius_x, config.search_radius_y,
            )
            global_argmax = use_global | ~bounds.valid

            x0, y0 = search_ops.region_origin(bounds, out_w, out_h, span_x, span_y)
            scores = region_fn(frame, state.template, state.t_mean, state.t_std, x0, y0)
            l_val, l_x, l_y = search_ops.masked_region_argmax(scores, x0, y0, bounds)

            def do_global(frame):
                m = full_fn(
                    frame.astype(jnp.float32) * jnp.float32(1 / 255.0)
                    if frame.dtype == jnp.uint8 else frame,
                    state.template, state.t_mean, state.t_std,
                )
                return search_ops.argmax2d(m)

            def skip(frame):
                return (jnp.float32(0.0), jnp.int32(0), jnp.int32(0))

            g_val, g_x, g_y = lax.cond(global_argmax, do_global, skip, frame)
            best_val = jnp.where(global_argmax, g_val, l_val)
            best_x = jnp.where(global_argmax, g_x, l_x)
            best_y = jnp.where(global_argmax, g_y, l_y)
            return apply_update(
                state, frame, best_val, best_x, best_y, use_global,
                global_argmax, (height, width), (templ, templ), config,
            )

        return step

    steps = {
        "branch": make_step((height, width), (templ, templ), config,
                            ncc_full_fn=full_fn, ncc_region_fn=region_fn,
                            strategy="fused"),
        "overlay": make_overlay_step(),
        "none": make_step((height, width), (templ, templ),
                          TrackerConfig(enable_global_search=False),
                          ncc_full_fn=full_fn, ncc_region_fn=region_fn,
                          strategy="fused"),
    }
    scan_fns = {k: make_masked_scan_fn(s, donate=False) for k, s in steps.items()}

    chunks = [jax.device_put(frames[1 + i : 1 + i + chunk])
              for i in range(0, num_frames, chunk)]
    valid = jax.device_put(np.ones(chunk, bool))

    def run(name, fetch=True):
        st = state0
        outs = []
        for c in chunks:
            st, out = scan_fns[name](st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    for k in scan_fns:
        run(k, fetch=False)
        print(f"compiled {k}", flush=True)
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results, trajs = {}, {}
    for k in scan_fns:
        best = float("inf")
        host = None
        for _ in range(2):
            t0 = time.perf_counter()
            host = run(k)
            best = min(best, time.perf_counter() - t0)
        trajs[k] = np.asarray(host.bbox)
        results[k] = {
            "fps": round(num_frames / best, 1),
            "us_per_frame": round(best / num_frames * 1e6, 2),
        }
        print(json.dumps({k: results[k]}), flush=True)
    results["overlay_traj_equal_vs_branch"] = bool(
        (trajs["overlay"] == trajs["branch"]).all()
    )
    print(json.dumps({"cond_ab": results}))


if __name__ == "__main__":
    main()
