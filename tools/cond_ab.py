"""A/B the global-search lax.cond structure in the single-stream step.

step_breakdown.py attributed +19 us/frame to the global-search cond.  Three
variants, same tracked clip (1024 frames, chunk 512, fast engine):

  branch  — the round-1 structure, inlined HERE for reproducibility (the
            shipping step adopted `overlay` after this tool's measurement):
            one cond SELECTS do_global vs do_local.
  overlay — the shipping fused step (pvot.tracker.step.make_step): the
            local region pass ALWAYS runs; cond(global, do_global, zeros)
            overlays the rare global result.  Semantics identical: when
            global fires the local result is discarded by the where; when
            it doesn't, the cond's live branch is trivial.
  none    — enable_global_search=False.  NOT cond-free: the
            collapsed-window fallback cond remains (its dynamic
            ~bounds.valid predicate keeps the global branch compiled in),
            so read it as "no re-acquisition mode", not a lower bound.

Measured on-chip (round 2): branch 111.3 -> overlay 106.5 us/frame,
trajectories bit-equal.

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
    if num_frames % chunk:
        raise ValueError("num_frames must be a multiple of chunk (no tail "
                         "padding in this tool; the fixed-length valid mask "
                         "would mismatch a partial final chunk)")
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

    full_fn, region_fn, _ = get_backend("fast", (height, width), (templ, templ), config)
    span_x = 2 * config.search_radius_x + 1
    span_y = 2 * config.search_radius_y + 1
    out_w = width - templ + 1
    out_h = height - templ + 1
    lost_threshold = int(config.lost_frame_threshold)

    from pvot.io.gray import ensure_gray_f32

    def make_branch_step():
        """The round-1 cond-SELECT structure, preserved here verbatim so the
        A/B stays reproducible after the shipping step moved to overlay."""

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

            def do_global(frame, st):
                m = full_fn(
                    ensure_gray_f32(frame), st.template, st.t_mean, st.t_std
                )
                return search_ops.argmax2d(m)

            def do_local(frame, st):
                x0, y0 = search_ops.region_origin(
                    bounds, out_w, out_h, span_x, span_y
                )
                scores = region_fn(
                    frame, st.template, st.t_mean, st.t_std, x0, y0
                )
                return search_ops.masked_region_argmax(scores, x0, y0, bounds)

            best_val, best_x, best_y = lax.cond(
                global_argmax, do_global, do_local, frame, state
            )
            return apply_update(
                state, frame, best_val, best_x, best_y, use_global,
                global_argmax, (height, width), (templ, templ), config,
            )

        return step

    steps = {
        "branch": make_branch_step(),
        "overlay": make_step((height, width), (templ, templ), config,
                             ncc_full_fn=full_fn, ncc_region_fn=region_fn,
                             strategy="fused"),
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
