"""Per-frame cost breakdown of the scanned tracking step on the real TPU.

Times a ladder of scanned step variants (same chunked-scan protocol as
bench.py: stage + compile async, flip to synchronous mode with a tiny fetch,
then time dispatch + one packed fetch).  Each rung adds one piece of the real
step, so consecutive deltas attribute per-frame time to:

  empty          scan framework floor (loop + carry + tiny output)
  frame_sum      + reading the (H, W) uint8 frame from the chunk
  region_slice   + dynamic_slice of the (span+t-1)^2 candidate region + f32
  matmul         + im2col-x + MXU matmul + shifted-adds (the cov map)
  integrals      + sliding box sums (integral images) + NCC normalize
  argmax         + masked region argmax
  update         + full state update (= the real local-only step)
  full_step      + the global-search lax.cond (the production step)

Usage (one TPU process at a time; run via nohup and poll the log):
    nohup python tools/step_breakdown.py > /tmp/breakdown.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(num_frames: int = 512, chunk_size: int = 512,
         width: int = 1280, height: int = 720, templ: int = 80) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops import search as search_ops
    from pvot.ops.ncc_matmul import (
        cross_correlate, make_full_fn, make_region_fn, ncc_map_matmul,
        sliding_box_sums,
    )
    from pvot.tracker.scan import make_masked_scan_fn
    from pvot.tracker.state import StepOutput, TrackerState, init_state
    from pvot.tracker.step import apply_update, make_step

    config = TrackerConfig()
    spec = SyntheticSpec(width=width, height=height, num_frames=num_frames + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state0 = init_state(jnp.asarray(template), (x, y, w, h))

    span_x = 2 * config.search_radius_x + 1
    span_y = 2 * config.search_radius_y + 1
    out_w = width - templ + 1
    out_h = height - templ + 1
    region_fn = make_region_fn(span_x, span_y)
    full_fn = make_full_fn(strip_rows=128)

    def out_like(state, val=None, bx=None, by=None):
        return StepOutput(
            bbox=jnp.stack([bx if bx is not None else state.bbox_x,
                            by if by is not None else state.bbox_y,
                            state.bbox_w, state.bbox_h]),
            score=val if val is not None else jnp.float32(0.0),
            used_global=jnp.bool_(False),
            updated=jnp.bool_(True),
        )

    # --- the ladder ---------------------------------------------------------
    def step_empty(state, frame):
        del frame
        return state, out_like(state)

    def step_frame_sum(state, frame):
        s = jnp.sum(frame.astype(jnp.float32))
        return state, out_like(state, val=s * 0.0)

    def _origin(state):
        cx = state.bbox_x + state.bbox_w // 2
        cy = state.bbox_y + state.bbox_h // 2
        bounds = search_ops.local_window_bounds(
            cx, cy, templ, templ, out_w, out_h,
            config.search_radius_x, config.search_radius_y)
        x0, y0 = search_ops.region_origin(bounds, out_w, out_h, span_x, span_y)
        return bounds, x0, y0

    def _region(state, frame):
        _, x0, y0 = _origin(state)
        region = lax.dynamic_slice(
            frame, (y0, x0), (span_y + templ - 1, span_x + templ - 1))
        return region.astype(jnp.float32) * jnp.float32(1 / 255.0), x0, y0

    def step_region_slice(state, frame):
        region, _, _ = _region(state, frame)
        return state, out_like(state, val=region[0, 0] * 0.0)

    def step_matmul(state, frame):
        region, _, _ = _region(state, frame)
        cov = cross_correlate(region, state.template - state.t_mean)
        return state, out_like(state, val=cov[0, 0] * 0.0)

    def step_integrals(state, frame):
        region, _, _ = _region(state, frame)
        scores = ncc_map_matmul(region, state.template, state.t_mean, state.t_std)
        return state, out_like(state, val=scores[0, 0] * 0.0)

    def step_argmax(state, frame):
        region, x0, y0 = _region(state, frame)
        scores = ncc_map_matmul(region, state.template, state.t_mean, state.t_std)
        bounds, _, _ = _origin(state)
        val, bx, by = search_ops.masked_region_argmax(scores, x0, y0, bounds)
        return state, out_like(state, val=val, bx=bx, by=by)

    def step_update(state, frame):
        frame_f = frame.astype(jnp.float32) * jnp.float32(1 / 255.0)
        bounds, x0, y0 = _origin(state)
        region = lax.dynamic_slice(
            frame_f, (y0, x0), (span_y + templ - 1, span_x + templ - 1))
        scores = ncc_map_matmul(region, state.template, state.t_mean, state.t_std)
        val, bx, by = search_ops.masked_region_argmax(scores, x0, y0, bounds)
        return apply_update(state, frame_f, val, bx, by, jnp.bool_(False),
                            jnp.bool_(False), (height, width), (templ, templ),
                            config)

    step_full = make_step((height, width), (templ, templ), config,
                          ncc_full_fn=full_fn, ncc_region_fn=region_fn,
                          strategy="fused")

    ladder = [
        ("empty", step_empty),
        ("frame_sum", step_frame_sum),
        ("region_slice", step_region_slice),
        ("matmul", step_matmul),
        ("integrals", step_integrals),
        ("argmax", step_argmax),
        ("update", step_update),
        ("full_step", step_full),
    ]

    chunks = [jax.device_put(frames[1 + i : 1 + i + chunk_size])
              for i in range(0, num_frames, chunk_size)]
    valid = jax.device_put(np.ones(chunk_size, bool))
    jax.block_until_ready(chunks[-1])

    scans = {}
    for name, step in ladder:
        scans[name] = make_masked_scan_fn(step, donate=False)

    from pvot.tracker.scan import _pack_outputs, fetch_outputs

    def run(name, fetch):
        st = state0
        outs = []
        for c in chunks:
            st, out = scans[name](st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    # Compile everything (async mode), then flip to synchronous timing.
    for name, _ in ladder:
        run(name, fetch=False)
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results = {}
    prev_us = 0.0
    for name, _ in ladder:
        elapsed = float("inf")
        for _trial in range(2):
            t0 = time.perf_counter()
            host = run(name, fetch=True)
            elapsed = min(elapsed, time.perf_counter() - t0)
        us = elapsed / num_frames * 1e6
        results[name] = {
            "us_per_frame": round(us, 2),
            "delta_us": round(us - prev_us, 2),
            "fps": round(num_frames / elapsed, 1),
        }
        prev_us = us
        print(json.dumps({name: results[name]}), flush=True)
        del host

    print(json.dumps({"breakdown": results}))


if __name__ == "__main__":
    main()
