"""Why does S=8 lockstep serving only reach ~7.2k aggregate FPS when one
stream alone does ~10.4k?  Rung ladder on the real chip.

Hypothesis under test: jax.vmap(lax.dynamic_slice) over per-stream origins
lowers to an XLA gather whose TPU lowering is element-granular — the region
extraction, not the NCC math, binds the multi-stream step.

Rungs (all S=8, 720p/80px, chunk 64, 256 frames, fused geometry):
  1. empty        — staged (C, S, H, W) scan, state pass-through
  2. slice        — vmapped dynamic_slice of the (span+t-1)^2 region only,
                    reduced to a scalar (no NCC)
  3. slice_onehot — same extraction via two bf16 one-hot selection matmuls
                    (exact for uint8 values: integers <= 256 are bf16-exact)
  4. ncc_fixed    — full NCC math at a FIXED origin (no gather)
  5. ncc_onehot   — full NCC math on the one-hot-extracted region
  6. full         — the real make_multi_stream_step

Usage: nohup python tools/multi_stream_breakdown.py > /tmp/ms_breakdown.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(num_streams: int = 8, width: int = 1280, height: int = 720,
         templ: int = 80, num_frames: int = 256, chunk: int = 64) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops import search as search_ops
    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.parallel.multi import make_multi_stream_step
    from pvot.tracker.scan import make_masked_scan_fn
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    span = 2 * config.search_radius_x + 1
    region = span + templ - 1  # rows/cols of the candidate region

    spec = SyntheticSpec(width=width, height=height, num_frames=num_frames + 1,
                         target_w=templ, target_h=templ, seed=1)
    base = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    templ_img = gray_u8_to_f32(base[0])[y : y + h, x : x + w]
    one = init_state(jnp.asarray(templ_img), (x, y, w, h))
    states = jax.tree.map(lambda a: jnp.stack([a] * num_streams), one)

    staged = [
        jax.device_put(
            np.broadcast_to(
                base[1 + i : 1 + i + chunk, None],
                (chunk, num_streams, height, width),
            ).copy()
        )
        for i in range(0, num_frames, chunk)
    ]
    valid = jax.device_put(np.ones(chunk, bool))

    def onehot_region(frame_s, y0, x0):
        """(S, H, W) u8, per-stream origins -> (S, region, region) f32/255
        via two selection matmuls (bf16-exact for uint8 values)."""
        ry = jnp.arange(region, dtype=jnp.int32)
        # P_rows[s, r, h] = 1 at h == y0[s] + r      (S, region, H)
        p_rows = (
            (y0[:, None, None] + ry[None, :, None])
            == jnp.arange(height, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        p_cols = (
            (x0[:, None, None] + ry[None, :, None])
            == jnp.arange(width, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)  # (S, region, W)
        fb = frame_s.astype(jnp.bfloat16)
        rows = jnp.einsum("srh,shw->srw", p_rows, fb)  # (S, region, W)
        sub = jnp.einsum("scw,srw->src", p_cols, rows)  # (S, region, region)
        return sub.astype(jnp.float32) * jnp.float32(1.0 / 255.0)

    def make_rung(kind):
        real_step = make_multi_stream_step((height, width), (templ, templ), config)

        def step(states_, frame):  # frame (S, H, W) u8
            if kind == "full":
                return real_step(states_, frame)
            cx = states_.bbox_x + states_.bbox_w // 2
            cy = states_.bbox_y + states_.bbox_h // 2
            out_w = width - templ + 1
            out_h = height - templ + 1
            bounds = search_ops.local_window_bounds(
                cx, cy, templ, templ, out_w, out_h,
                config.search_radius_x, config.search_radius_y,
            )
            x0, y0 = search_ops.region_origin(bounds, out_w, out_h, span, span)
            if kind == "empty":
                score = jnp.zeros((num_streams,), jnp.float32)
            elif kind == "slice":
                sub = jax.vmap(
                    lambda fr, yy, xx: lax.dynamic_slice(
                        fr, (yy, xx), (region, region)
                    )
                )(frame, y0, x0)
                score = jnp.sum(sub.astype(jnp.float32), axis=(1, 2))
            elif kind == "slice_onehot":
                sub = onehot_region(frame, y0, x0)
                score = jnp.sum(sub, axis=(1, 2))
            elif kind == "ncc_fixed":
                sub = frame[:, :region, :region]
                maps = jax.vmap(
                    lambda fr, t, m, s: ncc_map_matmul(fr, t, m, s)
                )(sub, states_.template, states_.t_mean, states_.t_std)
                score = jnp.max(maps, axis=(1, 2))
            elif kind == "ncc_onehot":
                sub = onehot_region(frame, y0, x0)
                maps = jax.vmap(
                    lambda fr, t, m, s: ncc_map_matmul(fr, t, m, s)
                )(sub, states_.template, states_.t_mean, states_.t_std)
                score = jnp.max(maps, axis=(1, 2))
            else:
                raise ValueError(kind)
            from pvot.tracker.state import StepOutput

            out = StepOutput(
                bbox=jnp.stack(
                    [states_.bbox_x, states_.bbox_y,
                     states_.bbox_w, states_.bbox_h], axis=-1,
                ),
                score=score,
                used_global=jnp.zeros((num_streams,), bool),
                updated=jnp.zeros((num_streams,), bool),
            )
            return states_, out

        return make_masked_scan_fn(step, donate=False)

    # One-shot correctness check: one-hot extraction == dynamic_slice.
    f0 = staged[0][0]
    y0c = jnp.array([5 * s for s in range(num_streams)], jnp.int32)
    x0c = jnp.array([7 * s for s in range(num_streams)], jnp.int32)
    a = np.asarray(onehot_region(f0, y0c, x0c))
    b = np.asarray(
        jax.vmap(
            lambda fr, yy, xx: lax.dynamic_slice(fr, (yy, xx), (region, region))
        )(f0, y0c, x0c).astype(jnp.float32)
        * (1.0 / 255.0)
    )
    err = float(np.max(np.abs(a - b)))
    print(f"onehot extraction max abs err vs dynamic_slice: {err:.3g}", flush=True)
    assert err < 1e-7, "one-hot selection must be exact for uint8 values"

    rungs = ["empty", "slice", "slice_onehot", "ncc_fixed", "ncc_onehot", "full"]
    fns = {k: make_rung(k) for k in rungs}

    def run(kind, fetch=True):
        st = states
        outs = []
        for c in staged:
            st, out = fns[kind](st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        if fetch:
            for leaf in jax.tree.leaves(dev):
                leaf.copy_to_host_async()
            return jax.tree.map(np.asarray, jax.device_get(dev))
        return dev

    for k in rungs:
        run(k, fetch=False)
        print(f"compiled {k}", flush=True)
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results = {}
    for k in rungs:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(k)
            best = min(best, time.perf_counter() - t0)
        results[k] = {
            "us_per_scanned_frame": round(best / num_frames * 1e6, 1),
            "aggregate_fps": round(num_frames * num_streams / best, 1),
        }
        print(json.dumps({k: results[k]}), flush=True)
    print(json.dumps({"multi_stream_breakdown": results}))


if __name__ == "__main__":
    main()
