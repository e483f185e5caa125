"""On-TPU A/B ladder for the headline tracking path.

Measures (same flip protocol as bench.py):
  1. floor amortization: frames 1024 vs 4096 at chunk 512 (the ~30 ms
     relay dispatch+fetch round-trip is a per-run constant, see
     tools/step_breakdown.py: the empty-scan rung costs ~62 us/frame at 512
     frames — pure fixed cost).
  2. matmul precision ladder on the region correlation: HIGHEST (6 bf16
     passes, exact f32) vs HIGH (3) vs DEFAULT (1), with trajectory
     equality and score drift vs the HIGHEST run.
  3. lax.scan unroll=2 at HIGHEST.

Usage: nohup python tools/perf_ab.py > /tmp/perf_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(width: int = 1280, height: int = 720, templ: int = 80,
         chunk_size: int = 512) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_matmul import make_full_fn, make_region_fn
    from pvot.tracker.scan import _pack_outputs, fetch_outputs, make_masked_scan_fn
    from pvot.tracker.state import init_state
    from pvot.tracker.step import make_step

    max_frames = 4096
    config = TrackerConfig()
    spec = SyntheticSpec(width=width, height=height, num_frames=max_frames + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state0 = init_state(jnp.asarray(template), (x, y, w, h))
    span_x = 2 * config.search_radius_x + 1
    span_y = 2 * config.search_radius_y + 1
    full_fn = make_full_fn(strip_rows=128)

    def build(precision, unroll=1):
        region_fn = make_region_fn(span_x, span_y, precision=precision)
        step = make_step((height, width), (templ, templ), config,
                         ncc_full_fn=full_fn, ncc_region_fn=region_fn,
                         strategy="fused")
        return make_masked_scan_fn(step, donate=False, unroll=unroll)

    scan_fns = {
        "highest": build(lax.Precision.HIGHEST),
        "high": build(lax.Precision.HIGH),
        "default": build(lax.Precision.DEFAULT),
        "highest_unroll2": build(lax.Precision.HIGHEST, unroll=2),
    }

    chunks = [jax.device_put(frames[1 + i : 1 + i + chunk_size])
              for i in range(0, max_frames, chunk_size)]
    valid = jax.device_put(np.ones(chunk_size, bool))
    jax.block_until_ready(chunks[-1])

    def run(name, num_frames, fetch=True):
        st = state0
        outs = []
        for c in chunks[: num_frames // chunk_size]:
            st, out = scan_fns[name](st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    cases = [
        ("highest", 1024), ("highest", 4096),
        ("high", 1024), ("default", 1024),
        ("highest_unroll2", 1024),
        ("high", 4096),
    ]
    # Compile everything in async mode.
    for name in scan_fns:
        run(name, chunk_size, fetch=False)
        print(f"compiled {name}", flush=True)
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results = {}
    trajs = {}
    scores = {}
    for name, n in cases:
        elapsed = float("inf")
        host = None
        for _trial in range(2):
            t0 = time.perf_counter()
            host = run(name, n)
            elapsed = min(elapsed, time.perf_counter() - t0)
        errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
                + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
                for i, b in enumerate(np.asarray(host.bbox))]
        key = f"{name}@{n}"
        trajs[key] = np.asarray(host.bbox)
        scores[key] = np.asarray(host.score)
        results[key] = {
            "fps": round(n / elapsed, 1),
            "us_per_frame": round(elapsed / n * 1e6, 2),
            "max_l1_err_px": int(max(errs)),
        }
        print(json.dumps({key: results[key]}), flush=True)

    base_t, base_s = trajs["highest@1024"], scores["highest@1024"]
    for name in ("high", "default", "highest_unroll2"):
        key = f"{name}@1024"
        results[key]["traj_equal_vs_highest"] = bool(
            (trajs[key] == base_t).all())
        results[key]["score_max_abs_diff_vs_highest"] = float(
            np.max(np.abs(scores[key] - base_s)))
    print(json.dumps({"perf_ab": results}))


if __name__ == "__main__":
    main()
