"""Separate the per-DISPATCH relay cost from true per-frame device time.

Round-5 ladder anomaly: the `empty` rung (zero work, no DMA) reads
~9 us/frame at chunk 512, and `empty4` (4 frames per grid step) reads the
SAME — so the floor is not per-grid-step bookkeeping.  Hypothesis: it is
the per-dispatch relay round trip D (each jit call in sync mode blocks on
the tunnel): us/frame = real + D / chunk.

This tool times the PRODUCTION 2-pass kernel (mega_track_chunk) at chunk
sizes C in {256, 512, 1024} on separately staged buffers (~1.9 GB total,
inside the relay guideline), same process, same protocol (n_disp chosen so
every size covers ~8192 frames per region).  A linear fit of us/frame
against 1/C yields D (slope) and the true device time (intercept).

If D dominates, the HEADLINE lever is bigger chunks / fewer dispatches —
not kernel work.  On directly-attached hardware D would be ~0.

Usage: nohup python tools/mega_chunk_scaling.py > /tmp/chunk_scaling.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(width=1280, height=720, templ=80, tier="2pass"):
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_mega import MegaGeometry, mega_track_chunk

    config = TrackerConfig()
    g = MegaGeometry((height, width), (templ, templ), config)
    sizes = [256, 512, 1024]
    spec = SyntheticSpec(width=width, height=height,
                         num_frames=max(sizes) + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    t_mean = np.float32(np.mean(template))
    t_std = np.float32(np.std(template) + 1e-6)

    staged = {}
    for c in sizes:
        padded = np.zeros((c, g.pad_h, g.pad_w), np.uint8)
        padded[:, :height, :width] = frames[1 : 1 + c]
        staged[c] = jax.device_put(padded)
    jax.block_until_ready(staged[sizes[-1]])

    p_bbox = jax.device_put(np.asarray([x, y, w, h], np.int32))
    p_tpl = jax.device_put(np.asarray(template, np.float32))
    p_mean = jax.device_put(t_mean)
    p_std = jax.device_put(t_std)
    p_zero = jax.device_put(np.int32(0))
    p_nv = {c: jax.device_put(np.int32(c)) for c in sizes}
    jax.block_until_ready(p_zero)

    highest = tier == "highest"
    sp = {"2pass": 2, "3pass": 3, "highest": 3}[tier]

    def call(c):
        return mega_track_chunk(
            staged[c], p_bbox, p_tpl, p_mean, p_std, p_zero, p_zero,
            p_nv[c], (height, width), (templ, templ), config,
            highest=highest, score_passes=sp, inkernel_global=True,
        )

    for c in sizes:
        rows, _ = call(c)
        jax.block_until_ready(rows)
        print(f"compiled chunk {c}", flush=True)

    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results = {}
    # Interleave size order across reps so session drift is common-mode.
    for rep in range(3):
        for c in sizes:
            n_disp = max(1, 8192 // c)
            t0 = time.perf_counter()
            sums = []
            for _ in range(n_disp):
                rows, _tpl = call(c)
                sums.append(jnp.sum(rows[:, 4]))
            s = float(jnp.stack(sums).sum().block_until_ready())
            us = (time.perf_counter() - t0) / (c * n_disp) * 1e6
            results.setdefault(c, []).append(round(us, 2))
            print(json.dumps({"chunk": c, "rep": rep,
                              "us_per_frame": round(us, 2),
                              "chk": s}), flush=True)

    best = {c: min(v) for c, v in results.items()}
    # Fit us = real + D / C  (least squares over 1/C).
    inv = np.array([1.0 / c for c in sizes])
    ys = np.array([best[c] for c in sizes])
    a = np.vstack([inv, np.ones_like(inv)]).T
    (slope, intercept), *_ = np.linalg.lstsq(a, ys, rcond=None)
    print(json.dumps({
        "tier": tier,
        "best_us_per_frame": best,
        "per_dispatch_ms": round(slope / 1000.0, 3),
        "device_us_per_frame": round(float(intercept), 2),
        "all": results,
    }))


if __name__ == "__main__":
    main()
