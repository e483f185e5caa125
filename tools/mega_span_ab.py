"""On-TPU A/B of the round-4 SPAN-TILED mega kernel at the blueprint's
r160 stress geometry (BASELINE.json config 4: radius 160 -> span 321,
nx=3 output tiles, ty=328) — the one config the round-3 mega envelope
excluded (VERDICT item 1).

Variants (one process, same staging, trajectory-checked per run):
  shear_scan   — the round-3 serving engine for this geometry (baseline;
                 suite rows measured 2,531 FPS at 1080p / 1,986 at 4K)
  mega_highest — span-tiled mega kernel, full HIGHEST parity
  mega_fast    — 3-pass bf16 hi/lo tier

Round-4 verdicts (fresh process, 256 frames, all 0 px):
  mega_fast 4,327 FPS (231.1 us/frame) vs shear_scan 2,965 (337.2) —
  1.46x in-process, 1.71x the committed round-3 suite row.
  mega_highest: relay compile HTTP 500 (see tools/span probe + the
  envelope note in pvot/ops/ncc_mega.py).  A box_band variant (banded-MXU
  vertical box sums) lost here too (237.4 us/frame) and was deleted.

Usage: nohup python tools/mega_span_ab.py > /tmp/mega_span.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(width=1920, height=1080, templ=80, radius=160, chunk=64,
         frames_total=256):
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_mega import MegaGeometry, O_BX, O_POISON, mega_track_chunk
    from pvot.tracker.mega import _state_from_chunk
    from pvot.tracker.state import init_state

    config = TrackerConfig(search_radius_x=radius, search_radius_y=radius)
    g = MegaGeometry((height, width), (templ, templ), config)
    print(json.dumps({"geometry": {
        "nx": g.nx, "ty": g.ty, "slab": [g.slab_h, g.slab_w],
        "pad": [g.pad_h, g.pad_w], "supported": g.supported(),
    }}), flush=True)
    spec = SyntheticSpec(width=width, height=height,
                         num_frames=frames_total + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state0 = init_state(jnp.asarray(template), (x, y, w, h))
    n_chunks = frames_total // chunk

    padded = np.zeros((frames_total, g.pad_h, g.pad_w), np.uint8)
    padded[:, :height, :width] = frames[1:]
    chunks = [jax.device_put(padded[i * chunk : (i + 1) * chunk])
              for i in range(n_chunks)]
    del padded
    jax.block_until_ready(chunks[-1])
    print("staged pre-padded", flush=True)

    state_extract = jax.jit(_state_from_chunk)
    kw = dict(frame_shape=(height, width), templ_shape=(templ, templ),
              config=config)

    def make_mega_run(**flags):
        def run(fetch=True):
            st = state0
            rows_all = []
            for c in chunks:
                rows, tplout = mega_track_chunk(
                    c,
                    jnp.stack([st.bbox_x, st.bbox_y, st.bbox_w, st.bbox_h]
                              ).astype(jnp.int32),
                    st.template, st.t_mean, st.t_std, st.lost_count,
                    st.use_global, jnp.int32(chunk), **flags, **kw)
                st = state_extract(rows, tplout)
                rows_all.append(rows)
            dev = jnp.concatenate(rows_all, axis=0)
            if not fetch:
                return dev
            dev.copy_to_host_async()
            return np.asarray(dev)
        return run

    def make_scan_run():
        # The shear scan engine on the same (unpadded slice of the) clip.
        from pvot.ops.backends import get_backend
        from pvot.tracker.scan import (
            _pack_outputs, fetch_outputs, make_masked_scan_fn,
        )
        from pvot.tracker.step import make_step

        full_fn, region_fn, argmax_fn = get_backend(
            "pallas_shear", (height, width), (h, w), config
        )
        step = make_step(
            (height, width), (h, w), config,
            ncc_full_fn=full_fn, ncc_region_fn=region_fn, strategy="fused",
            ncc_region_argmax_fn=argmax_fn,
        )
        scan_fn = make_masked_scan_fn(step, donate=False)
        scan_chunks = [
            jax.device_put(frames[1 + i : 1 + i + chunk])
            for i in range(0, frames_total, chunk)
        ]
        jax.block_until_ready(scan_chunks[-1])
        valid = jax.device_put(np.ones(chunk, bool))

        def run(fetch=True):
            st = state0
            outs = []
            for c in scan_chunks:
                st, out = scan_fn(st, c, valid)
                outs.append(out)
            dev = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs
            )
            return fetch_outputs(dev) if fetch else _pack_outputs(dev)
        return run

    runs = {
        "mega_highest": (make_mega_run(highest=True), "mega"),
        "mega_fast": (make_mega_run(highest=False), "mega"),
        "shear_scan": (make_scan_run(), "scan"),
    }
    live = {}
    for name, (run, kind) in runs.items():
        try:
            run(fetch=False)
            live[name] = (run, kind)
            print(f"compiled {name}", flush=True)
        except Exception as e:
            print(json.dumps({name: {"error": f"{type(e).__name__}: {e}"[:200]}}),
                  flush=True)

    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results, trajs = {}, {}
    for name, (run, kind) in live.items():
        best, out = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            best = min(best, time.perf_counter() - t0)
        if kind == "mega":
            bb = out[:, O_BX : O_BX + 4].astype(np.int32)
            poisoned = int((out[:, O_POISON] != 0.0).sum())
        else:
            bb = np.asarray(out.bbox).astype(np.int32)
            poisoned = 0
        errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
                + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
                for i, b in enumerate(bb)]
        trajs[name] = bb
        results[name] = {
            "fps": round(frames_total / best, 1),
            "us_per_frame": round(best / frames_total * 1e6, 2),
            "max_l1_err_px": int(max(errs)),
            "poisoned": poisoned,
        }
        print(json.dumps({name: results[name]}), flush=True)

    for name in trajs:
        if name != "mega_highest" and "mega_highest" in trajs:
            results[f"traj_equal_{name}"] = bool(
                (trajs["mega_highest"] == trajs[name]).all()
            )
    print(json.dumps({"mega_span_ab": results}))


if __name__ == "__main__":
    main()
