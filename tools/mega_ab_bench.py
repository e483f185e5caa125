"""On-TPU A/B: mega-kernel (whole chunk in ONE pallas_call) vs the
pallas_shear scan engine.

Round-3 question: tools/region_step_breakdown.py pinned the shear engine's
residual cost at ~32 us/frame of scan glue + per-step dispatch around a
~30 us kernel.  The mega-kernel (pvot/ops/ncc_mega.py) moves the whole
local-mode state machine on-chip — scratch state, in-kernel slab DMA,
shear scoring, argmax, EMA — so the per-frame cost should collapse to the
kernel grid step alone.

Protocol as tools/engine_ab_bench.py: one process, stage + compile, flip,
time dispatch->single-fetch, trajectory vs ground truth and bit-equality
across engines.  The mega path additionally reports its poison count
(must be 0 on the synthetic clip — no global frames).

Usage: nohup python tools/mega_ab_bench.py > /tmp/mega_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(width: int = 1280, height: int = 720, templ: int = 80,
         chunk_size: int = 512, max_frames: int = 2048,
         radius: int | None = None, mega_chunks: str = "512,1024") -> None:
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.backends import get_backend
    from pvot.ops.ncc_mega import O_BX, O_POISON, mega_track_chunk
    from pvot.tracker.mega import _state_from_chunk
    from pvot.tracker.scan import _pack_outputs, fetch_outputs, make_masked_scan_fn
    from pvot.tracker.state import init_state
    from pvot.tracker.step import make_step
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    config = TrackerConfig()
    if radius:
        config = TrackerConfig(search_radius_x=radius, search_radius_y=radius)
    spec = SyntheticSpec(width=width, height=height, num_frames=max_frames + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state0 = init_state(jnp.asarray(template), (x, y, w, h))
    geom = ((height, width), (templ, templ))

    # --- scan engine (pallas_shear fused) -----------------------------------
    full_fn, region_fn, argmax_fn = get_backend("pallas_shear", *geom, config)
    step = make_step(*geom, config, ncc_full_fn=full_fn,
                     ncc_region_fn=region_fn, strategy="fused",
                     ncc_region_argmax_fn=argmax_fn)
    scan_fn = make_masked_scan_fn(step, donate=False)

    state_extract = jax.jit(_state_from_chunk)

    def stage(cs):
        cks = [jax.device_put(frames[1 + i : 1 + i + cs])
               for i in range(0, max_frames, cs)]
        jax.block_until_ready(cks[-1])
        return cks

    def run_scan(chunks, valid, fetch=True):
        st = state0
        outs = []
        for c in chunks:
            st, out = scan_fn(st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    def run_mega(chunks, cs, fetch=True):
        st = state0
        rows_all = []
        for c in chunks:
            rows, tplout = mega_track_chunk(
                c,
                jnp.stack([st.bbox_x, st.bbox_y, st.bbox_w, st.bbox_h]
                          ).astype(jnp.int32),
                st.template, st.t_mean, st.t_std, st.lost_count,
                st.use_global, jnp.int32(cs),
                frame_shape=(height, width), templ_shape=(templ, templ),
                config=config,
            )
            st = state_extract(rows, tplout)
            rows_all.append(rows)
        dev = jnp.concatenate(rows_all, axis=0)
        if not fetch:
            return dev
        dev.copy_to_host_async()
        return np.asarray(dev)

    results, trajs = {}, {}
    mega_sizes = [int(s) for s in mega_chunks.split(",")]

    # Compile everything (async mode).
    scan_chunks = stage(chunk_size)
    valid = jax.device_put(np.ones(chunk_size, bool))
    run_scan(scan_chunks, valid, fetch=False)
    print("compiled scan(shear)", flush=True)
    mega_staged = {}
    for cs in mega_sizes:
        mega_staged[cs] = stage(cs) if cs != chunk_size else scan_chunks
        run_mega(mega_staged[cs], cs, fetch=False)
        print(f"compiled mega cs={cs}", flush=True)

    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    def record(name, elapsed, bboxes, extra=None):
        errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
                + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
                for i, b in enumerate(bboxes)]
        trajs[name] = np.asarray(bboxes)
        results[name] = {
            "fps": round(max_frames / elapsed, 1),
            "us_per_frame": round(elapsed / max_frames * 1e6, 2),
            "max_l1_err_px": int(max(errs)),
        }
        if extra:
            results[name].update(extra)
        print(json.dumps({name: results[name]}), flush=True)

    elapsed, host = float("inf"), None
    for _ in range(2):
        t0 = time.perf_counter()
        host = run_scan(scan_chunks, valid)
        elapsed = min(elapsed, time.perf_counter() - t0)
    record("scan_shear", elapsed, np.asarray(host.bbox))

    for cs in mega_sizes:
        elapsed, rows = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = run_mega(mega_staged[cs], cs)
            elapsed = min(elapsed, time.perf_counter() - t0)
        record(
            f"mega_cs{cs}", elapsed, rows[:, O_BX : O_BX + 4].astype(np.int32),
            extra={"poisoned": int((rows[:, O_POISON] != 0).sum())},
        )

    ref = next(iter(trajs))
    for name in results:
        results[name][f"traj_equal_vs_{ref}"] = bool(
            (trajs[name] == trajs[ref]).all()
        )
    tag = f"{width}x{height}_t{templ}_r{radius or 60}"
    print(json.dumps({f"mega_ab_{tag}": results}))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--templ", type=int, default=80)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--radius", type=int, default=None)
    ap.add_argument("--mega-chunks", default="512,1024")
    a = ap.parse_args()
    main(a.width, a.height, a.templ, a.chunk, a.frames, a.radius,
         a.mega_chunks)
