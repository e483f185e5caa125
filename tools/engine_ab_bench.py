"""On-TPU A/B: matmul engines vs Pallas unfused vs Pallas fused-argmax.

Round-3 question (VERDICT item 1): does moving the masked argmax +
confidence reduction INSIDE the Pallas kernel — so only (val, x, y) leaves
the chip — push the Pallas engine past the matmul engine at the headline
geometry (720p, 80x80 template, radius 60)?  Round-2 standings at that
geometry: matmul fast 10.4k FPS > matmul highest ~9.3k > pallas unfused
5.5k (the kernel pays a ~10.5 MB Toeplitz-operator rebuild per
template-update frame AND round-trips the score map through HBM for the
XLA-side argmax).

All variants run in ONE process minutes apart (the relay degrades across a
session; cross-process numbers do not compare), 2048 frames at chunk 512,
flip protocol, trajectory checked against synthetic ground truth and for
bit-equality against the HIGHEST matmul engine.

Usage: nohup python tools/engine_ab_bench.py > /tmp/engine_ab.log 2>&1 &
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
         radius: int | None = None, engines: str = "all") -> None:
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.backends import get_backend
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

    def build(backend, use_fused):
        full_fn, region_fn, argmax_fn = get_backend(backend, *geom, config)
        step = make_step(
            *geom, config, ncc_full_fn=full_fn, ncc_region_fn=region_fn,
            strategy="fused",
            ncc_region_argmax_fn=argmax_fn if use_fused else None,
        )
        return make_masked_scan_fn(step, donate=False)

    all_engines = {
        "matmul_highest": ("xla", False),
        "matmul_fast": ("fast", False),
        "pallas_unfused": ("pallas", False),
        "pallas_fused": ("pallas", True),
        # Round-3b: in-kernel 3-pass bf16 hi/lo correlation (_dot_hl3).
        "pallas_fast_fused": ("pallas_fast", True),
        # Round-3c: operator-free shear kernel (strided-roll Toeplitz in
        # registers; no operator build, no operator DMA) at full HIGHEST.
        "pallas_shear_fused": ("pallas_shear", True),
        # Round-5: the mega kernel as an A/B engine (whole chunk in one
        # pallas_call) — for envelope-extension rows like 1080p/t160/r160
        # where the VERDICT target is beating the shear scan engine.
        "mega": ("mega", True),
        "mega_fast": ("mega", False),  # 2-pass bf16 hi/lo tier
    }
    wanted = all_engines if engines == "all" else {
        k: all_engines[k] for k in engines.split(",")
    }
    scan_fns = {
        k: build(b, f) for k, (b, f) in wanted.items() if b != "mega"
    }

    chunks = [jax.device_put(frames[1 + i : 1 + i + chunk_size])
              for i in range(0, max_frames, chunk_size)]
    valid = jax.device_put(np.ones(chunk_size, bool))
    jax.block_until_ready(chunks[-1])

    mega_runners = {}
    if any(b == "mega" for b, _ in wanted.values()):
        from bench import _make_mega_runner
        from pvot.ops.ncc_mega import MegaGeometry

        g = MegaGeometry((height, width), (templ, templ), config)
        assert g.supported(), "geometry outside the mega envelope"
        padded = np.zeros((max_frames, g.pad_h, g.pad_w), np.uint8)
        padded[:, :height, :width] = frames[1 : 1 + max_frames]
        mchunks = [
            jax.device_put(padded[i : i + chunk_size])
            for i in range(0, max_frames, chunk_size)
        ]
        jax.block_until_ready(mchunks[-1])
        del padded
        for k, (b, highest) in wanted.items():
            if b != "mega":
                continue
            mega_runners[k] = _make_mega_runner(
                mchunks, state0, (height, width), (templ, templ),
                chunk_size, config, highest=highest, passes=1,
                score_passes=2,
            )

    def run(name, fetch=True):
        if name in mega_runners:
            return mega_runners[name][0](fetch=fetch)
        st = state0
        outs = []
        for c in chunks:
            st, out = scan_fns[name](st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    for name in wanted:
        run(name, fetch=False)
        print(f"compiled {name}", flush=True)
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results, trajs = {}, {}
    for name in wanted:
        elapsed = float("inf")
        host = None
        for _trial in range(2):
            t0 = time.perf_counter()
            host = run(name)
            elapsed = min(elapsed, time.perf_counter() - t0)
        if name in mega_runners:
            bboxes, _upd, _extras = mega_runners[name][2](host)
        else:
            bboxes = np.asarray(host.bbox)
        errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
                + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
                for i, b in enumerate(bboxes)]
        trajs[name] = np.asarray(bboxes)
        results[name] = {
            "fps": round(max_frames / elapsed, 1),
            "us_per_frame": round(elapsed / max_frames * 1e6, 2),
            "max_l1_err_px": int(max(errs)),
        }
        print(json.dumps({name: results[name]}), flush=True)

    ref_name = next(iter(trajs))
    for name in wanted:
        results[name][f"traj_equal_vs_{ref_name}"] = bool(
            (trajs[name] == trajs[ref_name]).all()
        )
    tag = f"{width}x{height}_t{templ}_r{radius or 60}"
    print(json.dumps({f"engine_ab_{tag}": results}))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--templ", type=int, default=80)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--radius", type=int, default=None)
    ap.add_argument("--engines", default="all")
    a = ap.parse_args()
    main(a.width, a.height, a.templ, a.chunk, a.frames, a.radius, a.engines)
