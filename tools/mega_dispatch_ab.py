"""Dispatch-count A/B for the mega path: is the remaining per-frame cost
device compute or relay dispatch overhead?

tools/mega_breakdown.py put the mega kernel's on-device compute at
~26 us/frame (score 18 + argmax 3.9 + EMA 3.6 + DMA/convert/rolls) but
the production path measures ~55 us/frame — the gap smells like the
per-chunk dispatch + state-extract RPCs (4 chunks = ~10 round trips).

Three variants in ONE process on the same staged chunks:

  floor    — a trivial jit touching all 4 chunks: 1 dispatch + 1 fetch,
             anchors the process's current fixed cost
  mega_4d  — production shape: one mega_track_chunk dispatch per chunk +
             per-chunk state extract, one packed fetch (what bench.py does)
  mega_1d  — ALL chunks inside one jit (unrolled chunk loop, state
             extraction fused in): 1 dispatch + 1 fetch total

Usage: nohup python tools/mega_dispatch_ab.py > /tmp/mega_dab.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(width=1280, height=720, templ=80, chunk=512, frames_total=2048):
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_mega import O_BX, mega_track_chunk
    from pvot.tracker.mega import _state_from_chunk
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    spec = SyntheticSpec(width=width, height=height,
                         num_frames=frames_total + 1,
                         target_w=templ, target_h=templ, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state0 = init_state(jnp.asarray(template), (x, y, w, h))
    n_chunks = frames_total // chunk
    chunks = [jax.device_put(frames[1 + i * chunk : 1 + (i + 1) * chunk])
              for i in range(n_chunks)]
    jax.block_until_ready(chunks[-1])

    kw = dict(frame_shape=(height, width), templ_shape=(templ, templ),
              config=config)
    state_extract = jax.jit(_state_from_chunk)

    def run_4d(fetch=True):
        st = state0
        rows_all = []
        for c in chunks:
            rows, tplout = mega_track_chunk(
                c,
                jnp.stack([st.bbox_x, st.bbox_y, st.bbox_w, st.bbox_h]
                          ).astype(jnp.int32),
                st.template, st.t_mean, st.t_std, st.lost_count,
                st.use_global, jnp.int32(chunk), **kw)
            st = state_extract(rows, tplout)
            rows_all.append(rows)
        dev = jnp.concatenate(rows_all, axis=0)
        if not fetch:
            return dev
        dev.copy_to_host_async()
        return np.asarray(dev)

    @jax.jit
    def one_dispatch(st, *cks):
        rows_all = []
        for c in cks:  # static unroll: one XLA program, N pallas_calls
            rows, tplout = mega_track_chunk(
                c,
                jnp.stack([st.bbox_x, st.bbox_y, st.bbox_w, st.bbox_h]
                          ).astype(jnp.int32),
                st.template, st.t_mean, st.t_std, st.lost_count,
                st.use_global, jnp.int32(chunk), **kw)
            st = _state_from_chunk(rows, tplout)
            rows_all.append(rows)
        return jnp.concatenate(rows_all, axis=0)

    def run_1d(fetch=True):
        dev = one_dispatch(state0, *chunks)
        if not fetch:
            return dev
        dev.copy_to_host_async()
        return np.asarray(dev)

    @jax.jit
    def floor_prog(*cks):
        return sum(jnp.float32(c[0, 0, 0]) for c in cks)

    def run_floor(fetch=True):
        dev = floor_prog(*chunks)
        if not fetch:
            return dev
        return float(dev)

    # Compile everything (async), then flip.
    run_floor(fetch=False)
    run_4d(fetch=False)
    print("compiled 4d", flush=True)
    run_1d(fetch=False)
    print("compiled 1d", flush=True)
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results = {}

    def record(name, fn, trials=3):
        best, out = float("inf"), None
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        results[name] = {
            "us_per_frame": round(best / frames_total * 1e6, 2),
            "total_ms": round(best * 1e3, 2),
        }
        print(json.dumps({name: results[name]}), flush=True)
        return out

    record("floor", run_floor)
    rows4 = record("mega_4dispatch", run_4d)
    rows1 = record("mega_1dispatch", run_1d)

    bb4 = rows4[:, O_BX : O_BX + 4].astype(np.int32)
    bb1 = rows1[:, O_BX : O_BX + 4].astype(np.int32)
    errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
            + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
            for i, b in enumerate(bb1)]
    results["traj_equal"] = bool((bb4 == bb1).all())
    results["max_l1_err_px"] = int(max(errs))
    results["fps_1d"] = round(
        frames_total / (results["mega_1dispatch"]["us_per_frame"] * 1e-6)
        / frames_total, 1)
    print(json.dumps({"mega_dispatch_ab": results}))


if __name__ == "__main__":
    main()
