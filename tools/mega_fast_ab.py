"""On-TPU A/B of the two round-3 mega-kernel levers left by
tools/mega_dispatch_ab.py's attribution (52 us/f = 14.7 relay floor +
~37 device):

  prepad    — frames staged HOST-padded to (pad_h, pad_w), removing the
              in-jit jnp.pad's ~2 GB/chunk device copy (~2.4 us/f)
  fast tier — highest=False: the shear correlation runs as a 3-pass bf16
              hi/lo decomposition instead of HIGHEST's 6 passes (the
              score loop was +18.0 us/f in tools/mega_breakdown.py)

Variants (one process, same 2.1 GB pre-padded staging, cs=512 x 4 chunks,
one packed fetch):

  mega_hi_prepad    HIGHEST + prepad
  mega_fast_prepad  hi/lo   + prepad

Trajectory: both checked against ground truth; bit-equality between the
two recorded (the fast tier's trajectory identity is a measured per-clip
property, like every fast engine).

Usage: nohup python tools/mega_fast_ab.py > /tmp/mega_fab.log 2>&1 &
"""

from __future__ import annotations

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
    from pvot.ops.ncc_mega import MegaGeometry, O_BX, O_POISON, mega_track_chunk
    from pvot.tracker.mega import _state_from_chunk
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    g = MegaGeometry((height, width), (templ, templ), config)
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

    def make_run(highest, score_passes=3):
        def run(fetch=True):
            st = state0
            rows_all = []
            for c in chunks:
                rows, tplout = mega_track_chunk(
                    c,
                    jnp.stack([st.bbox_x, st.bbox_y, st.bbox_w, st.bbox_h]
                              ).astype(jnp.int32),
                    st.template, st.t_mean, st.t_std, st.lost_count,
                    st.use_global, jnp.int32(chunk), highest=highest,
                    score_passes=score_passes, **kw)
                st = state_extract(rows, tplout)
                rows_all.append(rows)
            dev = jnp.concatenate(rows_all, axis=0)
            if not fetch:
                return dev
            dev.copy_to_host_async()
            return np.asarray(dev)
        return run

    runs = {
        "mega_hi_prepad": make_run(True),
        "mega_fast_prepad": make_run(False),
        # round 4: 2-pass tier — drop the wl@tth term (window effectively
        # bf16, template hi+lo); adopt only if the trajectory stays
        # bit-equal here AND on the fuzz seeds.
        "mega_fast2_prepad": make_run(False, score_passes=2),
        # round 5: 1-pass tier — plain bf16 x bf16 correlation (template
        # low half dropped too); ~1e-3 score perturbation, adopted only
        # under the trajectory guard.
        "mega_fast1_prepad": make_run(False, score_passes=1),
    }
    for name, run in runs.items():
        run(fetch=False)
        print(f"compiled {name}", flush=True)

    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results, trajs = {}, {}
    for name, run in runs.items():
        best, rows = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = run()
            best = min(best, time.perf_counter() - t0)
        bb = rows[:, O_BX : O_BX + 4].astype(np.int32)
        errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
                + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
                for i, b in enumerate(bb)]
        trajs[name] = bb
        results[name] = {
            "fps": round(frames_total / best, 1),
            "us_per_frame": round(best / frames_total * 1e6, 2),
            "max_l1_err_px": int(max(errs)),
            "poisoned": int((rows[:, O_POISON] != 0.0).sum()),
        }
        print(json.dumps({name: results[name]}), flush=True)

    names = list(runs)
    for other in names[1:]:
        results[f"traj_equal_hi_vs_{other}"] = bool(
            (trajs[names[0]] == trajs[other]).all()
        )
    print(json.dumps({"mega_fast_ab": results}))


if __name__ == "__main__":
    main()
