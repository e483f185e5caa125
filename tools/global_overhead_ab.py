"""A/B: what do CLEAN (never-global) clips pay for the in-kernel global
search being compiled into the mega kernel?

The round-4 in-kernel global-search variant adds, per scored frame, a few
scalar ops (mode selection already existed), an SMEM fold init, and a
dormant `pl.when(do_global)` strip loop.  On clean clips the predicate is
always false, so the expected cost is ~0 — but "expected" is not a
number, and the auto mode (pvot.tracker.mega.mega_mode) makes the global
kernel the DEFAULT whenever its probe passes, so the clean-path cost must
be measured on the chip (docs/PERFORMANCE.md rule 4: A/Bs within ONE
process only).

Protocol: stage a 720p/80x80 clean synthetic clip device-side, warm both
kernels (compiles + probes outside timing), flip with a tiny fetch, then
time N alternating runs of track_video_mega with inkernel_global pinned
False (poison kernel, never poisons here) and True (global kernel,
dormant branch).  Trajectories are asserted identical.

Run on the real TPU:
  nohup python tools/global_overhead_ab.py > /tmp/goab.log 2>&1 &

Verdict (TPU v5e relay, 2026-08-19, /tmp/goab.log, 1024 frames x 3 reps,
chunk_size=64 — the per-dispatch-bound regime, fine for a RELATIVE A/B):
  poison_kernel: median 444.92 us/frame  runs=[0.3568, 0.4556, 0.4884] s
  global_kernel: median 402.61 us/frame  runs=[0.3987, 0.4359, 0.4123] s
Trajectories identical (asserted).  The run ranges overlap completely:
the dormant global branch costs ~ZERO on clean clips (the -9% median is
session noise).  ADOPTED — mega_mode makes the in-kernel global kernel
the default wherever its probe passes.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = 1024
REPS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import (
        SyntheticSpec,
        generate_gray_video,
        target_bbox,
    )
    from pvot.tracker.mega import track_video_mega
    from pvot.tracker.state import init_state

    print(f"backend: {jax.default_backend()}", flush=True)
    config = TrackerConfig()
    spec = SyntheticSpec(
        width=1280, height=720, num_frames=FRAMES + 1, target_w=80,
        target_h=80, seed=1,
    )
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state = init_state(jnp.asarray(template), (x, y, w, h))
    staged = jax.device_put(frames[1:])
    jax.block_until_ready(staged)

    def run(ikg: bool):
        return track_video_mega(
            staged, state, config, chunk_size=64, _probe=True,
            inkernel_global=ikg,
        )

    # Warm both kernels (compile), flip with the runs' own record fetches.
    base = run(False)
    glob = run(True)
    assert np.array_equal(base[1].bbox, glob[1].bbox), "trajectory mismatch"
    assert not glob[1].used_global.any(), "clean clip must stay local"

    results: dict = {"poison_kernel": [], "global_kernel": []}
    for _ in range(REPS):
        for name, ikg in (("poison_kernel", False), ("global_kernel", True)):
            t0 = time.perf_counter()
            run(ikg)
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        print(
            f"{name}: median {med * 1e6 / FRAMES:.2f} us/frame "
            f"({FRAMES / med:,.0f} FPS)  runs={[round(t, 4) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
