"""Serving: S independent video streams on one chip via the multi-stream
mega kernel.

Every chunk of every stream runs in ONE pallas_call (grid (S, F), frame
axis innermost — pvot/ops/ncc_mega.py `mega_track_chunk_multi`), so each
stream tracks at the single-stream mega rate: 19-24k aggregate 720p FPS
at HIGHEST parity on one v5e chip, ~30k on the fast tier
(docs/PERFORMANCE.md "Saturation point").  On geometries outside the
mega envelope — or if the per-geometry compile+numerics probe fails —
`track_streams_mega` transparently falls back to the per-stream scan
engines with the same output contract.

Run:  python examples/serving_multistream.py
(CPU-safe: the probe fails fast on non-TPU backends and the scan
fallback serves the same results.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pvot
from pvot.io.gray import gray_u8_to_f32
from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox

S = 4  # independent streams (each with its own template and trajectory)
specs = [
    SyntheticSpec(width=640, height=480, num_frames=80,
                  target_w=48, target_h=48, seed=10 + s)
    for s in range(S)
]
videos = np.stack([generate_gray_video(spec) for spec in specs])

# One tracker state per stream, stacked along a leading S axis (the same
# layout pvot.parallel.multi.init_multi_state produces).
states = []
for s, spec in enumerate(specs):
    x, y, w, h = target_bbox(spec, 0)
    templ = jnp.asarray(gray_u8_to_f32(videos[s, 0])[y : y + h, x : x + w])
    states.append(pvot.init_state(templ, (x, y, w, h)))
states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

final, out = pvot.track_streams_mega(videos[:, 1:], states, chunk_size=32)

# out.* carry an (F, S) leading layout — one row per frame per stream.
errs = np.zeros(S, int)
for s, spec in enumerate(specs):
    want = np.array([target_bbox(spec, i + 1)[:2] for i in range(79)])
    errs[s] = np.abs(out.bbox[:, s, :2] - want).max()
print(f"streams={S} frames/stream={out.bbox.shape[0]} "
      f"max_err_px per stream={errs.tolist()}")
assert (errs <= 2).all()
print("serving example OK")
