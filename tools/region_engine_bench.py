"""In-scan A/B of region cross-correlation engines (im2col vs conv1d).

The standalone microbench is dispatch-bound; this benches the engines
inside the real scanned tracker at headline geometry (720p/80px), where
dispatch amortizes over the chunk.  Run on the real TPU.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_engine(cross_fn_name: str, num_frames=512, chunk=128):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot import ops
    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops import ncc_matmul
    from pvot.ops.ncc_matmul import ncc_map_matmul, sliding_box_sums
    from pvot.tracker.scan import _pack_outputs, fetch_outputs, make_masked_scan_fn
    from pvot.tracker.state import init_state
    from pvot.tracker.step import make_step

    cross = getattr(ncc_matmul, cross_fn_name)
    config = TrackerConfig()
    span_x = 2 * config.search_radius_x + 1
    span_y = 2 * config.search_radius_y + 1

    def region_fn(frame, templ, t_mean, t_std, x0, y0):
        th, tw = templ.shape
        region = lax.dynamic_slice(
            frame, (y0, x0), (span_y + th - 1, span_x + tw - 1)
        )
        n = float(th * tw)
        t_centered = templ - t_mean
        cov = cross(region, t_centered)
        sums, ssq = sliding_box_sums(region, th, tw)
        mean = sums / n
        var = ssq / n - jnp.square(mean)
        std = jnp.sqrt(jnp.maximum(var, 1e-6))
        return cov / ((std + 1e-6) * (t_std + 1e-6) * n)

    full_fn = lambda f, t, m, s: ncc_map_matmul(f, t, m, s, strip_rows=128)

    spec = SyntheticSpec(width=1280, height=720, num_frames=num_frames + 1,
                         target_w=80, target_h=80, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y:y + h, x:x + w]
    state = init_state(jnp.asarray(template), (x, y, w, h))
    step = make_step((720, 1280), (h, w), config,
                     ncc_full_fn=full_fn, ncc_region_fn=region_fn,
                     strategy="fused")
    scan_fn = make_masked_scan_fn(step)
    chunks = [jax.device_put(frames[1 + i: 1 + i + chunk])
              for i in range(0, num_frames, chunk)]
    valid = jax.device_put(np.ones(chunk, bool))

    def run(fetch):
        st = state
        outs = []
        for c in chunks:
            st, out = scan_fn(st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    run(False)
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    _ = np.asarray(flip)
    best, host = float("inf"), None
    for _ in range(3):
        t0 = time.perf_counter()
        host = run(True)
        best = min(best, time.perf_counter() - t0)
    errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
            + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
            for i, b in enumerate(np.asarray(host.bbox))]
    print(f"{cross_fn_name}: {num_frames / best:.1f} FPS "
          f"({best / num_frames * 1e3:.4f} ms/frame), max_err={max(errs)}")
    return num_frames / best


def main():
    a = bench_engine("cross_correlate")
    b = bench_engine("cross_correlate_conv1d")
    print(f"conv1d speedup: {b / a:.3f}x")


if __name__ == "__main__":
    main()
