"""On-chip validation + bench of the reworked Pallas kernel (ty tiles +
Hankel Toeplitz build), plus library-drive verification and chunk staging
timings.

Usage: nohup python tools/pallas_ty_bench.py > /tmp/pallas_ty.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import pvot
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox

    # 1. Pallas support probe (compiles + numerics on the real chip).
    from pvot.ops.ncc_pallas import _SUPPORT_CACHE, ncc_map_pallas, pallas_supported

    ok = pallas_supported()
    print(json.dumps({"pallas_supported": ok}), flush=True)
    if not ok:
        print(_SUPPORT_CACHE.get("last_error", "?"), flush=True)

    # 2. On-chip parity: region-sized and strip-sized maps vs matmul engine.
    from pvot.ops.ncc_matmul import ncc_map_matmul

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((200, 200), np.float32))
    templ = jnp.asarray(rng.random((80, 80), np.float32))
    a = np.asarray(ncc_map_pallas(img, templ))
    b = np.asarray(ncc_map_matmul(img, templ))
    print(json.dumps({"region_parity_max_abs_err": float(np.max(np.abs(a - b)))}),
          flush=True)
    img2 = jnp.asarray(rng.random((720, 1280), np.float32))
    a2 = np.asarray(ncc_map_pallas(img2, templ))
    b2 = np.asarray(ncc_map_matmul(img2, templ, strip_rows=128))
    print(json.dumps({"full_parity_max_abs_err": float(np.max(np.abs(a2 - b2)))}),
          flush=True)

    # 3. Library drive (verify skill): 100-frame tracked trajectory.
    spec = SyntheticSpec(width=1280, height=720, num_frames=100,
                         target_w=80, target_h=80, seed=1)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    state = pvot.init_state(
        jnp.asarray(gray_u8_to_f32(frames[0])[y : y + h, x : x + w]),
        (x, y, w, h),
    )
    _, out = pvot.track_video(frames[1:], state)
    errs = [abs(int(b[0]) - target_bbox(spec, i + 1)[0])
            + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
            for i, b in enumerate(np.asarray(out.bbox))]
    print(json.dumps({"track_video_max_l1_err_px": int(max(errs))}), flush=True)

    # 4. Staging timings: how long does device_put of 512-frame chunks take?
    spec_big = SyntheticSpec(width=1280, height=720, num_frames=2049,
                             target_w=80, target_h=80, seed=1)
    t0 = time.perf_counter()
    big = generate_gray_video(spec_big)
    t_gen = time.perf_counter() - t0
    t0 = time.perf_counter()
    chunks = [jax.device_put(big[1 + i : 1 + i + 512]) for i in range(0, 2048, 512)]
    jax.block_until_ready(chunks[-1])
    t_put = time.perf_counter() - t0
    print(json.dumps({"gen_2048_s": round(t_gen, 1),
                      "device_put_2048_s": round(t_put, 1),
                      "upload_gb_s": round(big.nbytes / 1e9 / t_put, 2)}),
          flush=True)

    # 5. Tracked FPS through the pallas backend (the --shared/--const modes),
    #    flip protocol, 512 frames.
    from pvot.config import TrackerConfig
    from pvot.ops.backends import get_backend
    from pvot.tracker.scan import _pack_outputs, fetch_outputs, make_masked_scan_fn
    from pvot.tracker.state import init_state
    from pvot.tracker.step import make_step

    config = TrackerConfig()
    template = gray_u8_to_f32(big[0])[y : y + h, x : x + w]
    st0 = init_state(jnp.asarray(template), (x, y, w, h))
    full_fn, region_fn, _ = get_backend("pallas", (720, 1280), (h, w), config)
    step = make_step((720, 1280), (h, w), config,
                     ncc_full_fn=full_fn, ncc_region_fn=region_fn,
                     strategy="fused")
    scan_fn = make_masked_scan_fn(step, donate=False)
    valid = jax.device_put(np.ones(512, bool))

    def run(fetch, n_chunks):
        st = st0
        outs = []
        for c in chunks[:n_chunks]:
            st, o = scan_fn(st, c, valid)
            outs.append(o)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    run(False, 1)
    flip = jax.jit(lambda m: m @ m)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    elapsed = float("inf")
    host = None
    for _ in range(2):
        t0 = time.perf_counter()
        host = run(True, 4)
        elapsed = min(elapsed, time.perf_counter() - t0)
    errs = [abs(int(b[0]) - target_bbox(spec_big, i + 1)[0])
            + abs(int(b[1]) - target_bbox(spec_big, i + 1)[1])
            for i, b in enumerate(np.asarray(host.bbox))]
    print(json.dumps({"pallas_tracked_fps_2048": round(2048 / elapsed, 1),
                      "us_per_frame": round(elapsed / 2048 * 1e6, 2),
                      "max_l1_err_px": int(max(errs))}),
          flush=True)


if __name__ == "__main__":
    main()
