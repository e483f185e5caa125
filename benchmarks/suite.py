"""Benchmark suite: every BASELINE.json config.

  1. 720p --cpu parity path (full-map TM_CCOEFF_NORMED + windowed argmax)
  2. 720p fused NCC with adaptive template update       <- bench.py headline
  3. batch mode N in {4, 8, 16, 32} (look-ahead dispatch, parity semantics)
  4. 1080p and 4K with a 160 px search radius (HBM/tiling stress)
  5. multi-object: 8 templates per frame via vmap
  6. multi-stream: 8 independent 720p streams in lockstep (serving)
  7. stream saturation sweep S in {8, 16, 32, 64} with MFU accounting
  8. streams x batch combined (32 streams, batch 4, C10 parity semantics)
  9. Pallas engine (--shared/--const/--const_tiled) + on-device parity
 10. mode-flag comparison table (--cpu/--cuda/--fast/--shared, one row
     each at identical geometry — the reference README.md:128-137 analog)

Run:  python benchmarks/suite.py [--configs 1,2,3] [--frames N]
Prints one JSON line per config and writes benchmarks/results.json.
Regenerate the docs table from results.json with benchmarks/report.py.

Timing protocol per bench.py: stage + compile (async), flip the relay to
synchronous mode, then time dispatch + one packed fetch; best of two.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_FPS = 12.15  # README.md:101-117 example session, --shared mode

# TPU v5e peaks for MFU accounting.  The MXU's native multiply is bf16 with
# f32 accumulation; a precision=HIGHEST f32 matmul (what the parity path
# uses) decomposes into 6 bf16 passes, so its effective peak is ~1/6.
V5E_BF16_PEAK = 394e12
V5E_F32_HIGHEST_PEAK = V5E_BF16_PEAK / 6


def fused_region_flops(templ: int, radius: int) -> float:
    """FLOPs per frame per stream of the fused local-search path.

    Dominated by the im2col-x matmul over the (span + t - 1)^2 region; the
    shifted adds, two integral images, and the normalization are noise.
    """
    span = 2 * radius + 1
    rows = span + templ - 1
    mm = 2.0 * rows * span * templ * templ  # dot_general MACs
    adds = float(templ) * span * span  # shifted-add reduction
    integrals = 2.0 * 2.0 * rows * (span + templ - 1)  # 2 cumsums x 2 images
    norm = 10.0 * span * span
    return mm + adds + integrals + norm


def _stage_flip_time(run_enqueue, run_fetch, trials: int = 2):
    """Warm (enqueue-only), flip to sync mode, then time run_fetch."""
    import jax
    import jax.numpy as jnp

    run_enqueue()
    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)
    best = float("inf")
    result = None
    for _ in range(trials):
        t0 = time.perf_counter()
        result = run_fetch()
        best = min(best, time.perf_counter() - t0)
    return result, best


def _make_tracking_run(
    width, height, templ, num_frames, chunk_size, backend, strategy,
    radius=None, batch=None,
):
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.backends import get_backend
    from pvot.tracker.scan import _pack_outputs, fetch_outputs, make_batch_step, make_masked_scan_fn
    from pvot.tracker.state import init_state
    from pvot.tracker.step import make_step
    from jax import lax

    config = TrackerConfig()
    if radius:
        config = TrackerConfig(search_radius_x=radius, search_radius_y=radius)
    spec = SyntheticSpec(
        width=width, height=height, num_frames=num_frames + 1,
        target_w=templ, target_h=templ, seed=1,
    )
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state = init_state(jnp.asarray(template), (x, y, w, h))

    full_fn, region_fn, argmax_fn = get_backend(
        backend, (height, width), (h, w), config
    )
    step = make_step(
        (height, width), (h, w), config,
        ncc_full_fn=full_fn, ncc_region_fn=region_fn, strategy=strategy,
        ncc_region_argmax_fn=argmax_fn,
    )
    if batch:
        bstep = make_batch_step(step, batch)

        def scan_body(st, xs):
            frames_b, valid = xs
            new_st, out = bstep(st, frames_b)
            keep = lambda a, b: jnp.where(valid, a, b)
            return jax.tree.map(keep, new_st, st), out

        scan_fn = jax.jit(
            lambda st, fr, va: lax.scan(scan_body, st, (fr, va))
        )
        n_groups = num_frames // (batch * chunk_size)
        staged = [
            jax.device_put(
                frames[1 + g * batch * chunk_size : 1 + (g + 1) * batch * chunk_size]
                .reshape(chunk_size, batch, height, width)
            )
            for g in range(max(1, n_groups))
        ]
        valid = jax.device_put(np.ones(chunk_size, bool))

        def run(fetch):
            st = state
            outs = []
            for s in staged:
                st, out = scan_fn(st, s, valid)
                outs.append(jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), out))
            dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
            return fetch_outputs(dev) if fetch else _pack_outputs(dev)

        return run, spec, len(staged) * batch * chunk_size

    scan_fn = make_masked_scan_fn(step, donate=False)
    staged = [
        jax.device_put(frames[1 + i : 1 + i + chunk_size])
        for i in range(0, num_frames, chunk_size)
    ]
    valid = jax.device_put(np.ones(chunk_size, bool))

    def run(fetch):
        st = state
        outs = []
        for c in staged:
            st, out = scan_fn(st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    return run, spec, num_frames


def bench_tracking(name, *, width, height, templ=80, num_frames=512,
                   chunk_size=128, backend="xla", strategy="fused",
                   radius=None, batch=None, check_err=True):
    from pvot.io.synthetic import target_bbox

    run, spec, total = _make_tracking_run(
        width, height, templ, num_frames, chunk_size, backend, strategy,
        radius, batch,
    )
    host, elapsed = _stage_flip_time(
        lambda: run(fetch=False), lambda: run(fetch=True)
    )
    fps = total / elapsed
    rec = {
        "config": name,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
        "frames": total,
        "elapsed_s": round(elapsed, 4),
    }
    if check_err and not batch:
        errs = [
            abs(int(b[0]) - target_bbox(spec, i + 1)[0])
            + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
            for i, b in enumerate(np.asarray(host.bbox))
        ]
        rec["max_l1_err_px"] = int(max(errs))
    return rec


def bench_multi_object(num_objects=8, width=1280, height=720, templ=80,
                       num_frames=256, chunk_size=64, backend="fast"):
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.parallel.multi import init_multi_state, make_multi_step
    from pvot.tracker.scan import make_masked_scan_fn

    config = TrackerConfig()
    spec = SyntheticSpec(
        width=width, height=height, num_frames=num_frames + 1,
        target_w=templ, target_h=templ, seed=1,
    )
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    g0 = gray_u8_to_f32(frames[0])
    # One true target + 7 fixed background patches (all same geometry).
    rois = [(x, y, w, h)] + [
        (64 + 96 * i, 128 + 32 * (i % 3), w, h) for i in range(num_objects - 1)
    ]
    templates = [g0[ry : ry + h, rx : rx + w] for rx, ry, _, _ in rois]
    states = init_multi_state(templates, rois)
    # Serving configs run the 'fast' engine (precision=HIGH — trajectory-
    # identical to HIGHEST, ~12% faster; multi-object/serving are pvot
    # extensions with no reference-parity constraint).
    multi_step = make_multi_step((height, width), (h, w), config, backend=backend)
    scan_fn = make_masked_scan_fn(multi_step, donate=False)
    staged = [
        jax.device_put(frames[1 + i : 1 + i + chunk_size])
        for i in range(0, num_frames, chunk_size)
    ]
    valid = jax.device_put(np.ones(chunk_size, bool))

    from pvot.tracker.scan import _pack_outputs, fetch_outputs

    def run(fetch):
        st = states
        outs = []
        for c in staged:
            st, out = scan_fn(st, c, valid)
            outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        # Packed single-transfer fetch (round-2 review item: the 4-leaf
        # fetch cost 3 extra ~30-80 ms relay round trips).
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    host, elapsed = _stage_flip_time(lambda: run(False), lambda: run(True))
    fps = num_frames / elapsed
    return {
        "config": f"multi_object_{num_objects}x_720p",
        "backend": backend,
        "value": round(fps, 2),
        "unit": "frames/s (all objects per frame)",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
        "object_rate": round(fps * num_objects, 1),
        "frames": num_frames,
        "elapsed_s": round(elapsed, 4),
    }


def bench_multi_stream(num_streams=8, width=1280, height=720, templ=80,
                       num_frames=256, chunk_size=64, frames_per_step=1,
                       backend="fast", passes=1):
    """Serving throughput: S independent 720p streams in lockstep on one chip.

    frames_per_step > 1 measures batch-N parity semantics combined with
    streams (C10: one NCC + state update per N frames per stream; the
    reference discards the other N-1 maps, so they cost nothing) — each
    scanned element then represents N stream frames."""
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.parallel.multi import make_multi_stream_step
    from pvot.tracker.scan import make_masked_scan_fn
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    base = generate_gray_video(SyntheticSpec(
        width=width, height=height, num_frames=num_frames + 1,
        target_w=templ, target_h=templ, seed=1,
    ))
    spec = SyntheticSpec(
        width=width, height=height, num_frames=num_frames + 1,
        target_w=templ, target_h=templ, seed=1,
    )
    x, y, w, h = target_bbox(spec, 0)
    templ_img = gray_u8_to_f32(base[0])[y : y + h, x : x + w]
    one = init_state(jnp.asarray(templ_img), (x, y, w, h))
    states = jax.tree.map(lambda a: jnp.stack([a] * num_streams), one)
    step = make_multi_stream_step((height, width), (h, w), config, backend=backend)
    scan_fn = make_masked_scan_fn(step, donate=False)
    # Streams share pixel content (synthetic); layout (C, S, H, W).
    staged = [
        jax.device_put(
            np.broadcast_to(
                base[1 + i : 1 + i + chunk_size, None],
                (chunk_size, num_streams, height, width),
            ).copy()
        )
        for i in range(0, num_frames, chunk_size)
    ]
    valid = jax.device_put(np.ones(chunk_size, bool))

    from pvot.tracker.scan import _pack_outputs, fetch_outputs

    def run(fetch):
        outs = []
        for _ in range(passes):  # fresh state per pass (floor amortization)
            st = states
            for c in staged:
                st, out = scan_fn(st, c, valid)
                outs.append(out)
        dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        # Packed single-transfer fetch (round-2 review item: the 4-leaf
        # fetch cost 3 extra ~30-80 ms relay round trips).
        return fetch_outputs(dev) if fetch else _pack_outputs(dev)

    host, elapsed = _stage_flip_time(lambda: run(False), lambda: run(True))
    fps = num_frames * passes * frames_per_step / elapsed
    name = f"multi_stream_{num_streams}x_720p"
    if frames_per_step > 1:
        name = f"multi_stream_{num_streams}x_batch{frames_per_step}_720p"
    flops = fused_region_flops(templ, 60)  # per scored frame per stream
    achieved = flops * (num_frames * passes / elapsed) * num_streams
    return {
        "config": name,
        "backend": backend,
        "value": round(fps, 2),
        "unit": "frames/s per stream (lockstep)",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
        "aggregate_fps": round(fps * num_streams, 1),
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_f32_highest_pct": round(100.0 * achieved / V5E_F32_HIGHEST_PEAK, 2),
        "mfu_bf16_pct": round(100.0 * achieved / V5E_BF16_PEAK, 2),
        "frames": num_frames * frames_per_step,
        "passes": passes,
        "elapsed_s": round(elapsed, 4),
    }


def bench_multi_stream_mega(num_streams=8, width=1280, height=720, templ=80,
                            num_frames=256, chunk_size=64, highest=True,
                            passes=1, batch=1, score_passes=3):
    """Serving on the MULTI-STREAM mega kernel: every chunk of every stream
    in ONE pallas_call (grid (S, F), pvot.ops.ncc_mega.mega_track_chunk_multi).

    The vmapped scan engines pay per-stream HBM buffer traffic that is
    constant in S (aggregate FPS flat at ~8k, docs/PERFORMANCE.md); here
    each stream runs at the single-stream mega rate, so the aggregate
    should scale with S until the chip's sequential-grid throughput binds.
    Frames stay uint8 on the wire; the in-jit pad to the kernel's aligned
    extents is the only staging overhead (same as bench.py's mega path).
    passes > 1 re-tracks the staged clips from fresh initial states that
    many times per timed run (bench.py's floor-amortization lever: staged
    HBM caps num_frames at big S, so the fixed ~30 ms relay fetch floor
    would otherwise dominate short rows; every pass is a full honest run
    and every pass validates against ground truth).
    """
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_mega import MegaGeometry, O_BX, O_POISON
    from pvot.tracker.mega import mega_chunk_step_multi
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    if not MegaGeometry((height, width), (templ, templ), config).supported():
        return {
            "config": f"multi_stream_{num_streams}x_{height}p",
            "backend": "mega",
            "skipped": "geometry outside the mega envelope",
        }
    # Unlike bench_multi_stream (which never trajectory-checks), this bench
    # validates every stream against ground truth — so the sinusoid must
    # stay trackable: short specs scale motion up (49 frames = 62 px/frame
    # > radius 60), hence a >=257-frame spec sliced to the frames we run.
    import itertools

    from pvot.io.synthetic import generate_gray_frames

    spec = SyntheticSpec(
        width=width, height=height,
        num_frames=max(257, num_frames + 1),
        target_w=templ, target_h=templ, seed=1,
    )
    base = np.stack(list(itertools.islice(
        generate_gray_frames(spec), num_frames + 1
    )))
    x, y, w, h = target_bbox(spec, 0)
    templ_img = gray_u8_to_f32(base[0])[y : y + h, x : x + w]
    one = init_state(jnp.asarray(templ_img), (x, y, w, h))
    states = jax.tree.map(lambda a: jnp.stack([a] * num_streams), one)
    # Streams share pixel content (synthetic); layout (S, C, H, W) chunks.
    staged = [
        jax.device_put(
            np.broadcast_to(
                base[1 + i : 1 + i + chunk_size][None],
                (num_streams, chunk_size, height, width),
            ).copy()
        )
        for i in range(0, num_frames, chunk_size)
    ]
    jax.block_until_ready(staged[-1])

    def run(fetch):
        rows_all = []
        for _ in range(passes):
            st = states  # fresh initial states: each pass is a full run
            for c in staged:
                # One fused dispatch per chunk (pvot.tracker.mega).
                rows, st = mega_chunk_step_multi(
                    c, st, chunk_size,
                    frame_shape=(height, width), templ_shape=(h, w),
                    config=config, highest=highest, batch=batch,
                    score_passes=score_passes,
                )
                rows_all.append(rows)
        dev = jnp.concatenate(rows_all, axis=1)  # (S, passes*F, TX)
        if not fetch:
            return dev
        dev.copy_to_host_async()
        return np.asarray(dev)  # ONE packed transfer

    host, elapsed = _stage_flip_time(lambda: run(False), lambda: run(True))
    bboxes = host[:, :, O_BX : O_BX + 4].astype(np.int32)  # (S, P*F, 4)
    # Batch (C10) semantics: only every batch-th frame is scored; skipped
    # look-ahead rows re-emit the pre-batch bbox (score -1, checked below),
    # so ground truth applies at the scored frames.
    errs = [
        abs(int(bboxes[s, i, 0]) - target_bbox(spec, (i % num_frames) + 1)[0])
        + abs(int(bboxes[s, i, 1]) - target_bbox(spec, (i % num_frames) + 1)[1])
        for s in range(num_streams)
        for i in range(num_frames * passes)
        if (i % num_frames) % batch == batch - 1
    ]
    if batch > 1:
        from pvot.ops.ncc_mega import O_SCORE

        skipped = np.asarray([
            host[s, i, O_SCORE]
            for s in range(num_streams)
            for i in range(num_frames * passes)
            if (i % num_frames) % batch != batch - 1
        ])
        assert (skipped == -1.0).all(), "look-ahead rows must not score"
    fps = num_frames * passes / elapsed
    flops = fused_region_flops(templ, 60) / batch  # scored frames only
    achieved = flops * fps * num_streams
    name = f"multi_stream_{num_streams}x_{height}p"
    if batch > 1:
        name = f"multi_stream_{num_streams}x_batch{batch}_{height}p"
    return {
        "config": name,
        "backend": "mega" if highest else "mega_fast",
        **({} if highest else {"tier": (
            "fast_1pass_bf16" if score_passes == 1
            else f"fast_{score_passes}pass_bf16_hilo"
        )}),
        "value": round(fps, 2),
        "unit": "frames/s per stream (lockstep)",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
        "aggregate_fps": round(fps * num_streams, 1),
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_f32_highest_pct": round(100.0 * achieved / V5E_F32_HIGHEST_PEAK, 2),
        "mfu_bf16_pct": round(100.0 * achieved / V5E_BF16_PEAK, 2),
        "frames": num_frames,
        "passes": passes,
        "elapsed_s": round(elapsed, 4),
        "max_l1_err_px": int(max(errs)),
        "poisoned": int((host[:, :, O_POISON] != 0.0).sum()),
        **(
            {} if highest
            else {"tier": (
                "fast_1pass_bf16" if score_passes == 1
                else f"fast_{score_passes}pass_bf16_hilo"
            )}
        ),
    }


def bench_hetero_serving(passes=4, batch=1):
    """Mixed-geometry serving (suite key 7h): two geometry groups — 8 x
    720p streams with an 80x80 template and 4 x 1080p streams with a 64x64
    template — staged on device and tracked through the SAME grouped
    mega-call structure `pvot.serve_streams_grouped` uses (one multi-stream
    mega dispatch per group chunk; the groups' dispatches interleave and
    the chip serializes them).  Every stream validates against its own
    clip's ground truth.  This is the staged device-throughput companion
    to the live-path 7me row for round 4's heterogeneous serving
    (real multi-camera fleets mix frame and template geometries)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import (
        SyntheticSpec,
        generate_gray_frames,
        target_bbox,
    )
    from pvot.ops.ncc_mega import MegaGeometry, O_BX, O_POISON
    from pvot.tracker.mega import mega_chunk_step_multi
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    # (streams, width, height, templ, frames, chunk): staged uint8 totals
    # ~1.5 GB — inside the relay's ~2 GB per-process guideline.
    plans = [
        (8, 1280, 720, 80, 96, 32),
        (4, 1920, 1080, 64, 96, 24),
    ]
    groups = []
    for (S, wd, ht, tp, nf, ck) in plans:
        if not MegaGeometry((ht, wd), (tp, tp), config).supported():
            return {
                "config": "hetero_serving_720p_1080p",
                "backend": "mega",
                "skipped": f"({ht}p, {tp}px) outside the mega envelope",
            }
        # batch > 1 commits one bbox per batch, so the per-frame motion
        # budget shrinks to radius/batch (the reference's own "batching
        # decreases robustness" tradeoff, README.md:135): a longer spec
        # slows the sinusoid so the batched 1080p group stays trackable
        # (at 257 frames its 18 px/frame x batch-4 jump exceeds r60 and
        # the tracker legitimately loses it — measured 828 px, round 5).
        spec = SyntheticSpec(
            width=wd, height=ht,
            num_frames=max(513 if batch > 1 else 257, nf + 1),
            target_w=tp, target_h=tp, seed=1,
        )
        base = np.stack(list(itertools.islice(
            generate_gray_frames(spec), nf + 1
        )))
        x, y, w, h = target_bbox(spec, 0)
        one = init_state(
            jnp.asarray(gray_u8_to_f32(base[0])[y : y + h, x : x + w]),
            (x, y, w, h),
        )
        states = jax.tree.map(lambda a: jnp.stack([a] * S), one)
        staged = [
            jax.device_put(np.broadcast_to(
                base[1 + i : 1 + i + ck][None], (S, ck, ht, wd)
            ).copy())
            for i in range(0, nf, ck)
        ]
        jax.block_until_ready(staged[-1])
        groups.append(dict(
            S=S, wh=(ht, wd), tshape=(h, w), spec=spec, states=states,
            staged=staged, nf=nf, ck=ck, templ=tp,
        ))

    def run(fetch):
        per_group_rows = [[] for _ in groups]
        for _ in range(passes):
            sts = [g["states"] for g in groups]  # fresh states per pass
            max_chunks = max(len(g["staged"]) for g in groups)
            for ci in range(max_chunks):
                # Interleave the groups' dispatches, as the grouped live
                # driver's concurrent host threads do.
                for gi, g in enumerate(groups):
                    if ci < len(g["staged"]):
                        rows, sts[gi] = mega_chunk_step_multi(
                            g["staged"][ci], sts[gi], g["ck"],
                            frame_shape=g["wh"], templ_shape=g["tshape"],
                            config=config, highest=True, batch=batch,
                        )
                        per_group_rows[gi].append(rows)
        devs = [jnp.concatenate(r, axis=1) for r in per_group_rows]
        if not fetch:
            return devs
        for d in devs:
            d.copy_to_host_async()
        return [np.asarray(d) for d in devs]  # packed transfers

    host, elapsed = _stage_flip_time(lambda: run(False), lambda: run(True))
    max_err, poisoned, total = 0, 0, 0
    labels = []
    for g, h_ in zip(groups, host):
        bb = h_[:, :, O_BX : O_BX + 4].astype(np.int32)
        # batch > 1 (C10 look-ahead cadence): only every batch-th frame is
        # scored; skipped rows re-emit the pre-batch bbox, so ground truth
        # applies at the scored frames (bench_multi_stream_mega protocol).
        errs = [
            abs(int(bb[s, i, 0]) - target_bbox(g["spec"], (i % g["nf"]) + 1)[0])
            + abs(int(bb[s, i, 1]) - target_bbox(g["spec"], (i % g["nf"]) + 1)[1])
            for s in range(g["S"])
            for i in range(g["nf"] * passes)
            if (i % g["nf"]) % batch == batch - 1
        ]
        max_err = max(max_err, max(errs))
        poisoned += int((h_[:, :, O_POISON] != 0.0).sum())
        total += g["S"] * g["nf"] * passes
        labels.append(f"{g['S']}x{g['wh'][0]}p/{g['templ']}px")
    agg = total / elapsed
    n_streams = sum(g["S"] for g in groups)
    # "value" is per-stream-equivalent (aggregate / total streams) so the
    # row's FPS column is unit-comparable with the homogeneous serving
    # rows, which all report frames/s per stream (round-4 ADVICE item).
    per_stream = agg / n_streams
    return {
        "config": (
            "hetero_serving_720p_1080p" if batch == 1
            else f"hetero_serving_720p_1080p_batch{batch}"
        ),
        "backend": "mega",
        "value": round(per_stream, 2),
        "unit": f"frames/s per stream ({n_streams} mixed streams)",
        "vs_baseline": round(per_stream / REFERENCE_FPS, 2),
        "aggregate_fps": round(agg, 1),
        "groups": labels,
        "frames": total,
        "passes": passes,
        "elapsed_s": round(elapsed, 4),
        "max_l1_err_px": int(max_err),
        "poisoned": poisoned,
    }


def bench_pallas():
    """The hand-written Pallas engine on real hardware: on-device parity vs
    the matmul engine at headline geometry, then the tracked-FPS bench with
    backend='pallas' (the reference's --shared/--const/--const_tiled modes
    all route here when the kernel is supported)."""
    import jax.numpy as jnp

    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_pallas import ncc_map_pallas, pallas_supported

    if not pallas_supported():
        return {
            "config": "pallas_720p_80px",
            "skipped": "pallas unsupported on this backend (probe failed)",
        }
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((200, 200), np.float32))
    templ = jnp.asarray(rng.random((80, 80), np.float32))
    err = float(
        np.max(np.abs(
            np.asarray(ncc_map_pallas(img, templ))
            - np.asarray(ncc_map_matmul(img, templ))
        ))
    )
    rec = bench_tracking(
        "pallas_720p_80px", width=1280, height=720, backend="pallas",
        num_frames=512, chunk_size=128,
    )
    rec["backend"] = "pallas"
    rec["parity_max_abs_err_vs_matmul"] = err
    return rec


def bench_mode_comparison(frames=512):
    """One row per user-facing mode flag, identical geometry — the direct
    analog of the reference README's five-kernel comparison table
    (README.md:128-137): --cpu vs --cuda(naive) vs --shared/--const/
    --const_tiled, plus pvot's --fast serving mode.  All tracked
    end-to-end on the real chip; trajectory-checked where applicable."""
    from pvot.ops.ncc_pallas import pallas_supported

    rows = [
        bench_tracking(
            "mode_cpu_720p", width=1280, height=720, backend="cpu",
            strategy="full", num_frames=min(frames, 256), chunk_size=64,
        ),
        bench_tracking(
            "mode_cuda_720p", width=1280, height=720, backend="xla",
            num_frames=frames, chunk_size=min(frames, 512),
        ),
        bench_tracking(
            "mode_fast_720p", width=1280, height=720, backend="fast",
            num_frames=frames, chunk_size=min(frames, 512),
        ),
    ]
    if pallas_supported():
        rows.append(
            bench_tracking(
                # The reference's --shared/--const/--const_tiled alias —
                # resolves to the shear Pallas engine since round 3c (with
                # the probe-gated operator-Pallas -> matmul fallback chain).
                "mode_shared_720p", width=1280, height=720, backend="shared",
                num_frames=frames, chunk_size=min(frames, 512),
            )
        )
    else:
        rows.append({
            "config": "mode_shared_720p",
            "skipped": "pallas unsupported on this backend (probe failed)",
        })
    return rows


def bench_mega(name="mega_720p", *, width=1280, height=720, templ=80,
               num_frames=2048, chunk_size=512, radius=None, passes=1,
               highest=True, score_passes=3):
    """The mega-kernel path (whole chunk in ONE pallas_call,
    pvot.ops.ncc_mega) — the suite row behind bench.py's default backend,
    and (round 4, via radius=) the r160 stress rows the span-tiled kernel
    admitted.  Protocol identical to bench_tracking; passes re-track the
    staged clip from fresh states to amortize the relay floor on short
    rows (every pass ground-truth-checked)."""
    import jax
    import jax.numpy as jnp

    from bench import _make_mega_runner
    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    if radius:
        config = TrackerConfig(search_radius_x=radius, search_radius_y=radius)
    spec = SyntheticSpec(
        width=width, height=height, num_frames=num_frames + 1,
        target_w=templ, target_h=templ, seed=1,
    )
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
    state = init_state(jnp.asarray(template), (x, y, w, h))
    chunks = [
        jax.device_put(frames[1 + i : 1 + i + chunk_size])
        for i in range(0, num_frames, chunk_size)
    ]
    jax.block_until_ready(chunks[-1])
    run_once, _run_timed, finish = _make_mega_runner(
        chunks, state, (height, width), (h, w), chunk_size, config,
        passes=passes, highest=highest, score_passes=score_passes,
    )
    host, elapsed = _stage_flip_time(
        lambda: run_once(fetch=False), lambda: run_once(fetch=True)
    )
    bboxes, _updated, extras = finish(host)
    errs = [
        abs(int(b[0]) - target_bbox(spec, (i % num_frames) + 1)[0])
        + abs(int(b[1]) - target_bbox(spec, (i % num_frames) + 1)[1])
        for i, b in enumerate(bboxes)
    ]
    total = num_frames * passes
    fps = total / elapsed
    return {
        "config": name,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
        "frames": total,
        "elapsed_s": round(elapsed, 4),
        "max_l1_err_px": int(max(errs)),
        **(
            {} if highest
            else {"tier": (
                "fast_1pass_bf16" if score_passes == 1
                else f"fast_{score_passes}pass_bf16_hilo"
            )}
        ),
        **extras,
    }


def bench_stream_sweep(sizes=(8, 16, 32, 64), backend="fast"):
    """Find the chip's serving saturation point: aggregate FPS + MFU as the
    lockstep stream count grows.  Frame counts shrink with S so staged
    device buffers stay within HBM (S=64 stages 64 x 720p uint8 per scan
    element)."""
    # S=64 staging is capped low: (64, 16) staged 3.8 GB and
    # RESOURCE_EXHAUSTED the relay chip in round 2 even in a fresh process
    # (the transient per-step region/im2col buffers at S=64 are ~0.5 GB on
    # top).  The relay floor (~30 ms/run) biases the S=64 row upward; read
    # it as a trend point, not an absolute.
    # (frames, chunk, passes): staged frames stay within HBM; passes
    # re-track the staged clip from fresh states so the timed region
    # covers >= ~512 frames even at big S (floor amortization; every
    # pass validates against ground truth on the mega rows).
    plans = {
        8: (256, 64, 2),
        16: (128, 32, 4),
        32: (128, 16, 4),
        64: (48, 12, 10),
    }
    out = []
    for s in sizes:
        frames, chunk, passes = plans.get(s, (64, 8, 8))
        if backend in ("mega", "mega_fast"):
            # The fast tier matches the bench.py headline default
            # (since round 5 the 1-pass plain-bf16 score dot; every pass
            # ground-truth-checked).
            out.append(bench_multi_stream_mega(
                s, num_frames=frames, chunk_size=chunk,
                highest=(backend == "mega"), passes=passes,
                # Round 5: the fast serving sweep runs the 1-pass tier
                # (the bench.py headline default; clean clips, per-run
                # ground-truth check is the guard).  Occlusion/batch fast
                # rows stay 2-pass — their confidence thresholds do real
                # work and a ~1e-3 score perturbation can move a
                # re-acquisition frame.
                score_passes=1 if backend == "mega_fast" else 3,
            ))
        else:
            out.append(bench_multi_stream(
                s, num_frames=frames, chunk_size=chunk, backend=backend,
                passes=passes,
            ))
    return out


def bench_multi_object_mega(num_objects=8, width=1280, height=720, templ=80,
                            num_frames=256, chunk_size=64, passes=2,
                            highest=True, score_passes=3):
    """Multi-object tracking on the MULTI-OBJECT mega kernel: K trackers
    over ONE shared clip per pallas_call (grid (K, F), shared-frame index
    map — pvot.ops.ncc_mega.mega_track_chunk_objects).  The vmapped scan
    step (config 5) pays per-object HBM score/im2col traffic and scan
    glue; here each object runs at the single-tracker mega rate.  All K
    objects start on the ground-truth target so every lane
    trajectory-checks.  passes: see bench_multi_stream_mega."""
    import itertools

    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import (
        SyntheticSpec,
        generate_gray_frames,
        target_bbox,
    )
    from pvot.ops.ncc_mega import MegaGeometry, O_BX, O_POISON
    from pvot.tracker.mega import mega_chunk_step_objects
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    if not MegaGeometry((height, width), (templ, templ), config).supported():
        return {
            "config": f"multi_object_{num_objects}x_{height}p",
            "backend": "mega",
            "skipped": "geometry outside the mega envelope",
        }
    spec = SyntheticSpec(
        width=width, height=height,
        num_frames=max(257, num_frames + 1),
        target_w=templ, target_h=templ, seed=1,
    )
    base = np.stack(list(itertools.islice(
        generate_gray_frames(spec), num_frames + 1
    )))
    x, y, w, h = target_bbox(spec, 0)
    templ_img = gray_u8_to_f32(base[0])[y : y + h, x : x + w]
    one = init_state(jnp.asarray(templ_img), (x, y, w, h))
    states = jax.tree.map(lambda a: jnp.stack([a] * num_objects), one)
    staged = [
        jax.device_put(base[1 + i : 1 + i + chunk_size])
        for i in range(0, num_frames, chunk_size)
    ]
    jax.block_until_ready(staged[-1])

    def run(fetch):
        rows_all = []
        for _ in range(passes):
            st = states
            for c in staged:
                # One fused dispatch per chunk (pvot.tracker.mega).
                rows, st = mega_chunk_step_objects(
                    c, st, chunk_size,
                    frame_shape=(height, width), templ_shape=(h, w),
                    config=config, highest=highest, score_passes=score_passes,
                )
                rows_all.append(rows)
        dev = jnp.concatenate(rows_all, axis=1)  # (K, P*F, TX)
        if not fetch:
            return dev
        dev.copy_to_host_async()
        return np.asarray(dev)

    host, elapsed = _stage_flip_time(lambda: run(False), lambda: run(True))
    bboxes = host[:, :, O_BX : O_BX + 4].astype(np.int32)
    errs = [
        abs(int(bboxes[k, i, 0]) - target_bbox(spec, (i % num_frames) + 1)[0])
        + abs(int(bboxes[k, i, 1]) - target_bbox(spec, (i % num_frames) + 1)[1])
        for k in range(num_objects)
        for i in range(num_frames * passes)
    ]
    fps = num_frames * passes / elapsed
    flops = fused_region_flops(templ, 60)
    achieved = flops * fps * num_objects
    return {
        "config": f"multi_object_{num_objects}x_{height}p",
        "backend": "mega" if highest else "mega_fast",
        "value": round(fps, 2),
        "unit": "frames/s (all objects per frame)",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
        "object_rate": round(fps * num_objects, 1),
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_f32_highest_pct": round(100.0 * achieved / V5E_F32_HIGHEST_PEAK, 2),
        "mfu_bf16_pct": round(100.0 * achieved / V5E_BF16_PEAK, 2),
        "frames": num_frames,
        "passes": passes,
        "elapsed_s": round(elapsed, 4),
        "max_l1_err_px": int(max(errs)),
        "poisoned": int((host[:, :, O_POISON] != 0.0).sum()),
    }


def bench_serving_e2e(num_streams=16, width=1280, height=720, templ=80,
                      num_frames=256, chunk_size=32, highest=False,
                      pipeline_depth=2, prepad=False):
    """END-TO-END serving on pvot.serve_streams: per-stream decode feeds,
    host pre-padded staging, chunk upload, the multi-stream mega kernel,
    and per-chunk record fetches are ALL inside the timed region (every
    other serving row stages its frames on device untimed, bench.py
    protocol).  On the test relay the host->device link is a tunnel with
    ~30-80 ms fixed round-trip latency, so this row is largely
    transfer/latency-bound THERE — it validates the live serving path end
    to end and lower-bounds it; production-PCIe numbers sit between this
    row and the staged 7m* rows.  pipeline_depth=2 keeps one chunk of
    compute in flight behind each record fetch (pvot.io.serving)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.serving import serve_streams
    from pvot.io.synthetic import (
        SyntheticSpec,
        generate_gray_frames,
        target_bbox,
    )
    from pvot.ops.ncc_mega import MegaGeometry
    from pvot.tracker.state import init_state

    config = TrackerConfig()
    geom = MegaGeometry((height, width), (templ, templ), config)
    if not geom.supported():
        return {
            "config": f"serving_e2e_{num_streams}x_720p",
            "skipped": "geometry outside the mega envelope",
        }
    # Trackable sinusoid (same rationale as bench_multi_stream_mega): a
    # long spec sliced so per-frame motion stays inside the search radius.
    spec = SyntheticSpec(
        width=width, height=height,
        num_frames=max(257, num_frames + 1),
        target_w=templ, target_h=templ, seed=1,
    )
    base = np.stack(list(itertools.islice(
        generate_gray_frames(spec), num_frames + 1
    )))
    x, y, w, h = target_bbox(spec, 0)
    templ_img = gray_u8_to_f32(base[0])[y : y + h, x : x + w]
    one = init_state(jnp.asarray(templ_img), (x, y, w, h))

    def fresh_states():
        return jax.tree.map(lambda a: jnp.stack([a] * num_streams), one)

    # Warmup: compiles the multi kernel + state extract at the served
    # shapes, runs the per-geometry probe, and (first record fetch) flips
    # the relay into synchronous honest-timing mode.
    warm = [iter(base[1 : 1 + 2 * chunk_size]) for _ in range(num_streams)]
    serve_streams(
        warm, fresh_states(), (height, width), config,
        chunk_size=chunk_size, highest=highest,
        pipeline_depth=pipeline_depth, prepad=prepad,
    )

    timings: list = []
    feeds = [iter(base[1 : 1 + num_frames]) for _ in range(num_streams)]
    t0 = time.perf_counter()
    _, outs = serve_streams(
        feeds, fresh_states(), (height, width), config,
        chunk_size=chunk_size, timings=timings, highest=highest,
        pipeline_depth=pipeline_depth, prepad=prepad,
    )
    elapsed = time.perf_counter() - t0
    errs = [
        abs(int(outs[s].bbox[i, 0]) - target_bbox(spec, i + 1)[0])
        + abs(int(outs[s].bbox[i, 1]) - target_bbox(spec, i + 1)[1])
        for s in range(num_streams)
        for i in range(num_frames)
    ]
    total = num_streams * num_frames
    return {
        "config": f"serving_e2e_{num_streams}x_720p",
        "backend": "mega" if highest else "mega_fast",
        "value": round(num_frames / elapsed, 2),
        "unit": "frames/s per stream (end-to-end: decode+upload+track+fetch)",
        "vs_baseline": round(num_frames / elapsed / REFERENCE_FPS, 2),
        "aggregate_fps": round(total / elapsed, 1),
        "pipeline_depth": pipeline_depth,
        "staging": "host_prepadded" if prepad else "wire_size",
        "upload_mb_s": round(
            total
            * (geom.pad_h * geom.pad_w if prepad else height * width)
            / 1e6 / elapsed,
            1,
        ),
        "frames": num_frames,
        "elapsed_s": round(elapsed, 4),
        "max_l1_err_px": int(max(errs)),
        "relay_note": "host->device link is the test tunnel (~10 MB/s "
                      "measured); this row validates the live path and "
                      "measures the TUNNEL, not the tracker — see the "
                      "staged 7m* rows for device throughput",
    }


def bench_occlusion(periods=(0, 256, 128, 64), *, width=1280, height=720,
                    templ=80, num_frames=1024, chunk_size=64,
                    occlusion_len=24, lost_threshold=10):
    """The occlusion-heavy regime (round-4 VERDICT item 2): the target
    leaves the frame for `occlusion_len` frames at the end of every
    `period`-frame window, driving the lost-object -> global-search ->
    re-acquire cycle repeatedly.  Each period runs the MEGA driver (whose
    global frames poison and transactionally re-run on the scan path,
    pvot.tracker.mega) against the shear SCAN engine on the same clip;
    trajectories must bit-match (the scan path IS the semantics oracle —
    during an occlusion there is no ground truth to check against).

    period=0 is the clean baseline.  The mega/scan FPS ratio per period
    locates the poison-rate crossover documented in docs/PERFORMANCE.md.

    The clip is STAGED on device once before timing (first run of this row
    passed host numpy per run and measured the relay tunnel: 16-23 FPS at
    ~15 MB/s of re-upload per run, three orders below the tracker) — the
    drivers accept device-resident frames as of round 4
    (pvot.tracker.scan.as_frames).  What remains in the timing is real
    algorithm cost: the per-transaction-round packed record fetch plus the
    rollback re-compute.
    """
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.tracker.mega import mega_mode, track_video_mega
    from pvot.tracker.scan import track_video
    from pvot.tracker.state import init_state

    config = TrackerConfig(lost_frame_threshold=lost_threshold)
    # Which kernel the auto mode serves at this geometry (round 4: True =
    # in-kernel global search, False = poison transactions) — recorded per
    # row so the results table says WHICH occlusion story it tells.
    mode = mega_mode((height, width), (templ, templ), config)
    out = []
    for period in periods:
        spec = SyntheticSpec(
            width=width, height=height, num_frames=num_frames + 1,
            target_w=templ, target_h=templ, seed=1,
            occlusion_period=period, occlusion_len=occlusion_len if period else 0,
        )
        frames = generate_gray_video(spec)
        x, y, w, h = target_bbox(spec, 0)
        template = gray_u8_to_f32(frames[0])[y : y + h, x : x + w]
        state = init_state(jnp.asarray(template), (x, y, w, h))
        staged = jax.device_put(frames[1:])
        jax.block_until_ready(staged)

        recs = {}
        for engine in ("mega", "scan"):
            # Warm (compiles + probes), then time two full runs; these
            # drivers fetch eagerly per transaction round, so the run is
            # timed whole (already past the relay's sync flip from the
            # warmup fetch).
            def run():
                if engine == "mega":
                    return track_video_mega(
                        staged, state, config, chunk_size=chunk_size,
                    )
                return track_video(
                    staged, state, config, strategy="fused",
                    backend="pallas_shear", chunk_size=chunk_size,
                )

            run()
            best, result = float("inf"), None
            for _ in range(2):
                t0 = time.perf_counter()
                result = run()
                best = min(best, time.perf_counter() - t0)
            recs[engine] = (best, result[1])
        mega_t, mega_out = recs["mega"]
        scan_t, scan_out = recs["scan"]
        traj_equal = bool(
            np.array_equal(mega_out.bbox, scan_out.bbox)
            and np.array_equal(mega_out.used_global, scan_out.used_global)
        )
        fps = num_frames / mega_t
        out.append({
            "config": f"occl_p{period}_720p" if period else "occl_clean_720p",
            "backend": "mega",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / REFERENCE_FPS, 2),
            "frames": num_frames,
            "elapsed_s": round(mega_t, 4),
            "scan_fps": round(num_frames / scan_t, 2),
            "global_frames": int(np.asarray(mega_out.used_global).sum()),
            "traj_equal_scan": traj_equal,
            "occlusion_period": period,
            "mega_mode": {True: "inkernel_global", False: "poison",
                          None: "scan_fallback"}[mode],
        })
        print(json.dumps(out[-1]), flush=True)
    return out


def bench_occlusion_serving(num_streams=8, stagger=True, *, width=1280,
                            height=720, templ=80, num_frames=192,
                            chunk_size=32, period=64, occ_len=12,
                            lost_threshold=10, passes=2, scan_compare=True):
    """Occlusion-heavy MULTI-STREAM serving (round-5 VERDICT item 4): the
    single-stream occlusion sweep (config 12) never measured what a lost
    stream costs the OTHER streams on the sequential (S, F) mega grid —
    a global frame's strip pass (~24 local-window equivalents of score
    work) stalls every later grid step behind it.

    Per-stream occlusion cycles of `period` frames with `occ_len` occluded
    frames each; stagger=True offsets each stream's cycle phase (the
    realistic multi-camera case), stagger=False occludes ALL streams
    simultaneously (the worst case).  Engines, all same-process A/B on the
    same staged clips: mega HIGHEST, mega 2-pass fast tier, then (after
    freeing the mega staging — two layouts at once would breach the ~2 GB
    relay guideline) the vmapped shear scan serving path.  Trajectories
    must agree across all three (the scan path is the semantics oracle —
    during an occlusion there is no ground truth).  Returns one row per
    engine so the crossover is read directly off the table."""
    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_mega import MegaGeometry, O_BX, O_GUSED, O_POISON
    from pvot.parallel.multi import make_multi_stream_step
    from pvot.tracker.mega import mega_chunk_step_multi, mega_multi_supported
    from pvot.tracker.scan import make_masked_scan_fn
    from pvot.tracker.state import init_state

    config = TrackerConfig(lost_frame_threshold=lost_threshold)
    name = (
        f"occl_serving_{num_streams}x_p{period}_"
        + ("staggered" if stagger else "simultaneous")
    )
    if not MegaGeometry((height, width), (templ, templ), config).supported():
        return [{"config": name, "backend": "mega",
                 "skipped": "geometry outside the mega envelope"}]
    if not mega_multi_supported(
        (height, width), (templ, templ), config, inkernel_global=True
    ):
        return [{"config": name, "backend": "mega",
                 "skipped": "in-kernel-global multi probe failed"}]

    # Phases scaled into [0, period - occ_len) so every stream's target is
    # visible at frame 0 (the template must be croppable).
    specs = [
        SyntheticSpec(
            width=width, height=height, num_frames=num_frames + 1,
            target_w=templ, target_h=templ, seed=1 + s,
            occlusion_period=period, occlusion_len=occ_len,
            occlusion_phase=(
                (s * (period - occ_len)) // num_streams if stagger else 0
            ),
        )
        for s in range(num_streams)
    ]
    videos = np.stack([generate_gray_video(sp) for sp in specs])
    states_l = []
    for s, sp in enumerate(specs):
        x, y, w, h = target_bbox(sp, 0)
        templ_img = gray_u8_to_f32(videos[s, 0])[y : y + h, x : x + w]
        states_l.append(init_state(jnp.asarray(templ_img), (x, y, w, h)))
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *states_l)

    staged = [
        jax.device_put(videos[:, 1 + i : 1 + i + chunk_size])
        for i in range(0, num_frames, chunk_size)
    ]
    jax.block_until_ready(staged[-1])

    def run_mega(fetch, highest, score_passes):
        rows_all = []
        for _ in range(passes):
            st = states
            for c in staged:
                rows, st = mega_chunk_step_multi(
                    c, st, chunk_size,
                    frame_shape=(height, width), templ_shape=(h, w),
                    config=config, highest=highest,
                    score_passes=score_passes, inkernel_global=True,
                )
                rows_all.append(rows)
        dev = jnp.concatenate(rows_all, axis=1)
        if not fetch:
            return dev
        dev.copy_to_host_async()
        return np.asarray(dev)

    host_h, elapsed_h = _stage_flip_time(
        lambda: run_mega(False, True, 3), lambda: run_mega(True, True, 3)
    )
    # Fast tier, same process/staging (honest A/B).
    _ = run_mega(False, False, 2)  # compile
    best_f, host_f = float("inf"), None
    for _ in range(2):
        t0 = time.perf_counter()
        host_f = run_mega(True, False, 2)
        best_f = min(best_f, time.perf_counter() - t0)
    elapsed_f = best_f

    total = num_streams * num_frames * passes
    rows = []
    for tier, host, elapsed in (
        ("mega", host_h, elapsed_h), ("mega_fast", host_f, elapsed_f)
    ):
        agg = total / elapsed
        rows.append({
            "config": name,
            "backend": tier,
            "value": round(agg / num_streams, 2),
            "unit": "frames/s per stream (lockstep)",
            "vs_baseline": round(agg / num_streams / REFERENCE_FPS, 2),
            "aggregate_fps": round(agg, 1),
            "frames": num_frames,
            "passes": passes,
            "elapsed_s": round(elapsed, 4),
            "global_frames": int(
                np.asarray(host[:, :, O_GUSED] != 0.0).sum()
            ) // passes,
            "poisoned": int((host[:, :, O_POISON] != 0.0).sum()),
            "occlusion_period": period,
            "stagger": stagger,
            **({"tier": "fast_2pass_bf16_hilo"} if tier == "mega_fast"
               else {}),
        })
        print(json.dumps(rows[-1]), flush=True)
    assert rows[0]["poisoned"] == 0 and rows[1]["poisoned"] == 0
    assert rows[0]["global_frames"] > 0, "fixture never searched globally"
    # Tier trajectory agreement (every pass).
    np.testing.assert_array_equal(
        host_h[:, :, O_BX : O_BX + 4], host_f[:, :, O_BX : O_BX + 4]
    )

    if scan_compare:
        bb_mega = host_h[:, : num_frames, O_BX : O_BX + 4].astype(np.int32)
        ug_mega = host_h[:, : num_frames, O_GUSED] != 0.0
        del host_h, host_f
        staged.clear()  # free the (S, C, H, W) mega staging first
        step = make_multi_stream_step(
            (height, width), (h, w), config, backend="pallas_shear"
        )
        scan_fn = make_masked_scan_fn(step, donate=False)
        staged_scan = [
            jax.device_put(
                np.ascontiguousarray(
                    videos[:, 1 + i : 1 + i + chunk_size].transpose(1, 0, 2, 3)
                )
            )
            for i in range(0, num_frames, chunk_size)
        ]
        valid = jax.device_put(np.ones(chunk_size, bool))
        jax.block_until_ready(staged_scan[-1])

        from pvot.tracker.scan import _pack_outputs, fetch_outputs

        def run_scan(fetch):
            outs = []
            for _ in range(passes):
                st = states
                for c in staged_scan:
                    st, out = scan_fn(st, c, valid)
                    outs.append(out)
            dev = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
            return fetch_outputs(dev) if fetch else _pack_outputs(dev)

        _ = run_scan(False)  # compile (process already in sync mode)
        best_s, host_s = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            host_s = run_scan(True)
            best_s = min(best_s, time.perf_counter() - t0)
        agg_s = total / best_s
        bb_scan = np.asarray(host_s.bbox)[: num_frames].transpose(1, 0, 2)
        ug_scan = np.asarray(host_s.used_global)[: num_frames].T
        traj_equal = bool(
            np.array_equal(bb_mega, bb_scan)
            and np.array_equal(ug_mega, ug_scan)
        )
        rows.append({
            "config": name,
            "backend": "pallas_shear",
            "value": round(agg_s / num_streams, 2),
            "unit": "frames/s per stream (lockstep)",
            "vs_baseline": round(agg_s / num_streams / REFERENCE_FPS, 2),
            "aggregate_fps": round(agg_s, 1),
            "frames": num_frames,
            "passes": passes,
            "elapsed_s": round(best_s, 4),
            "occlusion_period": period,
            "stagger": stagger,
            "traj_equal_mega": traj_equal,
        })
        print(json.dumps(rows[-1]), flush=True)
        assert traj_equal, "mega and scan serving trajectories diverged"
    return rows


def _bench_r160(name, **kw):
    """The r160 stress rows on the span-tiled mega kernel (round 4), with
    the round-3 behavior (scan auto engine) as the fallback when the mega
    compile fails on the serving chip."""
    try:
        rec = bench_mega(name, radius=160, passes=4, **kw)
        # "engine", not "backend": the merge keys rows by (config, backend),
        # and this row REPLACES the round-3 scan row for the same config.
        rec["engine"] = "mega"
        return rec
    except Exception as e:
        import sys

        print(f"suite: mega unavailable for {name} ({type(e).__name__}); "
              "falling back to the scan auto engine", file=sys.stderr)
        kw.pop("highest", None)
        kw.pop("score_passes", None)
        return bench_tracking(name, radius=160, backend="auto", **kw)


CONFIGS = {
    "1": lambda frames: bench_tracking(
        "cpu_parity_720p", width=1280, height=720, backend="cpu",
        strategy="full", num_frames=min(frames, 256), chunk_size=64,
    ),
    "2": lambda frames: bench_tracking(
        "fused_720p_80px", width=1280, height=720, num_frames=frames,
    ),
    "3": lambda frames: [
        bench_tracking(
            f"batch_{n}_720p", width=1280, height=720,
            num_frames=min(frames, 512), chunk_size=max(1, min(frames, 512) // n),
            batch=n, check_err=False,
        )
        for n in (4, 8, 16, 32)
    ],
    # r160 stress configs are pvot extensions (the reference never ran
    # 1080p/4K).  Round 4: the span-tiled mega kernel admits this span
    # (321 -> nx=3 output tiles, pvot/ops/ncc_mega.py), so these rows run
    # the mega driver (full HIGHEST parity, ground-truth-checked, passes=4
    # floor amortization) with a scan-engine fallback if the kernel is
    # unavailable on the serving chip.
    "4": lambda frames: [
        _bench_r160(
            "1080p_r160", width=1920, height=1080,
            num_frames=min(frames, 256), chunk_size=64,
        ),
        _bench_r160(
            "4k_r160", width=3840, height=2160,
            num_frames=min(frames, 128), chunk_size=32,
        ),
    ],
    # The same r160 rows on the bench-headline fast tier (2-pass bf16
    # hi/lo score loop, pvot/ops/ncc_mega.py score_passes) — like the
    # headline, trajectory validity is guarded per run by the ground
    # -truth check inside bench_mega (max_l1_err_px in the row).
    "4f": lambda frames: [
        _bench_r160(
            "1080p_r160_fast", width=1920, height=1080,
            num_frames=min(frames, 256), chunk_size=64,
            highest=False, score_passes=1,
        ),
        _bench_r160(
            "4k_r160_fast", width=3840, height=2160,
            num_frames=min(frames, 128), chunk_size=32,
            highest=False, score_passes=1,
        ),
    ],
    # Round 5: the 1080p/160x160-template/r160 class — the one measured
    # geometry the round-4 template envelope (th, tw <= 128) excluded;
    # round 5 raised the envelope to 256 px a side.  Scan-engine fallback
    # if the kernel is unavailable on the serving chip (round-3 standing:
    # shear scan engine 1,304 FPS here).
    "4t": lambda frames: [
        _bench_r160(
            "1080p_t160_r160", width=1920, height=1080, templ=160,
            num_frames=min(frames, 256), chunk_size=64,
        ),
        _bench_r160(
            "1080p_t160_r160_fast", width=1920, height=1080, templ=160,
            num_frames=min(frames, 256), chunk_size=64,
            highest=False, score_passes=1,
        ),
    ],
    "5": lambda frames: bench_multi_object(),
    # Multi-object on the multi-object mega kernel (grid (K, F), shared
    # frames) — the vmapped scan step (key 5) is the fallback path.
    "5m": lambda frames: bench_multi_object_mega(),
    # Round 5: the multi-object mega row on the 1-pass fast tier.
    "5mf": lambda frames: bench_multi_object_mega(
        highest=False, score_passes=1, passes=4
    ),
    "6": lambda frames: bench_multi_stream(),
    # Saturation sweep: aggregate FPS + MFU vs lockstep stream count.
    # One key per size — each runs in its own subprocess: even a single
    # S=8 sweep member can RESOURCE_EXHAUST the relay chip when it shares
    # a process with another staged config (observed twice in round 2).
    "7": lambda frames: bench_stream_sweep(),
    "7a": lambda frames: bench_stream_sweep(sizes=(8,)),
    "7b": lambda frames: bench_stream_sweep(sizes=(16,)),
    "7c": lambda frames: bench_stream_sweep(sizes=(32,)),
    "7d": lambda frames: bench_stream_sweep(sizes=(64,)),
    # The same sweep on the fused Pallas engine (vmapped kernel; probe-
    # gated with matmul fallback) — round-3 serving question.
    "7pa": lambda frames: bench_stream_sweep(sizes=(8,), backend="pallas"),
    "7pb": lambda frames: bench_stream_sweep(sizes=(16,), backend="pallas"),
    "7pc": lambda frames: bench_stream_sweep(sizes=(32,), backend="pallas"),
    "7pd": lambda frames: bench_stream_sweep(sizes=(64,), backend="pallas"),
    # Round-3c: the operator-free shear engine (the new default) on the
    # same sweep.
    "7sa": lambda frames: bench_stream_sweep(sizes=(8,), backend="pallas_shear"),
    "7sb": lambda frames: bench_stream_sweep(sizes=(16,), backend="pallas_shear"),
    "7sc": lambda frames: bench_stream_sweep(sizes=(32,), backend="pallas_shear"),
    "7sd": lambda frames: bench_stream_sweep(sizes=(64,), backend="pallas_shear"),
    # Round-3d: the MULTI-STREAM mega kernel (all streams' chunk in ONE
    # pallas_call, grid (S, F)) on the same sweep.
    "7ma": lambda frames: bench_stream_sweep(sizes=(8,), backend="mega"),
    "7mb": lambda frames: bench_stream_sweep(sizes=(16,), backend="mega"),
    "7mc": lambda frames: bench_stream_sweep(sizes=(32,), backend="mega"),
    "7md": lambda frames: bench_stream_sweep(sizes=(64,), backend="mega"),
    # The serving sweet spot (S=32) on the mega FAST tier (3-pass bf16
    # hi/lo score dot; trajectory-checked against ground truth like every
    # mega serving row).
    "7mf": lambda frames: bench_stream_sweep(sizes=(32,), backend="mega_fast"),
    # Round 5: the rest of the fast-tier sweep (1-pass score dot).
    "7mfa": lambda frames: bench_stream_sweep(sizes=(8,), backend="mega_fast"),
    "7mfb": lambda frames: bench_stream_sweep(sizes=(16,), backend="mega_fast"),
    "7mfd": lambda frames: bench_stream_sweep(sizes=(64,), backend="mega_fast"),
    # Heterogeneous serving (round 4): mixed frame/template geometries
    # through the grouped mega-call structure, staged device throughput.
    "7h": lambda frames: bench_hetero_serving(),
    # END-TO-END live serving (pvot.serve_streams): decode feeds + staging
    # + upload + mega kernel + record fetch all timed; relay-tunnel lower
    # bound (see bench_serving_e2e docstring).
    "7me": lambda frames: bench_serving_e2e(),
    # Streams x batch combined (C10 parity semantics: one update / N frames).
    "8": lambda frames: bench_multi_stream(
        32, num_frames=128, chunk_size=16, frames_per_step=4
    ),
    # Streams x batch ON THE MEGA GRID (round 4: the in-kernel batch
    # cadence — skipped look-ahead frames cost nothing; config 8 is the
    # scan-path analog, which never materializes the skipped frames).
    "8m": lambda frames: bench_multi_stream_mega(
        32, num_frames=128, chunk_size=16, passes=4, batch=4
    ),
    # Round 5: streams x batch on the 2-PASS fast tier (the 7mf and 8m
    # levers stacked — the serving-ceiling row).
    "8mf": lambda frames: bench_multi_stream_mega(
        32, num_frames=128, chunk_size=16, passes=4, batch=4,
        highest=False, score_passes=2,
    ),
    # Round 5: grouped heterogeneous serving x batch-4 look-ahead cadence.
    "7hb": lambda frames: bench_hetero_serving(batch=4),
    # Hand-written Pallas engine (--shared/--const/--const_tiled).
    "9": lambda frames: bench_pallas(),
    # Mode-flag comparison table (reference README.md:128-137 analog).
    "10": lambda frames: bench_mode_comparison(frames),
    # Mega-kernel headline (bench.py's default backend since round 3c).
    # 2048 frames: the ~30 ms relay floor amortizes to ~15 us/frame (a
    # 512-frame row reads ~40% low; docs/PERFORMANCE.md attribution).
    "11": lambda frames: bench_mega(num_frames=max(2048, frames)),
    # Serving beyond 720p: 8 x 1080p streams on the multi-stream mega
    # kernel (same 80x80 template / r60 envelope).  96 frames keeps the
    # staged uint8 under ~1.6 GB (relay RESOURCE_EXHAUSTED guideline).
    "7m1080": lambda frames: bench_multi_stream_mega(
        8, width=1920, height=1080, num_frames=96, chunk_size=24,
    ),
    # Occlusion-heavy regime (round 4): poison-rate sweep, mega driver vs
    # scan engine on periodically-occluded clips; locates the crossover.
    "12": lambda frames: bench_occlusion(),
    # Round 5: occlusion-heavy MULTI-STREAM serving (per-stream occlusion
    # cycles through the (S, F) mega grid, staggered vs simultaneous,
    # HIGHEST + fast tier + shear-scan crossover — one subprocess each).
    "12m8s": lambda frames: bench_occlusion_serving(8, stagger=True),
    "12m8c": lambda frames: bench_occlusion_serving(8, stagger=False),
    "12m32s": lambda frames: bench_occlusion_serving(
        32, stagger=True, num_frames=48, chunk_size=16, period=32,
        occ_len=8, lost_threshold=6, passes=5,
    ),
    "12m32c": lambda frames: bench_occlusion_serving(
        32, stagger=False, num_frames=48, chunk_size=16, period=32,
        occ_len=8, lost_threshold=6, passes=5,
    ),
    # Median-of-N fresh-process headline (round-4 VERDICT item 5): relay
    # session age swings single-process headline numbers up to +-40%
    # (docs/PERFORMANCE.md rule 4), so the repo's quoted headline is the
    # MEDIAN of >=3 fresh bench.py subprocesses with the range disclosed.
    "13": lambda frames: bench_headline_median(),
}


def bench_headline_median(runs=3):
    """Run bench.py in `runs` FRESH subprocesses and record the median
    with min/max: each subprocess is a new relay session, so this is the
    honest headline protocol under the documented session-age variance
    (every run still ground-truth-checks its trajectories internally)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vals, recs = [], []
    for i in range(runs):
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, cwd=repo,
        )
        line = next(
            ln for ln in reversed(r.stdout.strip().splitlines())
            if ln.startswith("{")
        )
        rec = json.loads(line)
        if rec.get("max_l1_err_px", 1) != 0:
            raise AssertionError(f"headline run {i} trajectory error: {rec}")
        vals.append(rec["value"])
        recs.append(rec)
        print(f"run {i}: {rec['value']} FPS", flush=True)
    med = sorted(vals)[len(vals) // 2]
    out = {
        "config": "headline_median_720p",
        "backend": recs[0]["backend"],
        "value": med,
        "unit": "frames/s",
        "vs_baseline": round(med / REFERENCE_FPS, 2),
        "runs": sorted(round(v, 2) for v in vals),
        "min": min(vals),
        "max": max(vals),
        "tier": recs[0].get("tier"),
        "protocol": f"median of {runs} fresh bench.py subprocesses",
    }
    print(json.dumps(out), flush=True)
    return [out]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--configs",
        default="1,2,3,4,5,6,7a,7pa,7b,7pb,7c,7pc,7d,7pd,8,9,10",
    )
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "results.json"))
    ap.add_argument(
        "--meta",
        default=(
            "TPU v5e (1 chip), sync-mode flip protocol (see bench.py); "
            "reference baseline = 12.15 FPS end-to-end CUDA --shared example "
            "session (README.md:101-117). Sweep/MFU fields: fused-region "
            "FLOP model in benchmarks/suite.py; f32-HIGHEST peak = bf16 "
            "peak / 6."
        ),
    )
    ap.add_argument(
        "--inline", action="store_true",
        help="run configs in-process (default: one subprocess per config — "
             "staged device buffers from earlier configs otherwise accumulate "
             "on the relay and the big stream configs OOM the chip)",
    )
    args = ap.parse_args()
    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()  # scan compiles persist across subprocesses
    keys = [k.strip() for k in args.configs.split(",")]
    results = []
    succeeded = set()
    if args.inline or len(keys) == 1:
        for key in keys:
            got = CONFIGS[key](args.frames)
            for rec in got if isinstance(got, list) else [got]:
                print(json.dumps(rec), flush=True)
                results.append(rec)
            succeeded.add(key)
    else:
        import subprocess
        import sys
        import tempfile

        for key in keys:
            with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
                tmp = tf.name
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--configs", key, "--frames", str(args.frames),
                 "--out", tmp, "--meta", ""],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            if proc.returncode != 0:
                results.append({"config": f"<config {key}>",
                                "error": f"rc={proc.returncode}"})
                continue
            with open(tmp) as f:
                results.extend(json.load(f))
            os.unlink(tmp)
            succeeded.add(key)
    if args.meta:
        results.append({"_meta": args.meta})
    results = merge_results(args.out, results, succeeded)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


def merge_results(path: str, new: list, succeeded=()) -> list:
    """Merge a (possibly partial) run into an existing results file.

    Records are keyed by (config, backend): a re-run config replaces its
    old row IN PLACE (table order is stable), novel configs append before
    the _meta row.  A partial `--configs 7md` run therefore refreshes one
    row instead of clobbering the whole committed table (which is what a
    bare overwrite did — the docs table is generated from this file).

    `succeeded` is the set of config KEYS that completed this run: any
    fossil "<config K>" error row for those keys is dropped (a failed
    run's error row is keyed by the suite key, a successful re-run's
    rows by real config names, so replacement alone never cleans them)."""
    try:
        with open(path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        return new
    stale = {f"<config {k}>" for k in succeeded}
    merged = [r for r in merged if r.get("config") not in stale]
    key = lambda r: (r.get("config"), r.get("backend"))  # noqa: E731
    # Drop stale same-key duplicates first (pre-merge-era files could hold
    # two rows for one key; replacement only ever hit the first, so the
    # second fossilized).
    seen = set()
    deduped = []
    for r in merged:
        if "_meta" in r:
            deduped.append(r)
            continue
        if key(r) in seen:
            continue
        seen.add(key(r))
        deduped.append(r)
    merged = deduped
    for rec in new:
        if "_meta" in rec:
            merged = [r for r in merged if "_meta" not in r] + [rec]
            continue
        for i, old in enumerate(merged):
            if "_meta" not in old and key(old) == key(rec):
                merged[i] = rec
                break
        else:
            metas = [r for r in merged if "_meta" in r]
            rows = [r for r in merged if "_meta" not in r]
            merged = rows + [rec] + metas
    return merged


if __name__ == "__main__":
    main()
