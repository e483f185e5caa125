"""Mega-kernel (whole-chunk-in-one-pallas_call) parity tests.

Interpret-mode on CPU: the kernel itself runs through the Pallas
interpreter, the driver logic (chunking, poison transactions, state
re-canonicalization) runs for real.  Chip-level validation lives in
tools/mega_ab_bench.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pvot.config import TrackerConfig
from pvot.io.gray import gray_u8_to_f32
from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
from pvot.ops.ncc_mega import MegaGeometry
from pvot.tracker.mega import track_video_mega
from pvot.tracker.scan import track_video
from pvot.tracker.state import init_state


def _setup(spec):
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    templ = jnp.asarray(gray_u8_to_f32(frames[0])[y : y + h, x : x + w])
    return frames, init_state(templ, (x, y, w, h))


# Small geometry keeps interpret-mode runtime sane while exercising real
# alignment residuals (frame extents NOT multiples of the slab alignments).
SPEC = SyntheticSpec(
    width=250, height=94, num_frames=14, target_w=16, target_h=16, seed=3,
    noise_std=1.0,
)
CONFIG = TrackerConfig(search_radius_x=8, search_radius_y=8)


def _assert_equal(want, got):
    np.testing.assert_array_equal(want.bbox, got.bbox)
    np.testing.assert_array_equal(want.updated, got.updated)
    np.testing.assert_array_equal(want.used_global, got.used_global)
    np.testing.assert_allclose(want.score, got.score, atol=1e-5)


def _assert_equal_global(want, got):
    """Equality contract for in-kernel global-search runs: bboxes/flags
    bit-equal; ACCEPTED scores strict (1e-5); REJECTED scores 2e-3 — a
    rejected score is a max over noise/near-flat positions where
    cross-engine numerics amplify (pvot.tracker.mega._outputs_equal)."""
    np.testing.assert_array_equal(want.bbox, got.bbox)
    np.testing.assert_array_equal(want.updated, got.updated)
    np.testing.assert_array_equal(want.used_global, got.used_global)
    acc = np.asarray(want.updated)
    np.testing.assert_allclose(
        np.asarray(want.score)[acc], np.asarray(got.score)[acc], atol=1e-5
    )
    np.testing.assert_allclose(want.score, got.score, atol=2e-3)


def test_mega_matches_scan_path():
    frames, state = _setup(SPEC)
    want_state, want = track_video(
        frames[1:], state, CONFIG, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, CONFIG, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert int(got_state.bbox_y) == int(want_state.bbox_y)
    np.testing.assert_allclose(
        np.asarray(got_state.template), np.asarray(want_state.template),
        atol=1e-6,
    )
    assert int(got_state.lost_count) == int(want_state.lost_count)


def test_mega_tail_chunk_masking():
    """13 frames over chunk 4: the padded tail must not commit state."""
    frames, state = _setup(SPEC)
    want_state, want = track_video(
        frames[1:], state, CONFIG, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, CONFIG, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    assert got.bbox.shape == want.bbox.shape == (13, 4)
    _assert_equal(want, got)


def test_mega_poison_reruns_global_frames():
    """A lost-object clip must poison and re-run through the scan path,
    ending with IDENTICAL records incl. used_global frames.
    inkernel_global=False pins the poison-transaction kernel — it stays
    the fallback for geometries where only the local-mode kernel
    compiles, so its machinery keeps its own coverage."""
    spec = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, state = _setup(spec)
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True, inkernel_global=False,
    )
    assert want.used_global.any(), "fixture must actually trigger global"
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert bool(got_state.use_global) == bool(want_state.use_global)


def test_mega_inkernel_global_matches_scan():
    """The round-4 in-kernel global-search kernel commits lost-object
    frames ON-CHIP (no poison, no scan re-run) with records bit-identical
    to the scan path, including used_global and the global->local
    re-acquisition transition."""
    spec = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, state = _setup(spec)
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    # _probe=True skips the support probe; inkernel_global=True forces the
    # global-mode kernel, so ANY global frame reaching the poison/rollback
    # path would desync the records and fail the equality below.
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True, inkernel_global=True,
    )
    assert want.used_global.any(), "fixture must actually trigger global"
    _assert_equal_global(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert bool(got_state.use_global) == bool(want_state.use_global)
    np.testing.assert_allclose(
        np.asarray(got_state.template), np.asarray(want_state.template),
        atol=1e-6,
    )


def test_mega_inkernel_global_strip_cover():
    """Re-acquisition is POSITIONALLY exact across the whole strip grid:
    the target reappears at positions chosen to land in interior strips,
    edge (clamped) strips, and strip-overlap regions, and the in-kernel
    full-map argmax must recover the exact scan-path bbox every time (the
    accepted-match score towers over the noise floor, so this isolates
    the strip cover + absolute-coordinate lexicographic combine from the
    rejected-frame noise-max tolerance)."""
    from pvot.ops.ncc_mega import TX, MegaGeometry

    rng = np.random.default_rng(21)
    h, w, t = 94, 250, 16
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=1,
        min_confidence=0.4, global_confidence=0.4,
    )
    g = MegaGeometry((h, w), (t, t), config)
    base = rng.integers(0, 256, (h, w), np.uint8)
    x0, y0 = (w - t) // 2, (h - t) // 2
    patch = base[y0 : y0 + t, x0 : x0 + t].copy()
    # Positions: map origin, strip-row boundary, lane-tile boundary (TX),
    # clamped right/bottom edges, and an interior overlap region.
    targets = [
        (0, 0),
        (0, max(0, g.ty - t // 2)),
        (min(w - t, TX - t // 2), 0),
        (w - t, h - t),
        (min(w - t, TX + 7), min(h - t, g.ty + 5)),
    ]
    frames = [base]
    for px, py in targets:
        gone = rng.integers(0, 256, (2, h, w), np.uint8)  # lose the target
        back = rng.integers(0, 256, (h, w), np.uint8)
        back[py : py + t, px : px + t] = patch
        frames += [gone[0], gone[1], back, back]  # re-acquire + settle
    frames = np.stack(frames)
    templ = jnp.asarray(gray_u8_to_f32(base)[y0 : y0 + t, x0 : x0 + t])
    state = init_state(templ, (x0, y0, t, t))
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True, inkernel_global=True,
    )
    assert want.used_global.sum() >= len(targets), "every cycle must global"
    for px, py in targets:
        assert any(
            (b[0], b[1]) == (px, py) for b in want.bbox
        ), f"oracle must re-acquire at {(px, py)}"
    _assert_equal_global(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)


def test_mega_auto_mode_prefers_inkernel_global():
    """With inkernel_global unset, the driver probes the global-mode
    kernel first and serves it when it proves out (records still exact)."""
    from pvot.tracker import mega as mega_mod

    frames, state = _setup(SPEC)
    want_state, want = track_video(
        frames[1:], state, CONFIG, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, CONFIG, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    _assert_equal(want, got)
    key = (
        "cpu", (SPEC.height, SPEC.width),
        (SPEC.target_h, SPEC.target_w), CONFIG, True, 1, True,
    )
    assert mega_mod._SUPPORT_CACHE.get(key) is True, (
        "auto mode must have probed (and adopted) the in-kernel global "
        "kernel at this geometry"
    )


def test_device_resident_frames_match_host():
    """Round 4: the drivers accept DEVICE-RESIDENT frames (a jax.Array stays
    put, chunks slice/pad on device, poison re-runs never re-upload —
    pvot.tracker.scan.as_frames).  Exercises the tail-pad path (13 frames,
    chunk 4) and the poison-rollback path on an exit/re-enter clip; records
    and final state must bit-match the host-numpy runs."""
    import jax

    spec = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, state = _setup(spec)
    staged = jax.device_put(frames[1:])

    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video(
        staged, state, config, strategy="fused", backend="xla", chunk_size=4,
    )
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)

    want_state, want = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    got_state, got = track_video_mega(
        staged, state, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    assert want.used_global.any(), "fixture must actually trigger global"
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert bool(got_state.use_global) == bool(want_state.use_global)


def test_mega_span_tiled_matches_scan_path():
    """Round 4: spans wider than one TX output tile (nx=2) AND taller than
    128 rows (ty=136) run the span-tiled score pass with the exact
    cross-tile argmax combine — the envelope extension that admits the
    blueprint's r160 configs (BASELINE.json config 4).  Trajectory must
    equal the scan path's; scores carry f32 accumulation-order noise that
    grows with the window, hence the looser atol."""
    spec = SyntheticSpec(
        width=250, height=160, num_frames=10, target_w=16, target_h=16,
        seed=7, noise_std=1.0,
    )
    config = TrackerConfig(search_radius_x=70, search_radius_y=64)
    g = MegaGeometry((160, 250), (16, 16), config)
    assert g.supported() and g.nx == 2 and g.ty > 128
    frames, state = _setup(spec)
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    np.testing.assert_array_equal(want.bbox, got.bbox)
    np.testing.assert_array_equal(want.updated, got.updated)
    np.testing.assert_allclose(want.score, got.score, atol=1e-4)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert int(got_state.bbox_y) == int(want_state.bbox_y)


def test_mega_span_tiled_multi_and_objects():
    """The span-tiled pass composes with the multi-stream and multi-object
    grid variants (same kernel body)."""
    import jax

    from pvot.tracker.mega import track_objects_mega, track_streams_mega

    spec = SyntheticSpec(
        width=250, height=160, num_frames=8, target_w=16, target_h=16,
        seed=9, noise_std=1.0,
    )
    config = TrackerConfig(search_radius_x=70, search_radius_y=64)
    frames, state = _setup(spec)
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    _, got_s = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True,
    )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[state, state])
    _, got_m = track_streams_mega(
        np.stack([frames, frames])[:, 1:], stacked, config, chunk_size=4,
        scan_backend="xla", interpret=True, _probe=True,
    )
    _, got_o = track_objects_mega(
        frames[1:], stacked, config, chunk_size=4,
        scan_backend="xla", interpret=True, _probe=True,
    )
    for lane in range(2):
        # Trajectory semantics vs the scan path; scores vs the SINGLE
        # mega run (same kernel math — only the vmapped chunk-boundary
        # stats re-canonicalization can move them by ~1 ulp.  vs the
        # matmul engine, low-variance windows on this noise clip amplify
        # reduction-order noise through the var cancellation to ~1e-3,
        # so that comparison pins bboxes only).
        np.testing.assert_array_equal(want.bbox, got_m.bbox[:, lane])
        np.testing.assert_array_equal(want.bbox, got_o.bbox[:, lane])
        np.testing.assert_allclose(
            got_s.score, got_m.score[:, lane], atol=1e-5
        )
        np.testing.assert_allclose(
            got_s.score, got_o.score[:, lane], atol=1e-5
        )


def test_mega_large_template_matches_scan_path():
    """Round 5: template WIDTH past one lane tile (tw > TX=128 — the
    structurally new envelope: tile_lanes grows past 2 lane tiles and the
    shear tt roll/correlation reads span it) runs the same kernel.
    Trajectory must equal the scan path's.  (th > 128 is only more
    unrolled k-blocks — interpret mode at 17 blocks times out on CPU, so
    the 160x160 geometry class is validated ON CHIP by the per-geometry
    probe + the engine A/B row; here the static envelope is asserted.)"""
    spec = SyntheticSpec(
        width=200, height=120, num_frames=8, target_w=136, target_h=48,
        seed=11, noise_std=1.0, amplitude=0.25,
    )
    config = TrackerConfig(search_radius_x=8, search_radius_y=8)
    g = MegaGeometry((120, 200), (48, 136), config)
    assert g.supported() and g.tw > 128 and g.tile_lanes > 2 * 128
    # The VERDICT target geometry class is admitted by the static envelope
    # (the runtime gate stays the per-geometry compile+numerics probe).
    assert MegaGeometry((1080, 1920), (160, 160),
                        TrackerConfig(search_radius_x=160,
                                      search_radius_y=160)).supported()
    frames, state = _setup(spec)
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    np.testing.assert_array_equal(want.bbox, got.bbox)
    np.testing.assert_array_equal(want.updated, got.updated)
    # 48x136 windows fold 6.5k terms: f32 accumulation-order noise between
    # the shear kernel and the matmul engine grows with the window.
    np.testing.assert_allclose(want.score, got.score, atol=1e-4)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert int(got_state.bbox_y) == int(want_state.bbox_y)


def test_mega_unroll_matches_unroll1():
    """Round 5: unroll=4 (four frames per sequential grid step — the
    per-step-floor amortization lever) must be BIT-IDENTICAL to unroll=1
    in records and final template: sub-frames run in order against the
    same scratch state, so only the grid bookkeeping changes.  Also
    composes with the in-kernel batch cadence (the mask uses the global
    frame index)."""
    import jax.numpy as jnp

    from pvot.ops.ncc_mega import mega_track_chunk
    from pvot.ops.ncc_reference import template_stats

    frames, state = _setup(SPEC)
    chunk = jnp.asarray(frames[1:13])  # 12 frames: divisible by 4
    t_mean, t_std = template_stats(state.template)
    args = (
        chunk,
        jnp.stack(state.bbox).astype(jnp.int32),
        state.template, t_mean, t_std,
        jnp.int32(0), jnp.int32(0), jnp.int32(12),
    )
    kw = dict(
        frame_shape=(94, 250), templ_shape=(16, 16), config=CONFIG,
        interpret=True,
    )
    # Variant list kept lean: the 4x-unrolled body makes interpret-mode
    # XLA compiles expensive (unroll=4 plain 53 s; with the in-kernel
    # global strip grid 197 s — measured round 5), and ikg/fast-tier are
    # structurally identical w.r.t. the unroll loop (same factored body).
    for extra in (
        {},
        {"batch": 4},
    ):
        rows1, tpl1 = mega_track_chunk(*args, **kw, **extra)
        rows4, tpl4 = mega_track_chunk(*args, **kw, unroll=4, **extra)
        np.testing.assert_array_equal(
            np.asarray(rows1), np.asarray(rows4), err_msg=str(extra)
        )
        np.testing.assert_array_equal(np.asarray(tpl1), np.asarray(tpl4))
    with pytest.raises(ValueError):
        mega_track_chunk(*args, **kw, unroll=5)  # 5 does not divide 12


def test_mega_unroll_multi_and_objects():
    """unroll composes with the multi-stream and multi-object grids."""
    import jax

    from pvot.ops.ncc_mega import (
        mega_track_chunk_multi,
        mega_track_chunk_objects,
    )
    from pvot.ops.ncc_reference import template_stats

    frames, state = _setup(SPEC)
    chunk = jnp.asarray(frames[1:9])  # 8 frames
    t_mean, t_std = template_stats(state.template)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[state, state]
    )
    margs = (
        jnp.stack([chunk, chunk]),
        jnp.stack([jnp.stack(state.bbox)] * 2).astype(jnp.int32),
        stacked.template,
        jnp.stack([t_mean] * 2), jnp.stack([t_std] * 2),
        jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
        jnp.full(2, 8, jnp.int32),
    )
    kw = dict(
        frame_shape=(94, 250), templ_shape=(16, 16), config=CONFIG,
        interpret=True,
    )
    # unroll=2 (not 4): same loop structure, half the traced body — the
    # interpret-mode XLA compile scales with the unrolled body size.
    r1, t1 = mega_track_chunk_multi(*margs, **kw)
    r2, t2 = mega_track_chunk_multi(*margs, **kw, unroll=2)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    oargs = (chunk,) + margs[1:]
    r1, t1 = mega_track_chunk_objects(*oargs, **kw)
    r2, t2 = mega_track_chunk_objects(*oargs, **kw, unroll=2)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_mega_geometry_fallback():
    """Spans beyond the round-4 envelope (4 output tiles) fall back to the
    scan path wholesale."""
    frames, state = _setup(SPEC)
    config = TrackerConfig(search_radius_x=256, search_radius_y=8)
    g = MegaGeometry((94, 250), (16, 16), config)
    assert not g.supported()
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    _assert_equal(want, got)


def test_mega_fast_tier_and_prepad():
    """highest=False (3-pass bf16 hi/lo shear dot) must track the HIGHEST
    kernel's trajectory on the fixture with only fast-tier score drift;
    pre-padded frames must produce bit-identical records."""
    from pvot.ops.ncc_mega import mega_track_chunk

    frames, state = _setup(SPEC)
    args = (
        jnp.asarray([int(state.bbox_x), int(state.bbox_y),
                     int(state.bbox_w), int(state.bbox_h)], jnp.int32),
        state.template, state.t_mean, state.t_std,
        state.lost_count, state.use_global, jnp.int32(8),
    )
    kw = dict(frame_shape=(94, 250), templ_shape=(16, 16), config=CONFIG,
              interpret=True)
    rows_hi, tpl_hi = mega_track_chunk(jnp.asarray(frames[1:9]), *args, **kw)
    rows_fast, tpl_fast = mega_track_chunk(
        jnp.asarray(frames[1:9]), *args, highest=False, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(rows_hi[:, :4]), np.asarray(rows_fast[:, :4])
    )
    drift = float(np.max(np.abs(
        np.asarray(rows_hi[:, 4]) - np.asarray(rows_fast[:, 4])
    )))
    assert drift < 1e-4, drift
    # 2-pass tier (round 4): window effectively bf16, template hi+lo;
    # same trajectory on the fixture, score drift one bf16 rounding wider.
    rows_f2, _ = mega_track_chunk(
        jnp.asarray(frames[1:9]), *args, highest=False, score_passes=2, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(rows_hi[:, :4]), np.asarray(rows_f2[:, :4])
    )
    drift2 = float(np.max(np.abs(
        np.asarray(rows_hi[:, 4]) - np.asarray(rows_f2[:, 4])
    )))
    # ~1.1e-3 measured on this 16x16-template fixture (score drift scales
    # like 1/sqrt(n); the 80x80 headline template sits well under 1e-3) —
    # the real guards are bbox bit-equality above and the on-chip
    # ground-truth check per run.
    assert drift2 < 4e-3, drift2
    # 1-pass tier (round 5): plain bf16 x bf16 — template low half dropped
    # too; trajectory must still match on the fixture (the on-chip
    # per-run ground-truth check remains the adoption guard).
    rows_f1, _ = mega_track_chunk(
        jnp.asarray(frames[1:9]), *args, highest=False, score_passes=1, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(rows_hi[:, :4]), np.asarray(rows_f1[:, :4])
    )
    drift1 = float(np.max(np.abs(
        np.asarray(rows_hi[:, 4]) - np.asarray(rows_f1[:, 4])
    )))
    assert drift1 < 2e-2, drift1
    with pytest.raises(ValueError):  # out-of-range tier fails loudly
        mega_track_chunk(
            jnp.asarray(frames[1:9]), *args, highest=False,
            score_passes=4, **kw
        )
    g = MegaGeometry((94, 250), (16, 16), CONFIG)
    prepad = np.zeros((8, g.pad_h, g.pad_w), np.uint8)
    prepad[:, :94, :250] = frames[1:9]
    rows_pp, tpl_pp = mega_track_chunk(jnp.asarray(prepad), *args, **kw)
    np.testing.assert_array_equal(np.asarray(rows_hi), np.asarray(rows_pp))
    np.testing.assert_array_equal(np.asarray(tpl_hi), np.asarray(tpl_pp))


def test_track_video_backend_mega_routes():
    """pvot.track_video(backend=\"mega\") reaches the mega driver (here its
    geometry/probe fallback arm on CPU) and matches the scan path."""
    frames, state = _setup(SPEC)
    want_state, want = track_video(
        frames[1:], state, CONFIG, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video(
        frames[1:], state, CONFIG, strategy="fused", backend="mega",
        chunk_size=4,
    )
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)


def test_track_stream_mega_matches_scan(monkeypatch):
    """The streaming mega path (one pallas_call per chunk, eager per-chunk
    fetch, transactional poison re-run) matches the scan stream — driven in
    interpret mode, including a poisoning (global-search) clip."""
    from pvot.io.pipeline import _track_stream_mega, track_stream

    spec = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, state = _setup(spec)
    want_state, want = track_stream(
        iter(frames[1:]), state, (94, 250), config, backend="xla",
        chunk_size=4,
    )
    timings: list = []
    got_state, got = _track_stream_mega(
        iter(frames[1:]), state, (94, 250), config, chunk_size=4,
        timings=timings, scan_backend="xla", interpret=True,
    )
    assert want.used_global.any(), "fixture must actually trigger global"
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert sum(n for n, _ in timings) == 17


def test_track_stream_backend_mega_fallback():
    """track_stream(backend=\"mega\") on a geometry outside the mega
    envelope falls back to the scan engines and still tracks."""
    frames, state = _setup(SPEC)
    config = TrackerConfig(search_radius_x=70, search_radius_y=8)
    from pvot.io.pipeline import track_stream

    want_state, want = track_stream(
        iter(frames[1:]), state, (94, 250), config, backend="xla",
        chunk_size=4,
    )
    got_state, got = track_stream(
        iter(frames[1:]), state, (94, 250), config, backend="mega",
        chunk_size=4,
    )
    _assert_equal(want, got)


def test_track_video_mega_respects_strategy(monkeypatch):
    """backend=\"mega\" with a non-fused strategy must NOT silently switch
    semantics to the fused kernel: the requested strategy runs on the scan
    engines (the pallas_shear chain) and the mega driver never fires."""
    import pvot.tracker.mega as mega_mod

    def boom(*a, **k):  # pragma: no cover - failure arm
        raise AssertionError("mega driver must not run for strategy='full'")

    monkeypatch.setattr(mega_mod, "track_video_mega", boom)
    frames, state = _setup(SPEC)
    want_state, want = track_video(
        frames[1:], state, CONFIG, strategy="full", backend="pallas_shear",
        chunk_size=4,
    )
    got_state, got = track_video(
        frames[1:], state, CONFIG, strategy="full", backend="mega",
        chunk_size=4,
    )
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)


def test_track_stream_mega_respects_strategy(monkeypatch):
    """track_stream(backend=\"mega\", strategy=\"full\") runs the full-map
    strategy on the scan engines — the mega chunk driver never fires."""
    import pvot.io.pipeline as pipeline_mod
    from pvot.io.pipeline import track_stream

    def boom(*a, **k):  # pragma: no cover - failure arm
        raise AssertionError("mega driver must not run for strategy='full'")

    monkeypatch.setattr(pipeline_mod, "_track_stream_mega", boom)
    frames, state = _setup(SPEC)
    want_state, want = track_stream(
        iter(frames[1:]), state, (94, 250), CONFIG, strategy="full",
        backend="pallas_shear", chunk_size=4,
    )
    got_state, got = track_stream(
        iter(frames[1:]), state, (94, 250), CONFIG, strategy="full",
        backend="mega", chunk_size=4,
    )
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)


def test_cli_mega_flag_parses():
    from pvot.cli.main import parse_args

    args = parse_args(["clip.mp4", "--mega", "--record"])
    assert args.mode == "mega"


def test_mega_multi_stream_matches_per_stream():
    """The multi-stream mega kernel (grid (S, F), per-stream (s, 0) input
    blocks) must match the per-stream scan path exactly — including the
    scratch-state re-seed at each stream boundary."""
    from pvot.tracker.mega import track_streams_mega

    specs = [
        SyntheticSpec(width=250, height=94, num_frames=14, target_w=16,
                      target_h=16, seed=3 + s, noise_std=1.0)
        for s in range(3)
    ]
    videos, states = [], []
    for spec in specs:
        frames, state = _setup(spec)
        videos.append(frames)
        states.append(state)
    videos = np.stack(videos)
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got_states, got = track_streams_mega(
        videos[:, 1:], stacked, CONFIG, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True,
    )
    assert got.bbox.shape == (13, 3, 4)
    for s in range(3):
        want_state, want = track_video(
            videos[s, 1:], states[s], CONFIG, strategy="fused",
            backend="xla", chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, got.bbox[:, s])
        np.testing.assert_array_equal(want.updated, got.updated[:, s])
        np.testing.assert_allclose(want.score, got.score[:, s], atol=1e-5)
        assert int(got_states.bbox_x[s]) == int(want_state.bbox_x)
        np.testing.assert_allclose(
            np.asarray(got_states.template[s]),
            np.asarray(want_state.template), atol=1e-6,
        )


def test_mega_multi_stream_per_stream_poison():
    """One stream losing its object must poison and re-run ONLY that
    stream; the others commit their mega records untouched."""
    from pvot.tracker.mega import track_streams_mega

    import itertools

    from pvot.io.synthetic import generate_gray_frames

    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    # Stream 0 must genuinely track locally under lost_frame_threshold=2:
    # a 120-frame sinusoid sliced to 18 frames moves slowly enough (the
    # 18-frame specs all outrun radius 8 and go global themselves).
    spec_ok = SyntheticSpec(
        width=250, height=94, num_frames=120, target_w=16, target_h=16,
        seed=3, noise_std=1.0,
    )
    spec_lost = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    videos, states = [], []
    for spec in (spec_ok, spec_lost):
        frames = np.stack(
            list(itertools.islice(generate_gray_frames(spec), 18))
        )
        x, y, w, h = target_bbox(spec, 0)
        templ = jnp.asarray(gray_u8_to_f32(frames[0])[y : y + h, x : x + w])
        videos.append(frames)
        states.append(init_state(templ, (x, y, w, h)))
    videos = np.stack(videos)
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got_states, got = track_streams_mega(
        videos[:, 1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True,
    )
    assert got.used_global[:, 1].any(), "lost stream must go global"
    assert not got.used_global[:, 0].any()
    for s in range(2):
        want_state, want = track_video(
            videos[s, 1:], states[s], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, got.bbox[:, s])
        np.testing.assert_array_equal(want.updated, got.updated[:, s])
        np.testing.assert_array_equal(
            want.used_global, got.used_global[:, s]
        )
        np.testing.assert_allclose(want.score, got.score[:, s], atol=1e-5)
        assert int(got_states.bbox_x[s]) == int(want_state.bbox_x)


def test_mega_multi_stream_scan_fallback():
    """Outside the mega envelope, track_streams_mega falls back to the
    per-stream scan path with the same output contract."""
    from pvot.tracker.mega import track_streams_mega

    config = TrackerConfig(search_radius_x=256, search_radius_y=8)
    frames, state = _setup(SPEC)
    videos = np.stack([frames, frames])
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[state, state])
    got_states, got = track_streams_mega(
        videos[:, 1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    for s in range(2):
        np.testing.assert_array_equal(want.bbox, got.bbox[:, s])
        np.testing.assert_allclose(want.score, got.score[:, s], atol=1e-5)


def test_mega_f32_frames_fallback():
    frames, state = _setup(SPEC)
    frames_f32 = gray_u8_to_f32(frames)
    want_state, want = track_video(
        frames_f32[1:], state, CONFIG, strategy="fused", backend="xla",
        chunk_size=4,
    )
    got_state, got = track_video_mega(
        frames_f32[1:], state, CONFIG, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    _assert_equal(want, got)


def test_mega_multi_object_matches_per_object():
    """The multi-object mega kernel (grid (K, F), SHARED frames): each
    object's trajectory through one clip must exactly match a lone
    tracker with the same template — per-object slab DMA out of the same
    frame, per-object (k, 0)-indexed state re-seed."""
    import itertools

    import jax

    from pvot.io.synthetic import generate_gray_frames
    from pvot.tracker.mega import track_objects_mega

    # One clip, three trackers: the real moving target plus two STATIC
    # high-contrast patches stamped into every frame.  (Patches of the
    # bare synthetic background are NCC-degenerate — smooth bilinear
    # field, argmax decided inside the engines' ~1e-5 reduction-order
    # noise — so the stamps keep every lane's peak decisive.)
    spec = SyntheticSpec(
        width=250, height=94, num_frames=120, target_w=16, target_h=16,
        seed=3, noise_std=1.0,
    )
    frames = np.stack(list(itertools.islice(generate_gray_frames(spec), 14)))
    rng = np.random.default_rng(21)
    for sx, sy in ((10, 10), (200, 60)):
        frames[:, sy : sy + 16, sx : sx + 16] = rng.integers(
            0, 256, (16, 16), np.uint8
        )
    x, y, w, h = target_bbox(spec, 0)
    rois = [(x, y, w, h), (10, 10, 16, 16), (200, 60, 16, 16)]
    states = [
        init_state(
            jnp.asarray(gray_u8_to_f32(frames[0])[ry : ry + rh, rx : rx + rw]),
            (rx, ry, rw, rh),
        )
        for rx, ry, rw, rh in rois
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got_states, got = track_objects_mega(
        frames[1:], stacked, CONFIG, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True,
    )
    assert got.bbox.shape == (13, 3, 4)
    for k in range(3):
        want_state, want = track_video(
            frames[1:], states[k], CONFIG, strategy="fused",
            backend="xla", chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, got.bbox[:, k])
        np.testing.assert_array_equal(want.updated, got.updated[:, k])
        np.testing.assert_allclose(want.score, got.score[:, k], atol=1e-5)
        assert int(got_states.bbox_x[k]) == int(want_state.bbox_x)
        np.testing.assert_allclose(
            np.asarray(got_states.template[k]),
            np.asarray(want_state.template), atol=1e-6,
        )


def test_mega_multi_object_per_object_poison():
    """An object that leaves the frame poisons and re-runs ONLY its own
    lane; the other object's mega records commit untouched."""
    import itertools

    import jax

    from pvot.io.synthetic import generate_gray_frames
    from pvot.tracker.mega import track_objects_mega

    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    # The clip's real target exits and re-enters (object 1 goes global);
    # object 0 tracks a distinctive STATIC patch stamped into every frame
    # (see test_mega_multi_object_matches_per_object for why the bare
    # background is not usable as a clean lane).
    spec = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    frames = np.stack(list(itertools.islice(generate_gray_frames(spec), 18)))
    rng = np.random.default_rng(22)
    frames[:, 10:26, 10:26] = rng.integers(0, 256, (16, 16), np.uint8)
    x, y, w, h = target_bbox(spec, 0)
    rois = [(10, 10, 16, 16), (x, y, w, h)]
    states = [
        init_state(
            jnp.asarray(gray_u8_to_f32(frames[0])[ry : ry + rh, rx : rx + rw]),
            (rx, ry, rw, rh),
        )
        for rx, ry, rw, rh in rois
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got_states, got = track_objects_mega(
        frames[1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True,
    )
    assert got.used_global[:, 1].any(), "lost object must go global"
    assert not got.used_global[:, 0].any()
    for k in range(2):
        want_state, want = track_video(
            frames[1:], states[k], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, got.bbox[:, k])
        np.testing.assert_array_equal(
            want.used_global, got.used_global[:, k]
        )
        np.testing.assert_allclose(want.score, got.score[:, k], atol=1e-5)
        assert int(got_states.bbox_x[k]) == int(want_state.bbox_x)


def test_mega_multi_object_scan_fallback():
    """Outside the mega envelope track_objects_mega falls back to the
    vmapped multi-object scan step with the same (F, K) contract."""
    import jax

    from pvot.tracker.mega import track_objects_mega

    config = TrackerConfig(search_radius_x=256, search_radius_y=8)
    frames, state = _setup(SPEC)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[state, state])
    got_states, got = track_objects_mega(
        frames[1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    want_state, want = track_video(
        frames[1:], state, config, strategy="fused", backend="xla",
        chunk_size=4,
    )
    for k in range(2):
        np.testing.assert_array_equal(want.bbox, got.bbox[:, k])
        np.testing.assert_allclose(want.score, got.score[:, k], atol=1e-5)


# ---------------------------------------------------------------------------
# Batch (look-ahead, C10) semantics composed with the mega grid (round 4):
# only every batch-th frame is scored in-kernel; the rest emit the pre-batch
# bbox with score -1 at zero marginal cost.  Oracle: the batched scan path
# (pvot.tracker.scan.track_video_batched, main.cpp:362-392 semantics).
# ---------------------------------------------------------------------------


def test_mega_batch_matches_scan_batch():
    """batch=4 over 23 frames (chunk 8): 5 full batches + 3 leftover frames
    must bit-match the batched scan path, including the leftover tail's
    score=-1 / no-update rows."""
    from pvot.tracker.scan import track_video_batched

    spec = SyntheticSpec(
        width=250, height=94, num_frames=24, target_w=16, target_h=16,
        seed=3, noise_std=1.0,
    )
    frames, state = _setup(spec)
    want_state, want = track_video_batched(
        frames[1:], state, CONFIG, batch_size=4, backend="xla",
    )
    got_state, got = track_video_mega(
        frames[1:], state, CONFIG, chunk_size=8, scan_backend="xla",
        interpret=True, batch=4,
    )
    assert got.bbox.shape == want.bbox.shape == (23, 4)
    _assert_equal(want, got)
    assert (got.score[:3] == -1.0).all()  # look-ahead rows
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert int(got_state.lost_count) == int(want_state.lost_count)
    np.testing.assert_allclose(
        np.asarray(got_state.template), np.asarray(want_state.template),
        atol=1e-6,
    )


def test_mega_batch_poison_reruns_on_batched_scan():
    """A lost-object clip in batch mode must poison and re-run through the
    BATCHED scan path (cadence preserved across the rollback)."""
    from pvot.tracker.scan import track_video_batched

    spec = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=1
    )
    frames, state = _setup(spec)
    want_state, want = track_video_batched(
        frames[1:], state, config, batch_size=2, backend="xla",
    )
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True, batch=2, inkernel_global=False,
    )
    assert want.used_global.any(), "fixture must actually trigger global"
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert bool(got_state.use_global) == bool(want_state.use_global)


def test_mega_multi_stream_batch_matches_per_stream():
    """Streams x batch on the multi-stream mega grid: each stream must
    match its own batched scan run (the 32-streams-x-batch-4 serving row's
    semantics, at test scale)."""
    import jax

    from pvot.tracker.mega import track_streams_mega
    from pvot.tracker.scan import track_video_batched

    spec = SyntheticSpec(
        width=250, height=94, num_frames=24, target_w=16, target_h=16,
        seed=3, noise_std=1.0,
    )
    frames, state = _setup(spec)
    videos = np.stack([frames[1:], frames[1:][::-1].copy()])
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[state, state])
    got_states, got = track_streams_mega(
        videos, stacked, CONFIG, chunk_size=8, scan_backend="xla",
        interpret=True, batch=4,
    )
    for s in range(2):
        want_state, want = track_video_batched(
            videos[s], state, CONFIG, batch_size=4, backend="xla",
        )
        np.testing.assert_array_equal(want.bbox, got.bbox[:, s])
        np.testing.assert_array_equal(want.updated, got.updated[:, s])
        np.testing.assert_allclose(want.score, got.score[:, s], atol=1e-5)
        assert int(got_states.bbox_x[s]) == int(want_state.bbox_x)


def test_mega_batch_inkernel_global_matches_batched_scan():
    """Batch cadence composes with the in-kernel global search: lost-object
    frames at the cadence commit on-chip, records match the batched scan
    path exactly (incl. used_global on scored frames, False on skipped)."""
    from pvot.tracker.scan import track_video_batched

    spec = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=1
    )
    frames, state = _setup(spec)
    want_state, want = track_video_batched(
        frames[1:], state, config, batch_size=2, backend="xla",
    )
    got_state, got = track_video_mega(
        frames[1:], state, config, chunk_size=4, scan_backend="xla",
        interpret=True, batch=2, _probe=True, inkernel_global=True,
    )
    assert want.used_global.any(), "fixture must actually trigger global"
    _assert_equal_global(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)
    assert bool(got_state.use_global) == bool(want_state.use_global)


def test_mega_multi_stream_inkernel_global():
    """Multi-stream grid with in-kernel global search: the lost stream
    re-acquires ON-CHIP while the clean stream's records are untouched —
    no poison lanes, no per-stream rollback."""
    import itertools

    import jax

    from pvot.io.synthetic import generate_gray_frames
    from pvot.tracker.mega import track_streams_mega

    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    spec_ok = SyntheticSpec(
        width=250, height=94, num_frames=120, target_w=16, target_h=16,
        seed=3, noise_std=1.0,
    )
    spec_lost = SyntheticSpec(
        width=250, height=94, num_frames=18, target_w=16, target_h=16,
        seed=5, exit_and_reenter=True,
    )
    videos, states = [], []
    for spec in (spec_ok, spec_lost):
        frames = np.stack(
            list(itertools.islice(generate_gray_frames(spec), 18))
        )
        x, y, w, h = target_bbox(spec, 0)
        templ = jnp.asarray(gray_u8_to_f32(frames[0])[y : y + h, x : x + w])
        videos.append(frames)
        states.append(init_state(templ, (x, y, w, h)))
    videos = np.stack(videos)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got_states, got = track_streams_mega(
        videos[:, 1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True, inkernel_global=True,
    )
    assert got.used_global[:, 1].any(), "lost stream must go global"
    assert not got.used_global[:, 0].any()
    for s in range(2):
        want_state, want = track_video(
            videos[s, 1:], states[s], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        got_s = type(want)(
            bbox=got.bbox[:, s], score=got.score[:, s],
            used_global=got.used_global[:, s], updated=got.updated[:, s],
        )
        _assert_equal_global(want, got_s)
        assert int(got_states.bbox_x[s]) == int(want_state.bbox_x)


def test_mega_multi_object_inkernel_global():
    """Multi-object grid (shared frames) with in-kernel global search: the
    object starting outside the frame re-acquires on-chip; the centered
    object tracks locally through the same clip."""
    import jax

    from pvot.tracker.mega import track_objects_mega

    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, state = _setup(SPEC)
    x, y, w, h = target_bbox(SPEC, 0)
    # Object 1 starts with its bbox center outside the frame: immediate
    # global mode, then re-acquisition of the same target.
    lost_state = init_state(state.template, (-(w // 2) - 2, y, w, h))
    states = [state, lost_state]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got_states, got = track_objects_mega(
        frames[1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True, inkernel_global=True,
    )
    assert got.used_global[:, 1].any(), "lost object must go global"
    for k in range(2):
        want_state, want = track_video(
            frames[1:], states[k], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        got_k = type(want)(
            bbox=got.bbox[:, k], score=got.score[:, k],
            used_global=got.used_global[:, k], updated=got.updated[:, k],
        )
        _assert_equal_global(want, got_k)
        assert int(got_states.bbox_x[k]) == int(want_state.bbox_x)


def test_mega_batch_non_pow2_falls_back():
    """batch=3 has no in-kernel cadence mask (Mosaic rejects division):
    the driver must fall back to the batched scan path, same results."""
    from pvot.tracker.scan import track_video_batched

    frames, state = _setup(SPEC)
    want_state, want = track_video_batched(
        frames[1:], state, CONFIG, batch_size=3, backend="pallas_shear",
    )
    got_state, got = track_video_mega(
        frames[1:], state, CONFIG, chunk_size=4, interpret=True, batch=3,
    )
    _assert_equal(want, got)
    assert int(got_state.bbox_x) == int(want_state.bbox_x)


def _bucketed_setup(lost_start=False):
    """Three mixed-size templates over one clip; object 2 optionally
    starts with its center outside the frame (immediate global mode)."""
    from pvot.parallel.multi import init_multi_state_bucketed

    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, _ = _setup(SPEC)
    x, y, w, h = target_bbox(SPEC, 0)
    g = gray_u8_to_f32(frames[0])
    templs = [
        g[y : y + h, x : x + w],
        g[y + 2 : y + 14, x + 2 : x + 14],
        g[y + 2 : y + 14, x : x + w],
    ]
    rois = [
        (x, y, w, h),
        (-8 if lost_start else x + 2, y + 2, 12, 12),
        (x, y + 2, w, 12),
    ]
    stacked = init_multi_state_bucketed(
        [np.asarray(t) for t in templs], rois
    )
    return config, frames, templs, rois, stacked


def _assert_object_equal_bucketed(want, got_k):
    """Bucketed contract: bboxes/flags bit-equal; accepted scores 5e-5
    (the traced-extent box sums reduce in a different f32 order than the
    exact-shape oracle — pvot.tracker.mega._outputs_equal), rejected
    engine-grade."""
    np.testing.assert_array_equal(want.bbox, got_k.bbox)
    np.testing.assert_array_equal(want.updated, got_k.updated)
    np.testing.assert_array_equal(want.used_global, got_k.used_global)
    acc = np.asarray(want.updated)
    np.testing.assert_allclose(
        np.asarray(want.score)[acc], np.asarray(got_k.score)[acc],
        atol=5e-5,
    )
    np.testing.assert_allclose(want.score, got_k.score, atol=2e-3)


def test_mega_objects_bucketed_matches_per_object():
    """HETEROGENEOUS template sizes on the multi-object mega kernel
    (round-4 VERDICT item 4): K mixed-size trackers in ONE pallas_call —
    per-object traced extents, per-object box-sum blocks — each trajectory
    exactly the single-tracker run at its true geometry."""
    from pvot.tracker.mega import track_objects_mega

    config, frames, templs, rois, stacked = _bucketed_setup()
    got_states, got = track_objects_mega(
        frames[1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True, inkernel_global=False,
    )
    for k in range(3):
        st = init_state(jnp.asarray(templs[k]), rois[k])
        want_state, want = track_video(
            frames[1:], st, config, strategy="fused", backend="xla",
            chunk_size=4,
        )
        got_k = type(want)(
            bbox=got.bbox[:, k], score=got.score[:, k],
            used_global=got.used_global[:, k], updated=got.updated[:, k],
        )
        _assert_object_equal_bucketed(want, got_k)
        assert int(got_states.bbox_x[k]) == int(want_state.bbox_x)
        # Final templates: bucket-padded copies of the true-extent result.
        eh, ew = rois[k][3], rois[k][2]
        np.testing.assert_allclose(
            np.asarray(got_states.template[k])[:eh, :ew],
            np.asarray(want_state.template), atol=1e-6,
        )


def test_mega_objects_bucketed_inkernel_global():
    """Bucketed + in-kernel global search: the 12x12 object starting
    outside the frame re-acquires ON-CHIP at its own traced geometry
    while the other mixed-size objects track locally."""
    from pvot.tracker.mega import track_objects_mega

    config, frames, templs, rois, stacked = _bucketed_setup(lost_start=True)
    got_states, got = track_objects_mega(
        frames[1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True, _probe=True, inkernel_global=True,
    )
    assert got.used_global[:, 1].any(), "lost object must go global"
    for k in range(3):
        st = init_state(jnp.asarray(templs[k]), rois[k])
        want_state, want = track_video(
            frames[1:], st, config, strategy="fused", backend="xla",
            chunk_size=4,
        )
        got_k = type(want)(
            bbox=got.bbox[:, k], score=got.score[:, k],
            used_global=got.used_global[:, k], updated=got.updated[:, k],
        )
        _assert_object_equal_bucketed(want, got_k)
        assert int(got_states.bbox_x[k]) == int(want_state.bbox_x)


def test_mega_objects_bucketed_probe_and_auto_mode():
    """The bucketed support probe (exact extent set) passes in interpret
    mode and the driver's auto mode adopts the in-kernel global kernel."""
    from pvot.tracker import mega as mega_mod

    config, frames, templs, rois, stacked = _bucketed_setup()
    got_states, got = mega_mod.track_objects_mega(
        frames[1:], stacked, config, chunk_size=4, scan_backend="xla",
        interpret=True,
    )
    extents = tuple((r[3], r[2]) for r in rois)
    key = (
        "objects", "cpu", (SPEC.height, SPEC.width),
        (16, 16), config, True, True, extents,
    )
    assert mega_mod._SUPPORT_CACHE.get(key) is True, (
        "auto mode must have probed (and adopted) the bucketed "
        "in-kernel-global kernel at this extent set"
    )
    for k in range(3):
        st = init_state(jnp.asarray(templs[k]), rois[k])
        _, want = track_video(
            frames[1:], st, config, strategy="fused", backend="xla",
            chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, got.bbox[:, k])


def test_track_video_multi_routes_bucketed():
    """track_video_multi auto-detects bucketed states (bbox extents !=
    template bucket) and serves them on the traced-extent step."""
    from pvot.parallel.multi import track_video_multi

    config, frames, templs, rois, stacked = _bucketed_setup()
    _, got = track_video_multi(
        frames[1:], stacked, config, chunk_size=4,
    )
    for k in range(3):
        st = init_state(jnp.asarray(templs[k]), rois[k])
        _, want = track_video(
            frames[1:], st, config, strategy="fused", backend="xla",
            chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, got.bbox[:, k])
        np.testing.assert_allclose(want.score, got.score[:, k], atol=2e-3)
