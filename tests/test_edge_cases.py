"""Edge-case behavior: frame-border tracking, window collapse, odd
geometries, template larger than the search span."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pvot.config import TrackerConfig
from pvot.io.gray import gray_u8_to_f32
from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
from pvot.tracker.scan import track_video
from pvot.tracker.state import init_state
from pvot.tracker.step import make_step
from tests.test_tracker import reference_tracker_emulator


def test_target_hugging_frame_edges():
    """Full-amplitude path pushes the target against every border: window
    clamping (main.cpp:195-198) and region-origin clipping must agree with
    the reference emulator exactly."""
    spec = SyntheticSpec(
        width=320, height=240, num_frames=50, target_w=32, target_h=32,
        seed=13, amplitude=1.0, noise_std=0.0,
    )
    video = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    cfg = TrackerConfig()
    want, _ = reference_tracker_emulator(video, (x, y, w, h), cfg)
    templ = gray_u8_to_f32(video[0])[y : y + h, x : x + w]
    state = init_state(jnp.asarray(templ), (x, y, w, h))
    _, out = track_video(video[1:], state, cfg, strategy="full", backend="cpu")
    got = [tuple(b) for b in np.asarray(out.bbox)]
    assert got == want
    # Fused fast path agrees too (reference-epsilon scores, same windows).
    state2 = init_state(jnp.asarray(templ), (x, y, w, h))
    _, fused = track_video(video[1:], state2, cfg, strategy="fused", backend="xla")
    gt_err = [
        abs(int(b[0]) - target_bbox(spec, i + 1)[0])
        + abs(int(b[1]) - target_bbox(spec, i + 1)[1])
        for i, b in enumerate(np.asarray(fused.bbox))
    ]
    assert max(gt_err) <= 2


def test_window_collapse_falls_back_to_global():
    """A bbox far right of the valid map makes the clamped window empty;
    the step must use the full-map argmax with the LOCAL threshold
    (main.cpp:439-446, 449)."""
    cfg = TrackerConfig(search_radius_x=4, search_radius_y=4)
    h, w = 64, 256
    th = tw = 16
    rng = np.random.default_rng(0)
    frame = rng.random((h, w)).astype(np.float32)
    templ = frame[24:40, 30:46].copy()
    # bbox center far right: cx - rx - tw//2 > out_w - 1 collapses the window.
    state = init_state(jnp.asarray(templ), (w - tw, 24, tw, th))
    state = state._replace(bbox_x=jnp.int32(w - 2))  # pathological position
    step = make_step((h, w), (th, tw), cfg, strategy="fused")
    new_state, out = jax.jit(step)(state, jnp.asarray(frame))
    assert bool(out.used_global)
    # Perfect match exists at (30, 24) and local threshold 0.4 accepts it.
    assert tuple(np.asarray(out.bbox)[:2]) == (30, 24)


def test_template_bigger_than_span_uses_full_strategy():
    """When the NCC map is smaller than the candidate span, make_step must
    silently fall back to the full-map strategy."""
    cfg = TrackerConfig(search_radius_x=60, search_radius_y=60)
    h, w = 96, 96  # out map 81x81 < span 121
    rng = np.random.default_rng(1)
    frame = rng.random((h, w)).astype(np.float32)
    templ = frame[40:56, 40:56].copy()
    state = init_state(jnp.asarray(templ), (40, 40, 16, 16))
    step = make_step((h, w), (16, 16), cfg, strategy="fused")
    new_state, out = jax.jit(step)(state, jnp.asarray(frame))
    assert tuple(np.asarray(out.bbox)[:2]) == (40, 40)
    assert float(out.score) > 0.99


@pytest.mark.parametrize("tw,th", [(1, 1), (3, 7), (31, 5)])
def test_odd_template_geometries(tw, th):
    """Non-square, tiny, and odd-sized templates through the full pipeline."""
    rng = np.random.default_rng(2)
    frame = rng.random((48, 64)).astype(np.float32)
    y0, x0 = 20, 30
    templ = frame[y0 : y0 + th, x0 : x0 + tw].copy()
    cfg = TrackerConfig(search_radius_x=8, search_radius_y=8)
    state = init_state(jnp.asarray(templ), (x0, y0, tw, th))
    step = make_step((48, 64), (th, tw), cfg, strategy="fused")
    _, out = jax.jit(step)(state, jnp.asarray(frame))
    assert tuple(np.asarray(out.bbox)[:2]) == (x0, y0)


def test_single_frame_video_and_empty_track():
    spec = SyntheticSpec(width=160, height=120, num_frames=2, target_w=24, target_h=24)
    video = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    templ = gray_u8_to_f32(video[0])[y : y + h, x : x + w]
    state = init_state(jnp.asarray(templ), (x, y, w, h))
    _, out = track_video(video[1:2], state, TrackerConfig(search_radius_x=10, search_radius_y=10))
    assert np.asarray(out.bbox).shape == (1, 4)
    state2 = init_state(jnp.asarray(templ), (x, y, w, h))
    _, empty = track_video(video[1:1], state2, TrackerConfig())
    assert np.asarray(empty.bbox).shape == (0, 4)


@pytest.mark.parametrize("seed", [21, 22, 23, 24, 25])
def test_trajectory_fuzz_vs_emulator(seed):
    """Randomized clip geometry/motion sweep: the device path (--cpu mode,
    full strategy) must match the reference-loop emulator exactly, and the
    fused path must match the cpu path's windows on the same clip.  Catches
    window-clamp / tie-break regressions the fixed fixtures might miss."""
    rng = np.random.default_rng(seed)
    tw = int(rng.choice([24, 32, 40]))
    radius = int(rng.choice([20, 30]))
    spec = SyntheticSpec(
        width=288, height=224, num_frames=30, target_w=tw, target_h=tw,
        seed=seed,
        amplitude=float(rng.uniform(0.3, 1.0)),
        noise_std=float(rng.uniform(0.0, 0.02)),
    )
    video = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    cfg = TrackerConfig(search_radius_x=radius, search_radius_y=radius)
    want, _ = reference_tracker_emulator(video, (x, y, w, h), cfg)
    templ = gray_u8_to_f32(video[0])[y : y + h, x : x + w]
    state = init_state(jnp.asarray(templ), (x, y, w, h))
    _, out = track_video(video[1:], state, cfg, strategy="full", backend="cpu")
    assert [tuple(b) for b in np.asarray(out.bbox)] == want
