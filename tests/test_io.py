"""I/O layer tests: grayscale parity, synthetic fixture determinism, video
round-trip, raw-frame cache format (B1's loader, baseline_cpu/cpub.cpp)."""

import os

import numpy as np
import pytest

from pvot.io.gray import bgr_to_gray_u8, gray_u8_to_f32, to_gray
from pvot.io.synthetic import SyntheticSpec, generate_bgr_frames, generate_gray_video
from pvot.io.video import VideoReader, VideoWriter, load_cached_video, save_cached_video

cv2 = pytest.importorskip("cv2")


def test_gray_matches_opencv(rng):
    bgr = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    want = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(bgr_to_gray_u8(bgr), want)


def test_gray_fixed_point_formula(rng):
    """The numpy fallback must match cv2 bit-exactly."""
    import pvot.io.gray as gray_mod

    bgr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    b = bgr[..., 0].astype(np.uint32)
    g = bgr[..., 1].astype(np.uint32)
    r = bgr[..., 2].astype(np.uint32)
    manual = (
        (b * gray_mod._B_COEF + g * gray_mod._G_COEF + r * gray_mod._R_COEF + gray_mod._ROUND)
        >> gray_mod._SHIFT
    ).astype(np.uint8)
    np.testing.assert_array_equal(manual, cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY))


def test_to_gray_reference_semantics(rng):
    """to_gray == cvtColor(BGR2GRAY) then /255 as f32 (utils.hpp:4-13)."""
    bgr = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    want = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
    np.testing.assert_array_equal(to_gray(bgr), want)


def test_synthetic_deterministic():
    spec = SyntheticSpec(width=160, height=120, num_frames=5, target_w=24, target_h=24)
    a = generate_gray_video(spec)
    b = generate_gray_video(spec)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (5, 120, 160) and a.dtype == np.uint8


def test_synthetic_bgr_roundtrips_through_gray():
    spec = SyntheticSpec(width=160, height=120, num_frames=3, target_w=24, target_h=24)
    gray = generate_gray_video(spec)
    for i, bgr in enumerate(generate_bgr_frames(spec)):
        np.testing.assert_array_equal(bgr_to_gray_u8(bgr), gray[i])


def test_synthetic_periodic_occlusion():
    """occlusion_period parks the target outside the frame for the LAST
    occlusion_len frames of every period window; frame 0 stays visible
    (it seeds the template)."""
    from pvot.io.synthetic import target_bbox

    spec = SyntheticSpec(
        width=160, height=120, num_frames=32, target_w=24, target_h=24,
        occlusion_period=8, occlusion_len=3,
    )
    for i in range(spec.num_frames):
        x = target_bbox(spec, i)[0]
        outside = x >= spec.width
        assert outside == (i % 8 >= 5), (i, x)
    assert target_bbox(spec, 0)[0] < spec.width
    frames = generate_gray_video(spec)
    assert frames.shape == (32, 120, 160)
    # occlusion_phase offsets the cycle (staggered multi-stream fixtures):
    # frame i with phase p occludes exactly when frame i+p would unphased.
    spec_p = SyntheticSpec(
        width=160, height=120, num_frames=32, target_w=24, target_h=24,
        occlusion_period=8, occlusion_len=3, occlusion_phase=4,
    )
    for i in range(spec_p.num_frames):
        outside = target_bbox(spec_p, i)[0] >= spec_p.width
        assert outside == ((i + 4) % 8 >= 5), i


def test_video_write_read_roundtrip(tmp_path):
    spec = SyntheticSpec(width=160, height=120, num_frames=8, target_w=24, target_h=24)
    path = str(tmp_path / "clip.avi")
    frames = list(generate_bgr_frames(spec))
    with VideoWriter(path, fps=30.0, size=(160, 120)) as w:
        for f in frames:
            w.write(f)
    with VideoReader(path) as r:
        assert r.size == (160, 120)
        decoded = list(r)
    assert len(decoded) == 8
    # Lossy codec: content approximately preserved.
    diff = np.abs(decoded[0].astype(int) - frames[0].astype(int)).mean()
    assert diff < 16


def test_raw_frame_cache_roundtrip(tmp_path, rng):
    """B1's cache format: int32 w,h,type header then raw frames
    (baseline_cpu/cpub.cpp loadCachedVideo)."""
    frames = rng.integers(0, 256, size=(4, 24, 32, 3), dtype=np.uint8)
    path = str(tmp_path / "frames.cache")
    save_cached_video(path, frames)
    loaded = load_cached_video(path)
    np.testing.assert_array_equal(loaded, frames)
    assert load_cached_video(str(tmp_path / "missing.cache")) is None
