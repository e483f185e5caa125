"""High-level NccTracker API tests."""

import numpy as np

from pvot.config import TrackerConfig
from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
from pvot.models.ncc import NccTracker

CFG = TrackerConfig(search_radius_x=20, search_radius_y=20)


def _clip():
    spec = SyntheticSpec(
        width=256, height=192, num_frames=16, target_w=24, target_h=24,
        seed=5, amplitude=0.25,
    )
    return spec, generate_gray_video(spec)


def test_update_loop_follows_target():
    spec, video = _clip()
    roi = target_bbox(spec, 0)
    tracker = NccTracker(video[0], roi, CFG)
    for i in range(1, len(video)):
        bbox, score = tracker.update(video[i])
        gx, gy, _, _ = target_bbox(spec, i)
        assert abs(bbox[0] - gx) <= 2 and abs(bbox[1] - gy) <= 2
        assert score > 0.8
    assert tracker.bbox == bbox


def test_track_matches_update_loop():
    spec, video = _clip()
    roi = target_bbox(spec, 0)
    a = NccTracker(video[0], roi, CFG)
    boxes_a = [a.update(video[i])[0] for i in range(1, len(video))]
    b = NccTracker(video[0], roi, CFG)
    out = b.track(video[1:], chunk_size=5)
    np.testing.assert_array_equal(
        np.asarray(boxes_a, np.int32), np.asarray(out.bbox)
    )


def test_save_load_roundtrip(tmp_path):
    spec, video = _clip()
    roi = target_bbox(spec, 0)
    t = NccTracker(video[0], roi, CFG)
    for i in range(1, 8):
        t.update(video[i])
    p = str(tmp_path / "t.npz")
    t.save(p)
    t2 = NccTracker.load(p, video.shape[1:], CFG)
    for i in range(8, len(video)):
        want = t.update(video[i])
        got = t2.update(video[i])
        assert want[0] == got[0]
