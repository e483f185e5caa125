"""Host (accelerator-free) path: native C++ NCC engine + host tracking loop.

The native engine is the reference ncc_cpu.cpp analog
(pvot/runtime/libpvot.cpp::pvot_ncc_match_f32); the host loop
(pvot/models/host.py) is an independent second implementation of the
tracker semantics — trajectory equality with the scanned JAX path is the
strongest cross-check both directions.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pvot
from pvot.config import TrackerConfig
from pvot.io.gray import gray_u8_to_f32
from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
from pvot.models.host import HostTracker, track_video_host
from pvot.ops.ncc_reference import ncc_map_reference, template_stats
from pvot.runtime import native


def test_native_ncc_matches_oracle(rng):
    """C++ engine vs the f32 JAX oracle: same epsilon structure, double
    accumulation keeps it within f32 rounding noise."""
    for fh, fw, th, tw in [(48, 64, 8, 8), (100, 120, 17, 13), (160, 160, 80, 80)]:
        frame = rng.random((fh, fw), np.float32)
        templ = rng.random((th, tw), np.float32)
        got = native.ncc_match(frame, templ)
        want = np.asarray(
            ncc_map_reference(jnp.asarray(frame), jnp.asarray(templ))
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_ncc_cached_stats_match_template_stats(rng):
    """Passing cached (t_mean, t_std) must agree with the JAX-side cache
    convention (t_std already includes one +1e-6)."""
    frame = rng.random((64, 64), np.float32)
    templ = rng.random((12, 12), np.float32)
    t_mean, t_std = template_stats(jnp.asarray(templ))
    got = native.ncc_match(frame, templ, float(t_mean), float(t_std))
    want = np.asarray(
        ncc_map_reference(jnp.asarray(frame), jnp.asarray(templ))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_numpy_fallback_matches_native(rng):
    """The pure-numpy fallback implements the identical double-accumulation
    math (used when no C++ toolchain exists)."""
    frame = rng.random((72, 90), np.float32)
    templ = rng.random((15, 11), np.float32)
    t_mean, t_std = native.template_stats_host(templ)
    a = native._ncc_numpy(frame, templ, t_mean, t_std)
    b = native.ncc_match(frame, templ, t_mean, t_std)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_host_trajectory_matches_device_path(small_spec, small_video):
    """Full-clip bbox/flag equality between the host loop and the scanned
    JAX path — two independent implementations of C5-C8."""
    x, y, w, h = target_bbox(small_spec, 0)
    templ = gray_u8_to_f32(small_video[0])[y : y + h, x : x + w]
    state = pvot.init_state(jnp.asarray(templ), (x, y, w, h))
    _, dev = pvot.track_video(small_video[1:], state)

    _, host = track_video_host(small_video[1:], templ, (x, y, w, h))
    np.testing.assert_array_equal(host["bbox"], np.asarray(dev.bbox))
    np.testing.assert_array_equal(host["used_global"], np.asarray(dev.used_global))
    np.testing.assert_array_equal(host["updated"], np.asarray(dev.updated))
    np.testing.assert_allclose(
        host["score"], np.asarray(dev.score), atol=2e-5
    )


def test_host_global_reacquisition_matches_device(reenter_spec, reenter_video):
    """Exit-and-reenter clip with a low lost threshold: the host loop takes
    the same global-search transitions as the device path."""
    config = TrackerConfig(lost_frame_threshold=5)
    x, y, w, h = target_bbox(reenter_spec, 0)
    templ = gray_u8_to_f32(reenter_video[0])[y : y + h, x : x + w]
    state = pvot.init_state(jnp.asarray(templ), (x, y, w, h))
    _, dev = pvot.track_video(reenter_video[1:], state, config=config)

    _, host = track_video_host(reenter_video[1:], templ, (x, y, w, h), config)
    assert host["used_global"].any()  # the scenario actually exercises C8
    np.testing.assert_array_equal(host["bbox"], np.asarray(dev.bbox))
    np.testing.assert_array_equal(host["used_global"], np.asarray(dev.used_global))


def test_host_tracker_incremental_matches_batch(small_spec, small_video):
    """HostTracker.update steps (carried lost/use_global counters) equal the
    one-shot loop."""
    x, y, w, h = target_bbox(small_spec, 0)
    templ = gray_u8_to_f32(small_video[0])[y : y + h, x : x + w]
    _, want = track_video_host(small_video[1:11], templ, (x, y, w, h))

    t = HostTracker(small_video[0], (x, y, w, h))
    got = [t.update(fr) for fr in small_video[1:11]]
    assert [b for b, _ in got] == [tuple(r) for r in want["bbox"].tolist()]
    assert t.bbox == tuple(want["bbox"][-1].tolist())


def test_host_windows_tree_variant(small_spec, small_video):
    """enable_global_search=False (Windows-tree/main_old) never goes global."""
    config = TrackerConfig(enable_global_search=False, lost_frame_threshold=2)
    x, y, w, h = target_bbox(small_spec, 0)
    templ = gray_u8_to_f32(small_video[0])[y : y + h, x : x + w]
    _, host = track_video_host(small_video[1:], templ, (x, y, w, h), config)
    assert not host["used_global"].any()


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_host_vs_device_fuzz(seed):
    """Randomized geometry/motion: the host loop and the scanned device path
    must agree exactly (bbox + flags) — the strongest guard on the two
    independent implementations of C5-C8."""
    rng = np.random.default_rng(seed)
    tw = int(rng.choice([24, 32, 40]))
    radius = int(rng.choice([16, 24, 30]))
    spec = SyntheticSpec(
        width=288, height=224, num_frames=25, target_w=tw, target_h=tw,
        seed=seed,
        amplitude=float(rng.uniform(0.3, 1.0)),
        noise_std=float(rng.uniform(0.0, 0.02)),
    )
    video = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    cfg = TrackerConfig(search_radius_x=radius, search_radius_y=radius,
                        lost_frame_threshold=4)
    templ = gray_u8_to_f32(video[0])[y : y + h, x : x + w]
    state = pvot.init_state(jnp.asarray(templ), (x, y, w, h))
    _, dev = pvot.track_video(video[1:], state, config=cfg)
    _, host = track_video_host(video[1:], templ, (x, y, w, h), cfg)
    np.testing.assert_array_equal(host["bbox"], np.asarray(dev.bbox))
    np.testing.assert_array_equal(host["used_global"], np.asarray(dev.used_global))
    np.testing.assert_array_equal(host["updated"], np.asarray(dev.updated))
