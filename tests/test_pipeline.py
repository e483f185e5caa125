"""Streaming pipeline tests: chunking, padding, trajectory equivalence with
the array driver, error propagation, and the pure-Python fallback."""

import numpy as np
import pytest

import jax.numpy as jnp

from pvot.io.gray import gray_u8_to_f32
from pvot.io.pipeline import FramePipeline, track_stream
from pvot.io.synthetic import (
    SyntheticSpec,
    generate_bgr_frames,
    generate_gray_video,
    target_bbox,
)
from pvot.tracker.scan import track_video
from pvot.tracker.state import init_state


def test_chunks_and_tail_padding(rng):
    frames = rng.integers(0, 256, size=(10, 16, 16), dtype=np.uint8)
    pipe = FramePipeline(iter(frames), (16, 16), chunk_size=4, capacity=8)
    got = list(pipe.chunks())
    assert [n for _, n in got] == [4, 4, 2]
    np.testing.assert_array_equal(got[0][0], frames[0:4])
    np.testing.assert_array_equal(got[2][0][:2], frames[8:10])
    np.testing.assert_array_equal(got[2][0][2:], np.repeat(frames[9:10], 2, 0))
    pipe.close()


def test_bgr_frames_converted(rng):
    from pvot.io.gray import bgr_to_gray_u8

    frames = rng.integers(0, 256, size=(5, 12, 12, 3), dtype=np.uint8)
    pipe = FramePipeline(iter(frames), (12, 12), chunk_size=5)
    (chunk, n), = list(pipe.chunks())
    assert n == 5
    for i in range(5):
        np.testing.assert_array_equal(chunk[i], bgr_to_gray_u8(frames[i]))
    pipe.close()


def test_python_fallback_ring(rng):
    frames = rng.integers(0, 256, size=(6, 8, 8), dtype=np.uint8)
    pipe = FramePipeline(
        iter(frames), (8, 8), chunk_size=4, capacity=3, use_native=False
    )
    got = list(pipe.chunks())
    assert [n for _, n in got] == [4, 2]
    np.testing.assert_array_equal(got[0][0], frames[:4])


def test_error_propagates():
    def bad_iter():
        yield np.zeros((8, 8), np.uint8)
        raise RuntimeError("decode failed")

    pipe = FramePipeline(bad_iter(), (8, 8), chunk_size=4)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(pipe.chunks())


def test_track_stream_matches_array_driver(small_video, small_spec):
    x, y, w, h = target_bbox(small_spec, 0)
    templ = gray_u8_to_f32(small_video[0])[y : y + h, x : x + w]
    s1 = init_state(jnp.asarray(templ), (x, y, w, h))
    _, want = track_video(small_video[1:], s1, chunk_size=8)
    s2 = init_state(jnp.asarray(templ), (x, y, w, h))
    _, got = track_stream(
        iter(small_video[1:]), s2, small_video.shape[1:], chunk_size=8
    )
    np.testing.assert_array_equal(np.asarray(got.bbox), np.asarray(want.bbox))


def test_close_while_producer_blocked(rng):
    """Closing mid-stream (e.g. the consumer aborted) must stop + join the
    producer BEFORE destroying the native ring — otherwise a blocked _push
    hands a freed C struct to pvot_ring_push (use-after-free)."""
    frames = rng.integers(0, 256, size=(64, 16, 16), dtype=np.uint8)
    # Tiny capacity: the producer fills the ring and blocks in _push.
    pipe = FramePipeline(iter(frames), (16, 16), chunk_size=4, capacity=2)
    import time

    time.sleep(0.05)  # let the producer hit the full ring
    pipe.close()  # must not crash; joins the producer first
    assert not pipe._thread.is_alive()


def test_close_while_producer_blocked_python_ring(rng):
    frames = rng.integers(0, 256, size=(64, 16, 16), dtype=np.uint8)
    pipe = FramePipeline(
        iter(frames), (16, 16), chunk_size=4, capacity=2, use_native=False
    )
    import time

    time.sleep(0.05)
    pipe.close()
    assert not pipe._thread.is_alive()


def test_frame_ring_guards_after_close():
    from pvot.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    ring = native.FrameRing(4, (8, 8))
    ring.close()
    assert len(ring) == 0
    with pytest.raises(RuntimeError):
        ring.push(np.zeros((8, 8), np.uint8))
    with pytest.raises(RuntimeError):
        ring.pop(1)
