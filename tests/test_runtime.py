"""Native runtime tests: bit-exactness vs the Python paths, ring buffer
semantics, and fallback behavior."""

import numpy as np
import pytest

from pvot.io import gray as gray_mod
from pvot.runtime import native


def test_native_builds():
    assert native.available(), "native runtime failed to build"


def test_native_gray_bit_exact(rng):
    bgr = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    want = gray_mod.bgr_to_gray_u8(bgr)
    got = native.bgr_to_gray_u8(bgr)
    np.testing.assert_array_equal(got, want)


def test_native_gray_batch(rng):
    bgr = rng.integers(0, 256, size=(5, 32, 40, 3), dtype=np.uint8)
    got = native.bgr_to_gray_u8(bgr)
    for i in range(5):
        np.testing.assert_array_equal(got[i], gray_mod.bgr_to_gray_u8(bgr[i]))


def test_native_f32_scale_bit_exact(rng):
    g = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
    want = gray_mod.gray_u8_to_f32(g)
    got = native.gray_u8_to_f32(g)
    np.testing.assert_array_equal(got, want)


def test_frame_ring(rng):
    ring = native.FrameRing(capacity=4, frame_shape=(8, 8))
    frames = rng.integers(0, 256, size=(6, 8, 8), dtype=np.uint8)
    assert len(ring) == 0
    for i in range(4):
        assert ring.push(frames[i])
    assert not ring.push(frames[4]), "ring should be full"
    assert len(ring) == 4
    popped = ring.pop(3)
    np.testing.assert_array_equal(popped, frames[:3])
    assert ring.push(frames[4]) and ring.push(frames[5])
    popped = ring.pop(10)
    np.testing.assert_array_equal(popped, frames[3:6])
    assert len(ring) == 0
    assert ring.pop(2).shape == (0, 8, 8)
    ring.close()
