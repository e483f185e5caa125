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


def test_stale_so_rebuilt(tmp_path):
    """A libpvot.so older than libpvot.cpp must be rebuilt by load(), so a
    stale binary can never shadow source changes (the .so is not in git)."""
    import os
    import subprocess
    import sys

    from pvot.runtime import native

    if native.load() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    so = native._SO
    cpp = os.path.join(os.path.dirname(so), "libpvot.cpp")
    # Make the .so stale relative to the source, then load in a fresh
    # interpreter (module-level cache would mask the rebuild here).
    old = os.path.getmtime(cpp) - 100
    os.utime(so, (old, old))
    code = (
        "from pvot.runtime import native; import os, sys;"
        "assert native.load() is not None;"
        "sys.exit(0 if os.path.getmtime(native._SO) > "
        f"{old + 50} else 1)"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(native.__file__))))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    result = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert result.returncode == 0, result.stderr
