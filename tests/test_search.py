"""Window math and argmax tie-break tests (C5 semantics).

The C++ window math (tracker_ghc/src/main.cpp:193-218) is transcribed in pure
Python here as the oracle; the jitted versions must agree for every bbox
position, including edge clamps and collapsed windows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pvot.ops import search as search_ops


def cpp_window(cx, cy, tw, th, out_w, out_h, rx, ry):
    """Literal transcription of main.cpp:195-198 (C++ int division)."""
    min_tx = max(0, cx - rx - tw // 2)
    max_tx = min(out_w - 1, cx + rx - tw // 2)
    min_ty = max(0, cy - ry - th // 2)
    max_ty = min(out_h - 1, cy + ry - th // 2)
    return min_tx, max_tx, min_ty, max_ty


@pytest.mark.parametrize(
    "cx,cy",
    [(100, 80), (0, 0), (5, 200), (319, 239), (250, 10), (400, 120), (160, 120)],
)
def test_window_bounds_match_cpp(cx, cy):
    tw, th, out_w, out_h, rx, ry = 32, 32, 289, 209, 60, 60
    b = search_ops.local_window_bounds(
        jnp.int32(cx), jnp.int32(cy), tw, th, out_w, out_h, rx, ry
    )
    want = cpp_window(cx, cy, tw, th, out_w, out_h, rx, ry)
    got = (int(b.min_tx), int(b.max_tx), int(b.min_ty), int(b.max_ty))
    assert got == want
    assert bool(b.valid) == (want[1] >= want[0] and want[3] >= want[2])


def test_argmax_first_occurrence_row_major():
    """cv::minMaxLoc scans row-major and keeps the FIRST max; ties must
    resolve identically (SURVEY.md §7 'Hard parts')."""
    m = np.zeros((5, 7), np.float32)
    m[2, 3] = 1.0
    m[2, 5] = 1.0
    m[4, 1] = 1.0
    val, x, y = search_ops.argmax2d(jnp.asarray(m))
    assert (float(val), int(x), int(y)) == (1.0, 3, 2)


def test_masked_window_argmax_matches_cropped_minmaxloc(rng):
    cv2 = pytest.importorskip("cv2")
    m = rng.random((50, 70)).astype(np.float32)
    bounds = search_ops.WindowBounds(
        jnp.int32(10), jnp.int32(30), jnp.int32(5), jnp.int32(20)
    )
    val, x, y = search_ops.masked_window_argmax(jnp.asarray(m), bounds)
    roi = m[5:21, 10:31]
    _, max_val, _, max_loc = cv2.minMaxLoc(roi)
    assert float(val) == pytest.approx(max_val, abs=1e-7)
    assert (int(x), int(y)) == (max_loc[0] + 10, max_loc[1] + 5)


@pytest.mark.parametrize("cx,cy", [(100, 80), (2, 2), (285, 205), (30, 200)])
def test_region_argmax_equals_full_map_argmax(rng, cx, cy):
    """Fused-path invariant: masked argmax over the fixed-size candidate
    region == masked argmax over the full map."""
    tw = th = 32
    out_h, out_w = 209, 289
    rx = ry = 60
    span_x, span_y = 2 * rx + 1, 2 * ry + 1
    ncc = rng.random((out_h, out_w)).astype(np.float32)
    bounds = search_ops.local_window_bounds(
        jnp.int32(cx), jnp.int32(cy), tw, th, out_w, out_h, rx, ry
    )
    want = search_ops.masked_window_argmax(jnp.asarray(ncc), bounds)

    x0, y0 = search_ops.region_origin(bounds, out_w, out_h, span_x, span_y)
    region = jax.lax.dynamic_slice(jnp.asarray(ncc), (y0, x0), (span_y, span_x))
    got = search_ops.masked_region_argmax(region, x0, y0, bounds)
    assert float(got[0]) == pytest.approx(float(want[0]), abs=0)
    assert (int(got[1]), int(got[2])) == (int(want[1]), int(want[2]))


def test_region_origin_contains_window():
    """For every bbox center the fixed-size region must contain the clamped
    window so masking can recover it exactly."""
    tw = th = 32
    out_w, out_h = 289, 209
    rx = ry = 60
    span_x, span_y = 2 * rx + 1, 2 * ry + 1
    for cx in range(-20, 340, 7):
        for cy in [0, 13, 120, 239, 260]:
            b = search_ops.local_window_bounds(
                jnp.int32(cx), jnp.int32(cy), tw, th, out_w, out_h, rx, ry
            )
            if not bool(b.valid):
                continue
            x0, y0 = search_ops.region_origin(b, out_w, out_h, span_x, span_y)
            assert 0 <= int(x0) <= out_w - span_x
            assert 0 <= int(y0) <= out_h - span_y
            assert int(x0) <= int(b.min_tx) and int(b.max_tx) <= int(x0) + span_x - 1
            assert int(y0) <= int(b.min_ty) and int(b.max_ty) <= int(y0) + span_y - 1


def test_window_bounds_fuzz_vs_cpp():
    """Randomized sweep of the window math against the C++ transcription."""
    rng = np.random.default_rng(123)
    for _ in range(300):
        out_w = int(rng.integers(10, 800))
        out_h = int(rng.integers(10, 600))
        tw = int(rng.integers(1, 120))
        th = int(rng.integers(1, 120))
        rx = int(rng.integers(1, 200))
        ry = int(rng.integers(1, 200))
        cx = int(rng.integers(-50, out_w + tw + 50))
        cy = int(rng.integers(-50, out_h + th + 50))
        b = search_ops.local_window_bounds(
            jnp.int32(cx), jnp.int32(cy), tw, th, out_w, out_h, rx, ry
        )
        want = cpp_window(cx, cy, tw, th, out_w, out_h, rx, ry)
        got = (int(b.min_tx), int(b.max_tx), int(b.min_ty), int(b.max_ty))
        assert got == want, (cx, cy, tw, th, out_w, out_h, rx, ry)
