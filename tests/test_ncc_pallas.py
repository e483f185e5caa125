"""Pallas NCC kernel tests (interpret mode on CPU; SURVEY.md §5 'race
detection' row: Pallas correctness is checked via interpret-mode vs the
oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pvot.ops.ncc_pallas import ncc_map_pallas, ncc_map_pallas_batched
from pvot.ops.ncc_reference import ncc_map_reference
from tests.test_ncc_ops import bruteforce_reference_map


def test_pallas_matches_bruteforce(rng):
    frame = rng.random((64, 80)).astype(np.float32)
    templ = frame[20:36, 30:42].copy()  # 16x12
    got = np.asarray(
        ncc_map_pallas(jnp.asarray(frame), jnp.asarray(templ), interpret=True)
    )
    want = bruteforce_reference_map(frame, templ)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pallas_matches_oracle_odd_shapes(rng):
    """Shapes that don't divide the (8, 128) tile exercise the padding/crop."""
    frame = rng.random((57, 133)).astype(np.float32)
    templ = rng.random((9, 11)).astype(np.float32)
    got = np.asarray(
        ncc_map_pallas(jnp.asarray(frame), jnp.asarray(templ), interpret=True)
    )
    want = np.asarray(ncc_map_reference(jnp.asarray(frame), jnp.asarray(templ)))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pallas_batched(rng):
    frames = rng.random((2, 40, 48)).astype(np.float32)
    templ = rng.random((8, 8)).astype(np.float32)
    got = np.asarray(
        ncc_map_pallas_batched(jnp.asarray(frames), jnp.asarray(templ), interpret=True)
    )
    for i in range(2):
        want = np.asarray(
            ncc_map_reference(jnp.asarray(frames[i]), jnp.asarray(templ))
        )
        np.testing.assert_allclose(got[i], want, atol=5e-5)


def test_pallas_flat_window_clamp(rng):
    frame = np.full((24, 136), 0.5, np.float32)
    templ = rng.random((8, 8)).astype(np.float32)
    got = np.asarray(
        ncc_map_pallas(jnp.asarray(frame), jnp.asarray(templ), interpret=True)
    )
    assert np.all(np.isfinite(got))
    assert np.all(np.abs(got) < 1e-3)


def test_toeplitz_hankel_build_matches_rolls(rng):
    """The ~5-op Hankel tile-reshape operator build (ncc_pallas.py
    _toeplitz_operators) equals the straightforward roll-per-lane
    construction for every (th, tw) bucket shape."""
    from pvot.ops.ncc_pallas import TX, _round_up, _toeplitz_operators

    # (9, 129) is the wraparound boundary tw == tile_lanes - TX + 1: exact,
    # and a guard regression (round-2 review) once rejected it.
    for th, tw in [(16, 12), (9, 11), (80, 80), (8, 128), (9, 129)]:
        t = rng.random((th, tw)).astype(np.float32)
        tile_lanes = _round_up(TX + tw - 1, 128)
        got = np.asarray(_toeplitz_operators(jnp.asarray(t), tile_lanes))
        k_blocks = -(-th // 8)
        padded = np.zeros((8 * k_blocks, tile_lanes), np.float32)
        padded[:th, :tw] = t
        want = np.stack(
            [np.roll(padded, dx, axis=1) for dx in range(TX)], axis=2
        )  # (8K, L, TX)
        want = want.reshape(k_blocks, 8, tile_lanes, TX)
        want = want.transpose(0, 2, 1, 3).reshape(k_blocks * tile_lanes, 8 * TX)
        np.testing.assert_array_equal(got, want, err_msg=f"{th}x{tw}")


def test_pallas_tall_strip_big_tile(rng):
    """A strip tall enough to trigger the ty=128 output tile (full MXU
    sublane occupancy) still matches the oracle."""
    frame = rng.random((200, 140)).astype(np.float32)
    templ = rng.random((17, 13)).astype(np.float32)
    got = np.asarray(
        ncc_map_pallas(jnp.asarray(frame), jnp.asarray(templ), interpret=True)
    )
    want = np.asarray(ncc_map_reference(jnp.asarray(frame), jnp.asarray(templ)))
    np.testing.assert_allclose(got, want, atol=5e-5)
