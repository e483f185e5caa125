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
