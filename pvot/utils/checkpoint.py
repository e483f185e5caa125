"""Tracker checkpoint / resume.

The reference has no state serialization — a run is one-shot over a video
(SURVEY.md §5 checkpoint row).  Here the whole scan carry {bbox, adaptive
template, stats, lost counter, global flag} round-trips through a .npz, so a
live stream can stop and resume mid-video with a bit-identical trajectory.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pvot.tracker.state import TrackerState

_FIELDS = TrackerState._fields
FORMAT_VERSION = 1


def save_state(path: str, state: TrackerState) -> None:
    """Serialize a TrackerState (single or batched) to an .npz file."""
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    np.savez(path, __version__=FORMAT_VERSION, **arrays)


def load_state(path: str) -> TrackerState:
    """Load a TrackerState saved by save_state."""
    with np.load(path) as data:
        version = int(data["__version__"])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        return TrackerState(*(jnp.asarray(data[name]) for name in _FIELDS))
