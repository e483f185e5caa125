"""Tracker checkpoint / resume.

The reference has no state serialization — a run is one-shot over a video
(SURVEY.md §5 checkpoint row).  Here the whole scan carry {bbox, adaptive
template, stats, lost counter, global flag} round-trips through a .npz, so a
live stream can stop and resume mid-video with a bit-identical trajectory.
"""

from __future__ import annotations

import numpy as np

from pvot.tracker.state import TrackerState

_FIELDS = TrackerState._fields
FORMAT_VERSION = 1


def normalize_path(path: str) -> str:
    """np.savez silently appends '.npz' to suffix-less paths; normalize up
    front so the name we save, report, and later load all agree."""
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: TrackerState) -> str:
    """Serialize a TrackerState (single or batched) to an .npz file.

    Returns the (normalized) path actually written."""
    path = normalize_path(path)
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    np.savez(path, __version__=FORMAT_VERSION, **arrays)
    return path


def load_state(path: str) -> TrackerState:
    """Load a TrackerState saved by save_state."""
    import os

    if not os.path.exists(path):
        path = normalize_path(path)
    with np.load(path) as data:
        version = int(data["__version__"])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        # numpy leaves: device-free load (jit converts on first use), so the
        # accelerator-free host mode can resume without touching a device.
        return TrackerState(*(np.asarray(data[name]) for name in _FIELDS))
