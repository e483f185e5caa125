"""Multi-object tracking via vmap.

The reference's proposal lists "multiple-object tracking by running several
trackers concurrently" as its never-implemented 150% stretch goal (Proposal
PDF p.3; SURVEY.md §2e).  On TPU it falls out of the functional design: the
per-frame step is a pure function of (state, frame), so K objects are a
`jax.vmap` over K TrackerStates sharing each frame — one fused dispatch for
all objects, K NCC searches batched onto the MXU together.

All templates in one MultiTracker must share a (th, tw) shape (vmap needs a
uniform pytree); heterogeneous ROI sizes go in separate trackers or get
resized/padded by the caller.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pvot.config import TrackerConfig
from pvot.tracker.state import StepOutput, TrackerState, init_state
from pvot.tracker.step import make_step


def init_multi_state(
    templates: Sequence[jax.Array],
    rois: Sequence[Tuple[int, int, int, int]],
) -> TrackerState:
    """Stack K single-object states into one batched TrackerState."""
    if len(templates) != len(rois):
        raise ValueError("templates and rois must pair up")
    shapes = {tuple(np.shape(t)) for t in templates}
    if len(shapes) != 1:
        raise ValueError(f"all templates must share one shape, got {shapes}")
    states = [init_state(jnp.asarray(t), r) for t, r in zip(templates, rois)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_multi_step(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig = TrackerConfig(),
    strategy: str = "fused",
    backend: str = "xla",
):
    """Per-frame step over a batched state: (K-state, frame) -> (K-state, K-outs)."""
    from pvot.ops.backends import get_backend

    full_fn, region_fn = get_backend(backend, frame_shape, templ_shape, config)
    step = make_step(
        frame_shape, templ_shape, config,
        ncc_full_fn=full_fn, ncc_region_fn=region_fn, strategy=strategy,
    )
    vstep = jax.vmap(step, in_axes=(0, None))

    def multi_step(states: TrackerState, frame: jax.Array):
        return vstep(states, frame)

    return multi_step


def track_video_multi(
    frames: np.ndarray,
    states: TrackerState,
    config: TrackerConfig = TrackerConfig(),
    strategy: str = "fused",
    backend: str = "xla",
    chunk_size: int = 32,
) -> Tuple[TrackerState, StepOutput]:
    """Track K objects through a gray video (F, H, W); outputs get a leading
    (F, K) layout."""
    from pvot.tracker.scan import _stack_outputs, make_masked_scan_fn

    frames = np.asarray(frames)
    f, h, w = frames.shape
    th, tw = states.template.shape[-2:]
    multi_step = make_multi_step((h, w), (th, tw), config, strategy, backend)
    scan_fn = make_masked_scan_fn(multi_step)
    outs = []
    for start in range(0, f, chunk_size):
        chunk = frames[start : start + chunk_size]
        n_real = chunk.shape[0]
        if n_real < chunk_size:
            pad = np.repeat(chunk[-1:], chunk_size - n_real, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        valid = np.arange(chunk_size) < n_real
        states, out = scan_fn(states, jax.device_put(chunk), jax.device_put(valid))
        outs.append(jax.tree.map(lambda a: a[:n_real], out))
    return states, _stack_outputs(outs)
