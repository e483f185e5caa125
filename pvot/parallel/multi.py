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
    per_object_frames: bool = False,
):
    """Per-frame step over a batched state: (K-state, frame) -> (K-state, K-outs).

    per_object_frames=False: one shared frame, K objects (multi-object).
    per_object_frames=True: frames (K, H, W), one per tracker — K independent
    STREAMS advancing in lockstep (the serving layout; shard it over a mesh
    with pvot.parallel.sharded for multi-chip).

    NOT a plain vmap of the single-object step: under vmap, lax.cond lowers
    to a select that executes BOTH branches, so every object would pay the
    full-frame NCC every frame (~450x slowdown measured).  Instead the local
    region search is vmapped (cheap, batched MXU work), and the expensive
    global search runs under a SCALAR cond — only on frames where at least
    one object needs re-acquisition, and then for all K objects (their
    templates differ, so K full maps are inherent to that rare case).
    """
    from jax import lax

    from pvot.ops import search as search_ops
    from pvot.ops.backends import get_backend
    from pvot.tracker.state import is_bbox_outside_frame
    from pvot.tracker.step import _ensure_f32, apply_update

    full_fn, region_fn = get_backend(backend, frame_shape, templ_shape, config)
    frame_h, frame_w = frame_shape
    templ_h, templ_w = templ_shape
    out_w = frame_w - templ_w + 1
    out_h = frame_h - templ_h + 1
    span_x = 2 * config.search_radius_x + 1
    span_y = 2 * config.search_radius_y + 1
    lost_threshold = int(config.lost_frame_threshold)
    use_region = strategy == "fused" and out_w >= span_x and out_h >= span_y

    def multi_step(states: TrackerState, frame: jax.Array):
        frame = _ensure_f32(frame)
        bbox_outside = is_bbox_outside_frame(
            states.bbox_x, states.bbox_y, states.bbox_w, states.bbox_h,
            frame_w, frame_h,
        )
        cx = states.bbox_x + states.bbox_w // 2
        cy = states.bbox_y + states.bbox_h // 2
        use_global = (
            states.use_global | bbox_outside | (states.lost_count >= lost_threshold)
        )
        bounds = search_ops.local_window_bounds(
            cx, cy, templ_w, templ_h, out_w, out_h,
            config.search_radius_x, config.search_radius_y,
        )  # all fields (K,)
        global_k = use_global | ~bounds.valid

        f_ax = 0 if per_object_frames else None

        # Local pass for every object (batched MXU work).
        if use_region:
            x0, y0 = search_ops.region_origin(bounds, out_w, out_h, span_x, span_y)

            def one_local(fr, templ, t_mean, t_std, x0k, y0k, b):
                scores = region_fn(fr, templ, t_mean, t_std, x0k, y0k)
                return search_ops.masked_region_argmax(scores, x0k, y0k, b)

            l_val, l_x, l_y = jax.vmap(one_local, in_axes=(f_ax, 0, 0, 0, 0, 0, 0))(
                frame, states.template, states.t_mean, states.t_std, x0, y0, bounds
            )
        else:

            def one_full(fr, templ, t_mean, t_std, b):
                m = full_fn(fr, templ, t_mean, t_std)
                return search_ops.masked_window_argmax(m, b)

            l_val, l_x, l_y = jax.vmap(one_full, in_axes=(f_ax, 0, 0, 0, 0))(
                frame, states.template, states.t_mean, states.t_std, bounds
            )

        # Global pass, only when some object needs it (scalar cond: one
        # branch executes).
        def do_global(frame):
            def one(fr, templ, t_mean, t_std):
                return search_ops.argmax2d(full_fn(fr, templ, t_mean, t_std))

            return jax.vmap(one, in_axes=(f_ax, 0, 0, 0))(
                frame, states.template, states.t_mean, states.t_std
            )

        def skip(frame):
            k = states.t_mean.shape[0]
            return (
                jnp.zeros((k,), jnp.float32),
                jnp.zeros((k,), jnp.int32),
                jnp.zeros((k,), jnp.int32),
            )

        g_val, g_x, g_y = lax.cond(jnp.any(global_k), do_global, skip, frame)
        best_val = jnp.where(global_k, g_val, l_val)
        best_x = jnp.where(global_k, g_x, l_x)
        best_y = jnp.where(global_k, g_y, l_y)

        return jax.vmap(
            lambda st, fr, bv, bx, by, ug, ga: apply_update(
                st, fr, bv, bx, by, ug, ga,
                frame_shape, templ_shape, config,
            ),
            in_axes=(0, f_ax, 0, 0, 0, 0, 0),
        )(states, frame, best_val, best_x, best_y, use_global, global_k)

    return multi_step


def make_multi_stream_step(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig = TrackerConfig(),
    strategy: str = "fused",
    backend: str = "xla",
):
    """S independent streams in lockstep: (S-state, (S,H,W)) -> (S-state, S-outs).

    The serving layout for a single chip; combine with
    pvot.parallel.sharded.make_data_parallel_multi_step to span a mesh.
    """
    return make_multi_step(
        frame_shape, templ_shape, config, strategy, backend,
        per_object_frames=True,
    )


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
