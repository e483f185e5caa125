"""End-to-end multi-stream serving: S live video streams on one chip.

The reference serves exactly one stream per process (its tracking loop owns
the single capture handle, tracker_ghc/src/main.cpp:337-480); serving S
cameras there means S processes × S GPUs.  Here one chip serves all S:

  decode      — one background decode/gray thread per stream
                (pvot.io.pipeline.FramePipeline: native C++ ring +
                bgr_to_gray_u8), all running concurrently with the device
  stage       — lockstep (S, C, H, W) uint8 chunks assembled into a
                pre-padded host buffer (the mega kernel's slab-aligned
                (pad_h, pad_w) layout, so the device never pays the pad —
                tools/mega_dispatch_ab.py attribution)
  compute     — every chunk of every stream is ONE pallas_call
                (pvot.ops.ncc_mega.mega_track_chunk_multi, grid (S, F)):
                each stream tracks at the single-stream mega rate, ~23-29k
                aggregate 720p FPS HIGHEST / ~39k fast tier on one v5e
                (docs/PERFORMANCE.md "Saturation point")
  commit      — per-stream transactional poison handling: a stream whose
                state machine enters a global-search branch re-runs just
                that chunk on the scan engines from its chunk-start
                snapshot (exact reference semantics on every frame);
                other streams' records commit untouched

Streams may end at different times: an ended stream's lanes carry
n_valid=0 padding (the kernel freezes its state; the scan fallback masks
per stream via pvot.parallel.multi.make_stream_masked_scan_fn) until every
stream is drained.  Outside the mega envelope — or if the per-geometry
compile+numerics probe fails — serving falls back to the lockstep vmapped
scan engines with the same output contract.

Heterogeneous inputs (mixed frame sizes / template sizes — the real
multi-camera case) serve through serve_streams_grouped: geometry groups,
one mega call per group chunk, groups running concurrently in host
threads (round 4).
"""

from __future__ import annotations

import time
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from pvot.io.pipeline import FramePipeline


class _StreamFeed:
    """One stream's decode pipeline + lockstep chunk cursor.

    next_chunk() always returns a full (chunk_size, H, W) uint8 array; once
    the stream is exhausted it keeps returning (held last frame, n_real=0)
    so the lockstep loop can carry live streams to their own ends."""

    def __init__(self, frame_iter: Iterable[np.ndarray], frame_shape, chunk_size: int):
        self.pipe = FramePipeline(frame_iter, frame_shape, chunk_size=chunk_size)
        self._gen = self.pipe.chunks()
        self._shape = tuple(frame_shape)
        self._cs = chunk_size
        self._last: Optional[np.ndarray] = None
        self.done = False

    def next_chunk(self) -> Tuple[np.ndarray, int]:
        if not self.done:
            try:
                chunk, n = next(self._gen)
                self._last = np.array(chunk[n - 1]) if n else self._last
                return chunk, n
            except StopIteration:
                self.done = True
        base = (
            self._last
            if self._last is not None
            else np.zeros(self._shape, np.uint8)
        )
        return np.broadcast_to(base, (self._cs, *self._shape)), 0

    def close(self) -> None:
        self.pipe.close()


def _empty_objects_output(k_objects: int):
    """A zero-frame StepOutput in serve_objects' documented (F, K) layout."""
    from pvot.tracker.state import StepOutput

    return StepOutput(
        bbox=np.zeros((0, k_objects, 4), np.int32),
        score=np.zeros((0, k_objects), np.float32),
        used_global=np.zeros((0, k_objects), bool),
        updated=np.zeros((0, k_objects), bool),
    )


def serve_streams(
    frame_iters: Sequence[Iterable[np.ndarray]],
    states,
    frame_shape: Tuple[int, int],
    config=None,
    backend: str = "mega",
    scan_backend: str = "pallas_shear",
    chunk_size: int = 32,
    timings: Optional[list] = None,
    highest: bool = True,
    score_passes: int = 3,
    pipeline_depth: int = 2,
    devices: Optional[Sequence] = None,
    prepad: bool = True,
    interpret: bool = False,
    _probe: bool = False,
    inkernel_global=None,
):
    """Serve S live frame streams end to end with decode/compute overlap.

    frame_iters: S iterables yielding uint8 BGR (H, W, 3) or gray (H, W)
    frames (different lengths allowed).  states: a stacked TrackerState
    with leading S axis (pvot.parallel.multi.init_multi_state layout).

    Returns (final stacked TrackerState, list of S host StepOutputs — one
    per stream, each with that stream's own frame count).  timings, when
    given a list, receives one (frames_committed, seconds) pair per
    lockstep chunk.

    backend="mega" routes every chunk through the multi-stream mega kernel
    (see module docstring); any other value — or an envelope/probe failure —
    serves on the lockstep vmapped scan engines (make_multi_stream_step +
    make_stream_masked_scan_fn), where `backend` names the NCC engine.

    highest=False runs the mega kernel's fast tier; score_passes picks
    its MXU pass count (3 = bf16 hi/lo default; 2/1 trade score precision
    for throughput — the bench.py headline runs 1).  Same
    trajectory-identity caveat as every fast engine; occlusion-heavy
    fleets whose confidence thresholds do real work should keep 3 (or
    HIGHEST).

    pipeline_depth (mega path) is how many chunks may be in flight before
    the oldest one's records are fetched and poison-checked.  Depth 2
    overlaps each chunk's device->host record fetch (a fixed relay/PCIe
    round trip) with the next chunk's compute; poison commits are then
    discovered one chunk late, which is safe because streams are
    independent — an in-flight chunk's records stay valid for every
    non-poisoned stream, and poisoned lanes re-run host-side from their
    chunk-start snapshots.  Depth 1 is the strict synchronous mode.

    devices: a sequence of jax.Devices to spread the streams over — pure
    host-driven data parallelism (streams are independent, so no
    collectives are needed: each device serves its contiguous stream group
    through its own pipelined loop in its own host thread, and dispatches
    interleave across devices).  The per-group drivers are exactly the
    single-device paths, so semantics are unchanged; `timings` then holds
    each group's per-chunk pairs concatenated group by group.  None
    (default) serves everything on the default device.

    prepad (mega path) trades host->device wire bytes against on-device
    pad copies: True stages chunks host-pre-padded to the kernel's
    aligned extents (no in-jit pad; ~6-8 us/frame cheaper on-device,
    tools/mega_fast_ab.py — the bench.py headline default), at ~18% more
    upload bytes; False ships wire-size frames and pays the in-jit pad.
    Pick False when the host->device link is the binder (e.g. serving at
    rates near the PCIe roofline, or the relay tunnel this repo tests
    over — bit-identical either way, records and trajectories alike).

    inkernel_global (mega path): None = auto — prefer the in-kernel
    global-search kernel when its probe passes (global frames then commit
    ON-CHIP: no poison, no rollback re-runs, no pipeline disturbance —
    the occlusion-regime fix); True/False forces the mode (_probe tests
    default to the poison kernel unless they opt in).
    """
    if devices is not None and len(devices) > 1:
        return _serve_streams_multidevice(
            frame_iters, states, frame_shape, config, backend, scan_backend,
            chunk_size, timings, highest, pipeline_depth, list(devices),
            prepad, interpret, _probe, inkernel_global,
            score_passes=score_passes,
        )
    device = devices[0] if devices else None
    from pvot.config import TrackerConfig

    config = config or TrackerConfig()
    h, w = frame_shape
    th, tw = states.template.shape[-2:]
    n_streams = int(np.shape(states.t_mean)[0])
    if len(frame_iters) != n_streams:
        raise ValueError(
            f"{len(frame_iters)} frame iterators for {n_streams} states"
        )

    if backend == "mega":
        from pvot.ops.ncc_mega import MegaGeometry
        from pvot.tracker.mega import mega_multi_mode

        g = MegaGeometry((h, w), (th, tw), config)
        mode = None
        if g.supported():
            if _probe:
                mode = bool(inkernel_global)
            elif inkernel_global is not None:
                mode = bool(inkernel_global)
            else:
                mode = mega_multi_mode(
                    (h, w), (th, tw), config, interpret=interpret
                )
        if mode is not None:
            return _serve_streams_mega(
                frame_iters, states, frame_shape, config, chunk_size,
                timings, scan_backend, highest, interpret,
                max(1, pipeline_depth), device, prepad,
                inkernel_global=mode, score_passes=score_passes,
            )
        backend = scan_backend

    return _serve_streams_scan(
        frame_iters, states, frame_shape, config, backend, chunk_size,
        timings, device,
    )


def _serve_streams_multidevice(
    frame_iters,
    states,
    frame_shape,
    config,
    backend: str,
    scan_backend: str,
    chunk_size: int,
    timings: Optional[list],
    highest: bool,
    pipeline_depth: int,
    devices: list,
    prepad: bool,
    interpret: bool,
    _probe: bool,
    inkernel_global=None,
    score_passes: int = 3,
):
    """Fan the streams out over devices: contiguous groups, one pipelined
    single-device driver per group in its own host thread.  Streams are
    independent so no collectives are involved; dispatches interleave
    across devices while every group keeps the single-device semantics
    (including per-group transactional rollback)."""
    from concurrent.futures import ThreadPoolExecutor

    import jax

    from pvot.config import TrackerConfig
    from pvot.tracker.mega import mega_multi_mode
    from pvot.ops.ncc_mega import MegaGeometry

    config = config or TrackerConfig()
    h, w = frame_shape
    th, tw = states.template.shape[-2:]
    n_streams = len(frame_iters)
    if int(np.shape(states.t_mean)[0]) != n_streams:
        raise ValueError(
            f"{n_streams} frame iterators for "
            f"{int(np.shape(states.t_mean)[0])} states"
        )
    mode = None
    if backend == "mega" and MegaGeometry(
        (h, w), (th, tw), config
    ).supported():
        if _probe or inkernel_global is not None:
            mode = bool(inkernel_global)
        else:
            mode = mega_multi_mode(
                (h, w), (th, tw), config, interpret=interpret
            )
    use_mega = mode is not None

    # Contiguous groups, sizes within one of each other; empty groups drop.
    n_dev = min(len(devices), n_streams)
    bounds = [round(g * n_streams / n_dev) for g in range(n_dev + 1)]
    groups = [
        (bounds[g], bounds[g + 1], devices[g])
        for g in range(n_dev)
        if bounds[g + 1] > bounds[g]
    ]

    def run_group(lo, hi, device):
        group_states = jax.tree.map(lambda a: a[lo:hi], states)
        group_timings: Optional[list] = [] if timings is not None else None
        if use_mega:
            final, outs = _serve_streams_mega(
                frame_iters[lo:hi], group_states, frame_shape, config,
                chunk_size, group_timings, scan_backend, highest, interpret,
                max(1, pipeline_depth), device, prepad,
                inkernel_global=mode, score_passes=score_passes,
            )
        else:
            final, outs = _serve_streams_scan(
                frame_iters[lo:hi], group_states, frame_shape, config,
                scan_backend if backend == "mega" else backend,
                chunk_size, group_timings, device,
            )
        # Decommit so cross-device finals can restack on the default device.
        return jax.tree.map(np.asarray, final), outs, group_timings

    with ThreadPoolExecutor(max_workers=len(groups)) as pool:
        futures = [pool.submit(run_group, lo, hi, d) for lo, hi, d in groups]
        results = [f.result() for f in futures]

    import jax.numpy as jnp

    finals = [r[0] for r in results]
    final = jax.tree.map(
        lambda *xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs]), *finals
    )
    outs = [o for _, group_outs, _ in results for o in group_outs]
    if timings is not None:
        for _, _, gt in results:
            timings.extend(gt or [])
    return final, outs


def serve_streams_grouped(
    frame_iters: Sequence[Iterable[np.ndarray]],
    states_list: Sequence,
    frame_shapes: Sequence[Tuple[int, int]],
    config=None,
    backend: str = "mega",
    scan_backend: str = "pallas_shear",
    chunk_size: int = 32,
    timings: Optional[list] = None,
    highest: bool = True,
    score_passes: int = 3,
    pipeline_depth: int = 2,
    devices: Optional[Sequence] = None,
    prepad: bool = True,
    interpret: bool = False,
    _probe: bool = False,
    inkernel_global=None,
):
    """Serve S live streams with HETEROGENEOUS geometries (round-4 VERDICT
    item 4): streams may differ in frame size and/or template size — the
    real multi-camera case the homogeneous serve_streams layout (one
    stacked-template mega grid) cannot express.

    Streams group by (frame_shape, template_shape); each group serves
    through the ordinary serve_streams driver — one multi-stream mega call
    per group chunk, per-group pipelining, per-group scan fallback — in its
    own host thread, so the groups' device dispatches interleave exactly
    like the devices= fan-out's (streams are independent; no collectives).
    Per-stream semantics are identical to serving each group alone.

    frame_iters: S frame iterables.  states_list: S SINGLE-stream
    TrackerStates (pvot.init_state), one per stream — unlike serve_streams
    there is no stacked layout to build, since shapes differ.
    frame_shapes: S (H, W) pairs.  devices: optional device list; groups
    round-robin over it (group g on devices[g % len]).

    Returns (list of S final single-stream TrackerStates, list of S host
    StepOutputs) in input order.  timings, when given, receives each
    group's per-chunk (frames, seconds) pairs concatenated group by group
    (groups run concurrently, so pairs interleave in wall time).
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from pvot.config import TrackerConfig

    config = config or TrackerConfig()
    n = len(frame_iters)
    if len(states_list) != n or len(frame_shapes) != n:
        raise ValueError(
            f"{n} frame iterators for {len(states_list)} states / "
            f"{len(frame_shapes)} frame shapes"
        )
    groups: dict = {}  # (frame_shape, templ_shape) -> [stream indices]
    for s in range(n):
        key = (
            tuple(frame_shapes[s]),
            tuple(np.shape(states_list[s].template)),
        )
        groups.setdefault(key, []).append(s)
    group_list = list(groups.items())

    def run_group(gi, key, idxs):
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[states_list[i] for i in idxs]
        )
        group_timings: Optional[list] = [] if timings is not None else None
        dev = [devices[gi % len(devices)]] if devices else None
        final, outs = serve_streams(
            [frame_iters[i] for i in idxs], stacked, key[0], config,
            backend=backend, scan_backend=scan_backend,
            chunk_size=chunk_size, timings=group_timings, highest=highest,
            score_passes=score_passes,
            pipeline_depth=pipeline_depth, devices=dev, prepad=prepad,
            interpret=interpret, _probe=_probe,
            inkernel_global=inkernel_global,
        )
        return final, outs, group_timings

    if len(group_list) == 1:
        results = [run_group(0, *group_list[0])]
    else:
        with ThreadPoolExecutor(max_workers=len(group_list)) as pool:
            futures = [
                pool.submit(run_group, gi, key, idxs)
                for gi, (key, idxs) in enumerate(group_list)
            ]
            results = [f.result() for f in futures]

    finals: list = [None] * n
    outs_by_stream: list = [None] * n
    for (_, idxs), (final, outs, gt) in zip(group_list, results):
        for pos, s in enumerate(idxs):
            finals[s] = jax.tree.map(lambda a: a[pos], final)
            outs_by_stream[s] = outs[pos]
        if timings is not None:
            timings.extend(gt or [])
    return finals, outs_by_stream


def _serve_streams_mega(
    frame_iters,
    states,
    frame_shape,
    config,
    chunk_size: int,
    timings: Optional[list],
    scan_backend: str,
    highest: bool,
    interpret: bool,
    depth: int,
    device=None,
    prepad: bool = True,
    inkernel_global: bool = False,
    score_passes: int = 3,
):
    from collections import deque

    import jax
    import jax.numpy as jnp

    from pvot.ops.ncc_mega import MegaGeometry, O_POISON
    from pvot.tracker.mega import _rows_to_output, mega_chunk_step_multi
    from pvot.tracker.scan import _stack_outputs, track_video

    h, w = frame_shape
    th, tw = states.template.shape[-2:]
    n_streams = len(frame_iters)
    g = MegaGeometry((h, w), (th, tw), config)

    feeds = [_StreamFeed(it, frame_shape, chunk_size) for it in frame_iters]
    # Staging buffers (see serve_streams's `prepad` doc for the
    # prepadded-vs-wire-size tradeoff).  One buffer per possible in-flight
    # chunk plus the one being filled; a buffer is recycled only after its
    # entry's blocking record fetch, which forces its input transfer to
    # completion first.
    stage_shape = (g.pad_h, g.pad_w) if prepad else (h, w)
    free_bufs = [
        np.zeros((n_streams, chunk_size, *stage_shape), np.uint8)
        for _ in range(depth + 1)
    ]
    inflight: deque = deque()
    outs: List[list] = [[] for _ in range(n_streams)]
    st = jax.device_put(states, device) if device is not None else states
    mark = time.perf_counter()

    def dispatch(chunks, n_real, st):
        buf = free_bufs.pop()
        for s, (chunk, _) in enumerate(chunks):
            buf[s, :, :h, :w] = chunk
        rows, st_after = mega_chunk_step_multi(
            jax.device_put(buf, device), st, n_real,
            frame_shape=(h, w), templ_shape=(th, tw), config=config,
            interpret=interpret, highest=highest,
            score_passes=score_passes,
            inkernel_global=inkernel_global,
        )
        rows.copy_to_host_async()
        return {
            # Retained per-stream frame arrays: a poisoned lane re-runs
            # from these on the scan path.
            "chunks": [c for c, _ in chunks],
            "n_real": n_real,
            "snapshot": st,
            "st_after": st_after,
            "rows": rows,
            "buf": buf,
            # Lanes whose records were already committed host-side by an
            # earlier poison transaction (their kernel lanes ran from a
            # stale state and are discarded at drain).
            "done_lanes": set(),
        }

    def drain(entry, fixed):
        """Fetch one entry's records; commit clean lanes.  A poisoned lane
        re-runs host-side on the scan path — its own chunk AND every later
        in-flight chunk (retained frames), eagerly, so the pipeline never
        stalls: other lanes' in-flight records stay valid, new dispatches
        keep overlapping, and the corrected state (returned via `fixed`)
        rejoins the kernel at the next dispatch.  Round 3 instead FLUSHED
        the whole in-flight window on any poison (drain-until-empty with
        no dispatch overlap) — the round-4 VERDICT's occlusion-regime
        cost.  Semantics are identical: the re-run covers exactly the
        frames whose kernel records were invalid."""
        nonlocal mark
        host = np.asarray(entry["rows"])  # blocks: kernel + record fetch
        free_bufs.append(entry["buf"])
        committed = 0
        for s in range(n_streams):
            n = int(entry["n_real"][s])
            if n == 0:
                continue
            committed += n
            if s in entry["done_lanes"]:
                continue  # committed eagerly by the poison transaction
            rs = host[s, :n]
            if not (rs[:, O_POISON] != 0.0).any():
                outs[s].append(_rows_to_output(rs))
                continue
            # Poison: the lane's chunk-start snapshot is still valid (the
            # lane was clean through the previous chunk).  Decommitted to
            # host so the rollback's scan path (default device) and
            # apply_fixed (this group's device) both colocate with it.
            start = jax.tree.map(
                lambda a, _s=s: np.asarray(a[_s]), entry["snapshot"]
            )
            for redo in (entry, *inflight):
                n2 = int(redo["n_real"][s])
                redo["done_lanes"].add(s)
                if n2 == 0:
                    continue
                fs, out = track_video(
                    np.asarray(redo["chunks"][s][:n2]), start, config,
                    strategy="fused", backend=scan_backend,
                    chunk_size=chunk_size,
                )
                outs[s].append(out)
                start = jax.tree.map(np.asarray, fs)
            fixed[s] = start
        now = time.perf_counter()
        if timings is not None:
            timings.append((committed, now - mark))
        mark = now
        return fixed

    def apply_fixed(st, fixed):
        for s, fs in fixed.items():
            st = jax.tree.map(lambda a, b, _s=s: a.at[_s].set(b), st, fs)
        return st

    fixed: dict = {}
    try:
        while True:
            chunks = [f.next_chunk() for f in feeds]
            n_real = np.array([n for _, n in chunks], np.int32)
            if not n_real.any():
                break
            if fixed:  # corrected lanes rejoin the kernel path here
                st = apply_fixed(st, fixed)
                fixed = {}
            entry = dispatch(chunks, n_real, st)
            st = entry["st_after"]
            inflight.append(entry)
            if len(inflight) >= depth:
                fixed = drain(inflight.popleft(), fixed)
        while inflight:
            fixed = drain(inflight.popleft(), fixed)
        st = apply_fixed(st, fixed)
    finally:
        for f in feeds:
            f.close()
    return st, [_stack_outputs(o) for o in outs]


def serve_objects(
    frame_iter: Iterable[np.ndarray],
    states,
    frame_shape: Tuple[int, int],
    config=None,
    backend: str = "mega",
    scan_backend: str = "pallas_shear",
    chunk_size: int = 32,
    timings: Optional[list] = None,
    highest: bool = True,
    score_passes: int = 3,
    pipeline_depth: int = 2,
    prepad: bool = True,
    interpret: bool = False,
    _probe: bool = False,
    inkernel_global=None,
):
    """Serve ONE live frame stream with K trackers end to end — the
    multi-object analog of serve_streams: a single decode thread, every
    chunk through the multi-object mega kernel (grid (K, F), shared
    frames; pvot.ops.ncc_mega.mega_track_chunk_objects), depth-N chunk
    pipelining, and per-object transactional poison rollback (a lane
    that enters a global-search branch re-runs its chunk on the
    single-object scan path from its chunk-start snapshot; other lanes'
    records commit untouched).

    `states` is a stacked TrackerState (leading K axis).  Returns
    (final stacked TrackerState, host StepOutput with the (F, K) leading
    layout — all lanes share the stream's length).  Outside the mega
    envelope — or on probe failure — falls back to the chunked vmapped
    multi-object scan step (same contract)."""
    import jax

    from pvot.config import TrackerConfig

    config = config or TrackerConfig()
    h, w = frame_shape
    th, tw = states.template.shape[-2:]
    # Heterogeneous template sizes (round 4): init_multi_state_bucketed
    # states — bbox extents differ from the shared template bucket.
    extents = tuple(
        (int(eh), int(ew))
        for eh, ew in zip(np.asarray(states.bbox_h), np.asarray(states.bbox_w))
    )
    bucketed = any(e != (th, tw) for e in extents)
    bucket_extents = extents if bucketed else None

    if backend == "mega":
        from pvot.ops.ncc_mega import MegaGeometry
        from pvot.tracker.mega import mega_objects_mode

        min_t = (
            (min(e[0] for e in extents), min(e[1] for e in extents))
            if bucketed else None
        )
        g = MegaGeometry((h, w), (th, tw), config, min_templ_shape=min_t)
        mode = None
        if g.supported():
            if _probe or inkernel_global is not None:
                mode = bool(inkernel_global)
            else:
                mode = mega_objects_mode(
                    (h, w), (th, tw), config, interpret=interpret,
                    bucket_extents=bucket_extents,
                )
        if mode is not None:
            return _serve_objects_mega(
                frame_iter, states, frame_shape, config, chunk_size,
                timings, scan_backend, highest, interpret,
                max(1, pipeline_depth), prepad, inkernel_global=mode,
                bucket_extents=bucket_extents, score_passes=score_passes,
            )
        backend = scan_backend

    # Scan fallback: the vmapped multi-object step under a masked scan
    # (all lanes share the stream's validity, so the plain per-frame mask
    # suffices).  Chunk fetches overlap one chunk deep, like every sibling
    # driver here: pack on device, fetch async, drain one chunk late.
    from pvot.parallel.multi import make_multi_step, make_multi_step_bucketed
    from pvot.tracker.scan import (
        _pack_outputs,
        _unpack_outputs,
        make_masked_scan_fn,
    )
    from pvot.tracker.state import StepOutput

    k_objects = int(np.shape(states.t_mean)[0])
    if bucketed:
        step = make_multi_step_bucketed((h, w), (th, tw), config)
    else:
        step = make_multi_step(
            (h, w), (th, tw), config, strategy="fused", backend=backend
        )
    scan_fn = make_masked_scan_fn(step)
    pipe = FramePipeline(frame_iter, frame_shape, chunk_size=chunk_size)
    outs = []
    st = states
    pending = None  # (device packed outs (C, K, 7), n_real)
    mark = time.perf_counter()

    def drain(entry):
        nonlocal mark
        packed, n = entry
        outs.append(_unpack_outputs(np.asarray(packed)[:n]))  # (n, K, 7)
        now = time.perf_counter()
        if timings is not None:
            timings.append((n, now - mark))
        mark = now

    try:
        for chunk, n_real in pipe.chunks():
            valid = np.arange(chunk_size) < n_real
            st, out = scan_fn(
                st, jax.device_put(chunk), jax.device_put(valid)
            )
            packed = _pack_outputs(out)
            packed.copy_to_host_async()
            if pending is not None:
                drain(pending)
            pending = (packed, n_real)
        if pending is not None:
            drain(pending)
    finally:
        pipe.close()
    if not outs:
        return st, _empty_objects_output(k_objects)
    return st, StepOutput(*(np.concatenate(xs) for xs in zip(*outs)))


def _serve_objects_mega(
    frame_iter,
    states,
    frame_shape,
    config,
    chunk_size: int,
    timings: Optional[list],
    scan_backend: str,
    highest: bool,
    interpret: bool,
    depth: int,
    prepad: bool,
    inkernel_global: bool = False,
    bucket_extents=None,
    score_passes: int = 3,
):
    from collections import deque

    import jax
    import jax.numpy as jnp

    from pvot.ops.ncc_mega import MegaGeometry, O_POISON
    from pvot.tracker.mega import _rows_to_output, mega_chunk_step_objects
    from pvot.tracker.scan import track_video
    from pvot.tracker.state import StepOutput

    h, w = frame_shape
    th, tw = states.template.shape[-2:]
    k_objects = int(np.shape(states.t_mean)[0])
    min_t = (
        (
            min(e[0] for e in bucket_extents),
            min(e[1] for e in bucket_extents),
        )
        if bucket_extents is not None else None
    )
    g = MegaGeometry((h, w), (th, tw), config, min_templ_shape=min_t)

    pipe = FramePipeline(frame_iter, frame_shape, chunk_size=chunk_size)
    stage_shape = (g.pad_h, g.pad_w) if prepad else (h, w)
    free_bufs = [
        np.zeros((chunk_size, *stage_shape), np.uint8)
        for _ in range(depth + 1)
    ]
    inflight: deque = deque()
    outs: List[list] = [[] for _ in range(k_objects)]
    st = states
    mark = time.perf_counter()

    def dispatch(chunk, n_real, st):
        buf = free_bufs.pop()
        buf[:, :h, :w] = chunk
        rows, st_after = mega_chunk_step_objects(
            jax.device_put(buf), st, n_real,
            frame_shape=(h, w), templ_shape=(th, tw), config=config,
            interpret=interpret, highest=highest,
            score_passes=score_passes,
            inkernel_global=inkernel_global,
            bucket_extents=bucket_extents,
        )
        rows.copy_to_host_async()
        return {
            "chunk": chunk,
            "n_real": n_real,
            "snapshot": st,
            "st_after": st_after,
            "rows": rows,
            "buf": buf,
            "done_lanes": set(),
        }

    def drain(entry, fixed):
        # Same no-flush eager rollback as _serve_streams_mega.drain: a
        # poisoned lane re-runs its chunk AND every later in-flight chunk
        # host-side immediately, other lanes and the pipeline continue.
        nonlocal mark
        host = np.asarray(entry["rows"])
        free_bufs.append(entry["buf"])
        n = entry["n_real"]
        for k in range(k_objects):
            if k in entry["done_lanes"]:
                continue
            rs = host[k, :n]
            if not (rs[:, O_POISON] != 0.0).any():
                outs[k].append(_rows_to_output(rs))
                continue
            start = jax.tree.map(
                lambda a, _k=k: np.asarray(a[_k]), entry["snapshot"]
            )
            if bucket_extents is not None:
                # Single-object rollback at the object's TRUE geometry:
                # slice the bucket padding off (stats already normalize
                # over the true extent); pad back before rejoining.
                eh, ew = bucket_extents[k]
                start = start._replace(template=start.template[:eh, :ew])
            for redo in (entry, *inflight):
                n2 = int(redo["n_real"])
                redo["done_lanes"].add(k)
                if n2 == 0:
                    continue
                fs, out = track_video(
                    np.asarray(redo["chunk"][:n2]), start, config,
                    strategy="fused", backend=scan_backend,
                    chunk_size=chunk_size,
                )
                outs[k].append(out)
                start = jax.tree.map(np.asarray, fs)
            if bucket_extents is not None:
                eh, ew = bucket_extents[k]
                start = start._replace(template=np.pad(
                    start.template, ((0, th - eh), (0, tw - ew))
                ))
            fixed[k] = start
        now = time.perf_counter()
        if timings is not None:
            timings.append((n, now - mark))
        mark = now
        return fixed

    def apply_fixed(st, fixed):
        for k, fs in fixed.items():
            st = jax.tree.map(lambda a, b, _k=k: a.at[_k].set(b), st, fs)
        return st

    fixed: dict = {}
    try:
        for chunk, n_real in pipe.chunks():
            if fixed:  # corrected lanes rejoin the kernel path here
                st = apply_fixed(st, fixed)
                fixed = {}
            entry = dispatch(chunk, n_real, st)
            st = entry["st_after"]
            inflight.append(entry)
            if len(inflight) >= depth:
                fixed = drain(inflight.popleft(), fixed)
        while inflight:
            fixed = drain(inflight.popleft(), fixed)
        st = apply_fixed(st, fixed)
    finally:
        pipe.close()
    per_object = [
        StepOutput(*(np.concatenate(xs) for xs in zip(*o))) if o else None
        for o in outs
    ]
    if any(o is None for o in per_object):
        # Zero frames served (all lanes share the one stream, so the lists
        # are either all filled or all empty): keep the documented (F, K)
        # layout, just with F = 0.
        return st, _empty_objects_output(k_objects)
    return st, StepOutput(
        *(np.stack(xs, axis=1) for xs in zip(*per_object))
    )


def _serve_streams_scan(
    frame_iters,
    states,
    frame_shape,
    config,
    backend: str,
    chunk_size: int,
    timings: Optional[list],
    device=None,
):
    import jax

    from pvot.parallel.multi import (
        make_multi_stream_step,
        make_stream_masked_scan_fn,
    )
    from pvot.tracker.scan import (
        _pack_outputs,
        _stack_outputs,
        _unpack_outputs,
    )
    from pvot.tracker.state import StepOutput

    h, w = frame_shape
    th, tw = states.template.shape[-2:]
    n_streams = len(frame_iters)
    step = make_multi_stream_step(
        (h, w), (th, tw), config, strategy="fused", backend=backend
    )
    scan_fn = make_stream_masked_scan_fn(step)

    feeds = [_StreamFeed(it, frame_shape, chunk_size) for it in frame_iters]
    outs: List[list] = [[] for _ in range(n_streams)]
    st = jax.device_put(states, device) if device is not None else states
    pending = None  # (device packed outs, n_real) — one-chunk fetch overlap
    mark = time.perf_counter()

    def drain(entry):
        nonlocal mark
        packed, n_real = entry
        host = np.asarray(packed)  # (C, S, 7)
        for s in range(n_streams):
            n = int(n_real[s])
            if n == 0:
                continue
            outs[s].append(_unpack_outputs(host[:n, s]))
        now = time.perf_counter()
        if timings is not None:
            timings.append((int(n_real.sum()), now - mark))
        mark = now

    try:
        while True:
            chunks = [f.next_chunk() for f in feeds]
            n_real = np.array([n for _, n in chunks], np.int32)
            if not n_real.any():
                break
            frames = np.stack([c for c, _ in chunks], axis=1)  # (C, S, H, W)
            valid = np.arange(chunk_size)[:, None] < n_real[None, :]
            st, out = scan_fn(
                st,
                jax.device_put(frames, device),
                jax.device_put(valid, device),
            )
            packed = _pack_outputs(out)
            packed.copy_to_host_async()
            if pending is not None:
                drain(pending)
            pending = (packed, n_real)
        if pending is not None:
            drain(pending)
    finally:
        for f in feeds:
            f.close()
    return st, [_stack_outputs(o) for o in outs]
