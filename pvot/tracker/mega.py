"""Mega-kernel tracking driver with a transactional scan-path fallback.

`track_video_mega` drives pvot.ops.ncc_mega: each chunk of frames is ONE
pallas_call that runs the whole state machine on-chip (see that module's
docstring for the design and the probe lineage).  Two kernel modes, picked
per geometry by a compile+numerics probe (mega_mode):

  * IN-KERNEL GLOBAL SEARCH (round 4, preferred): global branches
    (lost-object re-acquisition, bbox out of frame, collapsed window —
    tracker_ghc/src/main.cpp:399-446) score the FULL map inside the kernel
    as a strip grid under pl.when and commit on-chip.  Nothing ever
    poisons; occlusion-heavy clips run at mega rates (the round-3 poison
    protocol measured catastrophically there, results.json occl_* rows).
  * POISON TRANSACTIONS (round 3, fallback): the kernel POISONS a chunk
    whose state machine would enter a global branch, and this driver
    re-runs exactly that chunk through the ordinary XLA scan path
    (pvot.tracker.scan.track_video), then resumes the mega path on the
    next chunk.

Either way semantics match the scan engines on every frame (bboxes/flags
bit-equal; in-kernel-global rejected-frame scores are engine-grade — see
_outputs_equal).

Fetch discipline (memory/axon-relay-timing.md): all chunks are enqueued
device-side and their per-frame records land on the host in ONE packed
transfer at the end of each optimistic run; only a poison (rare) costs a
re-run of the chunks after it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pvot.config import TrackerConfig
from pvot.ops.ncc_mega import (
    MegaGeometry,
    O_BX,
    O_GUSED,
    O_LOST,
    O_POISON,
    O_SCORE,
    O_UPDATED,
    O_USEG,
    mega_track_chunk,
    mega_track_chunk_multi,
    mega_track_chunk_objects,
)
from pvot.ops.ncc_reference import template_stats
from pvot.tracker.scan import (
    as_frames,
    pad_tail,
    track_video,
    track_video_batched,
)
from pvot.tracker.state import StepOutput, TrackerState

_SUPPORT_CACHE: dict = {}


def _state_from_chunk(rows: jax.Array, tplout: jax.Array) -> TrackerState:
    """Chunk-final TrackerState from the kernel's last record + template.

    Stats are re-canonicalized through template_stats so chunk-start states
    bit-match the XLA path's cached stats whenever the template bits agree
    (pvot/ops/ncc_mega.py parity note)."""
    last = rows[-1]
    t_mean, t_std = template_stats(tplout)
    return TrackerState(
        bbox_x=last[O_BX + 0].astype(jnp.int32),
        bbox_y=last[O_BX + 1].astype(jnp.int32),
        bbox_w=last[O_BX + 2].astype(jnp.int32),
        bbox_h=last[O_BX + 3].astype(jnp.int32),
        template=tplout,
        t_mean=t_mean,
        t_std=t_std,
        lost_count=last[O_LOST].astype(jnp.int32),
        use_global=last[O_USEG] != 0.0,
    )


_CHUNK_STATICS = (
    "frame_shape", "templ_shape", "config", "interpret", "highest",
    "score_passes", "batch", "inkernel_global",
)


@functools.partial(jax.jit, static_argnames=_CHUNK_STATICS)
def mega_chunk_step(
    chunk: jax.Array,
    state: TrackerState,
    n_valid,
    *,
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    highest: bool = True,
    score_passes: int = 3,
    batch: int = 1,
    inkernel_global: bool = False,
):
    """ONE dispatch per chunk: bbox stack + mega kernel + chunk-final state
    extraction fused into a single jitted program.  On the relay every
    eager helper op (the bbox jnp.stack, each _state_from_chunk astype,
    template_stats) is its own dispatch round trip — the unfused loop paid
    ~10 of them per chunk, measured as the occl_clean_720p mega row
    landing 6x BELOW the scan engine on the same staged clip
    (benchmarks/suite.py::bench_occlusion, round 4)."""
    rows, tplout = mega_track_chunk(
        chunk,
        jnp.stack(
            [state.bbox_x, state.bbox_y, state.bbox_w, state.bbox_h]
        ).astype(jnp.int32),
        state.template, state.t_mean, state.t_std, state.lost_count,
        state.use_global, jnp.asarray(n_valid, jnp.int32),
        frame_shape=frame_shape, templ_shape=templ_shape, config=config,
        interpret=interpret, highest=highest, score_passes=score_passes,
        batch=batch, inkernel_global=inkernel_global,
    )
    return rows, _state_from_chunk(rows, tplout)


@functools.partial(jax.jit, static_argnames=_CHUNK_STATICS)
def mega_video_scan(
    chunks: jax.Array,
    state: TrackerState,
    n_last,
    *,
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    highest: bool = True,
    score_passes: int = 3,
    batch: int = 1,
    inkernel_global: bool = True,
):
    """The WHOLE clip in one dispatch: lax.scan over the chunk stack with
    the mega kernel + state extraction as the body, one packed record
    fetch at the very end.  Only sound in in-kernel-global mode (or with
    global search disabled): nothing can poison, so no host decision is
    ever needed between chunks.  The per-chunk driver below pays one relay
    dispatch per chunk even on clean clips (~16 round trips on the 1024
    -frame occlusion bench, measured as the mega row trailing the scan
    engine 9.6k vs 11.9k FPS at period=0 despite a faster kernel);
    scanning removes all of them.

    chunks: (N, cs, H, W) uint8, the tail chunk zero-padded; n_last =
    valid frames in the final chunk (traced: tail length doesn't
    recompile).  Returns ((N*cs, L) records, final TrackerState).
    """
    n, cs = chunks.shape[0], chunks.shape[1]
    n_valid = jnp.where(
        jnp.arange(n) == n - 1, jnp.asarray(n_last, jnp.int32), cs
    )

    def body(st, xs):
        chunk, nv = xs
        rows, tplout = mega_track_chunk(
            chunk,
            jnp.stack(
                [st.bbox_x, st.bbox_y, st.bbox_w, st.bbox_h]
            ).astype(jnp.int32),
            st.template, st.t_mean, st.t_std, st.lost_count,
            st.use_global, nv,
            frame_shape=frame_shape, templ_shape=templ_shape, config=config,
            interpret=interpret, highest=highest,
            score_passes=score_passes, batch=batch,
            inkernel_global=inkernel_global,
        )
        return _state_from_chunk(rows, tplout), rows

    final, rows = jax.lax.scan(body, state, (chunks, n_valid))
    return rows.reshape(n * cs, rows.shape[-1]), final


@functools.partial(jax.jit, static_argnames=_CHUNK_STATICS)
def mega_chunk_step_multi(
    chunk: jax.Array,
    states: TrackerState,
    n_valid,
    *,
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    highest: bool = True,
    score_passes: int = 3,
    batch: int = 1,
    inkernel_global: bool = False,
):
    """mega_chunk_step for the multi-stream kernel: (S, C, H, W) chunk +
    stacked states; n_valid is per-stream (S,) or a scalar (broadcast)."""
    s = np.shape(states.t_mean)[0]
    rows, tplout = mega_track_chunk_multi(
        chunk,
        jnp.stack(
            [states.bbox_x, states.bbox_y, states.bbox_w, states.bbox_h],
            axis=-1,
        ).astype(jnp.int32),
        states.template, states.t_mean, states.t_std, states.lost_count,
        states.use_global,
        jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32), (s,)),
        frame_shape=frame_shape, templ_shape=templ_shape, config=config,
        interpret=interpret, highest=highest, score_passes=score_passes,
        batch=batch, inkernel_global=inkernel_global,
    )
    return rows, jax.vmap(_state_from_chunk)(rows, tplout)


def _state_from_chunk_bucketed(rows: jax.Array, tplout: jax.Array):
    """_state_from_chunk for BUCKETED (mixed-size) templates: the stats
    recompute normalizes over the object's true pixel count (bbox_w/h ==
    template extents, the init_multi_state_bucketed invariant)."""
    from pvot.ops.ncc_matmul import template_stats_bucketed

    last = rows[-1]
    bw = last[O_BX + 2].astype(jnp.int32)
    bh = last[O_BX + 3].astype(jnp.int32)
    t_mean, t_std = template_stats_bucketed(tplout, bw * bh)
    return TrackerState(
        bbox_x=last[O_BX + 0].astype(jnp.int32),
        bbox_y=last[O_BX + 1].astype(jnp.int32),
        bbox_w=bw,
        bbox_h=bh,
        template=tplout,
        t_mean=t_mean,
        t_std=t_std,
        lost_count=last[O_LOST].astype(jnp.int32),
        use_global=last[O_USEG] != 0.0,
    )


@functools.partial(
    jax.jit, static_argnames=_CHUNK_STATICS + ("bucket_extents",)
)
def mega_chunk_step_objects(
    chunk: jax.Array,
    states: TrackerState,
    n_valid,
    *,
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    highest: bool = True,
    score_passes: int = 3,
    batch: int = 1,
    inkernel_global: bool = False,
    bucket_extents=None,
):
    """mega_chunk_step for the multi-object kernel: one shared (C, H, W)
    chunk, K stacked tracker states.  bucket_extents: per-object true
    (th, tw) when templates are bucket-padded (mixed sizes)."""
    k = np.shape(states.t_mean)[0]
    rows, tplout = mega_track_chunk_objects(
        chunk,
        jnp.stack(
            [states.bbox_x, states.bbox_y, states.bbox_w, states.bbox_h],
            axis=-1,
        ).astype(jnp.int32),
        states.template, states.t_mean, states.t_std, states.lost_count,
        states.use_global,
        jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32), (k,)),
        frame_shape=frame_shape, templ_shape=templ_shape, config=config,
        interpret=interpret, highest=highest, score_passes=score_passes,
        inkernel_global=inkernel_global, bucket_extents=bucket_extents,
    )
    extract = (
        _state_from_chunk if bucket_extents is None
        else _state_from_chunk_bucketed
    )
    return rows, jax.vmap(extract)(rows, tplout)


def _rows_to_output(rows: np.ndarray) -> StepOutput:
    """Host-side per-frame records -> StepOutput.  used_global comes from
    the kernel's O_GUSED lane: the in-kernel global-search mode (round 4)
    commits global frames on-chip; in poison mode the lane is identically
    zero (any frame whose state machine reaches a global branch poisons the
    chunk and is re-run on the scan path)."""
    return StepOutput(
        bbox=rows[:, O_BX : O_BX + 4].astype(np.int32),
        score=rows[:, O_SCORE].copy(),
        used_global=rows[:, O_GUSED] != 0.0,
        updated=rows[:, O_UPDATED] != 0.0,
    )


def _global_probe_clip(
    frames: np.ndarray, templ_shape: Tuple[int, int]
) -> tuple:
    """Mutate a random probe clip + build a start state that exercises the
    WHOLE global-search state machine (main.cpp:399-459): the bbox center
    starts outside the frame (forces use_global on frame 1), the front half
    of the clip is noise (global argmax REJECTS under global_confidence —
    sticky flag, lost counter), and the exact uint8 template patch is pasted
    off-center into the back half (global argmax ACCEPTS — re-acquisition,
    flag reset, then local tracking).  Returns the start state."""
    from pvot.io.gray import gray_u8_to_f32
    from pvot.tracker.state import init_state

    n_probe, h, w = frames.shape
    th, tw = templ_shape
    x = (w - tw) // 2
    y = (h - th) // 2
    templ = jnp.asarray(gray_u8_to_f32(frames[0])[y : y + th, x : x + tw])
    patch = frames[0][y : y + th, x : x + tw].copy()
    py = min(3 * th // 2, h - th)
    px = min(2 * tw, w - tw)
    for i in range(1 + (n_probe - 1) // 2, n_probe):
        frames[i, py : py + th, px : px + tw] = patch
    return init_state(templ, (-(tw // 2) - 2, y, tw, th))


def _outputs_equal(
    want: StepOutput, got: StepOutput, acc_atol: float = 1e-5
) -> bool:
    """Probe equality contract: bboxes and flags bit-equal; ACCEPTED
    frames' scores within acc_atol (a genuine match's score is numerically
    stable across engines; 1e-5 default — BUCKETED probes pass 5e-5: the
    traced-extent box sums gate each bucket row through a select, a
    different f32 accumulation order than the exact-shape oracle, measured
    1.3e-5 on the mixed-size probe clips); REJECTED frames' within 2e-3 —
    a rejected score is the max over noise / near-flat positions (the full
    map on global frames, the window otherwise), where eps-dominated
    low-variance positions amplify cross-engine per-position differences
    into the max (measured up to ~6e-4 full-map / ~3e-5 windowed vs the
    matmul oracle on the in-kernel-global test clips)."""
    if not (
        np.array_equal(want.bbox, got.bbox)
        and np.array_equal(want.updated, got.updated)
        and np.array_equal(want.used_global, got.used_global)
    ):
        return False
    acc = np.asarray(want.updated)
    return np.allclose(
        np.asarray(want.score)[acc], np.asarray(got.score)[acc],
        atol=acc_atol,
    ) and np.allclose(want.score, got.score, atol=2e-3)


def mega_supported(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    batch: int = 1,
    inkernel_global: bool = False,
) -> bool:
    """Compile + numerics probe at EXACTLY the served geometry (the same
    per-geometry discipline as ncc_pallas.pallas_supported: this relay's
    Mosaic rejects/miscompiles kernels unpredictably, so the mega path must
    prove itself against the scan path before it serves).  Probes a short
    random clip and requires bit-equal bboxes, flags, and scores.  batch > 1
    probes the in-kernel look-ahead cadence against the batched scan path
    (full batches + a leftover tail).  inkernel_global=True probes the
    round-4 in-kernel global-search mode on a clip that actually loses and
    re-acquires its target (_global_probe_clip)."""
    key = (
        jax.default_backend(), frame_shape, templ_shape, config, interpret,
        batch, inkernel_global,
    )
    if key not in _SUPPORT_CACHE:
        try:
            g = MegaGeometry(frame_shape, templ_shape, config)
            if not g.supported():
                raise ValueError("geometry outside mega envelope")
            rng = np.random.default_rng(11)
            h, w = frame_shape
            th, tw = templ_shape
            n_probe = 5 if batch == 1 else 2 * batch + 2
            if inkernel_global:
                n_probe = max(n_probe, 7)
            frames = rng.integers(0, 256, (n_probe, h, w), np.uint8)
            x = (w - tw) // 2
            y = (h - th) // 2
            from pvot.io.gray import gray_u8_to_f32
            from pvot.tracker.state import init_state

            if inkernel_global:
                state = _global_probe_clip(frames, (th, tw))
            else:
                templ = jnp.asarray(
                    gray_u8_to_f32(frames[0])[y : y + th, x : x + tw]
                )
                state = init_state(templ, (x, y, tw, th))
            cs_probe = 4 if batch == 1 else 2 * batch
            if batch == 1:
                want_state, want = track_video(
                    frames[1:], state, config, strategy="fused",
                    backend="pallas_shear", chunk_size=cs_probe,
                )
            else:
                want_state, want = track_video_batched(
                    frames[1:], state, config, batch_size=batch,
                    backend="pallas_shear",
                )
            got_state, got = track_video_mega(
                frames[1:], state, config, chunk_size=cs_probe,
                interpret=interpret, _probe=True, batch=batch,
                inkernel_global=inkernel_global,
            )
            if not _outputs_equal(want, got):
                raise ValueError(
                    f"mega probe mismatch: {got.bbox.tolist()} vs "
                    f"{want.bbox.tolist()}"
                )
            ok = True
        except Exception:
            import traceback

            _SUPPORT_CACHE["last_error"] = traceback.format_exc()
            ok = False
        if not ok:
            import sys

            print(
                "pvot: mega-kernel unavailable at geometry "
                f"frame={frame_shape} templ={templ_shape} "
                f"(probe failed); falling back to the scan engines",
                file=sys.stderr,
            )
        _SUPPORT_CACHE[key] = ok
    return _SUPPORT_CACHE[key]


def _resolve_mode(config: TrackerConfig, probe_fn, *args, **kw):
    """Shared mega-mode resolution: True = in-kernel global-search kernel
    (preferred — nothing ever poisons), False = poison-mode kernel, None =
    neither proved out at this geometry (serve on the scan engines)."""
    if config.enable_global_search and probe_fn(
        *args, **kw, inkernel_global=True
    ):
        return True
    if probe_fn(*args, **kw):
        return False
    return None


def mega_mode(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    batch: int = 1,
):
    """Resolve the single-stream mega kernel mode at a geometry (see
    _resolve_mode).  Drivers that call mega_track_chunk directly
    (pvot.io.pipeline) use this instead of mega_supported so they serve
    the in-kernel global-search kernel whenever it proves out."""
    return _resolve_mode(
        config, mega_supported, frame_shape, templ_shape, config,
        interpret=interpret, batch=batch,
    )


def mega_multi_mode(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    batch: int = 1,
):
    """mega_mode for the multi-stream kernel (pvot.io.serving)."""
    return _resolve_mode(
        config, mega_multi_supported, frame_shape, templ_shape, config,
        interpret=interpret, batch=batch,
    )


def mega_objects_mode(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    bucket_extents=None,
):
    """mega_mode for the multi-object kernel (pvot.io.serving).
    bucket_extents: per-object true (th, tw) for mixed-size templates."""
    return _resolve_mode(
        config, mega_objects_supported, frame_shape, templ_shape, config,
        interpret=interpret, bucket_extents=bucket_extents,
    )


def track_video_mega(
    frames: np.ndarray,
    state: TrackerState,
    config: TrackerConfig = TrackerConfig(),
    chunk_size: int = 256,
    scan_backend: str = "pallas_shear",
    interpret: bool = False,
    _probe: bool = False,
    batch: int = 1,
    inkernel_global=None,
) -> Tuple[TrackerState, StepOutput]:
    """Track a pre-decoded uint8 gray video (F, H, W) on the mega path.

    Falls back to the scan path wholesale when the geometry/dtype is outside
    the mega envelope or the per-geometry probe fails, and per-chunk when a
    chunk poisons (global-search semantics).  Returns exactly what
    pvot.tracker.scan.track_video returns.  Device-resident frames are
    accepted (pvot.tracker.scan.as_frames): chunks then slice on device and
    poison re-runs never re-upload data already on chip.

    batch > 1 composes the reference's look-ahead batch semantics (C10)
    with the mega grid: only every batch-th frame is scored in-kernel, the
    rest cost nothing (round-3's routing degraded --batch to the shear
    scan engine — VERDICT r3 item 7).  Non-power-of-two batches (no
    in-kernel cadence mask: Mosaic rejects division) and fallback/rollback
    paths run pvot.tracker.scan.track_video_batched, the semantics oracle.

    inkernel_global (round 4): None = auto — probe the in-kernel
    global-search kernel at this geometry and use it when it proves out
    (global frames then commit ON-CHIP and nothing ever poisons — the
    occlusion-regime fix, VERDICT r3 item 2); True/False forces the mode.
    The poison/rollback transaction machinery below stays as the fallback
    for geometries where only the local-mode kernel compiles.
    """
    batch = int(batch or 1)
    frames = as_frames(frames)
    if frames.ndim != 3:
        raise ValueError(f"expected (F, H, W) frames, got {frames.shape}")
    f, h, w = frames.shape
    th, tw = state.template.shape

    def scan_fallback(fr, st, cs_):
        if batch > 1:
            return track_video_batched(
                np.asarray(fr), st, config, batch_size=batch,
                backend=scan_backend,
            )
        return track_video(
            fr, st, config, strategy="fused", backend=scan_backend,
            chunk_size=cs_,
        )

    g = MegaGeometry((h, w), (th, tw), config)
    if f == 0 or frames.dtype != np.uint8 or not g.supported() or (
        batch > 1 and (batch & (batch - 1) or f < batch)
    ):
        return scan_fallback(frames, state, chunk_size)
    ikg = inkernel_global
    if not _probe:
        if ikg is None:
            # Global mode first: when it proves out it strictly dominates
            # (global frames commit on-chip; local frames pay a handful of
            # dormant scalar ops — tools/global_overhead_ab.py).  Without
            # enable_global_search the only full-map frames are collapsed
            # windows (step.py:141-144), too rare to justify the bigger
            # kernel.
            ikg = config.enable_global_search and mega_supported(
                (h, w), (th, tw), config, interpret=interpret, batch=batch,
                inkernel_global=True,
            )
        if not ikg and not mega_supported(
            (h, w), (th, tw), config, interpret=interpret, batch=batch,
        ):
            return scan_fallback(frames, state, chunk_size)
    ikg = bool(ikg)

    cs = min(chunk_size, f)
    if batch > 1:  # chunk boundaries must sit on batch boundaries
        cs = max(batch, (cs // batch) * batch)
    num_chunks = -(-f // cs)
    if ikg:
        # In-kernel-global mode never poisons, so the whole clip runs as
        # ONE scanned dispatch + one packed fetch (mega_video_scan) — no
        # per-chunk relay round trips, no transaction machinery.
        stack = jnp.asarray(frames)
        pad = num_chunks * cs - f
        if pad:
            stack = jnp.concatenate(
                [stack, jnp.zeros((pad, h, w), stack.dtype)]
            )
        rows, cur = mega_video_scan(
            stack.reshape(num_chunks, cs, h, w), state,
            f - (num_chunks - 1) * cs,
            frame_shape=(h, w), templ_shape=(th, tw), config=config,
            interpret=interpret, batch=batch, inkernel_global=True,
        )
        rows.copy_to_host_async()
        return cur, _rows_to_output(np.asarray(rows)[:f])
    results: list = [None] * num_chunks
    k = 0
    cur = state
    # Transaction window: the first optimistic round enqueues EVERYTHING
    # (clean clips pay exactly one packed fetch); after a poison the window
    # shrinks to bound the worst case (every enqueued chunk after a poison
    # was computed from a stale state and is wasted — unbounded lookahead
    # made an occlusion-heavy clip O(chunks^2), the round-4 VERDICT item),
    # then doubles back up on clean rounds.
    window = num_chunks
    scan_after_poison = False
    while k < num_chunks:
        if scan_after_poison:
            # Global-mode hysteresis: while the state machine is still in
            # global mode, the mega kernel would poison again on frame one
            # (lost objects stay lost for lost_frame_threshold frames,
            # tracker_ghc/src/main.cpp:399-446) — run scan chunks directly
            # until the flag clears.  The flag fetch is a scalar and only
            # happens on the post-poison path.
            scan_after_poison = False
            while k < num_chunks and bool(np.asarray(cur.use_global)):
                cur, out = scan_fallback(
                    frames[k * cs : (k + 1) * cs], cur, cs
                )
                results[k] = out
                k += 1
            if k >= num_chunks:
                break
        # Optimistic round: enqueue a window of chunks, fetch records once.
        snapshots = []
        pend = []
        st = cur
        for j in range(k, min(k + window, num_chunks)):
            chunk = frames[j * cs : (j + 1) * cs]
            n_real = chunk.shape[0]
            if n_real < cs:
                chunk = pad_tail(chunk, cs - n_real)
            snapshots.append(st)
            rows, st = mega_chunk_step(
                jax.device_put(chunk), st, n_real,
                frame_shape=(h, w),
                templ_shape=(th, tw),
                config=config,
                interpret=interpret,
                batch=batch,
                inkernel_global=ikg,
            )
            pend.append((j, rows, n_real))
        packed = jnp.concatenate([r for _, r, _ in pend], axis=0)
        packed.copy_to_host_async()
        host = np.asarray(packed)  # the single fetch per round

        poisoned_at = None
        for idx, (j, _, n_real) in enumerate(pend):
            rs = host[idx * cs : idx * cs + n_real]
            if (rs[:, O_POISON] != 0.0).any():
                poisoned_at = idx
                break
            results[j] = _rows_to_output(rs)
        if poisoned_at is None:
            cur = st
            k = pend[-1][0] + 1
            window = min(window * 2, num_chunks)
            continue
        # Transaction rollback: chunk j re-runs on the scan path (exact
        # global-search semantics), then the mega path resumes after it.
        j = pend[poisoned_at][0]
        cur, out = scan_fallback(
            frames[j * cs : (j + 1) * cs], snapshots[poisoned_at], cs
        )
        results[j] = out
        k = j + 1
        window = 4
        scan_after_poison = True

    return cur, StepOutput(
        *(np.concatenate(xs) for xs in zip(*results))
    )


def mega_multi_supported(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    batch: int = 1,
    inkernel_global: bool = False,
) -> bool:
    """Compile + numerics probe for the MULTI-stream mega kernel at the
    served geometry (its BlockSpec layout differs from the single-stream
    call — per-stream (s, 0)-indexed template/state blocks — so it must
    prove itself separately against the scan path).  inkernel_global=True
    probes stream 0 on a lose-and-reacquire clip (_global_probe_clip) with
    stream 1 clean, covering the mixed global/local case serving sees."""
    key = (
        "multi", jax.default_backend(), frame_shape, templ_shape, config,
        interpret, batch, inkernel_global,
    )
    if key not in _SUPPORT_CACHE:
        try:
            g = MegaGeometry(frame_shape, templ_shape, config)
            if not g.supported():
                raise ValueError("geometry outside mega envelope")
            rng = np.random.default_rng(12)
            h, w = frame_shape
            th, tw = templ_shape
            n_probe = 5 if batch == 1 else 2 * batch + 2
            if inkernel_global:
                n_probe = max(n_probe, 7)
            videos = rng.integers(0, 256, (2, n_probe, h, w), np.uint8)
            from pvot.io.gray import gray_u8_to_f32
            from pvot.tracker.state import init_state

            states = []
            for s in range(2):
                if inkernel_global and s == 0:
                    states.append(_global_probe_clip(videos[0], (th, tw)))
                    continue
                x = (w - tw) // 2 + 2 * s
                y = (h - th) // 2 - s
                templ = jnp.asarray(
                    gray_u8_to_f32(videos[s, 0])[y : y + th, x : x + tw]
                )
                states.append(init_state(templ, (x, y, tw, th)))
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
            cs_probe = 4 if batch == 1 else 2 * batch
            _, got = track_streams_mega(
                videos[:, 1:], stacked, config, chunk_size=cs_probe,
                interpret=interpret, _probe=True, batch=batch,
                inkernel_global=inkernel_global,
            )
            for s in range(2):
                if batch == 1:
                    _, want = track_video(
                        videos[s, 1:], states[s], config, strategy="fused",
                        backend="pallas_shear", chunk_size=cs_probe,
                    )
                else:
                    _, want = track_video_batched(
                        videos[s, 1:], states[s], config, batch_size=batch,
                        backend="pallas_shear",
                    )
                got_s = StepOutput(
                    bbox=got.bbox[:, s], score=got.score[:, s],
                    used_global=got.used_global[:, s],
                    updated=got.updated[:, s],
                )
                if not _outputs_equal(want, got_s):
                    raise ValueError(
                        f"mega multi probe mismatch (stream {s}): "
                        f"{got.bbox[:, s].tolist()} vs {want.bbox.tolist()}"
                    )
            ok = True
        except Exception:
            import traceback

            _SUPPORT_CACHE["last_error"] = traceback.format_exc()
            ok = False
        if not ok:
            import sys

            print(
                "pvot: multi-stream mega kernel unavailable at geometry "
                f"frame={frame_shape} templ={templ_shape} "
                "(probe failed); serving falls back to the scan engines",
                file=sys.stderr,
            )
        _SUPPORT_CACHE[key] = ok
    return _SUPPORT_CACHE[key]


def _track_streams_scan(
    videos: np.ndarray,
    states: TrackerState,
    config: TrackerConfig,
    chunk_size: int,
    scan_backend: str,
    batch: int = 1,
) -> Tuple[TrackerState, StepOutput]:
    """Per-stream scan-path fallback with track_streams_mega's output
    contract ((F, S) leading layout)."""
    finals, outs = [], []
    for s in range(videos.shape[0]):
        st = jax.tree.map(lambda a, _s=s: a[_s], states)
        if batch > 1:
            fs, out = track_video_batched(
                np.asarray(videos[s]), st, config, batch_size=batch,
                backend=scan_backend,
            )
        else:
            fs, out = track_video(
                videos[s], st, config, strategy="fused",
                backend=scan_backend, chunk_size=chunk_size,
            )
        finals.append(fs)
        outs.append(out)
    final = jax.tree.map(lambda *xs: jnp.stack(xs), *finals)
    return final, StepOutput(
        *(np.stack(xs, axis=1) for xs in zip(*outs))
    )


def track_streams_mega(
    videos: np.ndarray,
    states: TrackerState,
    config: TrackerConfig = TrackerConfig(),
    chunk_size: int = 256,
    scan_backend: str = "pallas_shear",
    interpret: bool = False,
    _probe: bool = False,
    batch: int = 1,
    inkernel_global=None,
) -> Tuple[TrackerState, StepOutput]:
    """Track S independent pre-decoded streams (S, F, H, W) uint8 on the
    multi-stream mega path: every chunk is ONE pallas_call covering all
    S streams (grid (S, F)), so serving runs at the single-stream mega
    rate per stream instead of the vmapped scan engines' flat ~8k
    aggregate (docs/PERFORMANCE.md "Saturation point").

    `states` is a stacked TrackerState (leading S axis, as built by
    pvot.parallel.multi.init_multi_state).  Returns (final stacked states,
    StepOutput with (F, S) leading layout — the track_video_multi
    convention).  inkernel_global (None = auto-probe) commits global
    frames on-chip; otherwise poison semantics are per stream: only the
    poisoned stream re-runs from its last good chunk, through
    track_video_mega (scan path for the poisoned chunk, mega again after).
    Device-resident videos are accepted (pvot.tracker.scan.as_frames).
    """
    batch = int(batch or 1)
    videos = as_frames(videos)
    if videos.ndim != 4:
        raise ValueError(f"expected (S, F, H, W) videos, got {videos.shape}")
    s_streams, f, h, w = videos.shape
    th, tw = states.template.shape[-2:]
    g = MegaGeometry((h, w), (th, tw), config)
    if f == 0 or videos.dtype != np.uint8 or not g.supported() or (
        batch > 1 and (batch & (batch - 1) or f < batch)
    ):
        return _track_streams_scan(
            videos, states, config, chunk_size, scan_backend, batch=batch
        )
    ikg = inkernel_global
    if not _probe:
        if ikg is None:
            ikg = config.enable_global_search and mega_multi_supported(
                (h, w), (th, tw), config, interpret=interpret, batch=batch,
                inkernel_global=True,
            )
        if not ikg and not mega_multi_supported(
            (h, w), (th, tw), config, interpret=interpret, batch=batch,
        ):
            return _track_streams_scan(
                videos, states, config, chunk_size, scan_backend, batch=batch
            )
    ikg = bool(ikg)

    cs = min(chunk_size, f)
    if batch > 1:  # chunk boundaries must sit on batch boundaries
        cs = max(batch, (cs // batch) * batch)
    num_chunks = -(-f // cs)

    # Optimistic pass: enqueue every chunk for every stream, ONE packed
    # fetch of all records.  Snapshots (device-held, tiny) let poisoned
    # streams roll back to their last good chunk boundary.
    snapshots = []
    rows_chunks = []
    st = states
    for j in range(num_chunks):
        chunk = videos[:, j * cs : (j + 1) * cs]
        n_real = chunk.shape[1]
        if n_real < cs:
            chunk = pad_tail(chunk, cs - n_real, axis=1)
        snapshots.append(st)
        rows, st = mega_chunk_step_multi(
            jax.device_put(chunk), st, n_real,
            frame_shape=(h, w),
            templ_shape=(th, tw),
            config=config,
            interpret=interpret,
            batch=batch,
            inkernel_global=ikg,
        )
        rows_chunks.append(rows)
    packed = jnp.concatenate(rows_chunks, axis=1)  # (S, num_chunks*cs, TX)
    packed.copy_to_host_async()
    host = np.asarray(packed)  # the single fetch

    final_states = [None] * s_streams
    stream_outs = [None] * s_streams
    for s in range(s_streams):
        chunks_out = []
        poisoned_at = None
        for j in range(num_chunks):
            n_real = min(cs, f - j * cs)
            rs = host[s, j * cs : j * cs + n_real]
            if (rs[:, O_POISON] != 0.0).any():
                poisoned_at = j
                break
            chunks_out.append(_rows_to_output(rs))
        if poisoned_at is None:
            final_states[s] = jax.tree.map(lambda a, _s=s: a[_s], st)
        else:
            # Only this stream rolls back: scan path for the poisoned
            # chunk, mega again afterwards (track_video_mega's own
            # transaction loop).
            snap = jax.tree.map(
                lambda a, _s=s: a[_s], snapshots[poisoned_at]
            )
            fs, out = track_video_mega(
                videos[s, poisoned_at * cs :], snap, config, chunk_size=cs,
                scan_backend=scan_backend, interpret=interpret, batch=batch,
                inkernel_global=ikg if _probe else None,
            )
            final_states[s] = fs
            chunks_out.append(out)
        stream_outs[s] = StepOutput(
            *(np.concatenate(xs) for xs in zip(*chunks_out))
        )
    final = jax.tree.map(lambda *xs: jnp.stack(xs), *final_states)
    return final, StepOutput(
        *(np.stack(xs, axis=1) for xs in zip(*stream_outs))
    )


def mega_objects_supported(
    frame_shape: Tuple[int, int],
    templ_shape: Tuple[int, int],
    config: TrackerConfig,
    interpret: bool = False,
    inkernel_global: bool = False,
    bucket_extents=None,
) -> bool:
    """Compile + numerics probe for the MULTI-OBJECT mega kernel (shared
    frames, (k, 0)-indexed state blocks) at the served geometry, against
    per-object single-tracker runs of the same clip.  inkernel_global=True
    starts object 0 with its bbox center outside the frame so it loses and
    re-acquires on-chip while object 1 tracks locally through the SAME
    frames (the pasted patch is shared — both objects see it).
    bucket_extents: the served per-object true extents for the BUCKETED
    (mixed-size) kernel — the probe runs the exact extent set (each set
    is its own compiled program: per-object box blocks + traced masks)."""
    key = (
        "objects", jax.default_backend(), frame_shape, templ_shape, config,
        interpret, inkernel_global, bucket_extents,
    )
    if key not in _SUPPORT_CACHE:
        try:
            if bucket_extents is not None:
                min_t = (
                    min(e[0] for e in bucket_extents),
                    min(e[1] for e in bucket_extents),
                )
                g = MegaGeometry(frame_shape, templ_shape, config, min_t)
            else:
                g = MegaGeometry(frame_shape, templ_shape, config)
            if not g.supported():
                raise ValueError("geometry outside mega envelope")
            rng = np.random.default_rng(13)
            h, w = frame_shape
            th, tw = templ_shape
            n_probe = 7 if inkernel_global else 5
            frames = rng.integers(0, 256, (n_probe, h, w), np.uint8)
            from pvot.io.gray import gray_u8_to_f32
            from pvot.tracker.state import init_state

            k_probe = (
                2 if bucket_extents is None else len(bucket_extents)
            )
            probe_extents = (
                ((th, tw),) * k_probe
                if bucket_extents is None else tuple(bucket_extents)
            )
            states = []
            for k in range(k_probe):
                eh, ew = probe_extents[k]
                if inkernel_global and k == 0:
                    states.append(_global_probe_clip(frames, (eh, ew)))
                    continue
                x = (w - ew) // 2 + 3 * k
                y = (h - eh) // 2 - 2 * k
                templ = jnp.asarray(
                    gray_u8_to_f32(frames[0])[y : y + eh, x : x + ew]
                )
                states.append(init_state(templ, (x, y, ew, eh)))
            if bucket_extents is None:
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
            else:
                from pvot.parallel.multi import init_multi_state_bucketed

                stacked = init_multi_state_bucketed(
                    [np.asarray(s.template) for s in states],
                    [
                        (int(s.bbox_x), int(s.bbox_y),
                         int(s.bbox_w), int(s.bbox_h))
                        for s in states
                    ],
                    bucket=(th, tw),
                )
            _, got = track_objects_mega(
                frames[1:], stacked, config, chunk_size=4,
                interpret=interpret, _probe=True,
                inkernel_global=inkernel_global,
            )
            for k in range(k_probe):
                _, want = track_video(
                    frames[1:], states[k], config, strategy="fused",
                    backend="pallas_shear", chunk_size=4,
                )
                got_k = StepOutput(
                    bbox=got.bbox[:, k], score=got.score[:, k],
                    used_global=got.used_global[:, k],
                    updated=got.updated[:, k],
                )
                if not _outputs_equal(
                    want, got_k,
                    acc_atol=1e-5 if bucket_extents is None else 5e-5,
                ):
                    raise ValueError(
                        f"mega objects probe mismatch (object {k}): "
                        f"{got.bbox[:, k].tolist()} vs {want.bbox.tolist()}"
                    )
            ok = True
        except Exception:
            import traceback

            _SUPPORT_CACHE["last_error"] = traceback.format_exc()
            ok = False
        if not ok:
            import sys

            print(
                "pvot: multi-object mega kernel unavailable at geometry "
                f"frame={frame_shape} templ={templ_shape} "
                "(probe failed); falling back to the vmapped scan step",
                file=sys.stderr,
            )
        _SUPPORT_CACHE[key] = ok
    return _SUPPORT_CACHE[key]


def track_objects_mega(
    frames: np.ndarray,
    states: TrackerState,
    config: TrackerConfig = TrackerConfig(),
    chunk_size: int = 256,
    scan_backend: str = "pallas_shear",
    interpret: bool = False,
    _probe: bool = False,
    inkernel_global=None,
) -> Tuple[TrackerState, StepOutput]:
    """Track K objects through ONE pre-decoded uint8 clip (F, H, W) on the
    multi-object mega path: every chunk runs all K trackers in ONE
    pallas_call (grid (K, F), shared frames — the reference's 150% stretch
    goal, SURVEY.md §2e, at mega-kernel rates instead of the vmapped scan
    step's).  `states` is a stacked TrackerState (leading K axis,
    pvot.parallel.multi.init_multi_state layout).  Returns (final stacked
    states, StepOutput with the (F, K) leading layout —
    track_video_multi's convention).  Poison (global-search) semantics are
    per object: only the poisoned object re-runs its chunk on the scan
    path from its chunk-start snapshot; because every object reads the
    same clip, the fallback is the single-object driver per poisoned
    object.  Device-resident frames are accepted
    (pvot.tracker.scan.as_frames).
    """
    frames = as_frames(frames)
    if frames.ndim != 3:
        raise ValueError(f"expected (F, H, W) frames, got {frames.shape}")
    f, h, w = frames.shape
    k_objects = int(np.shape(states.t_mean)[0])
    th, tw = states.template.shape[-2:]
    # Heterogeneous template sizes (round 4): bbox extents != the shared
    # template bucket means init_multi_state_bucketed states — the kernel
    # runs with per-object traced extents + per-object box blocks.
    extents = tuple(
        (int(eh), int(ew))
        for eh, ew in zip(np.asarray(states.bbox_h), np.asarray(states.bbox_w))
    )
    bucketed = any(e != (th, tw) for e in extents)
    bucket_extents = extents if bucketed else None
    g = MegaGeometry(
        (h, w), (th, tw), config,
        min_templ_shape=(
            (min(e[0] for e in extents), min(e[1] for e in extents))
            if bucketed else None
        ),
    )

    def multi_fallback():
        from pvot.parallel.multi import track_video_multi

        return track_video_multi(
            frames, states, config, strategy="fused", backend=scan_backend,
            chunk_size=chunk_size,
        )

    if f == 0 or frames.dtype != np.uint8 or not g.supported():
        return multi_fallback()
    ikg = inkernel_global
    if not _probe:
        if ikg is None:
            ikg = config.enable_global_search and mega_objects_supported(
                (h, w), (th, tw), config, interpret=interpret,
                inkernel_global=True, bucket_extents=bucket_extents,
            )
        if not ikg and not mega_objects_supported(
            (h, w), (th, tw), config, interpret=interpret,
            bucket_extents=bucket_extents,
        ):
            return multi_fallback()
    ikg = bool(ikg)

    cs = min(chunk_size, f)
    num_chunks = -(-f // cs)

    # Optimistic pass: enqueue every chunk, ONE packed record fetch;
    # poisoned objects roll back from their chunk-start snapshots.
    snapshots = []
    rows_chunks = []
    st = states
    for j in range(num_chunks):
        chunk = frames[j * cs : (j + 1) * cs]
        n_real = chunk.shape[0]
        if n_real < cs:
            chunk = pad_tail(chunk, cs - n_real)
        snapshots.append(st)
        rows, st = mega_chunk_step_objects(
            jax.device_put(chunk), st, n_real,
            frame_shape=(h, w),
            templ_shape=(th, tw),
            config=config,
            interpret=interpret,
            inkernel_global=ikg,
            bucket_extents=bucket_extents,
        )
        rows_chunks.append(rows)
    packed = jnp.concatenate(rows_chunks, axis=1)  # (K, num_chunks*cs, TX)
    packed.copy_to_host_async()
    host = np.asarray(packed)  # the single fetch

    final_states = [None] * k_objects
    object_outs = [None] * k_objects
    for k in range(k_objects):
        chunks_out = []
        poisoned_at = None
        for j in range(num_chunks):
            n_real = min(cs, f - j * cs)
            rs = host[k, j * cs : j * cs + n_real]
            if (rs[:, O_POISON] != 0.0).any():
                poisoned_at = j
                break
            chunks_out.append(_rows_to_output(rs))
        if poisoned_at is None:
            final_states[k] = jax.tree.map(lambda a, _k=k: a[_k], st)
        else:
            snap = jax.tree.map(
                lambda a, _k=k: a[_k], snapshots[poisoned_at]
            )
            if bucketed:
                # Single-object rollback runs at the object's TRUE
                # geometry: slice the bucket padding off the template
                # (stats already normalize over the true extent).
                eh, ew = extents[k]
                snap = snap._replace(template=snap.template[:eh, :ew])
            fs, out = track_video_mega(
                frames[poisoned_at * cs :], snap, config, chunk_size=cs,
                scan_backend=scan_backend, interpret=interpret,
                inkernel_global=ikg if _probe else None,
            )
            if bucketed:
                # Back to the bucket layout for the stacked final state.
                fs = fs._replace(template=jnp.pad(
                    fs.template,
                    ((0, th - extents[k][0]), (0, tw - extents[k][1])),
                ))
            final_states[k] = fs
            chunks_out.append(out)
        object_outs[k] = StepOutput(
            *(np.concatenate(xs) for xs in zip(*chunks_out))
        )
    final = jax.tree.map(lambda *xs: jnp.stack(xs), *final_states)
    return final, StepOutput(
        *(np.stack(xs, axis=1) for xs in zip(*object_outs))
    )
