"""End-to-end multi-stream serving tests (pvot.io.serving.serve_streams):
lockstep feeds over unequal-length streams, the mega path in interpret
mode (including per-stream poison transactions), and the per-stream-valid
scan fallback.  Chip-level serving numbers live in benchmarks/suite.py
(7m* keys)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvot.config import TrackerConfig
from pvot.io.gray import gray_u8_to_f32
from pvot.io.serving import _StreamFeed, serve_streams
from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
from pvot.tracker.scan import track_video
from pvot.tracker.state import init_state

CONFIG = TrackerConfig(search_radius_x=8, search_radius_y=8)


def _make_streams(lengths, seed0=3, spec_overrides=()):
    """Unequal-length synthetic streams sharing one (94, 250) geometry."""
    videos, states = [], []
    for i, n in enumerate(lengths):
        kw = dict(
            width=250, height=94, num_frames=n + 1, target_w=16,
            target_h=16, seed=seed0 + i, noise_std=1.0,
        )
        if i < len(spec_overrides):
            kw.update(spec_overrides[i])
        spec = SyntheticSpec(**kw)
        frames = generate_gray_video(spec)
        x, y, w, h = target_bbox(spec, 0)
        templ = jnp.asarray(gray_u8_to_f32(frames[0])[y : y + h, x : x + w])
        videos.append(frames)
        states.append(init_state(templ, (x, y, w, h)))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return videos, states, stacked


def _assert_stream_equal(want, got):
    np.testing.assert_array_equal(want.bbox, got.bbox)
    np.testing.assert_array_equal(want.updated, got.updated)
    np.testing.assert_array_equal(want.used_global, got.used_global)
    np.testing.assert_allclose(want.score, got.score, atol=1e-5)


def _assert_stream_equal_global(want, got):
    """In-kernel global-search serving contract: bboxes/flags bit-equal,
    accepted scores strict, rejected scores engine-grade (see
    pvot.tracker.mega._outputs_equal)."""
    np.testing.assert_array_equal(want.bbox, got.bbox)
    np.testing.assert_array_equal(want.updated, got.updated)
    np.testing.assert_array_equal(want.used_global, got.used_global)
    acc = np.asarray(want.updated)
    np.testing.assert_allclose(
        np.asarray(want.score)[acc], np.asarray(got.score)[acc], atol=1e-5
    )
    np.testing.assert_allclose(want.score, got.score, atol=2e-3)


def test_stream_feed_holds_after_end(rng):
    frames = rng.integers(0, 256, size=(6, 8, 8), dtype=np.uint8)
    feed = _StreamFeed(iter(frames), (8, 8), chunk_size=4)
    c0, n0 = feed.next_chunk()
    c1, n1 = feed.next_chunk()
    assert (n0, n1) == (4, 2)
    np.testing.assert_array_equal(c1[:2], frames[4:6])
    c2, n2 = feed.next_chunk()  # exhausted: held last frame, zero valid
    assert n2 == 0 and feed.done
    np.testing.assert_array_equal(c2, np.broadcast_to(frames[5], (4, 8, 8)))
    feed.close()


def test_serve_streams_scan_unequal_lengths():
    """The scan fallback's per-stream validity mask: three streams ending
    at different ticks, each trajectory exactly the single-stream scan."""
    lengths = [13, 6, 17]
    videos, states, stacked = _make_streams(lengths)
    final, outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG,
        backend="xla", chunk_size=4,
    )
    assert [o.bbox.shape[0] for o in outs] == lengths
    for s, n in enumerate(lengths):
        want_state, want = track_video(
            videos[s][1:], states[s], CONFIG, strategy="fused",
            backend="xla", chunk_size=4,
        )
        _assert_stream_equal(want, outs[s])
        assert int(final.bbox_x[s]) == int(want_state.bbox_x)
        np.testing.assert_allclose(
            np.asarray(final.template[s]),
            np.asarray(want_state.template), atol=1e-6,
        )


def test_serve_streams_mega_interpret_unequal_lengths():
    """The mega serving path (one pallas_call per lockstep chunk) over
    unequal-length streams: ended streams ride n_valid=0 lanes with frozen
    state while the longest stream finishes."""
    lengths = [13, 7]
    videos, states, stacked = _make_streams(lengths)
    timings: list = []
    final, outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG,
        backend="mega", scan_backend="xla", chunk_size=4,
        timings=timings, interpret=True, _probe=True,
    )
    assert [o.bbox.shape[0] for o in outs] == lengths
    assert sum(n for n, _ in timings) == sum(lengths)
    for s, n in enumerate(lengths):
        want_state, want = track_video(
            videos[s][1:], states[s], CONFIG, strategy="fused",
            backend="xla", chunk_size=4,
        )
        _assert_stream_equal(want, outs[s])
        assert int(final.bbox_x[s]) == int(want_state.bbox_x)


def test_serve_streams_score_passes_plumbing():
    """Round 5: serve_streams exposes the fast tier's MXU pass count; the
    1-pass tier must reach the kernel and track the fixture (trajectory
    vs the HIGHEST-tier serve; scores drift at fast-tier magnitude)."""
    lengths = [9, 9]
    videos, states, stacked = _make_streams(lengths)
    kw = dict(
        backend="mega", scan_backend="xla", chunk_size=4,
        interpret=True, _probe=True,
    )
    _, outs_hi = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG, **kw
    )
    _, outs_f1 = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG,
        highest=False, score_passes=1, **kw
    )
    for s in range(2):
        np.testing.assert_array_equal(outs_hi[s].bbox, outs_f1[s].bbox)
        drift = float(np.max(np.abs(
            np.asarray(outs_hi[s].score) - np.asarray(outs_f1[s].score)
        )))
        assert 0.0 < drift < 2e-2, drift  # fast tier really ran


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_serve_streams_mega_per_stream_poison(depth):
    """A stream that loses its object mid-serve poisons and re-runs ONLY
    its own chunks on the scan path; the healthy stream's mega records
    commit untouched and both trajectories match the scan oracle.  depth=1
    is the strict synchronous mode; depth>=2 discovers the poison one or
    more chunks late and must flush the in-flight window (committing the
    clean lane's records, re-running the poisoned lane's)."""
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    # Stream 0 tracks cleanly (slow 120-frame sinusoid sliced short);
    # stream 1 exits the frame and re-enters (goes global).
    videos, states, stacked = _make_streams(
        [17, 17],
        spec_overrides=(
            dict(num_frames=120),
            dict(seed=5, exit_and_reenter=True, noise_std=2.0),
        ),
    )
    videos = [v[:18] for v in videos]
    final, outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), config,
        backend="mega", scan_backend="xla", chunk_size=4,
        pipeline_depth=depth, interpret=True, _probe=True,
    )
    assert outs[1].used_global.any(), "lost stream must go global"
    assert not outs[0].used_global.any()
    for s in range(2):
        want_state, want = track_video(
            videos[s][1:], states[s], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        _assert_stream_equal(want, outs[s])
        assert int(final.bbox_x[s]) == int(want_state.bbox_x)


def test_serve_streams_mega_inkernel_global():
    """Serving with the in-kernel global-search kernel: the lost stream
    re-acquires ON-CHIP — no poison lanes, no rollback re-runs, no
    pipeline disturbance — and both trajectories match the scan oracle
    (the round-4 occlusion-regime fix at the serving layer)."""
    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    videos, states, stacked = _make_streams(
        [17, 17],
        spec_overrides=(
            dict(num_frames=120),
            dict(seed=5, exit_and_reenter=True, noise_std=2.0),
        ),
    )
    videos = [v[:18] for v in videos]
    final, outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), config,
        backend="mega", scan_backend="xla", chunk_size=4,
        pipeline_depth=2, interpret=True, _probe=True,
        inkernel_global=True,
    )
    assert outs[1].used_global.any(), "lost stream must go global"
    assert not outs[0].used_global.any()
    for s in range(2):
        want_state, want = track_video(
            videos[s][1:], states[s], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        _assert_stream_equal_global(want, outs[s])
        assert int(final.bbox_x[s]) == int(want_state.bbox_x)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
@pytest.mark.parametrize("use_mega", [False, True])
def test_serve_streams_multidevice(use_mega):
    """Streams fanned over 4 devices (host-driven data parallelism, one
    pipelined driver per device group) must return BIT-IDENTICAL results
    to the single-device serve, in submission order — the fan-out only
    changes placement, never math."""
    lengths = [13, 6, 9, 11, 7]
    videos, states, stacked = _make_streams(lengths)
    kw = (
        dict(backend="mega", interpret=True, _probe=True)
        if use_mega else dict(backend="xla")
    )
    want_final, want_outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG,
        scan_backend="xla", chunk_size=4, **kw,
    )
    final, outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG,
        scan_backend="xla", chunk_size=4,
        devices=jax.devices()[:4], **kw,
    )
    assert [o.bbox.shape[0] for o in outs] == lengths
    for s in range(len(lengths)):
        np.testing.assert_array_equal(want_outs[s].bbox, outs[s].bbox)
        np.testing.assert_array_equal(want_outs[s].score, outs[s].score)
        np.testing.assert_array_equal(want_outs[s].updated, outs[s].updated)
        assert int(final.bbox_x[s]) == int(want_final.bbox_x[s])
        np.testing.assert_array_equal(
            np.asarray(final.template[s]), np.asarray(want_final.template[s])
        )


def test_serve_cli_synthetic(tmp_path, capsys):
    """pvot-serve end to end on synthetic streams: per-stream summaries,
    aggregate summary line, and per-stream JSON-lines trajectories."""
    import json

    from pvot.cli.serve import main

    rc = main([
        "--synthetic", "320x240x12", "--streams", "2", "--chunk-size", "4",
        "--search-radius", "24",
        "--trajectory-out", str(tmp_path / "traj"),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving summary: streams=2, frames=22" in text
    assert "stream 0: frames=11" in text
    for s in range(2):
        lines = (tmp_path / f"traj.s{s}.jsonl").read_text().splitlines()
        assert len(lines) == 11
        rec = json.loads(lines[0])
        assert rec["stream"] == s and rec["frame"] == 1
        assert len(rec["bbox"]) == 4


def test_serve_cli_video_files(tmp_path, capsys):
    """pvot-serve over real video files (encoded fixtures), shared --roi."""
    import cv2  # noqa: F401  (skip below if absent)

    from pvot.cli.serve import main
    from pvot.io.synthetic import SyntheticSpec, generate_bgr_frames
    from pvot.io.video import VideoWriter

    spec = SyntheticSpec(
        width=160, height=120, num_frames=10, target_w=32, target_h=32,
        seed=9,
    )
    paths = []
    for s in range(2):
        path = str(tmp_path / f"clip{s}.avi")
        with VideoWriter(path, fps=30.0, size=(160, 120)) as wtr:
            for frame in generate_bgr_frames(spec):
                wtr.write(frame)
        paths.append(path)
    rc = main(paths + [
        "--roi", "64,44,32,32", "--chunk-size", "4", "--search-radius", "16",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving summary: streams=2, frames=18" in text


def test_serve_streams_decode_error_propagates():
    """A stream whose decoder raises mid-serve must surface the error and
    join every feed's decode thread (no leaked threads, no hang)."""
    import threading

    def bad_iter():
        yield np.zeros((94, 250), np.uint8)
        raise RuntimeError("decode failed")

    import time as _time

    videos, states, stacked = _make_streams([9, 9])
    before = threading.active_count()
    with pytest.raises(RuntimeError, match="decode failed"):
        serve_streams(
            [iter(videos[0][1:]), bad_iter()], stacked, (94, 250), CONFIG,
            backend="xla", chunk_size=4,
        )
    # Feeds are closed in the driver's finally: decode threads must wind
    # down (stop event + join), restoring the pre-call thread count.
    for _ in range(100):
        if threading.active_count() <= before:
            break
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_serve_streams_checkpoint_resume_bit_identical(tmp_path):
    """Stop-and-resume mid-serve through the stacked-state checkpoint:
    first half -> save -> load -> second half must equal one full serve
    bit for bit (the checkpoint round-trips the whole scan carry)."""
    from pvot.utils.checkpoint import load_state, save_state

    videos, states, stacked = _make_streams([12, 12])
    full_final, full_outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG,
        backend="xla", chunk_size=4,
    )
    half_final, half_outs = serve_streams(
        [iter(v[1:7]) for v in videos], stacked, (94, 250), CONFIG,
        backend="xla", chunk_size=4,
    )
    path = save_state(str(tmp_path / "serve_ckpt"), half_final)
    resumed = load_state(path)
    _, rest_outs = serve_streams(
        [iter(v[7:]) for v in videos], resumed, (94, 250), CONFIG,
        backend="xla", chunk_size=4,
    )
    for s in range(2):
        got_bbox = np.concatenate([half_outs[s].bbox, rest_outs[s].bbox])
        got_score = np.concatenate([half_outs[s].score, rest_outs[s].score])
        np.testing.assert_array_equal(full_outs[s].bbox, got_bbox)
        np.testing.assert_array_equal(full_outs[s].score, got_score)


def test_serve_cli_checkpoint_resume(tmp_path, capsys):
    """pvot-serve --checkpoint-out writes a stacked-state .npz that
    --resume accepts (stream-count validated)."""
    from pvot.cli.serve import main

    ckpt = str(tmp_path / "ck")
    rc = main([
        "--synthetic", "320x240x8", "--streams", "2", "--chunk-size", "4",
        "--search-radius", "24", "--checkpoint-out", ckpt,
    ])
    assert rc == 0
    assert "Checkpoint saved" in capsys.readouterr().out
    rc = main([
        "--synthetic", "320x240x8", "--streams", "2", "--chunk-size", "4",
        "--search-radius", "24", "--resume", ckpt + ".npz",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving summary: streams=2, frames=16" in text  # all 8 frames/stream
    # Stream-count mismatch is rejected.
    rc = main([
        "--synthetic", "320x240x8", "--streams", "3", "--chunk-size", "4",
        "--search-radius", "24", "--resume", ckpt + ".npz",
    ])
    assert rc == 2
    capsys.readouterr()


def _make_objects_clip(n_frames=17, exit_and_reenter=False):
    """One clip + K decisive trackables: the moving target plus a
    distinctive STATIC patch stamped into every frame (bare-background
    patches are NCC-degenerate; see tests/test_mega.py)."""
    import itertools

    from pvot.io.synthetic import generate_gray_frames

    spec = SyntheticSpec(
        width=250, height=94, num_frames=120 if not exit_and_reenter else 18,
        target_w=16, target_h=16, seed=3 if not exit_and_reenter else 5,
        noise_std=1.0 if not exit_and_reenter else 2.0,
        exit_and_reenter=exit_and_reenter,
    )
    frames = np.stack(
        list(itertools.islice(generate_gray_frames(spec), n_frames + 1))
    )
    rng = np.random.default_rng(23)
    frames[:, 10:26, 10:26] = rng.integers(0, 256, (16, 16), np.uint8)
    x, y, w, h = target_bbox(spec, 0)
    rois = [(10, 10, 16, 16), (x, y, w, h)]
    states = [
        init_state(
            jnp.asarray(gray_u8_to_f32(frames[0])[ry : ry + rh, rx : rx + rw]),
            (rx, ry, rw, rh),
        )
        for rx, ry, rw, rh in rois
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return frames, states, stacked


@pytest.mark.parametrize("depth", [1, 2])
def test_serve_objects_mega_interpret(depth):
    """Streaming multi-object serving (serve_objects, mega path): K
    trackers over one live stream, (F, K) output, each lane equal to a
    lone tracker over the same clip."""
    from pvot.io.serving import serve_objects

    frames, states, stacked = _make_objects_clip(n_frames=13)
    timings: list = []
    final, out = serve_objects(
        iter(frames[1:]), stacked, (94, 250), CONFIG,
        backend="mega", scan_backend="xla", chunk_size=4,
        timings=timings, pipeline_depth=depth, interpret=True, _probe=True,
    )
    assert out.bbox.shape == (13, 2, 4)
    assert sum(n for n, _ in timings) == 13
    for k in range(2):
        want_state, want = track_video(
            frames[1:], states[k], CONFIG, strategy="fused",
            backend="xla", chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, out.bbox[:, k])
        np.testing.assert_array_equal(want.updated, out.updated[:, k])
        np.testing.assert_allclose(want.score, out.score[:, k], atol=1e-5)
        assert int(final.bbox_x[k]) == int(want_state.bbox_x)


def test_serve_objects_mega_inkernel_global():
    """serve_objects with the in-kernel global-search kernel: the lane
    that exits the frame re-acquires on-chip, the static-patch lane is
    untouched, both match lone-tracker oracles."""
    from pvot.io.serving import serve_objects

    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, states, stacked = _make_objects_clip(
        n_frames=17, exit_and_reenter=True
    )
    final, out = serve_objects(
        iter(frames[1:]), stacked, (94, 250), config,
        backend="mega", scan_backend="xla", chunk_size=4,
        interpret=True, _probe=True, inkernel_global=True,
    )
    assert out.used_global[:, 1].any(), "exiting lane must go global"
    for k in range(2):
        want_state, want = track_video(
            frames[1:], states[k], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        got_k = type(want)(
            bbox=out.bbox[:, k], score=out.score[:, k],
            used_global=out.used_global[:, k], updated=out.updated[:, k],
        )
        _assert_stream_equal_global(want, got_k)
        assert int(final.bbox_x[k]) == int(want_state.bbox_x)


def test_serve_objects_mega_poison_and_wire_staging():
    """A lane that goes global poisons and re-runs only itself (the
    static-patch lane's mega records commit untouched); wire-size staging
    is bit-identical to pre-padded."""
    from pvot.io.serving import serve_objects

    config = TrackerConfig(
        search_radius_x=8, search_radius_y=8, lost_frame_threshold=2
    )
    frames, states, stacked = _make_objects_clip(
        n_frames=17, exit_and_reenter=True
    )
    runs = []
    for prepad in (True, False):
        final, out = serve_objects(
            iter(frames[1:]), stacked, (94, 250), config,
            backend="mega", scan_backend="xla", chunk_size=4,
            prepad=prepad, interpret=True, _probe=True,
        )
        runs.append((final, out))
    (fa, oa), (fb, ob) = runs
    np.testing.assert_array_equal(oa.bbox, ob.bbox)
    np.testing.assert_array_equal(oa.score, ob.score)
    assert oa.used_global[:, 1].any(), "lost lane must go global"
    assert not oa.used_global[:, 0].any()
    for k in range(2):
        want_state, want = track_video(
            frames[1:], states[k], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, oa.bbox[:, k])
        np.testing.assert_array_equal(want.used_global, oa.used_global[:, k])
        assert int(fa.bbox_x[k]) == int(want_state.bbox_x)


def test_serve_objects_scan_fallback():
    """Outside the mega envelope serve_objects serves on the vmapped
    multi-object scan step with the same (F, K) contract."""
    from pvot.io.serving import serve_objects

    config = TrackerConfig(search_radius_x=70, search_radius_y=8)
    frames, states, stacked = _make_objects_clip(n_frames=9)
    final, out = serve_objects(
        iter(frames[1:]), stacked, (94, 250), config,
        backend="mega", scan_backend="xla", chunk_size=4,
    )
    assert out.bbox.shape == (9, 2, 4)
    for k in range(2):
        _, want = track_video(
            frames[1:], states[k], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, out.bbox[:, k])
        np.testing.assert_allclose(want.score, out.score[:, k], atol=1e-5)


def test_serve_objects_empty_stream_keeps_layout():
    """Zero served frames still honor the documented (F, K) output layout
    (F = 0) on BOTH serve_objects arms — mega and the scan fallback."""
    from pvot.io.serving import serve_objects

    _, _, stacked = _make_objects_clip(n_frames=3)
    for kwargs in (
        dict(backend="mega", interpret=True, _probe=True),  # mega arm
        dict(  # scan-fallback arm (radius outside the mega envelope)
            backend="mega", scan_backend="xla",
            config=TrackerConfig(search_radius_x=70, search_radius_y=8),
        ),
    ):
        kwargs.setdefault("config", CONFIG)
        config = kwargs.pop("config")
        final, out = serve_objects(
            iter([]), stacked, (94, 250), config, chunk_size=4, **kwargs
        )
        assert out.bbox.shape == (0, 2, 4)
        assert out.score.shape == (0, 2)
        assert out.used_global.shape == (0, 2)
        assert out.updated.shape == (0, 2)
        np.testing.assert_array_equal(
            np.asarray(final.bbox_x), np.asarray(stacked.bbox_x)
        )


def test_serve_cli_resume_rejects_roi(tmp_path, capsys):
    """--roi and --resume conflict: templates come from the checkpoint."""
    from pvot.cli.serve import main

    rc = main([
        "--synthetic", "320x240x4", "--streams", "1",
        "--roi", "10,10,8,8", "--resume", str(tmp_path / "absent.npz"),
    ])
    assert rc == 2
    assert "mutually exclusive" in capsys.readouterr().err


def test_serve_cli_resume_single_object_checkpoint(tmp_path, capsys):
    """A single-object checkpoint (scalar leaves, as the main pvot CLI
    saves) resumes in pvot-serve as a one-lane stream."""
    from pvot.cli.serve import main
    from pvot.io.synthetic import generate_gray_frames
    from pvot.tracker.state import init_state as init_single
    from pvot.utils.checkpoint import save_state

    # Template from the serve CLI's stream-0 synthetic spec (seed=1).
    spec = SyntheticSpec(width=320, height=240, num_frames=8, seed=1)
    first = next(generate_gray_frames(spec))
    x, y, w, h = target_bbox(spec, 0)
    templ = jnp.asarray(gray_u8_to_f32(first)[y : y + h, x : x + w])
    state = init_single(templ, (x, y, w, h))
    assert np.ndim(state.t_mean) == 0  # genuinely unstacked
    path = save_state(str(tmp_path / "single"), state)

    rc = main([
        "--synthetic", "320x240x8", "--streams", "1", "--chunk-size", "4",
        "--search-radius", "24", "--resume", path,
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving summary: streams=1, frames=8" in text


def test_serve_cli_closes_decoders_on_error(monkeypatch):
    """Decoder handles are closed even when serving raises mid-run —
    in streams mode AND objects mode."""
    import pvot.io.serving as serving_mod
    import pvot.io.video as video_mod
    from pvot.cli.serve import main

    closed = []

    class FakeReader:
        def __init__(self, path):
            self.path = path
            self.size = (64, 48)

        def read(self):
            return np.zeros((48, 64, 3), np.uint8)

        def __iter__(self):
            return iter([])

        def close(self):
            closed.append(self.path)

    def boom(*a, **k):
        raise RuntimeError("decode explosion")

    monkeypatch.setattr(video_mod, "VideoReader", FakeReader)
    monkeypatch.setattr(serving_mod, "serve_streams", boom)
    monkeypatch.setattr(serving_mod, "serve_objects", boom)
    with pytest.raises(RuntimeError, match="decode explosion"):
        main(["a.mp4", "b.mp4", "--roi", "4,4,8,8"])
    assert closed == ["a.mp4", "b.mp4"]
    closed.clear()
    with pytest.raises(RuntimeError, match="decode explosion"):
        main(["a.mp4", "--roi", "4,4,8,8", "--roi", "20,20,8,8"])
    assert closed == ["a.mp4"]


def test_serve_cli_closes_decoders_on_arg_errors(monkeypatch, capsys):
    """Validation-error exits AFTER decoders open close them too (the
    serving try/finally only covers the serve call itself)."""
    import pvot.io.video as video_mod
    from pvot.cli.serve import main

    closed = []

    class FakeReader:
        def __init__(self, path):
            self.path = path
            self.size = (64, 48)

        def read(self):
            return np.zeros((48, 64, 3), np.uint8)

        def __iter__(self):
            return iter([])

        def close(self):
            closed.append(self.path)

    monkeypatch.setattr(video_mod, "VideoReader", FakeReader)
    # ROI-count mismatch over file streams: the hint names the file-mode
    # remedy (one path), not --streams (which files ignore).
    rc = main(["a.mp4", "b.mp4", "c.mp4",
               "--roi", "4,4,8,8", "--roi", "9,9,8,8"])
    assert rc == 2
    assert closed == ["a.mp4", "b.mp4", "c.mp4"]
    assert "give exactly one video path" in capsys.readouterr().err
    closed.clear()
    # Missing --roi for file streams.
    assert main(["a.mp4"]) == 2
    assert closed == ["a.mp4"]
    closed.clear()
    # Malformed --roi after decoders opened (SystemExit routed to _fail).
    assert main(["a.mp4", "--roi", "bogus"]) == 2
    assert closed == ["a.mp4"]


def test_serve_cli_closes_decoders_on_partial_open(monkeypatch, capsys):
    """If the Nth decoder fails to open, the first N-1 handles are closed
    (readers are appended to the closer list as each one opens)."""
    import pvot.io.video as video_mod
    from pvot.cli.serve import main

    closed = []

    class FakeReader:
        def __init__(self, path):
            if path == "bad.mp4":
                raise OSError("no such container")
            self.path = path
            self.size = (64, 48)

        def close(self):
            closed.append(self.path)

    monkeypatch.setattr(video_mod, "VideoReader", FakeReader)
    rc = main(["a.mp4", "b.mp4", "bad.mp4", "--roi", "4,4,8,8"])
    assert rc == 2
    assert closed == ["a.mp4", "b.mp4"]
    assert "Cannot open video 'bad.mp4'" in capsys.readouterr().err


def test_serve_cli_closes_decoders_on_bad_resume(monkeypatch, tmp_path,
                                                 capsys):
    """A missing or corrupt --resume checkpoint (raises after decoders
    open) exits 2 and closes every decoder handle."""
    import pvot.io.video as video_mod
    from pvot.cli.serve import main

    closed = []

    class FakeReader:
        def __init__(self, path):
            self.path = path
            self.size = (64, 48)

        def read(self):
            return np.zeros((48, 64, 3), np.uint8)

        def __iter__(self):
            return iter([])

        def close(self):
            closed.append(self.path)

    monkeypatch.setattr(video_mod, "VideoReader", FakeReader)
    rc = main(["a.mp4", "b.mp4", "--resume", str(tmp_path / "absent.npz")])
    assert rc == 2
    assert closed == ["a.mp4", "b.mp4"]
    assert "Cannot resume from" in capsys.readouterr().err
    closed.clear()
    corrupt = tmp_path / "corrupt.npz"
    corrupt.write_bytes(b"not an npz")
    rc = main(["a.mp4", "--resume", str(corrupt)])
    assert rc == 2
    assert closed == ["a.mp4"]


def test_serve_cli_objects_checkpoint_resume(tmp_path, capsys):
    """A K-object --checkpoint-out resumes in objects mode on one stream."""
    from pvot.cli.serve import main

    ckpt = str(tmp_path / "objck")
    rc = main([
        "--synthetic", "320x240x8", "--streams", "1", "--chunk-size", "4",
        "--search-radius", "24",
        "--roi", "120,80,40,40", "--roi", "40,30,40,40",
        "--checkpoint-out", ckpt,
    ])
    assert rc == 0
    assert "Checkpoint saved" in capsys.readouterr().out
    rc = main([
        "--synthetic", "320x240x8", "--streams", "1", "--chunk-size", "4",
        "--search-radius", "24", "--resume", ckpt + ".npz",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving 1 stream x 2 objects" in text
    assert "Serving summary: objects=2, frames=8" in text


def test_serve_cli_objects_mode(tmp_path, capsys):
    """One video + several --roi = multi-object serving via the CLI."""
    import json

    from pvot.cli.serve import main

    rc = main([
        "--synthetic", "320x240x10", "--streams", "1", "--chunk-size", "4",
        "--search-radius", "24",
        "--roi", "120,80,40,40", "--roi", "40,30,40,40",
        "--trajectory-out", str(tmp_path / "t"),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving 1 stream x 2 objects" in text
    assert "Serving summary: objects=2, frames=9" in text
    lines = (tmp_path / "t.o1.jsonl").read_text().splitlines()
    assert len(lines) == 9
    assert json.loads(lines[0])["object"] == 1


@pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 virtual devices")
def test_serve_cli_devices_flag(capsys):
    """--devices N fans the streams over N local devices from the CLI."""
    from pvot.cli.serve import main

    rc = main([
        "--synthetic", "320x240x8", "--streams", "2", "--chunk-size", "4",
        "--search-radius", "24", "--devices", "2",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "2 devices" in text
    assert "Serving summary: streams=2, frames=14" in text


def test_serve_cli_arg_errors(capsys):
    import pytest as _pytest

    from pvot.cli.serve import main, parse_args

    with _pytest.raises(SystemExit):
        parse_args([])  # no inputs at all
    with _pytest.raises(SystemExit):
        parse_args(["a.mp4", "--synthetic", "64x48x4"])  # both
    # ROI count mismatch: 2 ROIs for 3 streams.
    rc = main([
        "--synthetic", "320x240x4", "--streams", "3",
        "--roi", "1,1,8,8", "--roi", "2,2,8,8",
    ])
    assert rc == 2
    # Mixed ROI extents are no longer an arg error anywhere (round 4):
    # streams mode routes to the grouped heterogeneous driver, objects
    # mode to the bucketed layout (covered by their own tests).
    capsys.readouterr()


def test_serve_streams_mega_wire_staging_matches_prepad():
    """prepad=False (wire-size frames, in-jit pad) must be bit-identical
    to the host-pre-padded default — the pad only ever adds zero pixels
    past every slab read."""
    lengths = [9, 6]
    videos, states, stacked = _make_streams(lengths)
    runs = []
    for prepad in (True, False):
        final, outs = serve_streams(
            [iter(v[1:]) for v in videos], stacked, (94, 250), CONFIG,
            backend="mega", scan_backend="xla", chunk_size=4,
            prepad=prepad, interpret=True, _probe=True,
        )
        runs.append((final, outs))
    (fa, oa), (fb, ob) = runs
    for s in range(2):
        np.testing.assert_array_equal(oa[s].bbox, ob[s].bbox)
        np.testing.assert_array_equal(oa[s].score, ob[s].score)
        np.testing.assert_array_equal(
            np.asarray(fa.template[s]), np.asarray(fb.template[s])
        )


def test_serve_streams_mega_envelope_fallback():
    """Outside the mega envelope serve_streams(backend='mega') serves on
    the lockstep scan engines with the same output contract."""
    config = TrackerConfig(search_radius_x=70, search_radius_y=8)
    lengths = [9, 5]
    videos, states, stacked = _make_streams(lengths)
    final, outs = serve_streams(
        [iter(v[1:]) for v in videos], stacked, (94, 250), config,
        backend="mega", scan_backend="xla", chunk_size=4,
    )
    assert [o.bbox.shape[0] for o in outs] == lengths
    for s, n in enumerate(lengths):
        _, want = track_video(
            videos[s][1:], states[s], config, strategy="fused",
            backend="xla", chunk_size=4,
        )
        _assert_stream_equal(want, outs[s])


def _assert_stream_equal_hetero(want, got):
    """Bboxes/flags bit-equal; scores engine-grade (2e-5): the grouped
    scan path runs the vmapped multi-stream step, whose XLA lowering
    reduces in a slightly different order than the single-stream step at
    some geometries (measured 1.1e-5 at 70x200/t12)."""
    np.testing.assert_array_equal(want.bbox, got.bbox)
    np.testing.assert_array_equal(want.updated, got.updated)
    np.testing.assert_array_equal(want.used_global, got.used_global)
    np.testing.assert_allclose(want.score, got.score, atol=2e-5)


def _make_hetero_streams(geoms, seed0=3):
    """Streams with PER-STREAM geometry: geoms is a list of
    (n_frames, height, width, templ).  Returns (videos, states,
    frame_shapes)."""
    videos, states, frame_shapes = [], [], []
    for i, (n, h, w, t) in enumerate(geoms):
        spec = SyntheticSpec(
            width=w, height=h, num_frames=n + 1, target_w=t, target_h=t,
            seed=seed0 + i, noise_std=1.0,
        )
        frames = generate_gray_video(spec)
        x, y, tw, th = target_bbox(spec, 0)
        templ = jnp.asarray(
            gray_u8_to_f32(frames[0])[y : y + th, x : x + tw]
        )
        videos.append(frames)
        states.append(init_state(templ, (x, y, tw, th)))
        frame_shapes.append((h, w))
    return videos, states, frame_shapes


def test_serve_streams_grouped_mixed_geometry():
    """Heterogeneous serving (round-4 VERDICT item 4): streams with
    different frame sizes AND template sizes serve concurrently through
    geometry groups; every trajectory exactly matches the single-stream
    scan, outputs and finals in input order."""
    from pvot.io.serving import serve_streams_grouped

    geoms = [
        (13, 94, 250, 16),   # group A
        (6, 70, 200, 12),    # group B: different frame + template
        (17, 94, 250, 16),   # group A again (non-contiguous)
    ]
    videos, states, frame_shapes = _make_hetero_streams(geoms)
    timings: list = []
    finals, outs = serve_streams_grouped(
        [iter(v[1:]) for v in videos], states, frame_shapes, CONFIG,
        backend="xla", chunk_size=4, timings=timings,
    )
    assert [o.bbox.shape[0] for o in outs] == [g[0] for g in geoms]
    assert sum(n for n, _ in timings) == sum(g[0] for g in geoms)
    for s, (n, h, w, t) in enumerate(geoms):
        want_state, want = track_video(
            videos[s][1:], states[s], CONFIG, strategy="fused",
            backend="xla", chunk_size=4,
        )
        _assert_stream_equal_hetero(want, outs[s])
        assert int(finals[s].bbox_x) == int(want_state.bbox_x)
        np.testing.assert_allclose(
            np.asarray(finals[s].template),
            np.asarray(want_state.template), atol=1e-4,
        )


def test_serve_streams_grouped_mega_interpret():
    """The grouped driver routes each geometry group through the mega
    serving path (interpret mode): same per-stream trajectories as the
    scan oracle."""
    from pvot.io.serving import serve_streams_grouped

    geoms = [(9, 94, 250, 16), (5, 94, 230, 16)]
    videos, states, frame_shapes = _make_hetero_streams(geoms)
    finals, outs = serve_streams_grouped(
        [iter(v[1:]) for v in videos], states, frame_shapes, CONFIG,
        backend="mega", scan_backend="xla", chunk_size=4, interpret=True,
        _probe=True,
    )
    for s, (n, h, w, t) in enumerate(geoms):
        want_state, want = track_video(
            videos[s][1:], states[s], CONFIG, strategy="fused",
            backend="xla", chunk_size=4,
        )
        # Accepted scores strict, rejected engine-grade (the mega kernel's
        # noise-max property, pvot.tracker.mega._outputs_equal).
        _assert_stream_equal_global(want, outs[s])
        assert int(finals[s].bbox_x) == int(want_state.bbox_x)


def test_serve_cli_hetero_video_files(tmp_path, capsys):
    """pvot-serve over clips with DIFFERENT frame sizes and ROI sizes
    routes to the grouped driver end to end."""
    import cv2  # noqa: F401  (skip below if absent)

    from pvot.cli.serve import main
    from pvot.io.synthetic import SyntheticSpec, generate_bgr_frames
    from pvot.io.video import VideoWriter

    sizes = [(160, 120, 32), (200, 150, 24)]
    paths = []
    for s, (w, h, t) in enumerate(sizes):
        spec = SyntheticSpec(
            width=w, height=h, num_frames=10, target_w=t, target_h=t,
            seed=9 + s,
        )
        path = str(tmp_path / f"clip{s}.avi")
        with VideoWriter(path, fps=30.0, size=(w, h)) as wtr:
            for frame in generate_bgr_frames(spec):
                wtr.write(frame)
        paths.append(path)
    rc = main(paths + [
        "--roi", "64,44,32,32", "--roi", "88,63,24,24",
        "--chunk-size", "4", "--search-radius", "16",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "2 geometry groups" in text
    assert "Serving summary: streams=2, frames=18" in text


def test_serve_cli_hetero_checkpoint_resume(tmp_path, capsys):
    """Heterogeneous serving checkpoints per stream (PREFIX.s<K>.npz) and
    resumes from the prefix: the resumed second half is bit-identical to
    the uninterrupted run's."""
    import json

    import cv2  # noqa: F401

    from pvot.cli.serve import main
    from pvot.io.synthetic import SyntheticSpec, generate_bgr_frames
    from pvot.io.video import VideoWriter

    sizes = [(160, 120, 32), (200, 150, 24)]
    paths = []
    for s, (w, h, t) in enumerate(sizes):
        spec = SyntheticSpec(
            width=w, height=h, num_frames=12, target_w=t, target_h=t,
            seed=9 + s,
        )
        path = str(tmp_path / f"clip{s}.avi")
        with VideoWriter(path, fps=30.0, size=(w, h)) as wtr:
            for frame in generate_bgr_frames(spec):
                wtr.write(frame)
        paths.append(path)
    rois = ["--roi", "64,44,32,32", "--roi", "88,63,24,24"]
    common = ["--chunk-size", "4", "--search-radius", "16"]

    # Uninterrupted run: full trajectories.
    rc = main(paths + rois + common + [
        "--trajectory-out", str(tmp_path / "full"),
    ])
    assert rc == 0

    # First half + checkpoint, then resume the tail.
    ck = str(tmp_path / "ck")
    rc = main(paths + rois + common + [
        "--max-frames", "5", "--checkpoint-out", ck,
    ])
    assert rc == 0
    assert (tmp_path / "ck.s0.npz").exists()
    assert (tmp_path / "ck.s1.npz").exists()

    # Resume: the CLI contract feeds frames from each stream's current
    # position (for files, from the top — no frame is consumed for the
    # template in resume mode).  This verifies the per-stream checkpoint
    # layout round-trips and every fed frame gets a record.
    rc = main(paths + common + ["--resume", ck,
                                "--trajectory-out", str(tmp_path / "res")])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving summary: streams=2" in text
    res0 = [
        json.loads(line)
        for line in (tmp_path / "res.s0.jsonl").read_text().splitlines()
    ]
    assert len(res0) == 12  # every decoded frame got a record


def test_serve_objects_bucketed_mega_interpret():
    """serve_objects with MIXED template sizes: the bucketed mega kernel
    serves all K in one pallas_call per chunk; trajectories match the
    per-object single-tracker oracles at their true geometries."""
    from pvot.io.serving import serve_objects
    from pvot.io.synthetic import generate_gray_video
    from pvot.parallel.multi import init_multi_state_bucketed

    config = TrackerConfig(search_radius_x=8, search_radius_y=8)
    spec = SyntheticSpec(
        width=250, height=94, num_frames=13, target_w=16, target_h=16,
        seed=3, noise_std=1.0,
    )
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    g = gray_u8_to_f32(frames[0])
    templs = [g[y : y + h, x : x + w], g[y + 2 : y + 14, x + 2 : x + 14]]
    rois = [(x, y, w, h), (x + 2, y + 2, 12, 12)]
    stacked = init_multi_state_bucketed(
        [np.asarray(t) for t in templs], rois
    )
    final, out = serve_objects(
        iter(frames[1:]), stacked, (94, 250), config, scan_backend="xla",
        chunk_size=4, interpret=True, _probe=True, inkernel_global=False,
    )
    assert out.bbox.shape[:2] == (12, 2)
    for k in range(2):
        st = init_state(jnp.asarray(templs[k]), rois[k])
        want_state, want = track_video(
            frames[1:], st, config, strategy="fused", backend="xla",
            chunk_size=4,
        )
        np.testing.assert_array_equal(want.bbox, out.bbox[:, k])
        np.testing.assert_array_equal(want.updated, out.updated[:, k])
        acc = np.asarray(want.updated)
        np.testing.assert_allclose(
            np.asarray(want.score)[acc], np.asarray(out.score[:, k])[acc],
            atol=5e-5,
        )
        assert int(final.bbox_x[k]) == int(want_state.bbox_x)


def test_serve_cli_objects_mixed_roi_sizes(tmp_path, capsys):
    """pvot-serve: several --roi of DIFFERENT sizes on one stream routes
    to the bucketed multi-object layout end to end."""
    from pvot.cli.serve import main

    rc = main([
        "--synthetic", "320x240x8", "--streams", "1",
        "--roi", "140,100,40,40", "--roi", "150,110,24,20",
        "--chunk-size", "4", "--search-radius", "16",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Serving 1 stream x 2 objects" in text
    # 8 synthetic frames, frame 0 seeds the templates -> 7 tracked.
    assert "objects=2, frames=7" in text
