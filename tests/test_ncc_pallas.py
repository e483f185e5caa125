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


def test_geometry_keyed_probe_falls_back_gracefully(monkeypatch):
    """A kernel that works at the tiny smoke geometry but fails at the
    served geometry must be caught by the probe and fall back to the matmul
    engine — the round-2 failure mode: the 8x8/64x256 probe passed while an
    80x80/720p Mosaic/VMEM failure would explode mid-run.  The probe cache
    is keyed per geometry, so a big-geometry refusal does not poison the
    small-geometry verdict."""
    import pvot.ops.ncc_pallas as npz
    from pvot.config import TrackerConfig
    from pvot.ops.backends import get_backend

    real = npz.ncc_map_pallas
    real_argmax = npz.ncc_region_argmax_pallas

    def flaky(img, templ, *a, **k):
        if img.shape[0] > 100:  # fails only at large geometry
            raise RuntimeError("simulated Mosaic failure at large geometry")
        k["interpret"] = True  # CPU runs Pallas interpreted only
        return real(img, templ, *a, **k)

    def flaky_argmax(region, templ, *a, **k):
        if region.shape[0] > 100:
            raise RuntimeError("simulated Mosaic failure at large geometry")
        k["interpret"] = True
        return real_argmax(region, templ, *a, **k)

    monkeypatch.setattr(npz, "ncc_map_pallas", flaky)
    monkeypatch.setattr(npz, "ncc_region_argmax_pallas", flaky_argmax)
    saved = dict(npz._SUPPORT_CACHE)
    npz._SUPPORT_CACHE.clear()
    try:
        cfg = TrackerConfig(search_radius_x=60, search_radius_y=60)
        # 720p/80x80: the full-strip probe trips the simulated failure.
        full_fn, region_fn, _ = get_backend("pallas", (720, 1280), (80, 80), cfg)
        assert full_fn.__module__ == "pvot.ops.ncc_matmul"
        # Tiny geometry (strip/region < 100 rows) still resolves to pallas.
        cfg_small = TrackerConfig(search_radius_x=10, search_radius_y=10)
        full_fn2, region_fn2, _ = get_backend(
            "pallas", (60, 160), (8, 8), cfg_small
        )
        assert full_fn2.__module__ == "pvot.ops.ncc_pallas"
        # Per-geometry cache: both verdicts recorded independently.
        backend = __import__("jax").default_backend()
        assert (
            npz._SUPPORT_CACHE[
                (backend, (720, 1280), (80, 80), (121, 121), True, False)
            ]
            is False
        )
        assert (
            npz._SUPPORT_CACHE[
                (backend, (60, 160), (8, 8), (21, 21), True, False)
            ]
            is True
        )
    finally:
        npz._SUPPORT_CACHE.clear()
        npz._SUPPORT_CACHE.update(saved)


def test_fused_region_argmax_matches_masked_argmax(rng):
    """The on-chip argmax kernel (north-star fusion, SURVEY.md §7 step 4)
    must reproduce region_fn + masked_region_argmax exactly: same clamped-
    window masking, same row-major first-occurrence tie-break — at single-
    tile (span 121), multi-tile (span 321: 3x3 grid + cross-tile combine),
    and tiny geometries."""
    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.ops.search import WindowBounds, masked_region_argmax

    for span, t in [(121, 80), (321, 80), (21, 8)]:
        region = jnp.asarray(
            rng.random((span + t - 1, span + t - 1), dtype=np.float32)
        )
        templ = jnp.asarray(rng.random((t, t), dtype=np.float32))
        x0, y0 = jnp.int32(37), jnp.int32(11)
        for ax0, ax1, ay0, ay1 in [
            (0, span - 1, 0, span - 1),        # full span
            (5, span - 7, 11, span - 3),       # clamped window
            (span // 2, span // 2, span // 2, span // 2),  # 1x1 window
        ]:
            b = WindowBounds(x0 + ax0, x0 + ax1, y0 + ay0, y0 + ay1)
            scores = ncc_map_matmul(region, templ)
            wv, wx, wy = masked_region_argmax(scores, x0, y0, b)
            gv, gx, gy = ncc_region_argmax_pallas(
                region, templ, b, x0, y0, interpret=True
            )
            assert (int(gx), int(gy)) == (int(wx), int(wy))
            np.testing.assert_allclose(float(gv), float(wv), atol=2e-5)


def test_fused_region_argmax_tie_break(rng):
    """Exact ties must resolve to the first occurrence in row-major region
    order (cv::minMaxLoc semantics) — forced by a constant region, where
    EVERY window scores identically."""
    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.ops.search import WindowBounds

    span, t = 121, 16
    region = jnp.full((span + t - 1, span + t - 1), 0.5, jnp.float32)
    templ = jnp.asarray(rng.random((t, t), dtype=np.float32))
    x0, y0 = jnp.int32(0), jnp.int32(0)
    b = WindowBounds(jnp.int32(7), jnp.int32(60), jnp.int32(13), jnp.int32(50))
    _, gx, gy = ncc_region_argmax_pallas(
        region, templ, b, x0, y0, interpret=True
    )
    assert (int(gx), int(gy)) == (7, 13)  # window's top-left corner


def test_step_with_fused_argmax_trajectory_equal(rng):
    """A tracked scan whose step uses the fused argmax kernel produces
    bit-identical trajectories to the default matmul-engine step."""
    import jax

    from pvot.config import TrackerConfig
    from pvot.io.gray import gray_u8_to_f32
    from pvot.io.synthetic import SyntheticSpec, generate_gray_video, target_bbox
    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.tracker.scan import track_video
    from pvot.tracker.state import init_state
    from pvot.tracker.step import make_step

    spec = SyntheticSpec(width=160, height=120, num_frames=24, target_w=16,
                         target_h=16, seed=5)
    frames = generate_gray_video(spec)
    x, y, w, h = target_bbox(spec, 0)
    templ = jnp.asarray(gray_u8_to_f32(frames[0])[y : y + h, x : x + w])
    config = TrackerConfig(search_radius_x=12, search_radius_y=12)

    state = init_state(templ, (x, y, w, h))
    _, want = track_video(jnp.asarray(frames[1:]), state, config=config)

    span = (2 * 12 + 1, 2 * 12 + 1)

    def argmax_fn(frame, templ_, t_mean, t_std, x0, y0, bounds):
        region = jax.lax.dynamic_slice(
            frame, (y0, x0), (span[0] + h - 1, span[1] + w - 1)
        )
        return ncc_region_argmax_pallas(
            region, templ_, bounds, x0, y0, t_mean, t_std, interpret=True
        )

    step = make_step((120, 160), (16, 16), config,
                     ncc_region_argmax_fn=argmax_fn)
    state2 = init_state(templ, (x, y, w, h))

    def scan_step(s, f):
        return step(s, f)

    _, got = jax.lax.scan(scan_step, state2, jnp.asarray(frames[1:]))
    np.testing.assert_array_equal(np.asarray(got.bbox), np.asarray(want.bbox))
    np.testing.assert_array_equal(
        np.asarray(got.updated), np.asarray(want.updated)
    )


def test_fused_argmax_single_tile_gating():
    """The fused reduction only engages when the span fits one kernel tile
    (measured slower at multi-tile geometries, docs/PERFORMANCE.md
    "Engine ranking"); larger spans get region_argmax_fn=None so the step
    uses the unfused score-map + XLA-argmax path."""
    from pvot.ops.backends import _maybe_fused_argmax

    assert _maybe_fused_argmax((720, 1280), (80, 80), 121, 121) is not None
    assert _maybe_fused_argmax((720, 1280), (80, 80), 41, 41) is not None
    assert _maybe_fused_argmax((1080, 1920), (160, 160), 321, 321) is None
    assert _maybe_fused_argmax((720, 1280), (80, 80), 129, 121) is None
    assert _maybe_fused_argmax((720, 1280), (80, 80), 121, 129) is None


def test_fused_region_argmax_uint8_wire(rng):
    """The fused kernel accepts the uint8 wire dtype (slice-then-convert
    semantics, bit-exact vs converting first)."""
    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.ops.search import WindowBounds, masked_region_argmax

    span, t = 21, 8
    region_u8 = rng.integers(0, 256, (span + t - 1, span + t - 1),
                             dtype=np.uint8)
    from pvot.io.gray import gray_u8_to_f32

    templ = jnp.asarray(
        gray_u8_to_f32(region_u8)[3 : 3 + t, 4 : 4 + t]
    )
    x0, y0 = jnp.int32(2), jnp.int32(6)
    b = WindowBounds(x0, x0 + span - 1, y0, y0 + span - 1)
    want = masked_region_argmax(
        ncc_map_matmul(jnp.asarray(region_u8), templ), x0, y0, b
    )
    got = ncc_region_argmax_pallas(
        jnp.asarray(region_u8), templ, b, x0, y0, interpret=True
    )
    assert (int(got[1]), int(got[2])) == (int(want[1]), int(want[2]))
    np.testing.assert_allclose(float(got[0]), float(want[0]), atol=2e-5)


def test_pallas_fast_hilo_matches_oracle(rng):
    """The 3-pass bf16 hi/lo fast variant (highest=False) must stay within
    HIGH-grade drift of the exact-f32 oracle: ~1e-5 relative for O(1) NCC
    scores (same bound the xla_fast engine is held to).  Interpret mode
    executes the identical hi/lo decomposition the chip runs."""
    frame = rng.random((96, 160), dtype=np.float32)
    templ = rng.random((17, 23), dtype=np.float32)
    got = np.asarray(
        ncc_map_pallas(
            jnp.asarray(frame), jnp.asarray(templ), interpret=True,
            highest=False,
        )
    )
    want = bruteforce_reference_map(frame, templ)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pallas_fast_region_argmax_matches(rng):
    """Fast fused argmax finds the same peak as the exact path when the
    template is genuinely present in the region (a distinct peak, so the
    ~1e-5 score drift cannot flip the argmax)."""
    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.ops.search import WindowBounds, masked_region_argmax

    span, t = 121, 32
    region = rng.random((span + t - 1, span + t - 1), dtype=np.float32)
    templ = region[40 : 40 + t, 25 : 25 + t].copy()  # plant a true match
    region_j, templ_j = jnp.asarray(region), jnp.asarray(templ)
    x0, y0 = jnp.int32(3), jnp.int32(9)
    b = WindowBounds(x0, x0 + span - 1, y0, y0 + span - 1)
    wv, wx, wy = masked_region_argmax(
        ncc_map_matmul(region_j, templ_j), x0, y0, b
    )
    gv, gx, gy = ncc_region_argmax_pallas(
        region_j, templ_j, b, x0, y0, interpret=True, highest=False
    )
    assert (int(gx), int(gy)) == (int(wx), int(wy)) == (25 + 3, 40 + 9)
    np.testing.assert_allclose(float(gv), float(wv), atol=5e-5)


def test_pallas_fast_backend_resolution(monkeypatch):
    """'pallas_fast' resolves to the Pallas engine with highest=False on
    the hot paths when the probe passes, and falls back to xla_fast when
    it fails — without touching the parity 'pallas' engine's cache key."""
    import pvot.ops.backends as backends_mod
    import pvot.ops.ncc_pallas as ncc_pallas_mod
    from pvot.config import TrackerConfig

    calls = []

    def fake_supported(frame_shape=None, templ_shape=None, span_shape=None,
                       strip_rows=256, highest=True, shear=False):
        calls.append(highest)
        return not highest  # fast probe passes, parity probe fails

    monkeypatch.setattr(ncc_pallas_mod, "pallas_supported", fake_supported)
    monkeypatch.setattr(
        "pvot.ops.ncc_pallas.pallas_supported", fake_supported
    )
    cfg = TrackerConfig()
    full_fast, region_fast, argmax_fast = backends_mod.get_backend(
        "pallas_fast", (96, 160), (16, 16), cfg
    )
    assert argmax_fast is not None  # span fits one tile -> fused argmax
    full_par, region_par, argmax_par = backends_mod.get_backend(
        "pallas", (96, 160), (16, 16), cfg
    )
    assert argmax_par is None  # parity probe failed -> matmul fallback
    assert calls == [False, True]


def test_pallas_shear_matches_oracle(rng):
    """The operator-free shear kernel (strided-roll transposed-Toeplitz in
    registers, ncc_pallas._score_tile shear=True) must agree with the exact
    oracle at f32-rounding grade: it runs the SAME HIGHEST dot as the
    operator path, only with the RHS built by roll instead of DMA'd.
    Odd geometry exercises the zero-tail wraparound absorber."""
    for shape, tshape in [((64, 80), (16, 12)), ((57, 133), (9, 11)),
                          ((200, 200), (80, 80))]:
        frame = rng.random(shape).astype(np.float32)
        templ = rng.random(tshape).astype(np.float32)
        got = np.asarray(
            ncc_map_pallas(
                jnp.asarray(frame), jnp.asarray(templ), interpret=True,
                shear=True,
            )
        )
        want = bruteforce_reference_map(frame, templ)
        np.testing.assert_allclose(got, want, atol=5e-5)


def test_pallas_shear_region_argmax_exact(rng):
    """Shear fused argmax reproduces the masked-argmax oracle exactly
    (value to f32 rounding, argmax bit-equal incl. row-major tie-break)."""
    from pvot.ops.ncc_matmul import ncc_map_matmul
    from pvot.ops.ncc_pallas import ncc_region_argmax_pallas
    from pvot.ops.search import WindowBounds, masked_region_argmax

    span, t = 121, 80
    region = rng.random((span + t - 1, span + t - 1)).astype(np.float32)
    templ = region[40 : 40 + t, 25 : 25 + t].copy()
    region_j, templ_j = jnp.asarray(region), jnp.asarray(templ)
    x0, y0 = jnp.int32(3), jnp.int32(9)
    b = WindowBounds(x0, x0 + span - 1, y0, y0 + span - 1)
    wv, wx, wy = masked_region_argmax(
        ncc_map_matmul(region_j, templ_j), x0, y0, b
    )
    gv, gx, gy = ncc_region_argmax_pallas(
        region_j, templ_j, b, x0, y0, interpret=True, shear=True
    )
    assert (int(gx), int(gy)) == (int(wx), int(wy)) == (25 + 3, 40 + 9)
    np.testing.assert_allclose(float(gv), float(wv), atol=1e-5)


def test_pallas_shear_rejects_fast_tier():
    """shear is HIGHEST-only: the lane-contracting dot silently drops the
    precision request when fed a ref-staged RHS (chip repro in
    tools/fused_argmax_probe.py dot_rhs_lane), so the hi/lo fast tier is
    not offered on the shear path."""
    with pytest.raises(ValueError, match="HIGHEST-only"):
        ncc_map_pallas(
            jnp.zeros((32, 160), jnp.float32),
            jnp.zeros((8, 8), jnp.float32),
            interpret=True, highest=False, shear=True,
        )


def test_pallas_shear_backend_resolution(monkeypatch):
    """'pallas_shear' resolves to the shear engine when its probe passes
    and falls back to the operator 'pallas' engine when it fails."""
    import pvot.ops.backends as backends_mod
    import pvot.ops.ncc_pallas as ncc_pallas_mod
    from pvot.config import TrackerConfig

    calls = []

    def fake_supported(frame_shape=None, templ_shape=None, span_shape=None,
                       strip_rows=256, highest=True, shear=False):
        calls.append(shear)
        return not shear  # shear probe fails, operator probe passes

    monkeypatch.setattr(ncc_pallas_mod, "pallas_supported", fake_supported)
    cfg = TrackerConfig()
    full_fn, region_fn, argmax_fn = backends_mod.get_backend(
        "pallas_shear", (96, 160), (16, 16), cfg
    )
    # Fell back to the operator engine, which probed fine -> fused argmax.
    assert argmax_fn is not None
    assert calls == [True, False]
