"""On-TPU A/B of Toeplitz-operator construction strategies.

The Pallas engine's per-frame fixed cost is rebuilding the phase-concatenated
Toeplitz operator whenever the template EMA fires (~every frame at the
headline geometry).  Round 2 used the Hankel tile-reshape build
(pvot/ops/ncc_pallas.py:_toeplitz_operators) whose `tiled` intermediate is
(8K, TX*(L+2TX)) — ~26 MB at 80x80 — plus flip/transpose relayouts.  This
tool measures, on the real chip, device-time per build for:

  hankel        the round-2 build (tile -> reshape -> flip -> transpose)
  slices_big    TX static slices of a front-padded template, stacked on a
                new lane axis, then the (K,8,L,TX)->(K,L,8,TX) relayout to
                the big (K*L, 8*TX) RHS layout the round-2 kernel consumes
  slices_phase  the same slices but the template rows are pre-permuted to
                (p, k) order (a tiny 80-row transpose) so the stack lands
                DIRECTLY in a per-phase (8*K*L, TX) layout — no big
                relayout.  Needs the kernel to issue 8 (.., L)@(L, TX)
                matmuls per k-block instead of one (.., L)@(L, 8*TX).
  phase_bf16    slices_phase on bf16 hi/lo split halves (2x half-size
                operators) — the storage for an in-kernel 3-pass
                precision=HIGH emulation (Mosaic rejects HIGH natively).

Timing: loop-delta inside one jit (N=32 vs N=160 build iterations over
CSE-defeating perturbed templates; delta/128 = per-build device time),
after the bench.py flip protocol.  Exactness: every f32 variant must be
element-EXACT vs the hankel build.

Usage: nohup python tools/toeplitz_build_bench.py > /tmp/toep_bench.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


TX = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_hankel(t_centered, tile_lanes):
    """The round-2 production build (now superseded by slices_big_direct in
    pvot.ops.ncc_pallas._toeplitz_operators), kept inline here so the A/B
    stays reproducible: pad -> tile -> reshape (Hankel trick) -> flip ->
    transpose."""
    import jax.numpy as jnp

    th, tw = t_centered.shape
    k_blocks = -(-th // 8)
    L = tile_lanes
    assert L - TX + 1 >= tw
    padded = jnp.pad(t_centered, ((0, 8 * k_blocks - th), (0, L - tw)))
    r = padded.shape[0]
    q = jnp.concatenate([padded[:, L - TX + 1 :], padded], axis=1)
    n = q.shape[1] + TX
    p_arr = jnp.pad(q, ((0, 0), (0, TX)))
    tiled = jnp.tile(p_arr, (1, TX + 1))[:, : TX * (n + 1)]
    win = tiled.reshape(r, TX, n + 1)[:, :, :L]
    toep = win[:, ::-1, :].transpose(0, 2, 1)
    toep = toep.reshape(k_blocks, 8, L, TX).transpose(0, 2, 1, 3)
    return toep.reshape(k_blocks * L, 8 * TX)


def _win_slices(padded, tile_lanes):
    """(rows, L) zero-padded template rows -> (rows, L, TX) sliding windows:
    win[r, l, dx] = padded[r, l - dx] (0 for l < dx).  TX static slices of a
    front-padded buffer; no wraparound concerns (cf. the Hankel build's
    tw <= L - TX + 1 constraint)."""
    import jax.numpy as jnp

    L = tile_lanes
    vpad = jnp.pad(padded, ((0, 0), (TX - 1, 0)))  # vpad[r, j+TX-1] = p[r, j]
    cols = [vpad[:, TX - 1 - dx : TX - 1 - dx + L] for dx in range(TX)]
    return jnp.stack(cols, axis=-1)


def build_slices_big(t_centered, tile_lanes):
    """Slice-stack build of the round-2 kernel's (K*L, 8*TX) layout."""
    import jax.numpy as jnp

    th, tw = t_centered.shape
    k_blocks = -(-th // 8)
    L = tile_lanes
    padded = jnp.pad(t_centered, ((0, 8 * k_blocks - th), (0, L - tw)))
    win = _win_slices(padded, L)  # (8K, L, TX)
    toep = win.reshape(k_blocks, 8, L, TX).transpose(0, 2, 1, 3)
    return toep.reshape(k_blocks * L, 8 * TX)


def build_slices_big_direct(t_centered, tile_lanes):
    """The winning build (58 vs 82 us/build on-chip), promoted to
    production as pvot.ops.ncc_pallas._toeplitz_operators."""
    from pvot.ops.ncc_pallas import _toeplitz_operators

    return _toeplitz_operators(t_centered, tile_lanes)


def build_slices_phase(t_centered, tile_lanes):
    """Per-phase layout (8*K*L, TX): rows (p*K + k)*L + l = t_c[8k+p, l-dx].
    The row permutation happens on the TINY padded template (80 rows), so
    the big stack writes the final layout directly."""
    import jax.numpy as jnp

    th, tw = t_centered.shape
    k_blocks = -(-th // 8)
    L = tile_lanes
    padded = jnp.pad(t_centered, ((0, 8 * k_blocks - th), (0, L - tw)))
    perm = padded.reshape(k_blocks, 8, L).transpose(1, 0, 2).reshape(-1, L)
    win = _win_slices(perm, L)  # (8K, L, TX) in (p, k) row order
    return win.reshape(8 * k_blocks * L, TX)


def build_shear_T(t_centered, tile_lanes):
    """Reshape-shear build of the TRANSPOSED operator (K*8*TX, L): row
    ((k*8 + p)*TX + dx), lane l = t_c[8k+p, l - dx].

    The shear trick: broadcast each zero-padded template row v (length
    M = L + TX) TX times, flatten, trim to TX*(M-1), reshape (TX, M-1) —
    element [dx, j] = v[(j - dx) mod M], and the M-tw zero tail makes every
    wrapped index land on zero, which IS the operator's 0-outside-[0,tw)
    semantics.  No transposes, no lane-axis stacking, no concatenates: one
    fused broadcast+trim copy.  Consuming this layout needs the kernel's
    correlation dot to contract over the RHS's LANE dim
    (dimension_numbers ((1,), (1,)) — probed separately)."""
    import jax.numpy as jnp

    th, tw = t_centered.shape
    k_blocks = -(-th // 8)
    L = tile_lanes
    M = L + TX
    padded = jnp.pad(t_centered, ((0, 8 * k_blocks - th), (0, M - tw)))
    b = jnp.broadcast_to(padded[:, None, :], (8 * k_blocks, TX, M))
    c = b.reshape(8 * k_blocks, TX * M)[:, : TX * (M - 1)]
    d = c.reshape(8 * k_blocks, TX, M - 1)[:, :, :L]
    return d.reshape(8 * k_blocks * TX, L)


def build_phase_bf16(t_centered, tile_lanes):
    """bf16 hi/lo pair of per-phase operators (for in-kernel HIGH emulation:
    a @ b ~= a_hi@b_hi + a_hi@b_lo + a_lo@b_hi, f32 accumulation)."""
    import jax.numpy as jnp

    hi = t_centered.astype(jnp.bfloat16)
    lo = (t_centered - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        build_slices_phase(hi.astype(jnp.float32), tile_lanes).astype(jnp.bfloat16),
        build_slices_phase(lo.astype(jnp.float32), tile_lanes).astype(jnp.bfloat16),
    )


def main(templ: int = 80) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    tile_lanes = _round_up(TX + templ - 1, 128)
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.random((templ, templ), dtype=np.float32))
    t_centered = t0 - jnp.mean(t0)

    builders = {
        "hankel": build_hankel,
        "slices_big": build_slices_big,
        "slices_big_direct": build_slices_big_direct,
        "slices_phase": build_slices_phase,
        "shear_T": build_shear_T,
        "phase_bf16": build_phase_bf16,
    }

    # --- exactness ---------------------------------------------------------
    ref = np.asarray(build_hankel(t_centered, tile_lanes))
    got_big = np.asarray(build_slices_big(t_centered, tile_lanes))
    exact_big = bool((ref == got_big).all())
    got_bigd = np.asarray(build_slices_big_direct(t_centered, tile_lanes))
    exact_big_direct = bool((ref == got_bigd).all())
    k_blocks = -(-templ // 8)
    got_phase = np.asarray(build_slices_phase(t_centered, tile_lanes))
    # Reindex phase layout back to big layout for comparison.
    back = (
        got_phase.reshape(8, k_blocks, tile_lanes, TX)
        .transpose(1, 2, 0, 3)
        .reshape(k_blocks * tile_lanes, 8 * TX)
    )
    exact_phase = bool((ref == back).all())
    got_shear = np.asarray(build_shear_T(t_centered, tile_lanes))
    back_shear = (
        got_shear.reshape(k_blocks, 8, TX, tile_lanes)
        .transpose(0, 3, 1, 2)
        .reshape(k_blocks * tile_lanes, 8 * TX)
    )
    exact_shear = bool((ref == back_shear).all())
    hi, lo = build_phase_bf16(t_centered, tile_lanes)
    recon = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    bf16_err = float(np.max(np.abs(recon - got_phase)))
    print(json.dumps({
        "exact_big": exact_big, "exact_big_direct": exact_big_direct,
        "exact_phase": exact_phase, "exact_shear_T": exact_shear,
        "bf16_recon_max_abs_err": bf16_err,
    }), flush=True)

    # --- device-time per build (loop-delta) --------------------------------
    def looped(builder, n):
        @jax.jit
        def run(t):
            def body(i, acc):
                tc = t + (1e-6 * i)  # defeat CSE across iterations
                out = builder(tc, tile_lanes)
                leaves = out if isinstance(out, tuple) else (out,)
                for leaf in leaves:
                    # Consume the WHOLE operator: a [0,0] read lets XLA
                    # slice-propagate and DCE the build (first run of this
                    # tool measured slices_phase at 0 us that way); the sum
                    # forces materialization and costs every strategy the
                    # same ~10.5 MB read.
                    acc = acc + jnp.sum(leaf.astype(jnp.float32))
                return acc
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    N_LO, N_HI = 32, 160
    fns = {}
    for name, b in builders.items():
        for n in (N_LO, N_HI):
            f = looped(b, n)
            f(t_centered).block_until_ready()  # compile (async ok)
            fns[(name, n)] = f
        print(f"compiled {name}", flush=True)

    flip = jax.jit(lambda a: a @ a)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    jax.block_until_ready(flip)
    _ = np.asarray(flip)

    results = {}
    for name in builders:
        times = {}
        for n in (N_LO, N_HI):
            best = float("inf")
            for _ in range(3):
                t_start = time.perf_counter()
                v = fns[(name, n)](t_centered)
                _ = np.asarray(v)
                best = min(best, time.perf_counter() - t_start)
            times[n] = best
        per_build_us = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e6
        results[name] = {
            "per_build_us": round(per_build_us, 1),
            "t_lo_ms": round(times[N_LO] * 1e3, 2),
            "t_hi_ms": round(times[N_HI] * 1e3, 2),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"toeplitz_build_bench": results}))


if __name__ == "__main__":
    main()
