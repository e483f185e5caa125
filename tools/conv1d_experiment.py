"""Experiment: can a 1-D conv replace the im2col-x matmul in the region path?

The fused region path is HBM-bound on the im2col buffer ((Y, out_w, tw) f32,
~7.7 MB/frame at 720p/80px; docs/PERFORMANCE.md "Saturation point").  A 1-D
valid conv along width with the template rows as filters computes the same
R1[y, r, dx] without materializing im2col — IF XLA lowers it onto the MXU
(the known trap is 2-D convs with template-sized kernels, which never reach
the MXU; 1-D with kernel width 80 may lower differently).

Run on the real TPU: python tools/conv1d_experiment.py
Prints per-formulation timing (honest sync-mode protocol) and numerics vs
the im2col matmul.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvot.ops.ncc_matmul import cross_correlate

    rng = np.random.default_rng(0)
    region = jnp.asarray(rng.random((200, 200), np.float32))
    tc = jnp.asarray(rng.random((80, 80), np.float32) - 0.5)

    def conv1d_cross(img, t):
        th, tw = t.shape
        y, w = img.shape
        out_h, out_w = y - th + 1, w - tw + 1
        # (N=y, C=1, W) * (O=th, I=1, W=tw) -> (y, th, out_w)
        r1 = lax.conv_general_dilated(
            img[:, None, :], t[:, None, :],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST,
        )
        shifted = [
            lax.slice(r1, (r, r, 0), (r + out_h, r + 1, out_w)).reshape(out_h, out_w)
            for r in range(th)
        ]
        return sum(shifted)

    f_im2col = jax.jit(cross_correlate)
    f_conv1d = jax.jit(conv1d_cross)

    # Numerics first.
    a = f_im2col(region, tc)
    b = f_conv1d(region, tc)
    flip = jax.jit(lambda x: x @ x)(jnp.eye(128, dtype=jnp.float32))
    flip.copy_to_host_async()
    _ = np.asarray(flip)
    an, bn = np.asarray(a), np.asarray(b)
    print("max abs diff conv1d vs im2col:", float(np.max(np.abs(an - bn))))

    reps = 50
    for name, f in [("im2col", f_im2col), ("conv1d", f_conv1d)]:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [f(region, tc) for _ in range(reps)]
            s = jnp.stack([o[0, 0] for o in outs]).sum()
            s.copy_to_host_async()
            _ = float(s)
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name}: {best * 1e3:.3f} ms/region")


if __name__ == "__main__":
    main()
