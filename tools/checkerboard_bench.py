"""Microbench: checkerboard half-rate gather vs full-rate gather.

The honest frame's two 14.9 ms fusions (sun-shadow sample, RGBE probe
fetch) are 2M-index gathers from <=2MB tables — index-rate bound
(~4.7 cyc/idx, tools/microbench.py). The only lever is FEWER indices.
This measures the exact checkerboard machinery contemplated for
kernels/shadow.py + ibl.sample_cube:

  (H, W) indices -> (H, W/2) via per-row parity lane-pair select
  -> half gather + decode -> (H, W) via neighbor fill.

Run: python tools/checkerboard_bench.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.microbench import device_time_ms  # noqa: E402


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    h, w = 1088, 1920
    rng = np.random.default_rng(0)

    # shadow-style: smooth affine index map; probe-style: random
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    u = (0.31 * xs + 0.12 * ys + 37.0) % 1024
    v = (0.22 * ys - 0.08 * xs + 512.0) % 1024
    lin_sm = (v.astype(np.int32) * 1024 + u.astype(np.int32))
    n_words = 1024 * 1024 // 2
    table = jnp.asarray(
        rng.integers(0, 2**31 - 1, n_words, dtype=np.int32))
    lin_rand = rng.integers(0, 2 * n_words, (h, w), dtype=np.int32)

    def decode(idx, word):
        half = ((idx & 1) * 16).astype(jnp.uint32)
        return (((word.astype(jnp.uint32) >> half) & 0xFFFF)
                .astype(jnp.float32) * (1.0 / 65535.0))

    @jax.jit
    def full(idx2d, t=table):
        idx = idx2d.reshape(-1)
        return decode(idx, t[idx >> 1]).reshape(idx2d.shape).sum()

    @jax.jit
    def checker(idx2d, parity, t=table):
        # keep lane (x) parity == (row + frame) parity: (H, W/2) indices
        pairs = idx2d.reshape(h, w // 2, 2)
        row_par = (jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
                   + parity) & 1
        sel = jnp.take_along_axis(pairs, row_par[..., None], axis=2)[..., 0]
        idx = sel.reshape(-1)
        val = decode(idx, t[idx >> 1]).reshape(h, w // 2)
        # fill: gathered pixel keeps its value; missing pixel gets the mean
        # of its horizontal neighbors (same row, the two adjacent gathered
        # lanes). Build (H, W) by interleaving val with its neighbor mean.
        nb = 0.5 * (val + jnp.roll(val, -1, axis=1))
        nb2 = 0.5 * (val + jnp.roll(val, 1, axis=1))
        # missing pixel at even lane when row_par==1 -> neighbors are
        # val[i-1], val[i] in compact space; at odd lane -> val[i], val[i+1]
        fill = jnp.where(row_par == 0, nb, nb2)
        a = jnp.where(row_par == 0, val, fill)
        b = jnp.where(row_par == 0, fill, val)
        out = jnp.stack([a, b], axis=2).reshape(h, w)
        return out.sum()

    for name, idxs in (("smooth", jnp.asarray(lin_sm)),
                       ("random", jnp.asarray(lin_rand))):
        ms_f = device_time_ms(full, idxs)
        ms_c = device_time_ms(lambda i: checker(i, 0), idxs)
        print(f"{name}: full {ms_f:6.2f} ms   checker {ms_c:6.2f} ms   "
              f"ratio {ms_c / ms_f:.2f}")


if __name__ == "__main__":
    main()
