"""Microbench: does ROW WIDTH change the per-index cost of a 2M gather?

The profiled honest frame has two ~14.9 ms full-screen fusions — the
shadow-map sample (1-lane gather from a 2 MB packed-u16 table) and the
RGBE probe fetch (1-lane gather from 0.5 MB) — while the texture-stack
fetch (2-lane rows from a 22 MB HBM table) costs 9 ms. If 1-lane gathers
pay more per index than wider rows, repacking the small tables to wider
rows + a lane select is nearly free bandwidth-wise.

Run: python tools/gather_width.py
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

    n_px = 2_088_960
    rng = np.random.default_rng(0)

    # Shadow-map-like coherent-ish indices: a smooth affine map of screen
    # coords (screen-adjacent pixels hit nearby shadow texels).
    h, w = 1088, 1920
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    u = (0.31 * xs + 0.12 * ys + 37.0) % 1024
    v = (0.22 * ys - 0.08 * xs + 512.0) % 1024
    lin = (v.astype(np.int32) * 1024 + u.astype(np.int32)).reshape(-1)

    n_words = 1024 * 1024 // 2              # packed u16 pairs
    table = rng.integers(0, 2**31 - 1, n_words, dtype=np.int32)

    lin_j = jnp.asarray(lin)
    for widthlog in (0, 1, 2, 3, 4):
        lanes = 1 << widthlog
        tbl = jnp.asarray(table.reshape(n_words // lanes, lanes))

        @jax.jit
        def f(idx, t=tbl, lanes=lanes, widthlog=widthlog):
            word_idx = idx >> 1
            row = t[word_idx >> widthlog]           # (N, lanes) or (N,)
            if lanes == 1:
                word = row
            else:
                word = jnp.take_along_axis(
                    row, (word_idx & (lanes - 1))[:, None], axis=1)[:, 0]
            half = ((idx & 1) * 16).astype(jnp.uint32)
            return ((word.astype(jnp.uint32) >> half) & 0xFFFF).sum()

        ms = device_time_ms(f, lin_j)
        print(f"shadow-style gather rows={lanes:2d} lanes: {ms:7.2f} ms")

    # random (probe-style) indices into a small table
    ridx = jnp.asarray(rng.integers(0, n_words, n_px, dtype=np.int32))
    for widthlog in (0, 2, 3):
        lanes = 1 << widthlog
        tbl = jnp.asarray(table.reshape(n_words // lanes, lanes))

        @jax.jit
        def g(idx, t=tbl, lanes=lanes, widthlog=widthlog):
            row = t[idx >> widthlog]
            if lanes == 1:
                return row.sum()
            return jnp.take_along_axis(
                row, (idx & (lanes - 1))[:, None], axis=1)[:, 0].sum()

        ms = device_time_ms(g, ridx)
        print(f"random gather rows={lanes:2d} lanes: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
