"""Microbench: per-step BVH row-gather cost vs ROW WIDTH at traversal
scale (230k random indices into a ~70 MB HBM table) — the regime the PT
profile showed at ~253 ns/ray-step (2.8 s for a 48-step full-width
while), 60x the index-bound tier measured for <= 12-float rows.

Questions:
  1. where does the row-width cliff start (8/12/16/32/64 f32)?
  2. do FOUR 16-float gathers with the same index beat ONE 64-float
     gather (pipelined index-bound cost vs one serialized wide fetch)?

Run: python tools/bvh_gather_bench.py
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

    rng = np.random.default_rng(0)
    n_rays = 230_400
    n_rows = 280_000            # x 64 f32 = ~71 MB at widest
    idx = jnp.asarray(rng.integers(0, n_rows, n_rays, dtype=np.int32))

    base = rng.standard_normal((n_rows, 64), dtype=np.float32)

    for width in (8, 12, 16, 32, 64):
        tbl = jnp.asarray(base[:, :width])

        @jax.jit
        def f(i, t=tbl):
            return t[i].sum()

        ms = device_time_ms(f, idx)
        print(f"width {width:3d} f32 ({width * 4:4d} B/row, "
              f"{n_rows * width * 4 / 1e6:6.1f} MB): {ms:7.3f} ms "
              f"({ms * 1e6 / n_rays:6.1f} ns/idx)")

    # split: same 64 floats as four independent 16-float gathers
    quarters = [jnp.asarray(base[:, 16 * k:16 * (k + 1)].copy())
                for k in range(4)]

    @jax.jit
    def split(i):
        return sum(q[i].sum() for q in quarters)

    ms = device_time_ms(split, idx)
    print(f"4 x 16-f32 split gathers (256 B total):      {ms:7.3f} ms "
          f"({ms * 1e6 / n_rays:6.1f} ns/idx)")

    # small-table control: same widths, 4 MB table (VMEM-adjacent tier)
    small = rng.standard_normal((16_384, 64), dtype=np.float32)
    idx_s = jnp.asarray(rng.integers(0, 16_384, n_rays, dtype=np.int32))
    for width in (16, 64):
        tbl = jnp.asarray(small[:, :width])

        @jax.jit
        def f(i, t=tbl):
            return t[i].sum()

        ms = device_time_ms(f, idx_s)
        print(f"small table width {width:3d} ({16_384 * width * 4 / 1e6:.1f}"
              f" MB): {ms:7.3f} ms ({ms * 1e6 / n_rays:6.1f} ns/idx)")




def loop_carried():
    """The traversal regime: a fori_loop whose NEXT index comes from the
    CURRENT gather (serial dependence — no cross-iteration pipelining).
    Compares data-dependent vs loop-invariant indices at 48 steps."""
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tools.microbench import device_time_ms

    rng = np.random.default_rng(0)
    n_rays = 230_400
    for n_rows, label in ((105_596, "27 MB"), (844_768, "216 MB")):
        tbl = jnp.asarray(
            rng.integers(0, n_rows, (n_rows, 64), dtype=np.int32))
        idx0 = jnp.asarray(rng.integers(0, n_rows, n_rays, dtype=np.int32))

        @jax.jit
        def dep(i0, t=tbl):
            def body(_, i):
                row = t[i]
                return (row[:, 0] ^ row[:, 17] ^ row[:, 63]) % t.shape[0]
            return jax.lax.fori_loop(0, 48, body, i0).sum()

        @jax.jit
        def indep(i0, t=tbl):
            def body(_, acc):
                row = t[i0]
                return acc + row[:, 0] + row[:, 17] + row[:, 63]
            return jax.lax.fori_loop(0, 48, body,
                                     jnp.zeros_like(i0)).sum()

        for name, f in (("data-dependent", dep), ("loop-invariant", indep)):
            ms = device_time_ms(f, idx0, n=4, warmup=1)
            print(f"{label} {name:15s}: {ms:8.2f} ms / 48 gathers "
                  f"({ms / 48:6.3f} ms/step)")


if __name__ == "__main__" and "--loop" in sys.argv:
    loop_carried()
    sys.exit(0)


if __name__ == "__main__" and "--loop" not in sys.argv:
    main()
