"""Does XLA split the wide-BVH row gather into per-slice gathers?

pt_step_bench measured a bare closest trace at 4.2 s / 230k rays — ~6x
what the table-size-scaled single gather predicts. _step_wide slices the
gathered (R, 64) row ~20 times; if XLA's gather simplifier pushes those
slices into ~20 separate gathers, an optimization_barrier right after the
gather (forcing ONE materialized row fetch) should collapse the cost.

Times 48 traversal steps (fori_loop) of the real _step_wide on the atrium
wide BVH, with and without the barrier.

Run: python tools/step_barrier_bench.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from tools.microbench import device_time_ms  # noqa: E402


def main():
    import bench
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    from incarnation_tpu.kernels import bvh as bvh_mod

    host, name = bench.load_bench_scene()
    bvh = bvh_mod.build_scene_bvh(host.scene)
    rows = bvh.rows
    thread = bvh.links
    print(f"{name}: geo {rows.shape} ({rows.size * 4 / 1e6:.1f} MB) + thread {thread.shape} ({thread.size * 4 / 1e6:.1f} MB)")

    r = 230_400
    rng = np.random.default_rng(0)
    eye = np.asarray(host.bounds_center, np.float32) + [0, 2, 0]
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray(eye), (r, 3))
    d = jnp.asarray(d)

    n_per = rows.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                            jnp.where(d >= 0, 1e-12, -1e-12))
    okt_off = n_per * ((d[:, 0] < 0).astype(jnp.int32)
                       + 2 * (d[:, 1] < 0).astype(jnp.int32)
                       + 4 * (d[:, 2] < 0).astype(jnp.int32))

    def run_steps(step_fn):
        state = (jnp.zeros((r,), jnp.int32), jnp.full((r,), jnp.inf),
                 jnp.full((r,), -1, jnp.int32), jnp.zeros((r,)),
                 jnp.zeros((r,)), jnp.ones((r,), bool))
        state = jax.lax.fori_loop(
            0, 48, lambda _, st: step_fn(rows, thread, okt_off, o, d, inv_d,
                                         jnp.float32(1e4), st, False, None),
            state)
        return state[1], state[2]

    def step_barrier(rows_, links, off, o_, d_, inv, tmax, st, ah, af):
        # identical to _step_wide but the row gather is materialized ONCE
        def gathered_rows(idx):
            row = rows_[idx]
            return jax.lax.optimization_barrier(row)
        return bvh_mod._step_wide(_RowsProxy(rows_, gathered_rows), links,
                                  off, o_, d_, inv, tmax, st, ah, af)

    class _RowsProxy:
        """Array-like whose [idx] applies a post-gather barrier."""
        def __init__(self, rows_, fn):
            self._fn = fn
            self.shape = rows_.shape

        def __getitem__(self, idx):
            return self._fn(idx)

    for label, fn in (("plain _step_wide", bvh_mod._step_wide),
                      ("barrier after gather", step_barrier)):
        f = jax.jit(lambda o_, d_, fn=fn: run_steps(fn))
        ms = device_time_ms(f, o, d, n=4, warmup=1)
        print(f"{label:24s}: {ms:8.2f} ms for 48 steps "
              f"({ms / 48:6.2f} ms/step)")


if __name__ == "__main__":
    main()
