"""Decompose the atrium path-trace cost: bare traversal vs the in-step
any-hit alpha evaluation, per trace profile (r4: bench recorded 0.077
Mray/s; profile_pt shows ~58 ms per full-width step where the bare row
gather microbenches at 4.9 ms — this isolates where the rest goes).

Run: python tools/pt_step_bench.py
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
    from incarnation_tpu.kernels import pathtrace as pt

    host, name = bench.load_bench_scene()
    scene = host.scene
    bvh = bvh_mod.build_scene_bvh(scene)
    print(f"scene {name}: rows {bvh.rows.shape} "
          f"({bvh.rows.size * 4 / 1e6:.1f} MB) wide={bvh.wide}")

    w, h = 640, 360
    rng = np.random.default_rng(0)
    eye = np.asarray([0.0, 4.0, -14.0], np.float32)
    d = rng.standard_normal((w * h, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray(eye), (w * h, 3))
    d = jnp.asarray(d)

    def alpha_of(tri, u, v):
        return pt._alpha_at_hit(scene, tri, u, v,
                                 jnp.zeros(tri.shape[:1]))

    cases = [
        ("closest primary, no alpha", dict(profile="primary"), None),
        ("closest primary, alpha_of", dict(profile="primary"), alpha_of),
        ("closest incoherent, no alpha", dict(profile="incoherent"), None),
        ("closest incoherent, alpha_of", dict(profile="incoherent"),
         alpha_of),
        ("anyhit shadow, no alpha", dict(profile="incoherent",
                                         any_hit=True), None),
        ("anyhit shadow, alpha_of", dict(profile="incoherent",
                                         any_hit=True), alpha_of),
    ]
    for label, kw, af in cases:
        @jax.jit
        def f(o, d, kw=kw, af=af):
            r = bvh_mod.trace(bvh, o, d, alpha_of=af, **kw)
            return r["t"], r["tri"], r["trunc"]

        ms = device_time_ms(f, o, d)
        print(f"{label:34s}: {ms:8.2f} ms "
              f"({w * h / ms * 1e3 / 1e6:5.2f} Mray/s)")


if __name__ == "__main__":
    main()
