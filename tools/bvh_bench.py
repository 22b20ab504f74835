"""BVH traversal micro-benchmark on the real chip.

Measures compile time and Mray/s of bvh.trace alone (closest-hit and
any-hit) on helmet-scale geometry — the fast iteration loop for traversal
work (full PT compiles are minutes; this is seconds).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    from incarnation_tpu.scene.cache import load_scene_cached
    from incarnation_tpu.kernels import bvh as bvh_mod

    host = load_scene_cached(
        "/root/reference/content/models/damaged-helmet/DamagedHelmet.gltf",
        texture_max_dim=2048)
    t0 = time.time()
    bvh = bvh_mod.build_scene_bvh(host.scene)
    print(f"build: {time.time() - t0:.1f}s rows {bvh.rows.shape} "
          f"merged={bvh.merged}")

    w, h = 640, 360
    r = w * h
    rng = np.random.default_rng(0)
    # real primary rays: pinhole camera at the CLI's default framing
    eye = np.array([0.0, 0.6, -2.2], np.float32)
    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = -((np.arange(h) + 0.5) / h * 2 - 1)
    gx, gy = np.meshgrid(xs * np.tan(0.4) * (w / h), ys * np.tan(0.4),
                         indexing="xy")
    d = np.stack([gx, gy, np.ones_like(gx)], -1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)
    o = np.tile(eye, (r, 1))
    # bounce-like rays: origins ON the surface (first-hit points of the
    # primaries), cosine-ish random dirs — the PT's incoherent workload
    oi = (o + d * 1.8 + rng.uniform(-.05, .05, (r, 3))).astype(np.float32)
    di = rng.normal(size=(r, 3)).astype(np.float32)
    di /= np.linalg.norm(di, axis=-1, keepdims=True)

    for label, oo, dd, ah in (("primary", o, d, False),
                              ("incoherent", oi, di, False),
                              ("shadow(any)", o, d, True)):
        oo, dd = jnp.asarray(oo), jnp.asarray(dd)
        fn = jax.jit(lambda a, b, ah=ah: bvh_mod.trace(bvh, a, b,
                                                       any_hit=ah))
        t0 = time.time()
        out = fn(oo, dd)
        out["t"].block_until_ready()
        compile_s = time.time() - t0
        n = 20
        t0 = time.time()
        for _ in range(n):
            out = fn(oo, dd)
        out["t"].block_until_ready()
        dt = (time.time() - t0) / n
        print(f"{label:12s} compile {compile_s:6.1f}s  "
              f"{r / dt / 1e6:8.2f} Mray/s  "
              f"hit {float((out['tri'] >= 0).mean()):.3f} "
              f"trunc {int(out['trunc'])}")


if __name__ == "__main__":
    main()
