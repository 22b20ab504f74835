"""BVH traversal micro-benchmark on the real chip.

Measures compile time and Mray/s of bvh.trace alone (closest-hit and
any-hit) — the fast iteration loop for traversal work (full PT compiles are
minutes; this is seconds).

Usage: python tools/bvh_bench.py [--scene helmet|atrium] [--layout wide|binary|both]

Timing note: block_until_ready over the axon tunnel returns early; we force
a real numpy readback of the result after the timed loop — the device
executes the N dispatches serially, so the final readback bounds all of
them.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

HELMET = "/root/reference/content/models/damaged-helmet/DamagedHelmet.gltf"


def load(scene_name: str):
    from incarnation_tpu.scene.cache import load_scene_cached
    if scene_name == "helmet":
        return load_scene_cached(HELMET, texture_max_dim=2048)
    from incarnation_tpu.scene import stress
    atrium_dir = (pathlib.Path(__file__).resolve().parents[1]
                  / ".content_cache" / "atrium")
    return load_scene_cached(stress.build_atrium(atrium_dir),
                             texture_max_dim=2048)


def bench_layout(host, wide: bool):
    import jax
    import jax.numpy as jnp
    from incarnation_tpu.kernels import bvh as bvh_mod

    t0 = time.time()
    bvh = bvh_mod.build_scene_bvh(host.scene, wide=wide)
    print(f"[{'wide' if wide else 'binary'}] build: "
          f"{time.time() - t0:.1f}s rows {bvh.rows.shape}")

    w, h = 640, 360
    r = w * h
    rng = np.random.default_rng(0)
    # real primary rays: pinhole camera at the CLI's default framing
    center = np.asarray(host.bounds_center, np.float32)
    radius = float(np.linalg.norm(np.asarray(host.bounds_extent)))
    eye = center + np.array([0.0, 0.25, -1.1], np.float32) * radius
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross([0, 1, 0], fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = -((np.arange(h) + 0.5) / h * 2 - 1)
    gx, gy = np.meshgrid(xs * np.tan(0.4) * (w / h), ys * np.tan(0.4),
                         indexing="xy")
    d = (gx.reshape(-1, 1) * right + gy.reshape(-1, 1) * up
         + np.ones((r, 1)) * fwd)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)
    o = np.tile(eye, (r, 1)).astype(np.float32)
    # bounce-like rays: origins ON the surface (first-hit points of the
    # primaries), cosine-ish random dirs — the PT's incoherent workload
    oi = (o + d * 0.9 * radius
          + rng.uniform(-.02, .02, (r, 3)) * radius).astype(np.float32)
    di = rng.normal(size=(r, 3)).astype(np.float32)
    di /= np.linalg.norm(di, axis=-1, keepdims=True)

    import jax
    for label, oo, dd, ah, prof in (
            ("primary", o, d, False, "primary"),
            ("incoherent", oi, di, False, "incoherent"),
            ("shadow(any)", o, d, True, "anyhit")):
        oo, dd = jnp.asarray(oo), jnp.asarray(dd)
        fn = jax.jit(lambda a, b, ah=ah, prof=prof: bvh_mod.trace(
            bvh, a, b, any_hit=ah, profile=prof))
        t0 = time.time()
        out = fn(oo, dd)
        np.asarray(out["t"])
        compile_s = time.time() - t0
        n = 20
        t0 = time.time()
        for _ in range(n):
            out = fn(oo, dd)
        np.asarray(out["t"])          # true readback bounds all n runs
        dt = (time.time() - t0) / n
        print(f"{label:12s} compile {compile_s:6.1f}s  "
              f"{r / dt / 1e6:8.2f} Mray/s  "
              f"hit {float((out['tri'] >= 0).mean()):.3f} "
              f"trunc {int(out['trunc'])}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="helmet",
                    choices=["helmet", "atrium"])
    ap.add_argument("--layout", default="wide",
                    choices=["wide", "binary", "both"])
    args = ap.parse_args()

    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    host = load(args.scene)
    if args.layout in ("wide", "both"):
        bench_layout(host, wide=True)
    if args.layout in ("binary", "both"):
        bench_layout(host, wide=False)


if __name__ == "__main__":
    main()
