"""Measure the ray-survival curve of bvh.trace's traversal (alive fraction
vs step count) on real helmet primaries/incoherent rays — the data that
tunes the compaction ladder (_SEG0/_TIERS in kernels/bvh.py).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

CHECKPOINTS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    if "--cpu" in sys.argv:
        # survival is a property of tree+rays, not backend — CPU avoids
        # tying up the chip and the slow tunnel compiles (jax_platforms,
        # not jax_default_device: the latter initializes every backend
        # including a possibly-down axon tunnel)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from incarnation_tpu.scene.cache import load_scene_cached
    from incarnation_tpu.kernels import bvh as bvh_mod

    if "--atrium" in sys.argv:
        from incarnation_tpu.scene import stress
        host = load_scene_cached(
            stress.build_atrium(pathlib.Path(__file__).resolve().parents[1]
                                / ".content_cache" / "atrium"),
            texture_max_dim=2048)
    else:
        host = load_scene_cached(
            "/root/reference/content/models/damaged-helmet/"
            "DamagedHelmet.gltf", texture_max_dim=2048)
    bvh = bvh_mod.build_scene_bvh(host.scene,
                                  wide="--binary" not in sys.argv)
    step_fn = bvh_mod._step_wide if bvh.wide else bvh_mod._step
    c = np.asarray(host.bounds_center, np.float32)
    ext = float(np.linalg.norm(np.asarray(host.bounds_extent)))
    print(f"rows {bvh.rows.shape} bounds c={c.round(2)} ext={ext:.2f}")

    w, h = 640, 360
    r = w * h
    rng = np.random.default_rng(0)
    if host.cameras:
        # the scene's own camera — the view the bench/PT actually traces
        cam = host.cameras[0]
        eye = np.asarray(cam["position"], np.float32)
        fwd = np.asarray(cam["look"], np.float32)
        rgt = np.asarray(cam["right"], np.float32)
        up = np.asarray(cam["up"], np.float32)
    else:
        eye = c + np.array([0, 0.25 * ext, -1.9 * ext], np.float32)
        fwd = c - eye
        fwd /= np.linalg.norm(fwd)
        rgt = np.cross([0, 1, 0], fwd).astype(np.float32)
        rgt /= np.linalg.norm(rgt)
        up = np.cross(fwd, rgt)
    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = -((np.arange(h) + 0.5) / h * 2 - 1)
    gx, gy = np.meshgrid(xs * np.tan(0.4) * (w / h), ys * np.tan(0.4),
                         indexing="xy")
    d = (gx[..., None] * rgt + gy[..., None] * up + fwd).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)
    o = np.tile(eye, (r, 1))
    oi = (c + rng.uniform(-.4, .4, (r, 3)) * ext).astype(np.float32)
    di = rng.normal(size=(r, 3)).astype(np.float32)
    di /= np.linalg.norm(di, axis=-1, keepdims=True)

    # The REAL path-tracer populations: bounce wavefronts spawn at primary
    # hits (misses PARK at 1e29 — they ride the wavefront until the ladder
    # compacts), and shadow batches mix one NEE ray (dies on any hit...
    # measured here as closest, close enough for survival) with one
    # cosine sky ray per alive pixel. These curves, not the synthetic
    # random-ray one, size the ladder caps.
    pr = bvh_mod.trace(bvh, jnp.asarray(o), jnp.asarray(d),
                       profile="primary")
    hit_mask = np.asarray(pr["tri"]) >= 0
    t_hit = np.nan_to_num(np.asarray(pr["t"]), posinf=0.0)
    wp = o + t_hit[:, None] * d
    ob = np.where(hit_mask[:, None], wp, 1e29).astype(np.float32)
    db = rng.normal(size=(r, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    # sky rays: upper-hemisphere cosine-ish; NEE rays: toward a random
    # point light in the interior
    lp = (c + rng.uniform(-.35, .35, (r, 3)) * ext).astype(np.float32)
    dn = lp - wp
    dn /= np.maximum(np.linalg.norm(dn, axis=-1, keepdims=True), 1e-8)
    dsky = rng.normal(size=(r, 3)).astype(np.float32)
    dsky[:, 1] = np.abs(dsky[:, 1])
    dsky /= np.linalg.norm(dsky, axis=-1, keepdims=True)
    osh = np.concatenate([ob, ob])
    dsh = np.concatenate([dn.astype(np.float32), dsky])

    pops = (("primary", o, d), ("incoherent", oi, di),
            ("bounce", ob, db), ("shadow-mix", osh[:r], dsh[:r]),
            ("shadow-mix2", osh[r:], dsh[r:]))
    for label, oo, dd in pops:
        oo, dd = jnp.asarray(oo), jnp.asarray(dd)

        def curve(o_, d_):
            inv = 1.0 / jnp.where(jnp.abs(d_) > 1e-12, d_,
                                  jnp.where(d_ >= 0, 1e-12, -1e-12))
            n_per = 1 if bvh.wide else bvh.rows.shape[0] // 8
            links = None
            okt = n_per * ((d_[:, 0] < 0).astype(jnp.int32)
                           + 2 * (d_[:, 1] < 0).astype(jnp.int32)
                           + 4 * (d_[:, 2] < 0).astype(jnp.int32))
            st = (jnp.zeros((r,), jnp.int32), jnp.full((r,), jnp.inf),
                  jnp.full((r,), -1, jnp.int32), jnp.zeros((r,)),
                  jnp.zeros((r,)), jnp.ones((r,), bool))
            outs = []
            done = 0
            for ck in CHECKPOINTS:
                st = bvh_mod._run_steps(ck - done, bvh.rows, links, okt,
                                        o_, d_, inv, jnp.inf, st, False,
                                        None, step_fn)
                done = ck
                outs.append(jnp.sum(st[5].astype(jnp.int32)))
            hit = jnp.sum((st[2] >= 0).astype(jnp.int32))
            return jnp.stack(outs), hit

        t0 = time.time()
        alive, hit = jax.jit(curve)(oo, dd)
        alive = np.asarray(alive)
        print(f"{label}: compile+run {time.time() - t0:.0f}s "
              f"hit@{CHECKPOINTS[-1]} {int(hit) / r:.3f}")
        for ck, a in zip(CHECKPOINTS, alive):
            print(f"  step {ck:4d}: alive {a / r:7.4f}")


if __name__ == "__main__":
    main()
