"""Round-5 diagnostics: TAA shift-path residuals, big-tri counts, peel depth.

Usage: python tools/diag_r5.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import bench
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    from incarnation_tpu.config import Config
    from incarnation_tpu.core import mathutils as mu
    from incarnation_tpu.kernels import raster
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod

    width, height = 1920, 1088
    host, name = bench.load_bench_scene()
    scene = host.scene
    cfg = Config(sun_shadow_mode="map", masked_depth_peels=3)
    params = RasterParams(width=width, height=height, pair_capacity=1 << 18,
                          bin_max_span=8)
    view = bench._bench_view(host, width, height)
    jitters = np.asarray(mu.halton_jitter_table(16))
    shadow_bounds = (host.bounds_center,
                     float(np.linalg.norm(host.bounds_extent)) + 1e-3)

    def make_fc(i, prev_vp):
        j = jitters[i % 16] * 2.0 / np.array([width, height])
        return frame_mod.FrameConstants.make(
            view, cfg, sun_dir=np.asarray(scene.sun_dir),
            sun_color_intensity=[1., 1., 1., 100.],
            jitter=j, prev_view_proj=prev_vp, history_valid=(i > 0),
            frame_index=i, shadow_bounds=shadow_bounds)

    # ---- 1. TAA shift-path residuals ----
    fc0 = make_fc(0, None)
    fc1 = make_fc(1, np.asarray(fc0.view_proj))
    m = np.asarray(fc1.inv_view_proj) @ np.asarray(fc1.prev_view_proj)
    mn = m / m[3, 3]
    print("TAA mn residuals:")
    print("  diag:", abs(mn[0, 0] - 1), abs(mn[1, 1] - 1))
    print("  offdiag:", abs(mn[0, 1]), abs(mn[1, 0]))
    print("  z row:", abs(mn[2, 0]), abs(mn[2, 1]), abs(mn[2, 3]))
    print("  w col:", abs(mn[0, 3]), abs(mn[1, 3]))
    print("  shift px:", 0.5 * mn[3, 0] * width, -0.5 * mn[3, 1] * height)

    # ---- 2. pair/big counts per layer ----
    prim_visible = jnp.ones_like(scene.prim_is_decal, bool)
    prep = raster.prepare_geometry(scene, fc1.scene_rotation, fc1.view_proj,
                                   prim_visible, params)
    tri_ok = scene.tri_prim >= 0
    safe_prim = jnp.maximum(scene.tri_prim, 0)
    tri_alpha = scene.prim_alpha_mode[safe_prim]
    tri_decal = (scene.prim_is_decal[safe_prim] > 0) & tri_ok
    tri_masked = (tri_alpha > 0) & tri_ok & ~tri_decal
    lyr = jnp.zeros_like(scene.tri_prim)
    lyr = jnp.where(tri_masked, 1, lyr)
    lyr = jnp.where(tri_decal, 2, lyr)
    bins = raster.bin_triangles_layered(
        prep.setup_t, prep.ids, prep.valid, prep.bbox, params,
        prep.attr_flat, layer=lyr, n_layers=3)
    for i, nm in enumerate(("opaque", "masked", "decal")):
        b = bins[i]
        print(f"layer {nm}: pairs={int(np.sum(np.asarray(b.counts)))} "
              f"big={int(np.asarray(b.big_count)[0])} "
              f"big_ovf={int(np.asarray(b.big_overflow))}")
    print("total valid tris:", int(jnp.sum(prep.valid)),
          "masked tris:", int(jnp.sum(tri_masked & prep.valid)),
          "decal tris:", int(jnp.sum(tri_decal & prep.valid)))

    # ---- 3. peel depth to zero overflow ----
    from incarnation_tpu.kernels import ibl, sky
    from incarnation_tpu.scene.cache import load_probe_cached
    sun = np.asarray(scene.sun_dir)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), cfg.turbidity, 256, 128),
            envmap_size=cfg.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{cfg.turbidity}:"
            f"{cfg.envmap_resolution}")
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128))
    history = jnp.zeros((height, width, 3))
    for peels in (3, 4, 5, 6, 8):
        c = cfg.replace(masked_depth_peels=peels)
        t0 = time.time()
        out = frame_mod.render_frame_jit(scene, fc1, c, params, probe,
                                         env_brdf, history)
        ov = int(out["stats"]["peel_overflow"])
        out["color"].block_until_ready()
        compile_t = time.time() - t0
        t0 = time.time()
        n = 3
        for _ in range(n):
            out = frame_mod.render_frame_jit(scene, fc1, c, params, probe,
                                             env_brdf, history)
        out["color"].block_until_ready()
        dt = (time.time() - t0) / n
        print(f"peels={peels}: overflow={ov} frame={dt*1e3:.1f} ms "
              f"(compile {compile_t:.0f}s)")


if __name__ == "__main__":
    main()
