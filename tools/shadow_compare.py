"""Quantify the sun-shadow-map approximation against exact RT shadows.

The reference traces a DXR shadow ray per shaded pixel every frame
(ref: shaders/lighting/common.hlsli:91-116); the TPU rebuild's honest-frame
default is a rasterized orthographic shadow map with a stochastic PCF tap
(kernels/shadow.py) because a 2M-ray BVH walk per frame is gather-bound on
TPU. This tool renders the BENCH frame both ways (identical everything
else) and reports PSNR + error percentiles, so the quality delta of the
default is a recorded number, not an unquantified scope note
(VERDICT r4 item 6). Run `BENCH_RT_SHADOW=1 python bench.py` to price the
RT-shadow frame's FPS.

Usage: python tools/shadow_compare.py  (TPU; a few minutes of compiles)
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
    import jax.numpy as jnp
    from incarnation_tpu.config import Config
    from incarnation_tpu.core import mathutils as mu
    from incarnation_tpu.kernels import bvh as bvh_mod, ibl, sky
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.scene.cache import load_probe_cached

    width, height = 1920, 1088
    host, name = bench.load_bench_scene()
    scene = host.scene
    sun = np.asarray(scene.sun_dir)
    base = Config(sun_shadow_mode="map", masked_depth_peels=8)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), base.turbidity, 256, 128),
            envmap_size=base.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{base.turbidity}:"
            f"{base.envmap_resolution}")
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128))
    params = RasterParams(width=width, height=height, pair_capacity=1 << 18,
                          bin_max_span=8)
    view = bench._bench_view(host, width, height)
    jitters = np.asarray(mu.halton_jitter_table(16))
    shadow_bounds = (host.bounds_center,
                     float(np.linalg.norm(host.bounds_extent)) + 1e-3)
    scene_bvh = bvh_mod.build_scene_bvh(scene)

    def render(cfg, label):
        # Converged comparison: 16 TAA frames (static camera, full jitter
        # cycle) so the map path's stochastic PCF tap resolves to its
        # penumbra instead of single-frame noise.
        history = jnp.zeros((height, width, 3))
        prev_vp = None
        t0 = time.time()
        out = None
        for i in range(16):
            j = jitters[i % 16] * 2.0 / np.array([width, height])
            fc = frame_mod.FrameConstants.make(
                view, cfg, sun_dir=sun, sun_color_intensity=[1, 1, 1, 100.],
                jitter=j, prev_view_proj=prev_vp, history_valid=(i > 0),
                frame_index=i, shadow_bounds=shadow_bounds)
            prev_vp = np.asarray(fc.view_proj)
            out = frame_mod.render_frame_jit(scene, fc, cfg, params, probe,
                                             env_brdf, history,
                                             scene_bvh=scene_bvh)
            history = out["accumulation"]
        img = np.asarray(out["color"]).astype(np.float32)
        print(f"{label}: 16 frames in {time.time() - t0:.1f}s")
        return img

    img_map = render(base, "shadow-map frame")
    img_rt = render(base.replace(sun_shadow_mode="rt"), "rt-shadow frame")

    err = np.abs(img_map - img_rt).max(axis=-1)
    mse = float(np.mean((img_map - img_rt) ** 2))
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    pct = {p: float(np.percentile(err, p)) for p in (50, 90, 99, 99.9)}
    frac_gt8 = float((err > 8).mean())
    print(f"map-vs-RT sun shadows @1080p, 16-frame converged:")
    print(f"  PSNR {psnr:.1f} dB; |err| p50={pct[50]:.1f} p90={pct[90]:.1f} "
          f"p99={pct[99]:.1f} p99.9={pct[99.9]:.1f} (8-bit steps); "
          f"{frac_gt8 * 100:.2f}% of pixels differ by > 8 steps")
    from incarnation_tpu.utils import imageio as io_mod
    gal = pathlib.Path(__file__).resolve().parent.parent / "gallery"
    gal.mkdir(exist_ok=True)
    io_mod.save_png(gal / "shadow_map.png", img_map.astype(np.uint8))
    io_mod.save_png(gal / "shadow_rt.png", img_rt.astype(np.uint8))


if __name__ == "__main__":
    main()
