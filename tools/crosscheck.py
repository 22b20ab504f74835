"""Cross-path parity gate: raster vs path-traced rendering of the same
scene + directional light (VERDICT round-1 item 6 — the strongest parity
evidence obtainable without D3D12 reference captures: the two pipelines
share no raster/traversal code, so agreement on direct lighting catches
real shading bugs; ref targets: lighting/direct-lighting.hlsl vs
raytracing/pathtracing.hlsl NEE).

Setup: DamagedHelmet, one directional light (in scene.lights for the path
tracer's NEE *and* as the raster sun — the same light either way), no sky,
pinhole camera (aperture 0), TAA off, exact trilinear texturing. Residual
differences: pixel-center sampling vs CMJ-jittered AA at silhouettes, and
one-bounce GI the raster path lacks.

Usage: python tools/crosscheck.py [--width 640] [--height 352] [--spp 64]
Prints PSNR and writes gallery/crosscheck_{raster,pt}.png.
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

HELMET = pathlib.Path(
    "/root/reference/content/models/damaged-helmet/DamagedHelmet.gltf")


def render_both(width=640, height=352, spp=64, texture_max_dim=512,
                verbose=True, supersample=2):
    # texture_max_dim is chosen near the screen sampling rate: the path
    # tracer samples mip 0 (ref: pathtracing.hlsl SampleLevel 0) while the
    # raster resolve picks derivative mips, so oversized textures would
    # turn the comparison into a texture-filtering diff.
    """Returns (raster_color_u8, pt_color_u8, psnr_db)."""
    import jax.numpy as jnp
    from incarnation_tpu.config import Config, EnvSkyMode
    from incarnation_tpu.core.view import View
    from incarnation_tpu.kernels import bvh as bvh_mod
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.scene import lights as lights_mod
    from incarnation_tpu.scene.cache import load_scene_cached
    from incarnation_tpu.utils import imageio as io_mod

    host = load_scene_cached(HELMET, texture_max_dim=texture_max_dim)
    scene = host.scene

    # One directional light, both in scene.lights (path-traced NEE) and as
    # the raster sun pass (fc.sun_*) — identical direction and intensity.
    light_dir = np.asarray([0.5, 0.8, -0.6], np.float32)
    light_dir /= np.linalg.norm(light_dir)
    # transform with -row2 = direction toward the light
    z = -light_dir
    up = np.asarray([0.0, 1.0, 0.0], np.float32)
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    xform = np.eye(4, dtype=np.float32)
    xform[0, :3], xform[1, :3], xform[2, :3] = x, y, z
    # radiance = 100 x intensity; at EV13 exposure (~1.02e-4) intensity 80
    # puts lit albedo mid-range so DIRECT LIGHTING dominates the comparison
    # (emissive x20000 otherwise swamps it)
    intensity = 80.0
    lights = lights_mod.build_light_table(
        [{"type": "directional", "color": [1.0, 1.0, 1.0],
          "intensity": intensity}], [xform])
    scene = dataclasses.replace(
        scene, lights=lights,
        meta=dataclasses.replace(scene.meta, num_lights=1))

    cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP,
                 enable_sky_lighting=False, enable_taa=False,
                 stochastic_mip=False, stochastic_bilinear=False,
                 pathtracing_camera_aperture=0.0,
                 max_sample_count=max(spp, 4))
    view = View.from_lookat([0.0, 0.3, -3.2], [0.0, 0.0, 0.0],
                            aspect=width / height)
    fc = frame_mod.FrameConstants.make(
        view, cfg, sun_dir=light_dir,
        sun_color_intensity=[1.0, 1.0, 1.0, intensity])

    bvh = bvh_mod.build_scene_bvh(scene)

    # Supersampled raster: the path tracer integrates over the pixel AREA
    # (CMJ sub-pixel jitter), a 1-sample raster point-samples pixel centers
    # — on a metallic asset the sharp specular glints alone cost ~10 dB.
    # Rendering the raster path at ss x and box-downsampling compares
    # pixel integrals with pixel integrals.
    t0 = time.time()
    ss = max(1, int(supersample))
    params = RasterParams(width=width * ss, height=height * ss,
                          pair_capacity=1 << 17, bin_max_span=8)
    from incarnation_tpu.kernels import post
    out_r = frame_mod.render_frame_jit(scene, fc, cfg, params,
                                       scene_bvh=bvh)
    if ss > 1:
        hdr = out_r["hdr"].reshape(height, ss, width, ss, 3).mean((1, 3))
        raster_u8 = np.asarray(post.to_uint8(post.tonemap(hdr, fc.exposure)))
    else:
        raster_u8 = np.asarray(out_r["color"])
    if verbose:
        print(f"[raster] ss={ss}: {time.time() - t0:.1f}s")

    t0 = time.time()
    history = jnp.zeros((height, width, 3))
    for s in range(spp):
        out_p = frame_mod.render_pathtrace_jit(
            scene, bvh, fc, history, jnp.asarray(s, jnp.uint32), cfg,
            width, height, None)
        history = out_p["history"]
    pt_u8 = np.asarray(out_p["color"])
    if verbose:
        print(f"[pt] {spp} spp: {time.time() - t0:.1f}s")

    p = io_mod.psnr(raster_u8.astype(np.float32) / 255.0,
                    pt_u8.astype(np.float32) / 255.0)
    return raster_u8, pt_u8, p


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--min-psnr", type=float, default=None)
    args = ap.parse_args(argv)

    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    from incarnation_tpu.utils import imageio as io_mod

    raster_u8, pt_u8, p = render_both(args.width, args.height, args.spp)
    gal = pathlib.Path(__file__).resolve().parent.parent / "gallery"
    gal.mkdir(exist_ok=True)
    io_mod.save_png(gal / "crosscheck_raster.png", raster_u8)
    io_mod.save_png(gal / "crosscheck_pt.png", pt_u8)
    print(f"PSNR raster vs path-traced: {p:.2f} dB")
    if args.min_psnr is not None and p < args.min_psnr:
        print(f"FAIL: below gate {args.min_psnr}")
        sys.exit(1)


if __name__ == "__main__":
    main()
