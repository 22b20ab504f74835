"""Benchmark: Sponza-class scene, 1080p raster path, frames/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 30 FPS raster on one chip.

Scene: Sponza when its geometry is present; otherwise a 4x4 grid of
DamagedHelmet instances (247k triangles — Sponza-scale: 262k) since the
reference checkout ships Sponza.gltf without its (LFS) Sponza.bin.
"""

import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

SPONZA = pathlib.Path("/root/reference/content/models/sponza/Sponza.gltf")
HELMET = pathlib.Path(
    "/root/reference/content/models/damaged-helmet/DamagedHelmet.gltf")
TARGET_FPS = 30.0


def load_bench_scene():
    from incarnation_tpu.scene.cache import load_scene_cached
    from incarnation_tpu.scene import instancing
    if SPONZA.exists() and SPONZA.with_suffix(".bin").exists():
        host = load_scene_cached(SPONZA, texture_max_dim=1024)
        return host, host.scene, "sponza"
    host = load_scene_cached(HELMET, texture_max_dim=1024)
    scene = instancing.replicate_scene(
        host.scene, instancing.grid_offsets(4, 4, 3.0))
    return host, scene, "helmet_grid16"


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    from incarnation_tpu.config import Config
    from incarnation_tpu.core.view import View
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod

    width, height = 1920, 1088  # 1080p padded to whole 16-row tiles

    host, scene, name = load_bench_scene()
    cfg = Config()

    # Full deferred pipeline including sky IBL (dynamic-sky probe)
    import jax
    import jax.numpy as jnp
    from incarnation_tpu.kernels import ibl, sky
    from incarnation_tpu.scene.cache import load_probe_cached
    sun = np.asarray(host.scene.sun_dir)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), cfg.turbidity, 256, 128),
            envmap_size=cfg.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{cfg.turbidity}:"
            f"{cfg.envmap_resolution}")
    # 128^2 LUT: the function is smooth (max abs diff vs 512^2 < 1e-3) and
    # the small quad-packed table keeps the per-pixel gather cache-resident.
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128))
    # pair capacity sized ~1.5x the scene's real pair count (overflow is a
    # counted stat); oversizing inflates the CSR build cost
    params = RasterParams(width=width, height=height,
                          pair_capacity=1 << 18,
                          bin_max_span=8)
    view = View.from_lookat([0.0, 4.0, -14.0], [0.0, 0.0, 0.0],
                            aspect=width / height)
    sun_ci = [1.0, 1.0, 1.0, 100.0]

    # Honest TAA-loop frames, exactly like the interactive loop: jittered
    # camera, history threading, per-frame constants (the reference's 30 FPS
    # is a TAA-on frame, renderer.cpp:126-132).
    from incarnation_tpu.core import mathutils as mu
    jitters = np.asarray(mu.halton_jitter_table(16))

    def make_fc(i, prev_vp):
        j = jitters[i % 16] * 2.0 / np.array([width, height])
        return frame_mod.FrameConstants.make(
            view, cfg, sun_dir=sun, sun_color_intensity=sun_ci,
            jitter=j, prev_view_proj=prev_vp, history_valid=(i > 0),
            frame_index=i)

    # Multi-chip: shard the image into horizontal bands over all TPU chips
    # (SURVEY §2.4 scale-out; bands are independent so scaling is
    # near-linear). Single-chip environments take the plain jit path.
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    n_chips = len(tpus)
    mesh = None
    if n_chips > 1:
        while n_chips > 1 and height % (n_chips * params.tile_h) != 0:
            n_chips -= 1
        if n_chips > 1:
            from incarnation_tpu.dist import sharding
            mesh = sharding.make_mesh(devices=tpus[:n_chips])

    def run(fc, history):
        if mesh is not None:
            from incarnation_tpu.dist import sharding
            return sharding.render_frame_sharded_jit(
                scene, fc, cfg, params, mesh, probe=probe,
                env_brdf=env_brdf, history=history)
        return frame_mod.render_frame_jit(scene, fc, cfg, params, probe,
                                          env_brdf, history)

    history = jnp.zeros((height, width, 3))
    fc = make_fc(0, None)
    out = run(fc, history)
    out["color"].block_until_ready()

    n = 10
    fcs = []
    prev_vp = np.asarray(fc.view_proj)
    for i in range(1, n + 1):
        fcs.append(make_fc(i, prev_vp))
        prev_vp = np.asarray(fcs[-1].view_proj)
    history = out["accumulation"]
    t0 = time.time()
    for i in range(n):
        out = run(fcs[i], history)
        history = out["accumulation"]
    out["color"].block_until_ready()
    dt = (time.time() - t0) / n
    fps = 1.0 / dt

    suffix = f"_{n_chips}chip" if mesh is not None else ""
    print(json.dumps({
        "metric": f"{name}_1080p_raster_fps{suffix}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
