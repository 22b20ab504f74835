"""Command-line renderer: load a glTF scene, render frames to PNG.

The batch-mode replacement for the reference's interactive Win32 loop
(ref: source/demo-exe/main.cpp): all FConfig toggles are flags, the camera
comes from the scene's glTF camera 0 (like FView::Reset,
ref: src/demo.cpp:172-197) or --lookat overrides.

Usage:
  python -m incarnation_tpu.app.cli \
      --model /root/reference/content/models/damaged-helmet/DamagedHelmet.gltf \
      --out /tmp/helmet.png --width 1280 --height 720 --sun 1
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

from ..config import Config
from ..core.view import View
from ..kernels.raster import RasterParams
from ..renderer import frame as frame_mod
from ..scene.cache import load_scene_cached as load_scene
from ..utils import imageio as io_mod


def build_view(host, width, height, cfg: Config, lookat=None) -> View:
    aspect = width / height
    if lookat is not None:
        eye, target = lookat
        return View.from_lookat(eye, target, aspect=aspect, fov=cfg.fov,
                                near=cfg.camera_near_plane)
    if host.cameras:
        c = host.cameras[0]
        v = View(position=c["position"], right=c["right"], up=c["up"],
                 look=c["look"], fov=c["yfov"], aspect=aspect,
                 near=cfg.camera_near_plane)
        v.orthonormalize()
        return v
    return View.default(aspect=aspect, fov=cfg.fov,
                        near=cfg.camera_near_plane)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", default="frame.png")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--viewmode", type=int, default=0)
    ap.add_argument("--exposure", type=float, default=13.0)
    ap.add_argument("--sun", type=float, default=0.0,
                    help="directional sun intensity (0 = scene lights only)")
    ap.add_argument("--sun-dir", type=float, nargs=3, default=None)
    ap.add_argument("--lookat", type=float, nargs=6, default=None,
                    metavar=("EX", "EY", "EZ", "TX", "TY", "TZ"))
    ap.add_argument("--texture-max-dim", type=int, default=2048)
    ap.add_argument("--pair-capacity", type=int, default=1 << 20)
    ap.add_argument("--frames", type=int, default=1,
                    help="render N frames (timing: first is compile)")
    ap.add_argument("--no-sky", action="store_true",
                    help="disable sky lighting + background")
    ap.add_argument("--pathtrace", action="store_true",
                    help="progressive path tracing instead of raster")
    ap.add_argument("--spp", type=int, default=16,
                    help="path-tracing samples per pixel to accumulate")
    ap.add_argument("--pt-checkpoint", type=str, default=None,
                    help="save the path-trace accumulation + sample "
                         "counter to this .npz after the run")
    ap.add_argument("--resume", action="store_true",
                    help="resume accumulation from --pt-checkpoint if it "
                         "exists (bit-identical to an uninterrupted run)")
    ap.add_argument("--shadows", nargs="?", const="rt", default="map",
                    choices=["off", "map", "rt"],
                    help="sun shadows: 'map' (default; rasterized shadow "
                         "map, the TPU-native always-on path), 'rt' (exact "
                         "BVH shadow rays like the reference's DXR ray), "
                         "'off'")
    ap.add_argument("--shadow-res", type=int, default=1024)
    ap.add_argument("--forward", action="store_true",
                    help="forward lighting path (exact normals; BLEND "
                         "geometry alpha-composited — ref ui.cpp:346)")
    ap.add_argument("--hbao", action="store_true",
                    help="ray-traced HBAO + bent normals")
    ap.add_argument("--hdri", default=None,
                    help=".hdr environment (replaces the dynamic sky, like "
                         "FConfig::HDRIFilename)")
    ap.add_argument("--show-object-bounds", action="store_true")
    ap.add_argument("--show-light-bounds", action="store_true")
    ap.add_argument("--rotate-scene", type=float, default=None,
                    metavar="DEG", help="rotate the scene about world y "
                    "(the reference's RMB scene-rotation)")
    ap.add_argument("--tod", type=float, default=None, metavar="HOURS",
                    help="time-of-day sun position (decimal hours; uses "
                         "FConfig ToD julian date + latitude defaults)")
    ap.add_argument("--pick", type=int, nargs=2, default=None,
                    metavar=("X", "Y"),
                    help="print ids under pixel and highlight the primitive")
    ap.add_argument("--cpu", action="store_true",
                    help="render on the host CPU backend (debugging / "
                         "no-accelerator environments)")
    args = ap.parse_args(argv)
    from ..utils import jaxinit
    jaxinit.setup()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg = Config(viewmode=args.viewmode, exposure=args.exposure,
                 enable_sky_lighting=not args.no_sky,
                 enable_hbao=args.hbao, use_bent_normals=args.hbao,
                 forward_lighting=args.forward,
                 sun_shadow_mode=args.shadows,
                 shadow_map_resolution=args.shadow_res,
                 show_object_bounds=args.show_object_bounds,
                 show_light_bounds=args.show_light_bounds)
    if args.no_sky:
        from ..config import EnvSkyMode
        cfg = cfg.replace(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)
    t0 = time.time()

    def _progress(stage, frac):
        # load-progress reporting (ref: inc/scene.h:131-142); \r keeps it
        # one line like the reference's progress bar
        print(f"\r[load] {stage} {frac * 100:5.1f}%", end="",
              file=sys.stderr, flush=True)
        if frac >= 1.0:
            print(file=sys.stderr)

    host = load_scene(args.model, texture_max_dim=args.texture_max_dim,
                      progress=_progress)
    print(f"[scene] {host.name}: {host.scene.meta.num_triangles} tris, "
          f"{host.scene.meta.num_primitives} prims, "
          f"load {time.time() - t0:.1f}s")

    view = build_view(host, args.width, args.height, cfg,
                      lookat=(args.lookat[:3], args.lookat[3:])
                      if args.lookat else None)
    params = RasterParams(width=args.width, height=args.height,
                          pair_capacity=args.pair_capacity)

    sun_ci = None
    sun_dir = np.asarray(host.scene.sun_dir)
    if args.tod is not None:
        from ..scene.lights import sun_direction_tod
        sun_dir = sun_direction_tod(args.tod, cfg.tod_julian_date,
                                    cfg.tod_latitude)
        print(f"[sun] time-of-day {args.tod}h -> {sun_dir.round(3)}")
    if args.sun > 0:
        sun_ci = [1.0, 1.0, 1.0, args.sun]
        if args.sun_dir is not None:
            sun_dir = np.asarray(args.sun_dir, np.float32)
            sun_dir = sun_dir / np.linalg.norm(sun_dir)
    elif host.directional_light_index >= 0:
        i = host.directional_light_index
        sun_ci = list(np.asarray(host.scene.lights.color[i])) + [
            float(host.scene.lights.intensity[i])]

    scene_rotation = None
    if args.rotate_scene is not None:
        a = np.radians(args.rotate_scene)
        scene_rotation = np.eye(4, dtype=np.float32)
        scene_rotation[0, 0] = scene_rotation[2, 2] = np.cos(a)
        scene_rotation[0, 2] = -np.sin(a)
        scene_rotation[2, 0] = np.sin(a)
    shadow_bounds = None
    if cfg.sun_shadow_mode == "map":
        shadow_bounds = (host.bounds_center,
                         float(np.linalg.norm(host.bounds_extent)) + 1e-3)
    fc = frame_mod.FrameConstants.make(view, cfg, sun_dir=sun_dir,
                                       sun_color_intensity=sun_ci,
                                       scene_rotation=scene_rotation,
                                       shadow_bounds=shadow_bounds)

    probe = env_brdf = None
    if args.hdri:
        from ..config import EnvSkyMode
        cfg = cfg.replace(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)
    if cfg.enable_sky_lighting or args.hdri:
        import pathlib
        import jax
        import jax.numpy as jnp
        from ..kernels import ibl, sky
        from ..scene.cache import load_probe_cached
        t0 = time.time()
        if args.hdri:
            # HDRI environment probe (ref: FTextureCache::CacheHDRI,
            # src/demo.cpp:292-434)
            hp = pathlib.Path(args.hdri)
            key = f"hdri:{hp.resolve()}:{hp.stat().st_mtime_ns}:" \
                  f"{cfg.envmap_resolution}"
            probe = load_probe_cached(
                lambda: ibl.build_probe(
                    jnp.asarray(io_mod.load_hdr(hp)),
                    envmap_size=cfg.envmap_resolution),
                key, use_cache=cfg.use_content_cache)
        else:
            sd = np.asarray(fc.sun_dir).round(4)
            key = f"sky:{sd.tolist()}:{cfg.turbidity}:{cfg.envmap_resolution}"
            probe = load_probe_cached(
                lambda: ibl.build_probe(
                    sky.sky_latlong(fc.sun_dir, cfg.turbidity, 256, 128),
                    envmap_size=cfg.envmap_resolution),
                key, use_cache=cfg.use_content_cache)
        env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128))
        jax.block_until_ready((probe.sh, env_brdf))
        print(f"[probe] environment probe + BRDF LUT: {time.time() - t0:.1f}s")

    if args.pathtrace:
        import jax.numpy as jnp
        from ..kernels import bvh as bvh_mod
        t0 = time.time()
        bvh = bvh_mod.build_scene_bvh(host.scene)
        # hidden meshes must not trace (ref: update-tlas.inl:24 rebuilds
        # the TLAS over the visible list every frame; visibility changes
        # rarely here, so the leaf re-emit happens on change instead)
        bvh = bvh_mod.apply_mesh_visibility(bvh, host.scene,
                                            host.scene.mesh_visible)
        print(f"[bvh] LBVH over {host.scene.meta.num_triangles} tris: "
              f"{time.time() - t0:.1f}s")
        cfg = cfg.replace(max_sample_count=max(args.spp, 1))
        history = jnp.zeros((args.height, args.width, 3))
        # checkpoint/resume of the accumulation array + sample counter
        # (SURVEY §5: the reference's scene-rebuild equivalent; samples are
        # keyed on their index so a resumed run is bit-identical)
        start_s = 0
        ckpath = pathlib.Path(args.pt_checkpoint) if args.pt_checkpoint \
            else None
        if ckpath is not None and args.resume and ckpath.exists():
            ck = np.load(ckpath)
            if (int(ck["width"]), int(ck["height"])) != \
                    (args.width, args.height):
                sys.exit(f"checkpoint {ckpath} is "
                         f"{int(ck['width'])}x{int(ck['height'])}, "
                         f"not {args.width}x{args.height}")
            history = jnp.asarray(ck["history"])
            start_s = int(ck["next_sample"])
            print(f"[pt] resumed {ckpath} at sample {start_s}")
        out = None
        t0 = time.time()
        for s in range(start_s, args.spp):
            out = frame_mod.render_pathtrace_jit(
                host.scene, bvh, fc, history, jnp.asarray(s, jnp.uint32),
                cfg, args.width, args.height, probe)
            history = out["history"]
            if s == start_s:
                out["color"].block_until_ready()
                print(f"[pt] first sample (incl. compile): "
                      f"{time.time() - t0:.1f}s")
                t0 = time.time()
        if out is None:
            # checkpoint already holds all requested samples; color is a
            # pure function of the accumulated history
            from ..kernels import post
            color = post.to_uint8(post.tonemap(history, fc.exposure))
            out = dict(color=color, history=history)
        out["color"].block_until_ready()
        if args.spp - start_s > 1:
            dt = (time.time() - t0) / (args.spp - start_s - 1)
            # traces per sample: 4 bounce rays + 4 sky-shadow rays
            # + 4 x num_lights NEE shadow rays
            n_tr = 8 + 4 * host.scene.meta.num_lights
            mrays = args.width * args.height * n_tr / dt / 1e6
            print(f"[pt] {dt * 1e3:.0f} ms/sample (~{mrays:.2f} Mrays/s "
                  f"incl. shadow rays)")
        if ckpath is not None:
            ckpath.parent.mkdir(parents=True, exist_ok=True)
            np.savez(ckpath, history=np.asarray(history),
                     next_sample=args.spp,
                     width=args.width, height=args.height)
            print(f"[pt] checkpoint -> {ckpath}")
        io_mod.save_png(args.out, np.asarray(out["color"]))
        print(f"[out] {args.out}")
        return

    scene_bvh = None
    if args.shadows == "rt" or args.hbao:
        from ..kernels import bvh as bvh_mod
        t0 = time.time()
        scene_bvh = bvh_mod.apply_mesh_visibility(
            bvh_mod.build_scene_bvh(host.scene), host.scene,
            host.scene.mesh_visible)
        print(f"[bvh] LBVH for shadows/AO: {time.time() - t0:.1f}s")

    # TAA loop: subsequent frames jitter the camera by Halton(2,3) and
    # resolve against the previous accumulation (ref: renderer.cpp:126-132,
    # render-jobs/taa-resolve.inl)
    from ..core import mathutils as mu
    import jax.numpy as jnp
    jitters = mu.halton_jitter_table(16)
    history = None
    prev_vp = None
    t0 = time.time()
    for i in range(max(1, args.frames)):
        if cfg.enable_taa and args.frames > 1:
            j = jitters[i % 16] * 2.0 / np.array([args.width, args.height])
            fc = frame_mod.FrameConstants.make(
                view, cfg, sun_dir=sun_dir, sun_color_intensity=sun_ci,
                scene_rotation=scene_rotation,
                jitter=j, prev_view_proj=prev_vp, history_valid=(i > 0),
                frame_index=i, shadow_bounds=shadow_bounds)
            if history is None:
                history = jnp.zeros((args.height, args.width, 3))
        out = frame_mod.render_frame_jit(host.scene, fc, cfg, params, probe,
                                         env_brdf, history, scene_bvh)
        if i == 0 and host.scene.meta.has_masked:
            # Adaptive peel count (VERDICT r2 item 6): if the last masked
            # peel still alpha-failed for many pixels, raise the layer
            # count for subsequent frames (one extra jit specialization).
            ov = int(out["stats"]["peel_overflow"])
            if ov > 256 and cfg.masked_depth_peels < 4:
                old = cfg.masked_depth_peels
                cfg = cfg.replace(masked_depth_peels=old
                                  + (2 if ov > 65536 else 1))
                print(f"[peels] {ov} px overflowed {old}-layer peeling -> "
                      f"masked_depth_peels={cfg.masked_depth_peels}")
                if args.frames == 1:
                    # single-shot render: redo frame 0 at the raised count
                    # so the written image has no truncated peels
                    out = frame_mod.render_frame_jit(
                        host.scene, fc, cfg, params, probe, env_brdf,
                        history, scene_bvh)
        if cfg.enable_taa and args.frames > 1:
            history = out["accumulation"]
            prev_vp = np.asarray(fc.view_proj)
        out["color"].block_until_ready()
        label = "first frame (incl. compile)" if i == 0 else "frame"
        dt = time.time() - t0
        print(f"[{label}] {dt:.2f}s" if i == 0
              else f"[frame] {dt * 1e3:.1f} ms")
        t0 = time.time()

    stats = {k: int(v) for k, v in out["stats"].items()}
    covered = float(np.mean(np.asarray(out["tri"]) >= 0))
    print(f"[stats] {stats} coverage={covered:.3f}")

    color = out["color"]
    if args.pick is not None:
        x, y = args.pick
        prim, local, meshlet = frame_mod.pick(
            host.scene, np.asarray(out["tri"]), x, y)
        print(f"[pick] ({x},{y}): primitive={prim} triangle={local} "
              f"meshlet={meshlet}")
        if prim >= 0:
            color = frame_mod.highlight(color, out["tri"], host.scene, prim)
    # show_object_bounds / show_light_bounds now draw INSIDE the traced
    # frame via the device-side append buffer (the cull / light-culling
    # pass results append wireframes — renderer/debugdraw.py ddraw_*).

    io_mod.save_png(args.out, np.asarray(color))
    print(f"[out] {args.out}")


if __name__ == "__main__":
    main()
