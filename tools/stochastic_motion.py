"""Joint stochastic-estimator quality under motion at BENCH scale (1080p,
atrium, real chip) — the full-size companion of
tests/test_stochastic_motion.py (r3 VERDICT item 5).

Orbits the bench camera with ALL stochastic estimators on (mip, bilinear,
PCF, probe lobe, checkerboard; anisotropy excluded — its expectation is
the aniso integral, not the exact path's trilinear) and prints the PSNR
of frame N against the exact (non-stochastic) pipeline at the same
frames, plus the last-two-frame temporal delta of each path.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

N_FRAMES = 24


def main():
    import bench
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax.numpy as jnp
    from incarnation_tpu.config import Config
    from incarnation_tpu.core import mathutils as mu
    from incarnation_tpu.core.view import View
    from incarnation_tpu.kernels import ibl, sky
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.scene.cache import load_probe_cached
    import dataclasses

    width, height = 1920, 1088
    host, name = bench.load_bench_scene()
    sun = np.asarray(host.scene.sun_dir)
    base = dict(sun_shadow_mode="map", masked_depth_peels=3,
                max_anisotropy=1)
    cfg_s = Config(**base)
    cfg_e = Config(**base, stochastic_mip=False, stochastic_bilinear=False,
                   checkerboard_gathers=False)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), cfg_s.turbidity, 256, 128),
            envmap_size=cfg_s.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{cfg_s.turbidity}:"
            f"{cfg_s.envmap_resolution}")
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128))
    params = RasterParams(width=width, height=height, pair_capacity=1 << 18,
                          bin_max_span=8)
    base_view = bench._bench_view(host, width, height)
    shadow_bounds = (host.bounds_center,
                     float(np.linalg.norm(host.bounds_extent)) + 1e-3)
    jitters = np.asarray(mu.halton_jitter_table(16))

    def orbit_view(i):
        # slow orbit about the bench camera's look target
        a = 0.004 * i
        c, s = np.cos(a), np.sin(a)
        rot = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        return dataclasses.replace(
            base_view,
            position=base_view.position @ rot,
            right=base_view.right @ rot, up=base_view.up @ rot,
            look=base_view.look @ rot)

    def run_seq(cfg):
        history = jnp.zeros((height, width, 3))
        prev_vp = None
        frames = []
        for i in range(N_FRAMES):
            j = jitters[i % 16] * 2.0 / np.array([width, height])
            fc = frame_mod.FrameConstants.make(
                orbit_view(i), cfg, sun_dir=sun,
                sun_color_intensity=[1, 1, 1, 100.0], jitter=j,
                prev_view_proj=prev_vp, history_valid=(i > 0),
                frame_index=i, shadow_bounds=shadow_bounds)
            out = frame_mod.render_frame_jit(host.scene, fc, cfg, params,
                                             probe, env_brdf, history)
            history = out["accumulation"]
            prev_vp = np.asarray(fc.view_proj)
            if i >= N_FRAMES - 2:
                frames.append(np.asarray(out["color"][..., :3], np.float32))
        return frames

    t0 = time.time()
    fs = run_seq(cfg_s)
    fe = run_seq(cfg_e)

    def psnr(a, b):
        mse = np.mean((a - b) ** 2)
        return 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))

    print(f"frames={N_FRAMES} wall={time.time() - t0:.0f}s")
    print(f"joint stochastic vs exact PSNR @ frame {N_FRAMES}: "
          f"{psnr(fs[-1], fe[-1]):.2f} dB")
    print(f"temporal delta (stoch):  {psnr(fs[-1], fs[-2]):.2f} dB")
    print(f"temporal delta (exact):  {psnr(fe[-1], fe[-2]):.2f} dB")


if __name__ == "__main__":
    main()
