"""Quantify stochastic-filtering quality under TAA convergence.

Renders DamagedHelmet at 720p, N TAA frames, three configs:
  exact      — trilinear everywhere, exact bilinear history fetch
  stoch_tex  — stochastic mip+bilinear textures + IBL, exact history
  stoch_all  — stochastic textures + stochastic single-texel history fetch
Prints PSNR of each stochastic mode vs exact, and saves the PNGs.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

N_FRAMES = 32
W, H = 1280, 720


def render(cfg, probe, env_brdf, host, make_fc):
    import jax.numpy as jnp
    from incarnation_tpu.renderer import frame as frame_mod
    history = jnp.zeros((H, W, 3))
    prev_vp = None
    from incarnation_tpu.kernels.raster import RasterParams
    params = RasterParams(width=W, height=H, pair_capacity=1 << 17)
    out = None
    for i in range(N_FRAMES):
        fc = make_fc(cfg, i, prev_vp)
        out = frame_mod.render_frame_jit(host.scene, fc, cfg, params, probe,
                                         env_brdf, history)
        history = out["accumulation"]
        prev_vp = np.asarray(fc.view_proj)
    return np.asarray(out["color"]).astype(np.float32)


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax.numpy as jnp
    from incarnation_tpu.config import Config
    from incarnation_tpu.core.view import View
    from incarnation_tpu.core import mathutils as mu
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.kernels import ibl, sky
    from incarnation_tpu.scene.cache import load_scene_cached, \
        load_probe_cached

    host = load_scene_cached(
        "/root/reference/content/models/damaged-helmet/DamagedHelmet.gltf",
        texture_max_dim=1024)
    base = Config()
    sun = np.asarray(host.scene.sun_dir)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), base.turbidity, 256, 128),
            envmap_size=base.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{base.turbidity}:"
            f"{base.envmap_resolution}")
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128))
    view = View.from_lookat([0.0, 0.3, -3.2], [0.0, 0.0, 0.0], aspect=W / H)
    jitters = np.asarray(mu.halton_jitter_table(16))

    def make_fc(cfg, i, prev_vp):
        j = jitters[i % 16] * 2.0 / np.array([W, H])
        return frame_mod.FrameConstants.make(
            view, cfg, sun_dir=sun, sun_color_intensity=[1., 1., 1., 100.],
            jitter=j, prev_view_proj=prev_vp, history_valid=(i > 0),
            frame_index=i)

    cfgs = dict(
        exact=base.replace(stochastic_mip=False, stochastic_bilinear=False,
                           stochastic_taa=False),
        stoch_tex=base.replace(stochastic_mip=True, stochastic_bilinear=True,
                               stochastic_taa=False),
        stoch_all=base.replace(stochastic_mip=True, stochastic_bilinear=True,
                               stochastic_taa=True),
    )
    imgs = {}
    for name, cfg in cfgs.items():
        imgs[name] = render(cfg, probe, env_brdf, host, make_fc)
        from PIL import Image
        Image.fromarray(imgs[name].astype(np.uint8)).save(
            f"/tmp/stoch_{name}.png")

    ref = imgs["exact"]
    for name in ("stoch_tex", "stoch_all"):
        mse = np.mean((imgs[name] - ref) ** 2)
        psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        print(f"PSNR {name} vs exact after {N_FRAMES} TAA frames: "
              f"{psnr:.2f} dB")


if __name__ == "__main__":
    main()
