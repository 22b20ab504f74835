"""Golden-image regression + determinism tests (SURVEY §4 strategy)."""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.config import Config, EnvSkyMode
from incarnation_tpu.core import View
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import frame as frame_mod
from incarnation_tpu.utils.imageio import psnr, save_png
from scene_util import make_scene

GOLDEN_DIR = pathlib.Path(__file__).parent / "data"
W, H = 128, 64
PARAMS = RasterParams(width=W, height=H, tile_h=16, tile_w=128,
                      pair_capacity=256, bin_max_span=4, big_tri_capacity=16,
                      chunk=8)


def golden_scene():
    # two overlapping diffuse triangles + a point light + sun
    import dataclasses
    pts = np.array([[-5, -3, 6], [5, -3, 6], [0, 4, 6],
                    [-2, -2, 4], [3, -1, 4.5], [0, 3, 4.2]], np.float32)
    scene = make_scene(pts, [[0, 1, 2], [3, 4, 5]])
    mp = np.array(scene.mat_params)
    mp[0, 7] = 0.0
    mp[0, 8] = 0.4
    return dataclasses.replace(scene, mat_params=jnp.asarray(mp))


def render():
    cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)
    fc = frame_mod.FrameConstants.make(
        View.default(aspect=W / H), cfg, sun_dir=[0.3, 0.5, -1.0],
        sun_color_intensity=[1.0, 0.9, 0.8, 120.0])
    return frame_mod.render_frame_jit(golden_scene(), fc, cfg, PARAMS)


def test_frame_deterministic():
    a = np.asarray(render()["color"])
    b = np.asarray(render()["color"])
    np.testing.assert_array_equal(a, b)


def _gate(out, name):
    """PSNR gate against the checked-in golden (regenerate with
    REGEN_GOLDENS=1 when an intentional rendering change lands)."""
    import os
    golden_path = GOLDEN_DIR / name
    if os.environ.get("REGEN_GOLDENS") == "1" or not golden_path.exists():
        save_png(golden_path, out)
        pytest.skip("golden regenerated")
    from PIL import Image
    golden = np.asarray(Image.open(golden_path).convert("RGB"))
    value = psnr(out / 255.0, golden / 255.0)
    assert value > 45.0, f"PSNR vs {name} dropped to {value:.1f} dB"


def test_golden_image():
    _gate(np.asarray(render()["color"]), "golden_two_tris.png")


def _render_rich(forward: bool):
    """Every raster feature in one image: textured floor, MASK depth
    peels, decal blend, clustered point+spot lights, sun shadow map."""
    from incarnation_tpu.scene.testing import make_rich_scene
    scene = make_rich_scene()
    cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP,
                 sun_shadow_mode="map", enable_taa=False,
                 forward_lighting=forward, masked_depth_peels=2)
    fc = frame_mod.FrameConstants.make(
        View.from_lookat([0.0, 3.0, -6.0], [0.0, 0.5, 6.0], aspect=W / H),
        cfg, sun_dir=[0.3, 0.8, -0.4],
        sun_color_intensity=[1.0, 0.95, 0.9, 100.0],
        shadow_bounds=(np.zeros(3, np.float32), 18.0))
    params = RasterParams(width=W, height=H, tile_h=16, tile_w=128,
                          pair_capacity=1024, bin_max_span=8,
                          big_tri_capacity=32, chunk=8)
    out = frame_mod.render_frame_jit(scene, fc, cfg, params)
    assert int(out["stats"]["decal_overflow"]) == 0
    return np.asarray(out["color"])


def test_golden_rich_deferred():
    _gate(_render_rich(forward=False), "golden_rich_deferred.png")


def test_golden_rich_forward():
    _gate(_render_rich(forward=True), "golden_rich_forward.png")
