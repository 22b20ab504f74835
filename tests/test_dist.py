"""Multi-chip sharding conformance: band-sharded render == single-chip render
(SURVEY.md §4: runs on the virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from incarnation_tpu.config import Config, EnvSkyMode
from incarnation_tpu.core import View
from incarnation_tpu.dist import sharding
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import frame as frame_mod
from scene_util import make_scene

W, H = 128, 64
PARAMS = RasterParams(width=W, height=H, tile_h=8, tile_w=128,
                      pair_capacity=256, bin_max_span=8, big_tri_capacity=16,
                      chunk=8)


def make_test_scene():
    pts = np.array([[-4, -2, 5], [4, -2, 5], [0, 4, 5],
                    [-6, -5, 8], [6, -5, 8], [0, 6, 8]], np.float32)
    return make_scene(pts, [[0, 1, 2], [3, 4, 5]])


def test_band_sharded_matches_single(cpu_devices):
    scene = make_test_scene()
    cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)
    view = View.default(aspect=W / H)
    fc = frame_mod.FrameConstants.make(
        view, cfg, sun_dir=[0, 0, -1.0],
        sun_color_intensity=[1, 1, 1, 100.0])

    single = frame_mod.render_frame_jit(scene, fc, cfg, PARAMS)
    mesh = sharding.make_mesh(devices=cpu_devices[:4])
    sharded = sharding.render_frame_sharded_jit(scene, fc, cfg, PARAMS, mesh)

    np.testing.assert_array_equal(np.asarray(sharded["tri"]),
                                  np.asarray(single["tri"]))
    np.testing.assert_allclose(np.asarray(sharded["depth"]),
                               np.asarray(single["depth"]), atol=1e-6)
    # color allows tiny float divergence from the band projection matmul
    np.testing.assert_allclose(
        np.asarray(sharded["color"]).astype(int),
        np.asarray(single["color"]).astype(int), atol=1)


def test_band_projection_partition():
    # The 4 band projections partition NDC y exactly.
    n = 4
    for i in range(n):
        j = np.asarray(sharding.band_projection(n, jnp.asarray(i)))
        # y_top of band i: 1 - 2i/n maps to +1; y_bottom maps to -1
        y_top = 1.0 - 2.0 * i / n
        y_bot = 1.0 - 2.0 * (i + 1) / n
        assert abs(y_top * j[1, 1] + j[3, 1] - 1.0) < 1e-6
        assert abs(y_bot * j[1, 1] + j[3, 1] + 1.0) < 1e-6


def test_stats_are_psummed(cpu_devices):
    scene = make_test_scene()
    cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)
    fc = frame_mod.FrameConstants.make(View.default(aspect=W / H), cfg)
    mesh = sharding.make_mesh(devices=cpu_devices[:2])
    out = sharding.render_frame_sharded_jit(scene, fc, cfg, PARAMS, mesh)
    assert np.asarray(out["stats"]["culled_triangles"]).shape == ()
