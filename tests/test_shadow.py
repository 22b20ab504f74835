"""Sun shadow map tests (kernels/shadow.py + frame wiring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.config import Config
from incarnation_tpu.core.view import View
from incarnation_tpu.kernels import shadow
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import frame as frame_mod

from scene_util import make_scene


def _floor_blocker_scene():
    """A big floor quad at y=0 with a small blocker quad hovering at y=2."""
    quads = {
        # (y, half-extent)
        "floor": (0.0, 10.0),
        "blocker": (2.0, 1.0),
    }
    positions = []
    tris = []
    for y, e in quads.values():
        b = len(positions)
        positions += [[-e, y, -e], [e, y, -e], [e, y, e], [-e, y, e]]
        tris += [[b, b + 2, b + 1], [b, b + 3, b + 2]]
    normals = np.tile([0.0, 1.0, 0.0], (len(positions), 1))
    return make_scene(np.asarray(positions, np.float32),
                      np.asarray(tris, np.int32),
                      normals=normals.astype(np.float32),
                      double_sided=True)


def test_sun_view_proj_maps_sphere_to_ndc():
    vp = shadow.sun_view_proj([0.0, 1.0, 0.0], [1.0, 2.0, 3.0], 5.0)
    c = np.asarray([1.0, 2.0, 3.0, 1.0]) @ vp
    # center projects to ndc (0, 0) with z mid-range
    assert abs(c[0]) < 1e-4 and abs(c[1]) < 1e-4
    assert 0.0 < c[2] < 1.0
    lo = np.asarray([1.0, -3.0, 3.0, 1.0]) @ vp   # 5 below center
    hi = np.asarray([1.0, 7.0, 3.0, 1.0]) @ vp    # 5 above center
    # reverse-Z: closer to the sun (above) = larger ndc z
    assert hi[2] > lo[2]
    assert -1.01 <= lo[1] <= 1.01


def test_shadow_map_blocker_shadows_floor():
    scene = _floor_blocker_scene()
    sun_dir = np.asarray([0.0, 1.0, 0.0], np.float32)   # straight down
    res = 256
    cfg = Config(raster_tile_h=16)
    sm_params = shadow.shadow_params(res, cfg)
    sun_vp = jnp.asarray(shadow.sun_view_proj(sun_dir, [0, 1, 0], 12.0))
    depth, stats = shadow.render_sun_shadow_map(
        scene, jnp.eye(4), sun_vp, sm_params)
    assert int(stats["bin_overflow"]) == 0

    # world points: one under the blocker, one in the open
    wp = jnp.asarray([[[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]]])
    ndl = jnp.ones((1, 2))
    vis = shadow.sun_visibility(wp, ndl, depth, sun_vp, res)
    vis = np.asarray(vis)
    assert vis[0, 0] == 0.0, "point under blocker must be shadowed"
    assert vis[0, 1] == 1.0, "open point must be lit"


def test_frame_with_shadow_map_darkens_under_blocker():
    scene = _floor_blocker_scene()
    w, h = 256, 128
    cfg = Config(sun_shadow_mode="map", shadow_map_resolution=256,
                 enable_taa=False, env_sky_mode=1, raster_tile_h=16)
    view = View.from_lookat([0.0, 8.0, -9.0], [0.0, 0.0, 0.0],
                            aspect=w / h)
    params = RasterParams(width=w, height=h, tile_h=16,
                          pair_capacity=1 << 12, big_tri_capacity=128)
    fc = frame_mod.FrameConstants.make(
        view, cfg, sun_dir=[0.0, 1.0, 0.0],
        sun_color_intensity=[1.0, 1.0, 1.0, 100.0],
        shadow_bounds=([0.0, 1.0, 0.0], 12.0))
    out = frame_mod.render_frame(scene, fc, config=cfg, params=params)
    hdr = np.asarray(out["hdr"])
    tri = np.asarray(out["tri"])
    depth = np.asarray(out["depth"])

    # gather luminance of floor pixels (exclude the blocker itself):
    # project world points through the camera instead — sample a pixel
    # known to be under the blocker vs far from it.
    def px_of(world):
        c = np.append(np.asarray(world, np.float32), 1.0) \
            @ np.asarray(fc.view_proj)
        x = (c[0] / c[3] * 0.5 + 0.5) * w
        y = (0.5 - c[1] / c[3] * 0.5) * h
        return int(y), int(x)

    # under the blocker's front edge (visible past the blocker silhouette
    # from this camera) vs in the open
    yx_shadow = px_of([0.0, 0.0, -0.9])
    yx_lit = px_of([6.0, 0.0, -0.9])
    assert tri[yx_shadow] >= 0 and tri[yx_lit] >= 0
    lum_shadow = hdr[yx_shadow].sum()
    lum_lit = hdr[yx_lit].sum()
    assert lum_shadow < 0.5 * lum_lit, (lum_shadow, lum_lit)
    del depth

    # mode "off": both points equally lit
    cfg_off = cfg.replace(sun_shadow_mode="off")
    out2 = frame_mod.render_frame(scene, fc, config=cfg_off, params=params)
    hdr2 = np.asarray(out2["hdr"])
    # (view-dependent Fresnel varies across the floor; the point is only
    # that no near-zero shadow term is applied)
    assert hdr2[yx_shadow].sum() > 0.6 * hdr2[yx_lit].sum()


def test_frame_make_requires_bounds_for_map_mode():
    cfg = Config(sun_shadow_mode="map")
    view = View.from_lookat([0, 1, -3], [0, 0, 0])
    with pytest.raises(ValueError):
        frame_mod.FrameConstants.make(view, cfg)
