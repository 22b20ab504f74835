"""Debug draw / picking / decal tests."""

import dataclasses
import numpy as np
import jax.numpy as jnp

from incarnation_tpu.config import Config, EnvSkyMode
from incarnation_tpu.core import View
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import debugdraw, frame as frame_mod
from scene_util import make_scene

W, H = 128, 64
PARAMS = RasterParams(width=W, height=H, tile_h=16, tile_w=128,
                      pair_capacity=256, bin_max_span=4, big_tri_capacity=16,
                      chunk=8)
CFG = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)


def render(scene):
    fc = frame_mod.FrameConstants.make(
        View.default(aspect=W / H), CFG, sun_dir=[0, 0, -1.0],
        sun_color_intensity=[1, 1, 1, 100.0])
    return fc, frame_mod.render_frame_jit(scene, fc, CFG, PARAMS)


def tri_scene():
    pts = np.array([[-4, -2, 5], [4, -2, 5], [0, 4, 5]], np.float32)
    return make_scene(pts, [[0, 1, 2]])


def test_draw_lines_depth_tested():
    scene = tri_scene()
    fc, out = render(scene)
    # A line BEHIND the triangle must be hidden at covered pixels,
    # a line in front must be visible.
    seg_behind = np.array([[[-3, 0, 7], [3, 0, 7]]], np.float32)
    seg_front = np.array([[[-3, 1.2, 3], [3, 1.2, 3]]], np.float32)
    col = np.array([[1.0, 0.0, 1.0]])
    img0 = np.asarray(out["color"])
    img_b = np.asarray(debugdraw.draw_lines(
        out["color"], out["depth"], seg_behind, col, fc.view_proj))
    img_f = np.asarray(debugdraw.draw_lines(
        out["color"], out["depth"], seg_front, col, fc.view_proj))
    magenta = (img_f[..., 0] > 200) & (img_f[..., 2] > 200) \
        & (img_f[..., 1] < 60)
    assert magenta.any()                       # front line drawn
    # behind line hidden where the triangle covers the center row
    center = np.asarray(out["tri"])[H // 2 + 6] >= 0  # row of seg_behind
    changed = (img_b != img0).any(-1)
    assert not (changed[H // 2 + 6] & center).any()


def test_pick_and_highlight():
    scene = tri_scene()
    fc, out = render(scene)
    tri_map = np.asarray(out["tri"])
    prim, local, meshlet = frame_mod.pick(scene, tri_map, W // 2, H // 2)
    assert (prim, local, meshlet) == (0, 0, 0)
    assert frame_mod.pick(scene, tri_map, 2, 2) == (-1, -1, -1)
    hi = np.asarray(frame_mod.highlight(out["color"], out["tri"], scene, 0))
    assert hi[H // 2, W // 2].sum() > np.asarray(
        out["color"])[H // 2, W // 2].sum()


def test_decal_pass_blends():
    # Base quad + a decal quad slightly in front with red base color.
    pts = np.array([
        [-6, -4, 5], [6, -4, 5], [6, 4, 5], [-6, 4, 5],
        [-2, -1, 4.99], [2, -1, 4.99], [2, 1, 4.99], [-2, 1, 4.99],
    ], np.float32)
    scene = make_scene(pts, [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]],
                       tri_prim=np.array([0, 0, 1, 1], np.int32),
                       num_prims=2,
                       prim_tri_offset=np.array([0, 2], np.int32))
    mp = np.array(scene.mat_params)
    mp[:, 7] = 0.0  # diffuse
    scene = dataclasses.replace(
        scene,
        prim_is_decal=jnp.asarray(np.array([0, 1], np.int32)),
        prim_mesh=jnp.zeros(2, jnp.int32),
        mat_params=jnp.asarray(mp),
        meta=dataclasses.replace(scene.meta, has_decals=True))
    fc, out = render(scene)
    gb = out["gbuffer"]
    # decal region carries blended base color; decal prims excluded from the
    # main visibility buffer
    tri_map = np.asarray(out["tri"])
    assert (np.asarray(scene.tri_prim)[tri_map[tri_map >= 0]] == 0).all()
    assert bool(gb.mask[H // 2, W // 2])


# ---------------------------------------------------------------------------
# Wireframe primitive shapes + command queue
# (ref: renderer.cpp:724-1346 FDebugDraw, debug-primitives.gltf)
# ---------------------------------------------------------------------------

def test_primitive_edges_shapes():
    for shape in range(debugdraw.DebugShape.COUNT):
        segs = debugdraw.primitive_edges(shape)
        assert segs.ndim == 3 and segs.shape[1:] == (2, 3)
        # unit-sized: all vertices within the unit-ish bounding box
        assert np.abs(segs).max() <= 1.0 + 1e-5
    # sphere/icosphere vertices lie on the unit sphere
    for shape in (debugdraw.DebugShape.ICOSPHERE, debugdraw.DebugShape.SPHERE):
        segs = debugdraw.primitive_edges(shape)
        r = np.linalg.norm(segs.reshape(-1, 3), axis=-1)
        np.testing.assert_allclose(r, 1.0, atol=1e-5)


def test_primitive_edges_transform():
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] *= 2.0
    t[3, :3] = [10, 0, 0]
    segs = debugdraw.primitive_edges(debugdraw.DebugShape.CUBE, t)
    assert np.abs(segs[..., 0] - 10).max() <= 2 + 1e-5
    assert np.abs(segs[..., 1]).max() <= 2 + 1e-5


def test_debugdraw_queue_flush():
    scene = tri_scene()
    fc, out = render(scene)
    dd = debugdraw.DebugDraw()
    t = np.eye(4, dtype=np.float32)
    t[3, :3] = [0, 0, 5]   # at the triangle's depth, size 1 around center
    dd.draw_primitive(debugdraw.DebugShape.CUBE, [1.0, 0.0, 1.0], t)
    img0 = np.asarray(out["color"])
    img1 = np.asarray(dd.flush(out["color"], out["depth"], fc.view_proj))
    # magenta pixels appeared
    magenta = (img1[..., 0] > 200) & (img1[..., 2] > 200) & (img1[..., 1] < 60)
    assert magenta.sum() > 10
    assert not np.array_equal(img0, img1)
    # queue cleared: second flush is a no-op
    img2 = np.asarray(dd.flush(jnp.asarray(img1), out["depth"], fc.view_proj))
    np.testing.assert_array_equal(img1, img2)


def test_debugdraw_persistent():
    scene = tri_scene()
    fc, out = render(scene)
    dd = debugdraw.DebugDraw()
    t = np.eye(4, dtype=np.float32)
    t[3, :3] = [0, 0, 4.5]
    dd.draw_primitive(debugdraw.DebugShape.SPHERE, [0, 1.0, 0], t,
                      persistent=True)
    img1 = np.asarray(dd.flush(out["color"], out["depth"], fc.view_proj))
    img2 = np.asarray(dd.flush(out["color"], out["depth"], fc.view_proj))
    np.testing.assert_array_equal(img1, img2)
    assert not np.array_equal(img1, np.asarray(out["color"]))


def test_device_appended_draws():
    """Shader-appended debug draws (ref: debug-drawing/common.hlsli:33-95):
    the frame's own cull/light-cluster results append wireframe rows to
    the device-side buffer and the expanded splat lands in the image."""
    import jax.numpy as jnp
    from incarnation_tpu.config import Config, EnvSkyMode
    from incarnation_tpu.core.view import View
    from incarnation_tpu.kernels import ibl
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.scene.testing import make_rich_scene

    w, h = 256, 128
    scene = make_rich_scene()
    cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP,
                 sun_shadow_mode="off", raster_tile_h=8,
                 show_light_bounds=True, show_object_bounds=True)
    fc = frame_mod.FrameConstants.make(
        View.default(aspect=w / h), cfg, sun_dir=[0, 1.0, -0.2],
        sun_color_intensity=[1, 1, 1, 100.0])
    probe = ibl.build_probe(jnp.full((8, 16, 3), 0.5), envmap_size=8,
                            num_samples=16)
    brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(16))
    params = RasterParams(width=w, height=h, tile_h=8, tile_w=128,
                          pair_capacity=512, bin_max_span=8,
                          big_tri_capacity=16, chunk=8)
    base = frame_mod.render_frame_jit(
        scene, fc, cfg.replace(show_light_bounds=False,
                               show_object_bounds=False), params, probe,
        brdf)
    out = frame_mod.render_frame_jit(scene, fc, cfg, params, probe, brdf)
    # appended: rich scene's visible prims + its 2 punctual lights
    assert int(out["stats"]["debug_draws"]) >= 3
    diff = (np.asarray(out["color"]).astype(int)
            - np.asarray(base["color"]).astype(int))
    assert (np.abs(diff).sum(-1) > 0).sum() > 50   # wireframes visible
    # the light spheres draw green-dominant pixels somewhere
    ch = np.asarray(out["color"])[np.abs(diff).sum(-1) > 0]
    assert (ch[:, 1].astype(int) > ch[:, 0].astype(int) + 40).any()
