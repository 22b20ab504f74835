"""End-to-end frame rendering tests (tiny resolution, CPU interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.config import Config, EnvSkyMode, ViewMode
from incarnation_tpu.core import View, mathutils as mu
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import frame as frame_mod
from scene_util import make_scene

W, H = 128, 64
PARAMS = RasterParams(width=W, height=H, tile_h=16, tile_w=128,
                      pair_capacity=256, bin_max_span=4, big_tri_capacity=16,
                      chunk=8)


def tri_scene():
    pts = np.array([[-4, -2, 5], [4, -2, 5], [0, 4, 5]], np.float32)
    return make_scene(pts, [[0, 1, 2]])


def no_sky(cfg):
    return cfg.replace(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)


def render(cfg, scene=None, sun=(1.0, 1.0, 1.0, 100.0)):
    cfg = no_sky(cfg)
    scene = scene or tri_scene()
    view = View.default(aspect=W / H)
    fc = frame_mod.FrameConstants.make(
        view, cfg, sun_dir=[0, 0, -1.0], sun_color_intensity=sun)
    return frame_mod.render_frame_jit(scene, fc, cfg, PARAMS)


def test_lit_triangle():
    out = render(Config())
    color = np.asarray(out["color"])
    cy, cx = H // 2, W // 2
    # center lit (normal faces camera, sun from camera side)
    assert color[cy, cx].sum() > 30
    # background black
    assert color[2, 2].sum() == 0
    assert np.isfinite(np.asarray(out["hdr"])).all()


def test_direct_lighting_toggle():
    lit = np.asarray(render(Config())["color"]).astype(int)
    unlit = np.asarray(
        render(Config(enable_direct_lighting=False))["color"]).astype(int)
    assert lit.sum() > unlit.sum()
    assert unlit.sum() == 0  # no emissive, no sky yet


def test_viewmodes_run():
    for vm in [ViewMode.BASE_COLOR, ViewMode.OBJECT_IDS,
               ViewMode.TRIANGLE_IDS, ViewMode.NORMALMAP,
               ViewMode.NAN_CHECK]:
        out = render(Config(viewmode=vm))
        assert out["color"].shape == (H, W, 3)


def test_object_ids_nonblack():
    out = render(Config(viewmode=ViewMode.OBJECT_IDS))
    color = np.asarray(out["color"])
    assert color[H // 2, W // 2].sum() > 0


def test_world_position_reconstruction():
    out = render(Config())
    gb = out["gbuffer"]
    wp = np.asarray(gb.world_pos)[H // 2, W // 2]
    # the triangle lies in the z=5 plane
    np.testing.assert_allclose(wp[2], 5.0, atol=1e-3)


def test_rt_shadow_occlusion():
    # Occluder quad between sun and a receiver: receiver pixels behind the
    # occluder darken when a BVH enables shadow rays.
    from incarnation_tpu.kernels import bvh as bvh_mod
    pts = np.array([
        [-8, -6, 8], [8, -6, 8], [8, 6, 8], [-8, 6, 8],       # receiver
        [-2, -1.5, 4], [2, -1.5, 4], [2, 1.5, 4], [-2, 1.5, 4],  # occluder
    ], np.float32)
    # double-sided: shadow rays hit the occluder from behind, and backface
    # culling would skip one-sided geometry (matching the reference's
    # RAY_FLAG_CULL_BACK_FACING_TRIANGLES)
    scene = make_scene(pts, [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]],
                       double_sided=True)
    # diffuse material (the glTF default is metallic=1 -> nearly black)
    import dataclasses, jax.numpy as jnp
    mp = np.array(scene.mat_params)
    mp[:, 7] = 0.0   # metallic factor
    mp[:, 8] = 0.6   # roughness factor
    scene = dataclasses.replace(scene, mat_params=jnp.asarray(mp))
    b = bvh_mod.build_scene_bvh(scene)
    cfg = no_sky(Config(frustum_culling=False))
    view = View.default(aspect=W / H)
    # Slightly tilted sun so the shadow band lands on visible receiver pixels
    fc = frame_mod.FrameConstants.make(
        view, cfg, sun_dir=np.array([0.3, 0.3, -1.0]) / np.linalg.norm(
            [0.3, 0.3, -1.0]),
        sun_color_intensity=[1, 1, 1, 100.0])
    shadowed = np.asarray(frame_mod.render_frame_jit(
        scene, fc, cfg, PARAMS, None, None, None, b)["hdr"])
    unshadowed = np.asarray(frame_mod.render_frame_jit(
        scene, fc, cfg, PARAMS)["hdr"])
    # identical except strictly darker where rays are blocked
    diff = unshadowed.sum(-1) - shadowed.sum(-1)
    assert (diff >= -1e-4).all()
    assert (diff > 1e-3).sum() > 20     # a real shadow band exists
    # the frontmost occluder surface itself stays lit
    np.testing.assert_allclose(shadowed[H // 2, W // 2],
                               unshadowed[H // 2, W // 2], rtol=1e-5)


def test_hbao_runs_and_bounds():
    from incarnation_tpu.kernels import bvh as bvh_mod
    pts = np.array([[-6, -4, 5], [6, -4, 5], [6, 4, 5], [-6, 4, 5]],
                   np.float32)
    scene = make_scene(pts, [[0, 1, 2], [0, 2, 3]])
    b = bvh_mod.build_scene_bvh(scene)
    cfg = no_sky(Config(enable_hbao=True, use_bent_normals=True))
    fc = frame_mod.FrameConstants.make(View.default(aspect=W / H), cfg)
    out = frame_mod.render_frame_jit(scene, fc, cfg, PARAMS, None, None,
                                     None, b)
    assert np.isfinite(np.asarray(out["hdr"])).all()


def test_stochastic_mip_runs():
    cfg = no_sky(Config(stochastic_mip=True))
    out = render(cfg)
    assert np.isfinite(np.asarray(out["hdr"])).all()


def test_scene_rotation_consistency():
    """Full-system rotation invariance: rotating scene + camera + sun by the
    same rotation yields the identical image. Exercises the inverse-rotated
    ray path into the unrotated BVH (the reference instead rebuilds the TLAS
    with the scene rotation, update-tlas.inl)."""
    import dataclasses
    import jax.numpy as jnp
    from incarnation_tpu.kernels import bvh as bvh_mod
    pts = np.array([
        [-8, -6, 8], [8, -6, 8], [8, 6, 8], [-8, 6, 8],
        [-2, -1.5, 4], [2, -1.5, 4], [2, 1.5, 4], [-2, 1.5, 4],
    ], np.float32)
    scene = make_scene(pts, [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]],
                       double_sided=True)
    mp = np.array(scene.mat_params)
    mp[:, 7] = 0.0
    scene = dataclasses.replace(scene, mat_params=jnp.asarray(mp))
    b = bvh_mod.build_scene_bvh(scene)
    cfg = no_sky(Config(frustum_culling=False))
    sun = np.array([0.3, 0.3, -1.0]) / np.linalg.norm([0.3, 0.3, -1.0])

    view0 = View.default(aspect=W / H)
    fc0 = frame_mod.FrameConstants.make(
        view0, cfg, sun_dir=sun, sun_color_intensity=[1, 1, 1, 100.0])
    base = np.asarray(frame_mod.render_frame_jit(
        scene, fc0, cfg, PARAMS, None, None, None, b)["hdr"])
    assert (base.sum(-1) > 1e-3).any()

    # rotate EVERYTHING by 180 deg about y
    rot = np.diag([-1.0, 1.0, -1.0, 1.0]).astype(np.float32)
    r3 = rot[:3, :3]
    view1 = View(position=view0.position @ r3, right=view0.right @ r3,
                 up=view0.up, look=view0.look @ r3, fov=view0.fov,
                 aspect=view0.aspect, near=view0.near)
    fc1 = frame_mod.FrameConstants.make(
        view1, cfg, sun_dir=sun @ r3, sun_color_intensity=[1, 1, 1, 100.0],
        scene_rotation=rot)
    rotated = np.asarray(frame_mod.render_frame_jit(
        scene, fc1, cfg, PARAMS, None, None, None, b)["hdr"])

    np.testing.assert_allclose(rotated, base, atol=5e-3 * base.max(),
                               rtol=1e-3)


# ---------------------------------------------------------------------------
# Forward rendering path (ref: geo-raster/forward-pass.hlsl,
# render-jobs/forward-pass.inl, toggled in ui.cpp:346)
# ---------------------------------------------------------------------------

def test_forward_matches_deferred_opaque():
    """Config(forward_lighting=True) must produce a frame within ~1 dB of
    deferred on an opaque scene — the only intended difference is skipping
    the octahedral normal round trip (exact in f32 away from seams)."""
    d = np.asarray(render(Config())["color"]).astype(np.float64)
    f = np.asarray(
        render(Config(forward_lighting=True))["color"]).astype(np.float64)
    mse = np.mean((d - f) ** 2)
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 45.0, f"forward vs deferred PSNR {psnr:.1f} dB"


def _two_quad_blend_scene(front_alpha):
    """Opaque green quad at z=8 behind a BLEND red quad at z=5."""
    from incarnation_tpu.scene import materials as materials_mod

    class _G:
        materials = [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.0, 1.0, 0.0, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 1.0}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [1.0, 0.0, 0.0, front_alpha],
                "metallicFactor": 0.0, "roughnessFactor": 1.0},
             "alphaMode": "BLEND"},
        ]

    mats = materials_mod.build_material_table(_G)
    pts = np.array([
        [-12, -9, 8], [12, -9, 8], [12, 9, 8], [-12, 9, 8],   # back (green)
        [-3, -2, 5], [3, -2, 5], [3, 2, 5], [-3, 2, 5],       # front (red)
    ], np.float32)
    tris = [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]]
    return make_scene(pts, tris, materials=mats,
                      tri_prim=[0, 0, 1, 1], num_prims=2,
                      prim_tri_offset=[0, 2], prim_material=[0, 1],
                      prim_alpha_mode=[0, 2])


def test_forward_blend_compositing():
    """Forward alpha-composites BLEND layers: a half-transparent red quad
    over a green background mixes both; at alpha=1 the red quad wins."""
    out = render(Config(forward_lighting=True),
                 scene=_two_quad_blend_scene(0.5))
    hdr = np.asarray(out["hdr"])
    cy, cx = H // 2, W // 2
    r, g = hdr[cy, cx, 0], hdr[cy, cx, 1]
    assert r > 0 and g > 0, f"expected composited r+g, got {hdr[cy, cx]}"
    # directional sun, same normal/material shape -> contributions are the
    # 0.5/0.5 mix of the two surfaces' (equal-brightness) responses
    np.testing.assert_allclose(r, g, rtol=0.05)

    solid = render(Config(forward_lighting=True),
                   scene=_two_quad_blend_scene(1.0))
    hdr1 = np.asarray(solid["hdr"])
    # alpha=1: the red quad fully hides the green one; residual green is
    # only the white dielectric specular lobe (F0 = 0.04)
    assert hdr1[cy, cx, 0] > 0
    assert hdr1[cy, cx, 1] < 0.05 * hdr1[cy, cx, 0]


def test_bent_normals_viewmode():
    out = render(Config(viewmode=ViewMode.BENT_NORMALS))
    color = np.asarray(out["color"])
    cy, cx = H // 2, W // 2
    # geometric normal (0, 0, -1) -> 0.5, 0.5, 0 without HBAO
    assert abs(int(color[cy, cx, 0]) - 128) <= 1
    assert color[cy, cx, 2] == 0
    assert color[2, 2].sum() == 0  # background


def test_reflections_viewmode_with_probe():
    from incarnation_tpu.kernels import ibl
    # constant blue-ish latlong -> reflections show it everywhere on geo
    latlong = np.tile(np.asarray([0.1, 0.2, 0.9], np.float32),
                      (16, 32, 1))
    probe = ibl.build_probe(jnp.asarray(latlong), envmap_size=16)
    # sky_brightness sized so refl * EV13 exposure (~1e-4) lands mid-range
    cfg = no_sky(Config(viewmode=ViewMode.REFLECTIONS, sky_brightness=3000.0))
    scene = tri_scene()
    view = View.default(aspect=W / H)
    fc = frame_mod.FrameConstants.make(
        view, cfg, sun_dir=[0, 0, -1.0],
        sun_color_intensity=(1.0, 1.0, 1.0, 100.0))
    env_brdf = ibl.env_brdf_lut(16)
    out = frame_mod.render_frame_jit(scene, fc, cfg, PARAMS, probe=probe,
                                     env_brdf=env_brdf)
    color = np.asarray(out["color"])
    c = color[H // 2, W // 2].astype(int)
    assert c[2] > c[0] > 0, f"reflection should be blue-dominant, got {c}"


def test_multi_material_mixed_stack_sizes():
    """Two primitives with different materials whose texture stacks have
    DIFFERENT power-of-two sizes: each prim must resolve its own base color
    through the interleaved per-material stack (catches regressions in the
    per-meshlet material row and per-material stack addressing)."""
    import dataclasses
    from incarnation_tpu.scene import textures as textures_mod

    # material 0: 1x1 red base; material 1: 4x4 green base (with mips)
    def solid_rows(rgb, size):
        levels = []
        s = size
        base = np.uint32(0xFF000000 | (rgb[2] << 16) | (rgb[1] << 8) | rgb[0])
        while s >= 1:
            w0 = np.full((s * s,), base, np.uint32)
            levels.append(np.stack([
                w0, np.full_like(w0, 0xFFFF8080),
                np.full_like(w0, 0xFFFFFFFF),
                np.full_like(w0, 0x00FFFFFF)], axis=-1))
            if s == 1:
                break
            s //= 2
        return np.concatenate(levels, axis=0)

    r0 = solid_rows((255, 0, 0), 1)        # 1 row
    r1 = solid_rows((0, 255, 0), 4)        # 16+4+1 rows
    flat = np.concatenate([r0, r1], axis=0)
    meta = np.asarray([[0, 1, 1, 0], [1, 4, 3, 0]], np.int32)
    stack = textures_mod.make_material_stack(flat.astype(np.uint32), meta)

    pts = np.array([[-5, -3, 6], [0, -3, 6], [-2.5, 3, 6],
                    [0.5, -3, 6], [5, -3, 6], [3, 3, 6]], np.float32)
    scene = make_scene(pts, [[0, 1, 2], [3, 4, 5]],
                       tri_prim=np.asarray([0, 1], np.int32), num_prims=2,
                       prim_tri_offset=np.asarray([0, 1], np.int32),
                       prim_material=np.asarray([0, 1], np.int32),
                       mat_stack=stack)
    # two materials required in the params/table too
    from incarnation_tpu.scene import materials as materials_mod

    class _G:
        materials = [{}, {}]
    mats = materials_mod.build_material_table(_G)
    scene = dataclasses.replace(
        scene, materials=mats,
        mat_params=materials_mod.pack_material_params(mats))

    cfg = no_sky(Config(viewmode=ViewMode.BASE_COLOR))
    fc = frame_mod.FrameConstants.make(View.default(aspect=W / H), cfg)
    out = frame_mod.render_frame_jit(scene, fc, cfg, PARAMS)
    color = np.asarray(out["color"])
    tri = np.asarray(out["tri"])
    assert (tri == 0).any() and (tri == 1).any()
    left = color[tri == 0].astype(int).mean(axis=0)
    right = color[tri == 1].astype(int).mean(axis=0)
    assert left[0] > 150 and left[1] < 80, f"prim 0 should be red: {left}"
    assert right[1] > 150 and right[0] < 80, f"prim 1 should be green: {right}"
