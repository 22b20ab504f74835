"""Synthetic scene construction for tests, dry runs, and examples."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .loader import Scene, SceneMeta
from . import loader as loader_mod
from . import materials as materials_mod
from . import lights as lights_mod
from . import textures as textures_mod


def neutral_material_stack(n_materials: int = 1
                           ) -> textures_mod.MaterialTextureStack:
    """A 1x1 all-neutral texel per material (white base, flat normal)."""
    flat = np.tile(textures_mod._NEUTRAL_TEXEL[None], (n_materials, 1))
    meta = np.stack([
        np.arange(n_materials, dtype=np.int32),          # base
        np.ones(n_materials, np.int32),                  # size
        np.ones(n_materials, np.int32),                  # levels
        np.zeros(n_materials, np.int32),                 # address (wrap)
    ], axis=-1)
    return textures_mod.make_material_stack(flat, meta)


def checkerboard_alpha_stack(size: int = 4
                             ) -> textures_mod.MaterialTextureStack:
    """One material whose base-color texture is white with a checkerboard
    alpha (single mip) — for alpha-mask/cutout tests."""
    ys, xs = np.mgrid[0:size, 0:size]
    a = (((xs + ys) % 2) * 255).astype(np.uint32)
    w0 = (np.uint32(0x00FFFFFF) | (a << np.uint32(24)))
    rows = np.stack([
        w0,
        np.full_like(w0, 0xFFFF8080),
        np.full_like(w0, 0xFFFFFFFF),
        np.full_like(w0, 0x00FFFFFF),
    ], axis=-1).reshape(-1, 4)
    meta = np.asarray([[0, size, 1, textures_mod.ADDRESS_CLAMP]], np.int32)
    return textures_mod.make_material_stack(rows.astype(np.uint32), meta)


def two_material_stack(size: int = 4) -> textures_mod.MaterialTextureStack:
    """Material 0: neutral 1x1; material 1: white base with checkerboard
    alpha (size x size) — a real multi-material stack for frame tests."""
    flat0 = textures_mod._NEUTRAL_TEXEL[None]
    ys, xs = np.mgrid[0:size, 0:size]
    a = (((xs + ys) % 2) * 255).astype(np.uint32)
    w0 = (np.uint32(0x00FFFFFF) | (a << np.uint32(24)))
    rows1 = np.stack([
        w0,
        np.full_like(w0, 0xFFFF8080),
        np.full_like(w0, 0xFFFFFFFF),
        np.full_like(w0, 0x00FFFFFF),
    ], axis=-1).reshape(-1, 4)
    flat = np.concatenate([flat0, rows1]).astype(np.uint32)
    meta = np.asarray([
        [0, 1, 1, textures_mod.ADDRESS_WRAP],
        [1, size, 1, textures_mod.ADDRESS_CLAMP],
    ], np.int32)
    return textures_mod.make_material_stack(flat, meta)


def make_rich_scene():
    """A small scene exercising every frame path under one roof: textured
    opaque floor + MASK cutout quad (depth peels + any-hit alpha) + decal
    quad + two punctual lights (clustered) + a floating blocker (shadows).
    Used by the multi-chip dry run and the band-sharded full-frame test
    (VERDICT r2 item 4: the sharded frame must cover the gather-heavy
    paths, not a 2-triangle scene)."""
    import dataclasses
    quads = [
        # (origin, du, dv) — floor, masked screen, high blocker, decal
        ([-8, -2, 0], [16, 0, 0], [0, 0, 16]),
        ([-3, -2, 6], [6, 0, 0], [0, 6, 0]),
        ([-2, 3.5, 7], [4, 0, 0], [0, 0, 4]),
        ([1, -1.98, 4], [3, 0, 0], [0, 0, 3]),
    ]
    pos, uv, tris = [], [], []
    for (o, du, dv) in quads:
        b = len(pos)
        o, du, dv = (np.asarray(x, np.float32) for x in (o, du, dv))
        pos += [o, o + du, o + du + dv, o + dv]
        uv += [[0, 0], [2, 0], [2, 2], [0, 2]]
        tris += [[b, b + 2, b + 1], [b, b + 3, b + 2]]
    class _G:
        materials = [{}, {"alphaMode": "MASK", "alphaCutoff": 0.5}]
    mats = materials_mod.build_material_table(_G)
    lights = lights_mod.build_light_table(
        [{"type": "point", "color": [1.0, 0.5, 0.2], "intensity": 30.0,
          "range": 10.0},
         {"type": "spot", "color": [0.2, 0.5, 1.0], "intensity": 50.0,
          "spot": {"innerConeAngle": 0.3, "outerConeAngle": 0.7}}],
        [np.asarray([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
                     [0, 2, 4, 1]], np.float32),
         np.asarray([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0],
                     [-2, 4, 8, 1]], np.float32)])
    scene = make_scene(pos, tris, double_sided=True, materials=mats,
                       lights=lights,
                       uvs=np.asarray(uv, np.float32),
                       tri_prim=[0, 0, 1, 1, 2, 2, 3, 3], num_prims=4,
                       prim_tri_offset=[0, 2, 4, 6],
                       prim_alpha_mode=[0, 1, 0, 0],
                       prim_material=[0, 1, 0, 1],
                       mat_stack=two_material_stack())
    # fourth prim is a decal projected onto the floor (gbuffer decal pass)
    scene = dataclasses.replace(
        scene,
        prim_is_decal=jnp.asarray(np.asarray([0, 0, 0, 1], np.int32)),
        meta=dataclasses.replace(scene.meta, has_decals=True))
    return scene


def default_material_table() -> materials_mod.MaterialTable:
    class _G:
        materials = [{}]
    return materials_mod.build_material_table(_G)


def make_scene(positions, tris, normals=None, uvs=None, tangents=None,
               double_sided=False, transform=None, materials=None,
               lights=None, tri_prim=None, num_prims=1,
               prim_tri_offset=None, prim_alpha_mode=None,
               prim_material=None, mat_stack=None) -> Scene:
    """positions (V,3), tris (T,3) -> minimal Scene with neutral materials."""
    positions = np.asarray(positions, np.float32)
    tris = np.asarray(tris, np.int32)
    v, t = positions.shape[0], tris.shape[0]
    if normals is None:
        normals = np.tile([0, 0, -1.0], (v, 1)).astype(np.float32)
    if uvs is None:
        uvs = np.zeros((v, 2), np.float32)
    if tangents is None:
        tangents = np.tile([1, 0, 0, 1.0], (v, 1)).astype(np.float32)
    if transform is None:
        transform = np.eye(4, dtype=np.float32)
    if tri_prim is None:
        tri_prim = np.zeros((t,), np.int32)
    if prim_tri_offset is None:
        prim_tri_offset = np.zeros((num_prims,), np.int32)
    if materials is None:
        materials = default_material_table()
    if lights is None:
        lights = lights_mod.build_light_table([], [])

    p = num_prims
    if prim_alpha_mode is None:
        prim_alpha_mode = np.zeros((p,), np.int32)
    prim_alpha_mode = np.asarray(prim_alpha_mode, np.int32)
    meta = SceneMeta(num_vertices=v, num_triangles=t, num_primitives=p,
                     num_meshes=1, padded_vertices=v, padded_triangles=t,
                     padded_primitives=p,
                     num_lights=int(lights.count),
                     has_masked=bool((prim_alpha_mode > 0).any()),
                     has_blend=bool((prim_alpha_mode >= 2).any()),
                     has_extras=bool(
                         float(np.max(np.asarray(
                             materials.transmission_factor))) > 0.0
                         or float(np.max(np.asarray(
                             materials.clearcoat_factor))) > 0.0))
    counts = np.bincount(np.asarray(tri_prim), minlength=p).astype(np.int32)
    return Scene(
        positions=jnp.asarray(positions),
        normals=jnp.asarray(np.asarray(normals, np.float32)),
        tangents=jnp.asarray(np.asarray(tangents, np.float32)),
        uvs=jnp.asarray(np.asarray(uvs, np.float32)),
        tri_vtx=jnp.asarray(tris),
        tri_prim=jnp.asarray(np.asarray(tri_prim, np.int32)),
        vtx_mesh=jnp.zeros((v,), jnp.int32),
        tri_corner=jnp.asarray(loader_mod.triangle_corner_table(  # (36, T)
            positions, normals, tangents, uvs, tris)),
        tri_mesh=jnp.zeros((t,), jnp.int32),
        prim_mesh=jnp.zeros((p,), jnp.int32),
        prim_material=jnp.asarray(
            np.zeros((p,), np.int32) if prim_material is None
            else np.asarray(prim_material, np.int32)),
        prim_tri_offset=jnp.asarray(np.asarray(prim_tri_offset, np.int32)),
        prim_tri_count=jnp.asarray(counts),
        prim_bsphere=jnp.asarray(
            np.tile([0, 0, 0, 1e6], (p, 1)).astype(np.float32)),
        prim_double_sided=jnp.full((p,), int(double_sided), jnp.int32),
        prim_is_decal=jnp.zeros((p,), jnp.int32),
        prim_alpha_mode=jnp.asarray(prim_alpha_mode),
        # One meshlet per primitive (meshlets never span primitives — the
        # raster prep's fused visibility gather relies on that invariant).
        tri_meshlet=jnp.asarray(np.asarray(tri_prim, np.int32)),
        meshlet_bsphere=jnp.asarray(
            np.tile([0, 0, 0, 1e6], (p, 1)).astype(np.float32)),
        meshlet_mesh=jnp.zeros((p,), jnp.int32),
        meshlet_prim=jnp.asarray(np.arange(p, dtype=np.int32)),
        mesh_transforms=jnp.asarray(np.asarray(transform, np.float32)[None]),
        mesh_visible=jnp.ones((1,), jnp.int32),
        materials=materials,
        mat_params=materials_mod.pack_material_params(materials),
        mat_stack=(mat_stack if mat_stack is not None
                   else neutral_material_stack(
                       int(np.asarray(materials.metallic_factor).shape[0]))),
        lights=lights,
        sun_dir=jnp.asarray(lights_mod.DEFAULT_SUN_DIR),
        meta=meta,
    )
