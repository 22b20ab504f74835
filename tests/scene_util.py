"""Build tiny synthetic Scenes for kernel tests (no glTF needed)."""

import numpy as np
import jax.numpy as jnp

from incarnation_tpu.scene.loader import Scene, SceneMeta
from incarnation_tpu.scene import materials as materials_mod
from incarnation_tpu.scene import lights as lights_mod
from incarnation_tpu.scene import textures as textures_mod


def make_scene(positions, tris, normals=None, uvs=None, tangents=None,
               double_sided=False, transform=None, atlas=None,
               materials=None, lights=None, tri_prim=None, num_prims=1,
               prim_tri_offset=None):
    """positions (V,3), tris (T,3) -> minimal single-primitive Scene."""
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
    if atlas is None:
        atlas = textures_mod.build_atlas([], [])
    if materials is None:
        class _G:  # minimal glTF stand-in for the default material
            materials = [{}]
        materials = materials_mod.build_material_table(_G)
    if lights is None:
        lights = lights_mod.build_light_table([], [])

    p = num_prims
    meta = SceneMeta(num_vertices=v, num_triangles=t, num_primitives=p,
                     num_meshes=1, padded_vertices=v, padded_triangles=t,
                     padded_primitives=p)
    counts = np.bincount(tri_prim, minlength=p).astype(np.int32)
    return Scene(
        positions=jnp.asarray(positions),
        normals=jnp.asarray(np.asarray(normals, np.float32)),
        tangents=jnp.asarray(np.asarray(tangents, np.float32)),
        uvs=jnp.asarray(np.asarray(uvs, np.float32)),
        tri_vtx=jnp.asarray(tris),
        tri_prim=jnp.asarray(tri_prim),
        vtx_mesh=jnp.zeros((v,), jnp.int32),
        prim_mesh=jnp.zeros((p,), jnp.int32),
        prim_material=jnp.zeros((p,), jnp.int32),
        prim_tri_offset=jnp.asarray(prim_tri_offset),
        prim_tri_count=jnp.asarray(counts),
        prim_bsphere=jnp.asarray(
            np.tile([0, 0, 0, 1e6], (p, 1)).astype(np.float32)),
        prim_double_sided=jnp.full((p,), int(double_sided), jnp.int32),
        prim_is_decal=jnp.zeros((p,), jnp.int32),
        prim_alpha_mode=jnp.zeros((p,), jnp.int32),
        mesh_transforms=jnp.asarray(transform[None]),
        mesh_visible=jnp.ones((1,), jnp.int32),
        materials=materials,
        atlas=atlas,
        lights=lights,
        sun_dir=jnp.asarray(lights_mod.DEFAULT_SUN_DIR),
        meta=meta,
    )
