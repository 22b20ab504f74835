"""Scene replication: tile a packed scene into a grid of instances.

Used to build Sponza-scale benchmark scenes (the reference's Sponza geometry
is an unfetched LFS pointer in this checkout) and to exercise multi-mesh
transform paths. Equivalent to loading a glTF whose nodes reference the same
mesh k times (ref: src/scene.cpp LoadNode handles shared meshes the same way).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .loader import Scene, SceneMeta


def replicate_scene(scene: Scene, offsets: np.ndarray) -> Scene:
    """offsets: (k, 3) world-space translations; instance 0 keeps the
    original transform, each instance i gets transform @ translate(o_i)."""
    k = offsets.shape[0]
    m = scene.meta
    v, t, p = m.padded_vertices, m.padded_triangles, m.padded_primitives
    nm = scene.mesh_transforms.shape[0]

    def rep(a, stride=0):
        host = np.asarray(a)
        out = np.concatenate(
            [host + i * stride for i in range(k)], axis=0)
        return jnp.asarray(out)

    xf = np.asarray(scene.mesh_transforms)
    xfs = []
    for i in range(k):
        tr = np.eye(4, dtype=np.float32)
        tr[3, :3] = offsets[i]
        xfs.append(np.einsum("mij,jk->mik", xf, tr))
    tri_prim = np.asarray(scene.tri_prim)
    tri_prim_rep = np.concatenate(
        [np.where(tri_prim >= 0, tri_prim + i * p, -1) for i in range(k)])

    meta = SceneMeta(
        num_vertices=k * v, num_triangles=k * t, num_primitives=k * p,
        num_meshes=k * nm, padded_vertices=k * v, padded_triangles=k * t,
        padded_primitives=k * p, has_decals=m.has_decals,
        num_lights=m.num_lights, has_masked=m.has_masked,
        has_extras=m.has_extras, has_blend=m.has_blend)
    return dataclasses.replace(
        scene,
        positions=rep(scene.positions),
        normals=rep(scene.normals),
        tangents=rep(scene.tangents),
        uvs=rep(scene.uvs),
        tri_vtx=rep(scene.tri_vtx, stride=v),
        tri_prim=jnp.asarray(tri_prim_rep),
        vtx_mesh=rep(scene.vtx_mesh, stride=nm),
        tri_corner=jnp.asarray(np.concatenate(
            [np.asarray(scene.tri_corner)] * k, axis=1)),
        tri_mesh=rep(scene.tri_mesh, stride=nm),
        prim_mesh=rep(scene.prim_mesh, stride=nm),
        prim_material=rep(scene.prim_material),
        prim_tri_offset=rep(scene.prim_tri_offset, stride=t),
        prim_tri_count=rep(scene.prim_tri_count),
        prim_bsphere=rep(scene.prim_bsphere),
        tri_meshlet=jnp.asarray(np.concatenate(
            [np.where(np.asarray(scene.tri_meshlet) >= 0,
                      np.asarray(scene.tri_meshlet)
                      + i * scene.meshlet_bsphere.shape[0], -1)
             for i in range(k)])),
        meshlet_bsphere=rep(scene.meshlet_bsphere),
        meshlet_mesh=rep(scene.meshlet_mesh, stride=nm),
        meshlet_prim=rep(scene.meshlet_prim, stride=p),
        prim_double_sided=rep(scene.prim_double_sided),
        prim_is_decal=rep(scene.prim_is_decal),
        prim_alpha_mode=rep(scene.prim_alpha_mode),
        mesh_transforms=jnp.asarray(np.concatenate(xfs, axis=0)),
        mesh_visible=rep(scene.mesh_visible),
        meta=meta,
    )


def grid_offsets(nx: int, nz: int, spacing: float) -> np.ndarray:
    xs = (np.arange(nx) - (nx - 1) / 2.0) * spacing
    zs = (np.arange(nz) - (nz - 1) / 2.0) * spacing
    g = np.stack(np.meshgrid(xs, zs, indexing="ij"), axis=-1).reshape(-1, 2)
    return np.stack([g[:, 0], np.zeros(len(g)), g[:, 1]],
                    axis=-1).astype(np.float32)
