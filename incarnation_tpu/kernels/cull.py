"""Frustum culling: per-primitive bounding-sphere vs view frustum.

The reference's BatchCulling compute pass tests Gribb-Hartmann planes in
object space and appends surviving draws with atomics
(ref: shaders/culling/batch-culling.hlsl:25-52, 85-116). TPU-native version:
one vectorized world-space sphere-vs-planes test produces a boolean primitive
mask consumed by triangle setup (dense masked execution instead of indirect
draws, SURVEY.md §2.4); the culled count feeds render stats like the
reference's FRenderStats.m_culledPrimitives (ref: batch-culling.hlsl:118-122).
"""

from __future__ import annotations

import jax.numpy as jnp


def frustum_planes(view_proj):
    """Six frustum planes from a row-vector view-proj matrix
    (Gribb-Hartmann). Returns (6, 4): dot([p, 1], plane) >= 0 <=> inside.
    Reverse-Z infinite-far: the far plane (z <= w) is kept for generality.
    """
    m = view_proj
    planes = jnp.stack([
        m[:, 3] + m[:, 0],   # left:   x >= -w
        m[:, 3] - m[:, 0],   # right:  x <= w
        m[:, 3] + m[:, 1],   # bottom: y >= -w
        m[:, 3] - m[:, 1],   # top:    y <= w
        m[:, 2],             # near:   z >= 0
        m[:, 3] - m[:, 2],   # far:    z <= w
    ])
    return planes


def cull_primitives(prim_bsphere, prim_mesh, mesh_transforms, mesh_visible,
                    scene_rotation, view_proj):
    """-> (visible mask (P,), culled count ()). Spheres are object-space
    center+radius (ref: FGpuPrimitive.m_boundingSphere); radius scales by the
    largest world-axis scale like the reference's
    GetLargestScaleFactor (ref: batch-culling.inl)."""
    world = jnp.einsum("mij,jk->mik", mesh_transforms, scene_rotation)
    xf = world[prim_mesh]                                   # (P, 4, 4)
    center = (jnp.einsum("pi,pij->pj",
                         jnp.concatenate([prim_bsphere[:, :3],
                                          jnp.ones_like(prim_bsphere[:, :1])],
                                         axis=-1), xf))[:, :3]
    scale = jnp.max(jnp.linalg.norm(xf[:, :3, :3], axis=-1), axis=-1)
    radius = prim_bsphere[:, 3] * scale

    planes = frustum_planes(view_proj)                      # (6, 4)
    norm = jnp.linalg.norm(planes[:, :3], axis=-1)
    planes = planes / jnp.maximum(norm, 1e-12)[:, None]
    d = (center @ planes[:, :3].T + planes[None, :, 3])     # (P, 6)
    inside = jnp.all(d > -radius[:, None], axis=-1)
    inside &= mesh_visible[prim_mesh] > 0
    culled = jnp.sum(~inside)
    return inside, culled
