"""Tangent generation for primitives with a normal map but no TANGENT.

The reference runs MikkTSpace (ref: src/mesh-utils.cpp:560-638,
MeshUtils::FixupMeshes). Here we use the standard Lengyel per-triangle
accumulation with Gram-Schmidt orthogonalization — not bit-exact MikkTSpace,
but equivalent for the smooth, welded meshes in the content set (the only
asset lacking tangents, transmission-test, has no normal maps at all).
"""

from __future__ import annotations

import numpy as np


def generate_tangents(positions: np.ndarray, normals: np.ndarray,
                      uvs: np.ndarray, tri_indices: np.ndarray) -> np.ndarray:
    """positions/normals (V,3), uvs (V,2), tri_indices (T,3) -> (V,4)
    tangent xyz + handedness w."""
    v = positions.shape[0]
    tan = np.zeros((v, 3), np.float64)
    bitan = np.zeros((v, 3), np.float64)

    i0, i1, i2 = tri_indices[:, 0], tri_indices[:, 1], tri_indices[:, 2]
    e1 = positions[i1] - positions[i0]
    e2 = positions[i2] - positions[i0]
    duv1 = uvs[i1] - uvs[i0]
    duv2 = uvs[i2] - uvs[i0]
    det = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
    r = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    t = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * r[:, None]
    b = (e2 * duv1[:, 0:1] - e1 * duv2[:, 0:1]) * r[:, None]

    for idx in (i0, i1, i2):
        np.add.at(tan, idx, t)
        np.add.at(bitan, idx, b)

    n = normals.astype(np.float64)
    # Gram-Schmidt orthogonalize against the vertex normal
    t_ortho = tan - n * np.sum(n * tan, axis=-1, keepdims=True)
    lens = np.linalg.norm(t_ortho, axis=-1, keepdims=True)
    fallback = _any_perpendicular(n)
    t_unit = np.where(lens > 1e-8, t_ortho / np.maximum(lens, 1e-20),
                      fallback)
    w = np.where(np.sum(np.cross(n, t_unit) * bitan, axis=-1) < 0.0,
                 -1.0, 1.0)
    return np.concatenate(
        [t_unit, w[:, None]], axis=-1).astype(np.float32)


def _any_perpendicular(n: np.ndarray) -> np.ndarray:
    """A unit vector perpendicular to each normal (degenerate-UV fallback)."""
    a = np.where(np.abs(n[:, 0:1]) < 0.9,
                 np.array([[1.0, 0.0, 0.0]]), np.array([[0.0, 1.0, 0.0]]))
    p = np.cross(n, a)
    return p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-20)
