"""Meshletization: split primitives into small triangle clusters.

The reference builds meshlets (max 64 vertices / 126 triangles,
ref: src/scene.cpp:1545-1551) with a greedy scorer over vertex reuse,
spatial locality and normal coherence (ref: src/mesh-utils.cpp:250-280,
640-835), packs triangle indices 8-bit x3 (ref: mesh-utils.h:8-14), and
culls/draws at meshlet granularity.

TPU version: triangles are ordered by Morton code of their centroids
(spatial locality; the dominant term of the reference's score) and packed
greedily under the same 64-vertex/126-triangle limits. Meshlets provide
fine-grained frustum culling masks (the reference's batch-culling
USING_MESHLETS path) and the meshlet << 7 | triangle visibility encoding.
Since our rasterizer consumes a flat triangle stream, meshlets remain a
CULLING structure — triangles of culled meshlets are masked out; there is no
separate meshlet draw path to keep divergence off the TPU hot loop.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..kernels.bvh import morton3

MAX_VERTS = 64    # ref: scene.cpp:1545
MAX_TRIS = 126    # ref: scene.cpp:1546


@dataclasses.dataclass
class MeshletTable:
    """Host-side meshlet info merged into the Scene as arrays."""
    tri_order: np.ndarray       # (T,) permutation of global triangles
    tri_meshlet: np.ndarray     # (T,) meshlet id per (reordered) triangle
    offset: np.ndarray          # (M,) first triangle (in reordered stream)
    count: np.ndarray           # (M,) triangle count
    bsphere: np.ndarray         # (M, 4) object-space center + radius
    mesh: np.ndarray            # (M,) mesh-instance index


def meshletize(positions: np.ndarray, tri_vtx: np.ndarray,
               tri_prim: np.ndarray, prim_mesh: np.ndarray) -> MeshletTable:
    """Build meshlets per primitive over Morton-ordered triangles."""
    t = tri_vtx.shape[0]
    centroids = positions[tri_vtx].mean(axis=1)
    lo, hi = centroids.min(0), centroids.max(0)
    norm = (centroids - lo) / np.maximum(hi - lo, 1e-12)
    codes = morton3(norm)

    # global order: by (primitive, morton)
    order = np.lexsort((codes, tri_prim))
    tv_s = tri_vtx[order]
    prim_s = tri_prim[order]

    tri_meshlet = np.zeros(t, np.int64)
    offsets, counts, spheres, meshes = [], [], [], []

    start = 0
    m_id = 0
    while start < t:
        prim = prim_s[start]
        # candidate block bounded by MAX_TRIS and primitive end
        end_prim = start + np.searchsorted(
            prim_s[start:start + MAX_TRIS + 1], prim, side="right")
        hi_cut = min(start + MAX_TRIS, end_prim)
        block = tv_s[start:hi_cut]
        # shrink until unique vertex count fits
        cut = hi_cut - start
        while cut > 1:
            if np.unique(block[:cut]).size <= MAX_VERTS:
                break
            cut = max(1, int(cut * 0.7))
        end = start + cut
        tri_meshlet[start:end] = m_id
        offsets.append(start)
        counts.append(cut)
        pts = positions[np.unique(tv_s[start:end])]
        c = 0.5 * (pts.min(0) + pts.max(0))
        r = float(np.linalg.norm(pts - c, axis=1).max())
        spheres.append(np.concatenate([c, [r]]))
        meshes.append(prim_mesh[prim])
        start = end
        m_id += 1

    return MeshletTable(
        tri_order=order.astype(np.int32),
        tri_meshlet=tri_meshlet.astype(np.int32),
        offset=np.asarray(offsets, np.int32),
        count=np.asarray(counts, np.int32),
        bsphere=np.asarray(spheres, np.float32),
        mesh=np.asarray(meshes, np.int32))


def encode_meshlet_visibility_table(table: MeshletTable) -> np.ndarray:
    """Per (reordered) triangle: meshlet << 7 | local_tri
    (ref: shaders/geo-raster/encoding.hlsli:19-22)."""
    local = np.arange(table.tri_meshlet.shape[0]) - \
        table.offset[table.tri_meshlet]
    assert local.max() < (1 << 7)
    return ((table.tri_meshlet.astype(np.int64) << 7) | local) \
        .astype(np.int32)
