"""Meshletization: split primitives into small triangle clusters.

The reference builds meshlets (max 64 vertices / 126 triangles,
ref: src/scene.cpp:1545-1551) with a greedy scorer over vertex reuse,
spatial locality and normal coherence (ref: src/mesh-utils.cpp:250-280:
score = reuse/3 + log(maxDistSq/r^2+1)/3 + (1-dot(n,axis))/6, lowest
wins), growing each meshlet along an edge-adjacency frontier
(mesh-utils.cpp:640-835) and bounding it with Ritter's expanding-sphere
pass (mesh-utils.cpp:114-180 "MinimumBoundingSphere").

TPU version implements the same greedy scored growth (host-side, cached
with the scene): triangles are seeded in Morton order for determinism,
then each meshlet grows by repeatedly taking the lowest-scoring
edge-adjacent candidate under the same 64-vertex/126-triangle limits.
Spheres use the same Ritter pass. Meshlets provide fine-grained frustum
culling masks (the reference's batch-culling USING_MESHLETS path) and the
meshlet << 7 | triangle visibility encoding. Since our rasterizer consumes
a flat triangle stream, meshlets remain a CULLING structure — triangles of
culled meshlets are masked out; there is no separate meshlet draw path to
keep divergence off the TPU hot loop.
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


def ritter_sphere(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Ritter expanding-sphere over (N,3) points
    (ref: mesh-utils.cpp:114-180)."""
    pts = points.astype(np.float64)
    # extreme points along the widest axis seed the sphere
    mins = pts.argmin(axis=0)
    maxs = pts.argmax(axis=0)
    spans = ((pts[maxs] - pts[mins]) ** 2).sum(axis=1)
    axis = int(spans.argmax())
    p1, p2 = pts[mins[axis]], pts[maxs[axis]]
    center = 0.5 * (p1 + p2)
    radius = 0.5 * np.sqrt(((p2 - p1) ** 2).sum())
    # grow over out-of-sphere points (sequential like the reference; the
    # sphere state changes each absorption so this cannot vectorize)
    for _ in range(8):  # usually converges in 1-2 passes
        d = np.sqrt(((pts - center) ** 2).sum(axis=1))
        i = int(d.argmax())
        if d[i] <= radius + 1e-9:
            break
        k = 0.5 * (radius / d[i]) + 0.5
        center = center * k + pts[i] * (1.0 - k)
        radius = 0.5 * (radius + d[i])
    return center.astype(np.float32), float(radius)


def _circumsphere(pts: list) -> tuple[np.ndarray, float]:
    """Minimal sphere THROUGH 0-4 boundary points (center in their affine
    hull; least-norm solve handles collinear/coplanar degeneracy)."""
    if not pts:
        return np.zeros(3), 0.0
    p0 = pts[0]
    if len(pts) == 1:
        return p0.copy(), 0.0
    a = np.stack([p - p0 for p in pts[1:]])          # (m, 3)
    b = 0.5 * (a * a).sum(axis=1)
    x, *_ = np.linalg.lstsq(a, b, rcond=None)
    c = p0 + x
    return c, float(np.sqrt(((c - p0) ** 2).sum()))


def welzl_sphere(points: np.ndarray) -> tuple[np.ndarray, float]:
    """EXACT minimum enclosing sphere (Welzl's move-to-front algorithm) —
    strictly no larger than ritter_sphere's, so meshlet/primitive culling
    rejects more (the reference ships the Ritter expanding sphere it calls
    MinimumBoundingSphere, ref: mesh-utils.cpp:114-180; this goes one step
    further). Falls back to Ritter if the recursion degenerates."""
    pts = np.unique(points.astype(np.float64), axis=0)
    rng = np.random.default_rng(12345)
    rng.shuffle(pts)
    eps = 1e-9 * (1.0 + np.abs(pts).max())

    import sys
    sys.setrecursionlimit(max(10000, sys.getrecursionlimit()))

    def mb(n, boundary):
        if n == 0 or len(boundary) == 4:
            return _circumsphere(boundary)
        c, r = mb(n - 1, boundary)
        p = pts[n - 1]
        if ((p - c) ** 2).sum() <= (r + eps) ** 2:
            return c, r
        return mb(n - 1, boundary + [p])

    try:
        c, r = mb(len(pts), [])
        d = np.sqrt(((pts - c) ** 2).sum(axis=1)).max()
        if not np.isfinite(r) or d > r * (1 + 1e-6) + 1e-7:
            raise ValueError("welzl did not cover")
        return c.astype(np.float32), float(max(r, d))
    except (ValueError, RecursionError):
        return ritter_sphere(points)


def _edge_adjacency(tv: np.ndarray, positions: np.ndarray):
    """Triangle adjacency across shared (position-welded) edges.

    Returns (adj_index, adj_list): triangle i's neighbors are
    adj_list[adj_index[i]:adj_index[i+1]] (ref: BuildAdjacencyList,
    mesh-utils.cpp:285-420, which welds by position hash first).
    """
    t = tv.shape[0]
    # weld by exact position bytes (exporters duplicate verts for UV/normal
    # seams; the reference hashes the XMFLOAT3 the same way)
    _, rep = np.unique(positions.view([("", positions.dtype)] * 3),
                       return_inverse=True)
    w = rep[tv]                                   # (T,3) welded ids
    edges = np.stack([
        np.stack([w[:, 0], w[:, 1]], 1),
        np.stack([w[:, 1], w[:, 2]], 1),
        np.stack([w[:, 2], w[:, 0]], 1)], axis=1).reshape(-1, 2)
    edges = np.sort(edges, axis=1)
    tri_of_edge = np.repeat(np.arange(t), 3)
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    e = edges[order]
    tri = tri_of_edge[order]
    same = np.all(e[1:] == e[:-1], axis=1)
    # pair up consecutive same-edge entries (manifold edges pair once; at
    # non-manifold edges every co-incident pair is linked)
    starts = np.flatnonzero(np.r_[True, ~same])
    counts = np.diff(np.r_[starts, e.shape[0]])
    pairs_a, pairs_b = [], []
    multi = np.flatnonzero(counts > 1)
    for g in multi:
        grp = tri[starts[g]:starts[g] + counts[g]]
        for i in range(grp.size):
            for j in range(grp.size):
                if i != j:
                    pairs_a.append(grp[i])
                    pairs_b.append(grp[j])
    if not pairs_a:
        return np.zeros(t + 1, np.int64), np.zeros(0, np.int64)
    a = np.asarray(pairs_a)
    b = np.asarray(pairs_b)
    o = np.argsort(a, kind="stable")
    a, b = a[o], b[o]
    adj_index = np.searchsorted(a, np.arange(t + 1))
    return adj_index, b


def _meshletize_prim(tv: np.ndarray, positions: np.ndarray,
                     seed_order: np.ndarray):
    """Greedy scored meshlet growth within one primitive.

    Returns (order, counts): `order` lists local triangle ids grouped by
    meshlet, `counts` the triangles per meshlet.
    """
    t = tv.shape[0]
    adj_index, adj_list = _edge_adjacency(tv, positions)
    tri_pts = positions[tv]                        # (T,3,3)
    e01 = tri_pts[:, 1] - tri_pts[:, 0]
    e02 = tri_pts[:, 2] - tri_pts[:, 0]
    tri_n = np.cross(e01, e02)
    tri_n /= np.maximum(
        np.linalg.norm(tri_n, axis=1, keepdims=True), 1e-20)

    used = np.zeros(t, bool)
    vert_in = np.zeros(positions.shape[0], bool)  # meshlet vertex set
    order_out = np.empty(t, np.int64)
    counts = []
    out_pos = 0
    seed_ptr = 0

    while out_pos < t:
        # new meshlet seeded from the first unused triangle in Morton order
        while used[seed_order[seed_ptr]]:
            seed_ptr += 1
        seed = seed_order[seed_ptr]
        m_tris = [seed]
        used[seed] = True
        touched = list(tv[seed])
        vert_in[tv[seed]] = True
        n_vert = len(set(touched))
        center, radius = ritter_sphere(tri_pts[seed])
        n_sum = tri_n[seed].copy()
        cand = set()

        def push_neighbors(ti):
            for nb in adj_list[adj_index[ti]:adj_index[ti + 1]]:
                if not used[nb]:
                    cand.add(int(nb))

        push_neighbors(seed)
        while len(m_tris) < MAX_TRIS and cand:
            ca = np.fromiter(cand, np.int64, len(cand))
            verts = tv[ca]                        # (C,3)
            reuse = vert_in[verts].sum(axis=1)
            fits = (n_vert + 3 - reuse) <= MAX_VERTS
            if not fits.any():
                break
            # ref ComputeScore weights: reuse .334, location .333,
            # orientation .333 (mesh-utils.cpp:250-280)
            d2 = ((tri_pts[ca] - center) ** 2).sum(-1).max(-1)
            loc = np.log(d2 / max(radius * radius, 1e-20) + 1.0)
            axis = n_sum / max(float(np.sqrt(n_sum @ n_sum)), 1e-20)
            ori = (1.0 - tri_n[ca] @ axis) * 0.5
            score = 0.334 * (1.0 - reuse / 3.0) + 0.333 * loc + 0.333 * ori
            score = np.where(fits, score, np.inf)
            best = int(ca[score.argmin()])
            cand.discard(best)
            used[best] = True
            m_tris.append(best)
            bv = tv[best]
            n_vert += int(3 - vert_in[bv].sum())
            vert_in[bv] = True
            touched.extend(bv)
            # incremental Ritter absorption of the new corners (the exact
            # sphere is recomputed once per finished meshlet below)
            d3 = np.sqrt(((tri_pts[best] - center) ** 2).sum(-1))
            for j in range(3):
                d = d3[j]
                if d > radius:
                    k = 0.5 * (radius / d) + 0.5
                    center = center * k + tri_pts[best, j] * (1.0 - k)
                    radius = 0.5 * (radius + d)
                    d3 = np.sqrt(((tri_pts[best] - center) ** 2).sum(-1))
            n_sum += tri_n[best]
            push_neighbors(best)

        vert_in[touched] = False
        k = len(m_tris)
        order_out[out_pos:out_pos + k] = m_tris
        counts.append(k)
        out_pos += k

    return order_out, np.asarray(counts, np.int64)


def meshletize(positions: np.ndarray, tri_vtx: np.ndarray,
               tri_prim: np.ndarray, prim_mesh: np.ndarray) -> MeshletTable:
    """Build meshlets per primitive with greedy scored growth."""
    t = tri_vtx.shape[0]
    centroids = positions[tri_vtx].mean(axis=1)
    lo, hi = centroids.min(0), centroids.max(0)
    norm = (centroids - lo) / np.maximum(hi - lo, 1e-12)
    codes = morton3(norm)

    order = np.empty(t, np.int64)
    tri_meshlet = np.zeros(t, np.int64)
    offsets, counts_all, spheres, meshes = [], [], [], []
    out_pos = 0
    m_id = 0
    for prim in np.unique(tri_prim):
        tids = np.flatnonzero(tri_prim == prim)
        tv = tri_vtx[tids]
        seed = np.argsort(codes[tids], kind="stable")
        local_order, counts = _meshletize_prim(tv, positions, seed)
        g_order = tids[local_order]
        k = g_order.size
        order[out_pos:out_pos + k] = g_order
        start = 0
        for c in counts:
            tri_meshlet[out_pos + start:out_pos + start + int(c)] = m_id
            offsets.append(out_pos + start)
            counts_all.append(int(c))
            pts = positions[np.unique(
                tri_vtx[g_order[start:start + int(c)]])]
            c0, r = welzl_sphere(pts)
            spheres.append(np.concatenate([c0, [r]]))
            meshes.append(prim_mesh[prim])
            start += int(c)
            m_id += 1
        out_pos += k

    return MeshletTable(
        tri_order=order.astype(np.int32),
        tri_meshlet=tri_meshlet.astype(np.int32),
        offset=np.asarray(offsets, np.int32),
        count=np.asarray(counts_all, np.int32),
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
