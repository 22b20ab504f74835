"""LBVH: linear bounding-volume hierarchy build + ray traversal.

The reference gets BLAS/TLAS acceleration structures from the D3D12 driver
and traverses with RayQuery / DXR (ref: src/scene.cpp:672-848,
lighting/common.hlsli:96-116, raytracing/pathtracing.hlsl). On TPU we build
our own (SURVEY.md §2.4): a Karras-2012 LBVH over 30-bit Morton codes built
vectorized in numpy at scene load (static geometry — the reference's
per-frame TLAS rebuild handles scene rotation, which we instead apply by
inverse-rotating rays), flattened into gather-friendly node rows:

  node row (16 f32): [left_child, right_child (bitcast int; negative =
  ~leaf_triangle), left AABB min/max (6), right AABB min/max (6), pad]

so traversal costs ONE row gather per step. Traversal is a vectorized
lax.while_loop over ray batches with a short per-ray stack (closest-hit and
any-hit/shadow variants).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Build (numpy, at load)
# ---------------------------------------------------------------------------

def _expand_bits(v: np.ndarray) -> np.ndarray:
    v = (v * np.uint64(0x00010001)) & np.uint64(0xFF0000FF)
    v = (v * np.uint64(0x00000101)) & np.uint64(0x0F00F00F)
    v = (v * np.uint64(0x00000011)) & np.uint64(0xC30C30C3)
    v = (v * np.uint64(0x00000005)) & np.uint64(0x49249249)
    return v


def morton3(p01: np.ndarray) -> np.ndarray:
    """(N, 3) points in [0,1] -> 30-bit Morton codes (N,) uint32."""
    q = np.clip(p01 * 1024.0, 0, 1023).astype(np.uint64)
    return (( _expand_bits(q[:, 0]) << np.uint64(2))
            | (_expand_bits(q[:, 1]) << np.uint64(1))
            | _expand_bits(q[:, 2])).astype(np.uint32)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values."""
    bl = np.zeros(x.shape, np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        has = (v >> np.uint64(shift)) != 0
        bl = np.where(has, bl + shift, bl)
        v = np.where(has, v >> np.uint64(shift), v)
    return bl + (v != 0)


def _common_prefix(codes64: np.ndarray, i: np.ndarray, j: np.ndarray,
                   n: int) -> np.ndarray:
    """delta(i, j) with index-augmented codes; -1 outside [0, n)."""
    valid = (j >= 0) & (j < n)
    jj = np.clip(j, 0, n - 1)
    x = codes64[i] ^ codes64[jj]
    return np.where(valid, 64 - _bit_length_u64(x), -1)


def build_lbvh(tri_verts: np.ndarray):
    """tri_verts: (T, 3, 3) world-space triangles ->
    (nodes (2T-1, 16) f32 flattened rows, root index int).

    Karras 2012 radix-tree construction, vectorized.
    """
    t = tri_verts.shape[0]
    if t == 1:
        # Degenerate: single pseudo-internal node pointing at the leaf twice.
        lo = tri_verts[0].min(0)
        hi = tri_verts[0].max(0)
        row = np.zeros((1, 16), np.float32)
        row[0, 0] = np.frombuffer(np.int32(~0).tobytes(),
                                  np.float32)[0]
        row[0, 1] = row[0, 0]
        row[0, 2:5] = lo
        row[0, 5:8] = hi
        row[0, 8:11] = lo
        row[0, 11:14] = hi
        return row, 0

    centroids = tri_verts.mean(axis=1)
    lo = centroids.min(0)
    hi = centroids.max(0)
    norm = (centroids - lo) / np.maximum(hi - lo, 1e-12)
    codes = morton3(norm)
    order = np.argsort(codes, kind="stable").astype(np.int64)
    codes_s = codes[order]
    # index-augmented 64-bit codes make all keys unique
    codes64 = (codes_s.astype(np.uint64) << np.uint64(32)) \
        | np.arange(t, dtype=np.uint64)

    i = np.arange(t - 1, dtype=np.int64)
    d = np.sign(_common_prefix(codes64, i, i + 1, t)
                - _common_prefix(codes64, i, i - 1, t)).astype(np.int64)
    d = np.where(d == 0, 1, d)
    delta_min = _common_prefix(codes64, i, i - d, t)

    # find upper bound for range length by doubling
    lmax = np.full(t - 1, 2, np.int64)
    while True:
        probe = _common_prefix(codes64, i, i + lmax * d, t) > delta_min
        if not probe.any():
            break
        lmax = np.where(probe, lmax * 2, lmax)
        if lmax.max() > 2 * t:
            break

    # binary search the exact other end j
    l = np.zeros(t - 1, np.int64)
    step = lmax // 2
    while step.max() > 0:
        cand = l + step
        ok = _common_prefix(codes64, i, i + cand * d, t) > delta_min
        l = np.where(ok, cand, l)
        step = step // 2
    j = i + l * d
    delta_node = _common_prefix(codes64, i, j, t)

    # binary search split position
    s = np.zeros(t - 1, np.int64)
    div = 2
    step = -(-l // div)  # ceil(l / 2)
    while True:
        cand = s + step
        ok = _common_prefix(codes64, i, i + cand * d, t) > delta_node
        s = np.where((step > 0) & ok, cand, s)
        if (step <= 1).all():
            break
        div *= 2
        step = -(-l // div)
    gamma = i + s * d + np.minimum(d, 0)

    left_is_leaf = np.minimum(i, j) == gamma
    right_is_leaf = np.maximum(i, j) == gamma + 1
    left = np.where(left_is_leaf, ~gamma, gamma)            # ~x < 0 => leaf
    right = np.where(right_is_leaf, ~(gamma + 1), gamma + 1)

    # Bottom-up AABBs: leaf boxes known; iterate until all internals ready.
    tri_lo = tri_verts.min(axis=1)[order]
    tri_hi = tri_verts.max(axis=1)[order]
    n_int = t - 1
    node_lo = np.full((n_int, 3), np.inf, np.float32)
    node_hi = np.full((n_int, 3), -np.inf, np.float32)
    ready = np.zeros(n_int, bool)

    def child_box(c):
        is_leaf = c < 0
        leaf_idx = np.where(is_leaf, ~c, 0)
        int_idx = np.where(is_leaf, 0, c)
        lo_ = np.where(is_leaf[:, None], tri_lo[leaf_idx], node_lo[int_idx])
        hi_ = np.where(is_leaf[:, None], tri_hi[leaf_idx], node_hi[int_idx])
        ok = is_leaf | ready[int_idx]
        return lo_, hi_, ok

    for _ in range(64):
        if ready.all():
            break
        llo, lhi, lok = child_box(left)
        rlo, rhi, rok = child_box(right)
        new_ready = lok & rok & ~ready
        node_lo = np.where(new_ready[:, None], np.minimum(llo, rlo), node_lo)
        node_hi = np.where(new_ready[:, None], np.maximum(lhi, rhi), node_hi)
        ready |= new_ready

    # Flatten rows: children point at internal nodes; leaves carry the
    # ORIGINAL (pre-sort) triangle index.
    leaf_map = order  # sorted leaf position -> original triangle id
    def encode_child(c):
        is_leaf = c < 0
        leaf_orig = leaf_map[np.where(is_leaf, ~c, 0)]
        return np.where(is_leaf, ~leaf_orig, c).astype(np.int32)

    llo, lhi, _ = child_box(left)
    rlo, rhi, _ = child_box(right)
    rows = np.zeros((n_int, 16), np.float32)
    rows[:, 0] = encode_child(left).view(np.float32)
    rows[:, 1] = encode_child(right).view(np.float32)
    rows[:, 2:5] = llo
    rows[:, 5:8] = lhi
    rows[:, 8:11] = rlo
    rows[:, 11:14] = rhi
    return rows, 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneBVH:
    nodes: jnp.ndarray       # (T-1, 16) f32 rows (see module docstring)
    tri_rows: jnp.ndarray    # (T, 12) f32: v0 (3), e1 (3), e2 (3), pad
    double_sided: jnp.ndarray  # (T,) f32 (cull back faces when 0 —
    #                             ref: RAY_FLAG_CULL_BACK_FACING_TRIANGLES)


def build_scene_bvh(scene) -> SceneBVH:
    """World-space LBVH over the packed scene's real triangles."""
    m = scene.meta
    pos = np.asarray(scene.positions)
    xf = np.asarray(scene.mesh_transforms)
    vm = np.asarray(scene.vtx_mesh)
    world = np.einsum("vi,vij->vj",
                      np.concatenate([pos, np.ones_like(pos[:, :1])], -1),
                      xf[vm])[:, :3]
    tv = np.asarray(scene.tri_vtx)[:m.num_triangles]
    tris = world[tv]                                     # (T, 3, 3)
    nodes, _ = build_lbvh(tris)
    v0 = tris[:, 0]
    rows = np.concatenate([v0, tris[:, 1] - v0, tris[:, 2] - v0,
                           np.zeros((tris.shape[0], 3), np.float32)], -1)
    prim = np.asarray(scene.tri_prim)[:m.num_triangles]
    ds = np.asarray(scene.prim_double_sided)[np.maximum(prim, 0)]
    return SceneBVH(nodes=jnp.asarray(nodes),
                    tri_rows=jnp.asarray(rows.astype(np.float32)),
                    double_sided=jnp.asarray(ds.astype(np.float32)))


# ---------------------------------------------------------------------------
# Traversal (traced; vectorized over rays)
# ---------------------------------------------------------------------------

_STACK = 48


def _slab_test(o, inv_d, lo, hi, tmax):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    tnear = jnp.maximum(jnp.max(tn, axis=-1), 0.0)
    tfar = jnp.minimum(jnp.min(tf, axis=-1), tmax)
    return tnear <= tfar, tnear


def _tri_intersect(tri_row, o, d, cull_backface):
    """Moller-Trumbore. tri_row (..., 12). Returns (t or inf, u, v)."""
    v0 = tri_row[..., 0:3]
    e1 = tri_row[..., 3:6]
    e2 = tri_row[..., 6:9]
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    # front faces have det < 0 in LH with our winding; cull positive dets
    # when backface culling is on (matches the reference's
    # RAY_FLAG_CULL_BACK_FACING_TRIANGLES behavior)
    ok = jnp.where(cull_backface, det < -1e-12, jnp.abs(det) > 1e-12)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    tv = o - v0
    u = jnp.sum(tv * p, axis=-1) * inv
    q = jnp.cross(tv, e1)
    v = jnp.sum(d * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    ok &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    return jnp.where(ok, t, jnp.inf), u, v


def trace(bvh: SceneBVH, origins, directions, tmin=0.0, tmax=1e30,
          any_hit: bool = False, max_steps: int = 256):
    """Trace rays against the BVH.

    origins/directions: (R, 3). Returns dict(t (R,), tri (R,) i32 [-1 miss],
    u, v). For any_hit=True, traversal stops at the first accepted hit
    (shadow rays, ref: lighting/common.hlsli:96-116).
    """
    r = origins.shape[0]
    o = origins + directions * tmin
    inv_d = 1.0 / jnp.where(jnp.abs(directions) > 1e-12, directions,
                            jnp.where(directions >= 0, 1e-12, -1e-12))

    nodes = bvh.nodes
    tri_rows = bvh.tri_rows

    def body(state):
        cur, sp, stack, t_best, best_tri, uo, vo, alive = state
        is_leaf = cur < 0

        # --- leaf: intersect one triangle -------------------------------
        tri = jnp.where(is_leaf, ~cur, 0)
        trow = tri_rows[tri]
        cull = bvh.double_sided[tri] < 0.5
        t_hit, u, v = _tri_intersect(trow, o, directions, cull)
        accept = is_leaf & alive & (t_hit < t_best - 0.0) \
            & (t_hit <= tmax - tmin)
        t_best = jnp.where(accept, t_hit, t_best)
        best_tri = jnp.where(accept, tri, best_tri)
        uo = jnp.where(accept, u, uo)
        vo = jnp.where(accept, v, vo)
        if any_hit:
            alive = alive & ~accept

        # --- internal: test children ------------------------------------
        node = jnp.where(is_leaf, 0, cur)
        row = nodes[node]                          # (R, 16) one gather
        cl = jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
        cr = jax.lax.bitcast_convert_type(row[:, 1], jnp.int32)
        t_prune = jnp.minimum(t_best, tmax - tmin)
        lhit, lt = _slab_test(o, inv_d, row[:, 2:5], row[:, 5:8], t_prune)
        rhit, rt = _slab_test(o, inv_d, row[:, 8:11], row[:, 11:14], t_prune)
        lhit &= ~is_leaf
        rhit &= ~is_leaf

        l_first = lt <= rt
        near = jnp.where(lhit & (~rhit | l_first), cl,
                         jnp.where(rhit, cr, 0))
        far = jnp.where(lhit & rhit, jnp.where(l_first, cr, cl), 0)
        both = lhit & rhit
        any_child = lhit | rhit

        # Stack ops as one-hot selects over the (R, STACK) array — XLA
        # scatter/gather with per-row dynamic indices is an order of
        # magnitude slower on TPU than these dense masked ops.
        lanes = jax.lax.broadcasted_iota(jnp.int32, (r, _STACK), 1)
        push = both & alive
        push_oh = lanes == jnp.where(push, sp, -1)[:, None]
        stack = jnp.where(push_oh, far[:, None], stack)
        sp = jnp.where(push, jnp.minimum(sp + 1, _STACK), sp)

        # next node: descend or pop
        descend = any_child & ~is_leaf
        need_pop = (is_leaf | ~any_child)
        can_pop = sp > 0
        sp2 = jnp.where(need_pop & can_pop & alive, sp - 1, sp)
        pop_oh = lanes == sp2[:, None]
        popped = jnp.sum(jnp.where(pop_oh, stack, 0), axis=1)
        cur2 = jnp.where(~alive, cur,
                         jnp.where(descend, near,
                                   jnp.where(can_pop, popped, cur)))
        alive = alive & (descend | can_pop)
        return cur2, sp2, stack, t_best, best_tri, uo, vo, alive

    def cond(state):
        return state[7].any()

    init = (jnp.zeros((r,), jnp.int32),             # cur = root
            jnp.zeros((r,), jnp.int32),             # sp
            jnp.zeros((r, _STACK), jnp.int32),
            jnp.full((r,), jnp.inf),
            jnp.full((r,), -1, jnp.int32),
            jnp.zeros((r,)), jnp.zeros((r,)),
            jnp.ones((r,), bool))
    state = jax.lax.while_loop(cond, body, init)
    _, _, _, t_best, best_tri, u, v, _ = state
    t_out = jnp.where(best_tri >= 0, t_best + tmin, jnp.inf)
    return dict(t=t_out, tri=best_tri, u=u, v=v)


def trace_collect(bvh: SceneBVH, origins, directions, tmin=0.0, tmax=1e30,
                  max_candidates: int = 32):
    """Two-phase traversal: the while-loop only COLLECTS candidate leaf
    triangles (one node gather per step — gathers inside device loops run an
    order of magnitude slower than free-standing ones on this backend), then
    all candidates are intersected in one vectorized pass outside the loop.

    Returns dict(hit (R,) bool, t (R,), tri (R,) i32) for the closest
    accepted candidate; conservative — candidate overflow (beyond
    max_candidates) falls back to counting the overflowing ray as hit only
    if one of its collected candidates hits.
    """
    r = origins.shape[0]
    o = origins + directions * tmin
    inv_d = 1.0 / jnp.where(jnp.abs(directions) > 1e-12, directions,
                            jnp.where(directions >= 0, 1e-12, -1e-12))
    nodes = bvh.nodes
    mc = max_candidates

    def body(state):
        cur, sp, stack, cand, n_cand, alive = state
        is_leaf = cur < 0
        # record leaf candidate (one-hot write)
        cl_lanes = jax.lax.broadcasted_iota(jnp.int32, (r, mc), 1)
        rec = is_leaf & alive & (n_cand < mc)
        cand = jnp.where(
            cl_lanes == jnp.where(rec, n_cand, -1)[:, None],
            jnp.where(is_leaf, ~cur, 0)[:, None], cand)
        n_cand = jnp.where(rec, n_cand + 1, n_cand)

        node = jnp.where(is_leaf, 0, cur)
        row = nodes[node]
        cl = jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
        cr = jax.lax.bitcast_convert_type(row[:, 1], jnp.int32)
        t_pr = tmax - tmin
        lhit, lt = _slab_test(o, inv_d, row[:, 2:5], row[:, 5:8], t_pr)
        rhit, rt = _slab_test(o, inv_d, row[:, 8:11], row[:, 11:14], t_pr)
        lhit &= ~is_leaf
        rhit &= ~is_leaf
        l_first = lt <= rt
        near = jnp.where(lhit & (~rhit | l_first), cl,
                         jnp.where(rhit, cr, 0))
        far = jnp.where(lhit & rhit, jnp.where(l_first, cr, cl), 0)
        both = lhit & rhit
        any_child = lhit | rhit

        lanes = jax.lax.broadcasted_iota(jnp.int32, (r, _STACK), 1)
        push = both & alive
        stack = jnp.where(lanes == jnp.where(push, sp, -1)[:, None],
                          far[:, None], stack)
        sp = jnp.where(push, jnp.minimum(sp + 1, _STACK), sp)
        descend = any_child & ~is_leaf
        need_pop = is_leaf | ~any_child
        can_pop = sp > 0
        sp2 = jnp.where(need_pop & can_pop & alive, sp - 1, sp)
        popped = jnp.sum(jnp.where(lanes == sp2[:, None], stack, 0), axis=1)
        cur2 = jnp.where(~alive, cur,
                         jnp.where(descend, near,
                                   jnp.where(can_pop, popped, cur)))
        alive = alive & (descend | can_pop)
        return cur2, sp2, stack, cand, n_cand, alive

    init = (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), jnp.int32),
            jnp.zeros((r, _STACK), jnp.int32),
            jnp.zeros((r, mc), jnp.int32),
            jnp.zeros((r,), jnp.int32),
            jnp.ones((r,), bool))
    _, _, _, cand, n_cand, _ = jax.lax.while_loop(
        lambda s: s[5].any(), body, init)

    # Intersect all candidates outside the loop (fast gathers).
    slot = jax.lax.broadcasted_iota(jnp.int32, (r, mc), 1)
    valid = slot < n_cand[:, None]
    tri = jnp.where(valid, cand, 0)
    trow = bvh.tri_rows[tri]                       # (R, mc, 12)
    cull = bvh.double_sided[tri] < 0.5
    t_hit, _, _ = _tri_intersect(trow, o[:, None, :], directions[:, None, :],
                                 cull)
    t_hit = jnp.where(valid & (t_hit <= tmax - tmin), t_hit, jnp.inf)
    t_best = jnp.min(t_hit, axis=1)
    best_slot = jnp.argmin(t_hit, axis=1)
    best_tri = jnp.take_along_axis(cand, best_slot[:, None], axis=1)[:, 0]
    hit = jnp.isfinite(t_best)
    return dict(hit=hit, t=jnp.where(hit, t_best + tmin, jnp.inf),
                tri=jnp.where(hit, best_tri, -1))


def occluded(bvh: SceneBVH, origins, directions, tmin=0.1, tmax=1000.0):
    """Boolean shadow query (ref: lighting/common.hlsli:98-116: TMin 0.1,
    TMax 1000, backface culling)."""
    return trace_collect(bvh, origins, directions, tmin=tmin,
                         tmax=tmax)["hit"]
