"""LBVH: linear bounding-volume hierarchy build + threaded ray traversal.

The reference gets BLAS/TLAS acceleration structures from the D3D12 driver
and traverses with RayQuery / DXR (ref: src/scene.cpp:672-848,
lighting/common.hlsli:96-116, raytracing/pathtracing.hlsl). On TPU we build
our own (SURVEY.md §2.4): a Karras-2012 LBVH over 30-bit Morton codes built
vectorized in numpy at scene load (static geometry — the reference's
per-frame TLAS rebuild handles scene rotation, which we instead apply by
inverse-rotating rays).

The tree is THREADED for traversal (skip pointers, stackless): every node
row carries a hit link (first child) and a miss link (next subtree in DFS
order), leaves carry their Moller-Trumbore triangle rows INLINE, so a
traversal step is exactly ONE row gather plus a slab test or triangle
intersection and a few selects — no per-ray stack (round 1's 48-deep
one-hot stack was ~5x the per-step cost and capped the tracer at
0.07 Mray/s).

Leaves are QUADS: 4 Morton-consecutive triangles inline in one 192-byte
row. Traversal is HBM-latency bound per ROW (measured: 16 B vs 48 B rows
gather at the same rate), so 4 triangles per gather quarters the leaf
visits and halves total node count — the round-3 step-count lever
(VERDICT r2 item 2; the RT-core DXR equivalent is
raytracing/pathtracing.hlsl).

  row (48 f32):
    internal [lo(3), hi(3), .., flag0@12, hit@13, miss@14, pad..]
    leaf     [v0a(3), e1a(3), e2a(3), -, tri_a, ds_a, flag1@12,
              hit@13, miss@14, v0b..(9) @15, v0c..(9) @24, v0d..(9) @33,
              tri_b..d @42:45, ds_b..d @45:48]
  (links and triangle ids stored as exact small floats; empty quad slots
  hold degenerate triangles that never intersect)

Traversal runs straight-line unrolled segments (no while_loop bookkeeping)
with ray COMPACTION between segments: the median ray finishes in ~16 steps
while the worst needs hundreds, so the tail continues at 1/4 then 1/16
width inside an 8-step-unrolled while_loop. Rays exceeding the step budget
or the compaction capacity terminate with their best hit so far and are
counted in the returned `trunc` stat.
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
    return ((_expand_bits(q[:, 0]) << np.uint64(2))
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


def _karras_topology(codes64: np.ndarray, t: int):
    """Karras 2012 radix tree: left/right child codes for t-1 internal
    nodes (negative = ~sorted_leaf_position)."""
    i = np.arange(t - 1, dtype=np.int64)
    d = np.sign(_common_prefix(codes64, i, i + 1, t)
                - _common_prefix(codes64, i, i - 1, t)).astype(np.int64)
    d = np.where(d == 0, 1, d)
    delta_min = _common_prefix(codes64, i, i - d, t)

    lmax = np.full(t - 1, 2, np.int64)
    while True:
        probe = _common_prefix(codes64, i, i + lmax * d, t) > delta_min
        if not probe.any():
            break
        lmax = np.where(probe, lmax * 2, lmax)
        if lmax.max() > 2 * t:
            break

    l = np.zeros(t - 1, np.int64)
    step = lmax // 2
    while step.max() > 0:
        cand = l + step
        ok = _common_prefix(codes64, i, i + cand * d, t) > delta_min
        l = np.where(ok, cand, l)
        step = step // 2
    j = i + l * d
    delta_node = _common_prefix(codes64, i, j, t)

    s = np.zeros(t - 1, np.int64)
    div = 2
    step = -(-l // div)
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
    left = np.where(left_is_leaf, ~gamma, gamma)          # ~x < 0 => leaf
    right = np.where(right_is_leaf, ~(gamma + 1), gamma + 1)
    return left, right


ROW_LANES = 48
LEAF_K = 4            # triangles per leaf quad
_TRI1_OFF = (15, 24, 33)   # lanes of quad slots b, c, d
_ID1_OFF = 42              # tri ids of slots b, c, d
_DS1_OFF = 45              # double-sided flags of slots b, c, d


def _sah_topology(tri_verts: np.ndarray, leaf_k: int, nbins: int = 16):
    """Top-down binned-SAH build (level-synchronous: every frontier node is
    processed with one set of vectorized segment ops per level). Returns
    (left, right, quad_tri): internal-node child arrays in the Karras
    convention (negative = ~leaf_index) and (Q, leaf_k) original-triangle
    ids per leaf (-1 pad).

    The Morton/Karras topology groups leaves by code locality only; on
    architectural interiors that costs several times more traversal steps
    than an SAH tree (the reference's DXR BVH is SAH-built by the driver),
    and the per-step row gather is THE path-tracer cost on TPU.
    """
    t = tri_verts.shape[0]
    cent_all = tri_verts.mean(axis=1)
    tlo_all = tri_verts.min(axis=1)
    thi_all = tri_verts.max(axis=1)

    # provisional node table (root = 0); children rewritten to dense
    # internal ids / ~leaf ids in the final compaction
    prov_l = [-1]
    prov_r = [-1]
    prov_is_leaf = [False]
    prov_leaf = [-1]

    tids = np.arange(t, dtype=np.int64)    # original ids of frontier tris
    label = np.zeros(t, np.int64)          # frontier-local node per tri
    gid = np.array([0], np.int64)          # frontier-local -> provisional
    leaf_tris = []                         # per leaf: original tri ids

    def sa(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                + d[..., 2] * d[..., 0])

    while tids.size:
        k = gid.shape[0]
        cent = cent_all[tids]
        tlo = tlo_all[tids]
        thi = thi_all[tids]
        counts = np.bincount(label, minlength=k)

        clo = np.full((k, 3), np.inf)
        chi = np.full((k, 3), -np.inf)
        np.minimum.at(clo, label, cent)
        np.maximum.at(chi, label, cent)
        ext = chi - clo
        axis = ext.argmax(axis=1)
        ax_ext = ext[np.arange(k), axis]

        cval = cent[np.arange(tids.size), axis[label]]
        rel = (cval - clo[label, axis[label]]) \
            / np.maximum(ax_ext[label], 1e-20)
        b = np.clip((rel * nbins).astype(np.int64), 0, nbins - 1)

        flat = label * nbins + b
        bc = np.bincount(flat, minlength=k * nbins).reshape(k, nbins)
        blo = np.full((k * nbins, 3), np.inf)
        bhi = np.full((k * nbins, 3), -np.inf)
        np.minimum.at(blo, flat, tlo)
        np.maximum.at(bhi, flat, thi)
        blo = blo.reshape(k, nbins, 3)
        bhi = bhi.reshape(k, nbins, 3)

        plo = np.minimum.accumulate(blo, axis=1)
        phi = np.maximum.accumulate(bhi, axis=1)
        slo = np.minimum.accumulate(blo[:, ::-1], axis=1)[:, ::-1]
        shi = np.maximum.accumulate(bhi[:, ::-1], axis=1)[:, ::-1]
        pc = np.cumsum(bc, axis=1)
        nl = pc[:, :-1]                    # split after bin s: left <= s
        nr = counts[:, None] - nl
        cost = sa(plo[:, :-1], phi[:, :-1]) * nl \
            + sa(slo[:, 1:], shi[:, 1:]) * nr
        cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
        split = cost.argmin(axis=1)
        degenerate = ~np.isfinite(cost[np.arange(k), split]) \
            | (ax_ext <= 1e-12)

        make_leaf = counts <= leaf_k

        go_left = b <= split[label]
        if (degenerate & ~make_leaf).any():
            # identical/collapsed centroids: split by per-node rank parity
            order = np.argsort(label, kind="stable")
            starts = np.concatenate(
                [[0], np.cumsum(counts)[:-1]])
            rank = np.empty(tids.size, np.int64)
            rank[order] = np.arange(tids.size) - starts[label[order]]
            go_left = np.where(degenerate[label],
                               rank < (counts[label] + 1) // 2, go_left)

        # emit leaves
        leaf_nodes = np.flatnonzero(make_leaf)
        if leaf_nodes.size:
            lab_order = np.argsort(label, kind="stable")
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            for i in leaf_nodes:
                g = gid[i]
                prov_is_leaf[g] = True
                prov_leaf[g] = len(leaf_tris)
                seg = lab_order[starts[i]:starts[i] + counts[i]]
                leaf_tris.append(tids[seg])

        split_idx = np.flatnonzero(~make_leaf)
        if split_idx.size == 0:
            break
        # create children (BFS order)
        l_gid = np.zeros(k, np.int64)
        r_gid = np.zeros(k, np.int64)
        for i in split_idx:
            g = gid[i]
            l_gid[i] = len(prov_l)
            prov_l.append(-1)
            prov_r.append(-1)
            prov_is_leaf.append(False)
            prov_leaf.append(-1)
            r_gid[i] = len(prov_l)
            prov_l.append(-1)
            prov_r.append(-1)
            prov_is_leaf.append(False)
            prov_leaf.append(-1)
            prov_l[g] = l_gid[i]
            prov_r[g] = r_gid[i]

        keep = ~make_leaf[label]
        tids = tids[keep]
        new_prov = np.where(go_left[keep], l_gid[label[keep]],
                            r_gid[label[keep]])
        gid = np.unique(new_prov)
        remap = np.zeros(int(gid.max()) + 1, np.int64)
        remap[gid] = np.arange(gid.shape[0])
        label = remap[new_prov]

    # compact: dense internal numbering (provisional BFS order keeps the
    # root at 0), leaf children become ~leaf_id
    prov_l = np.asarray(prov_l)
    prov_r = np.asarray(prov_r)
    prov_is_leaf = np.asarray(prov_is_leaf)
    prov_leaf = np.asarray(prov_leaf)
    internal = ~prov_is_leaf
    int_id = np.cumsum(internal) - 1

    def map_child(c):
        return np.where(prov_is_leaf[c], ~prov_leaf[c], int_id[c])

    left = map_child(prov_l[internal])
    right = map_child(prov_r[internal])

    q = len(leaf_tris)
    quad_tri = np.full((q, leaf_k), -1, np.int64)
    for i, tr in enumerate(leaf_tris):
        quad_tri[i, :tr.size] = tr
    return left, right, quad_tri


def build_lbvh(tri_verts: np.ndarray, method: str = "sah"):
    """tri_verts: (T, 3, 3) world-space triangles -> (rows (N, 48) f32,
    links (8N, 2) f32, leaf_tri (N, 4) i64 original-triangle ids per leaf
    slot, -1 = empty). rows hold boxes / inline triangle quads (module
    docstring; root is node 0); links hold the per-octant (hit, miss)
    threading as GLOBAL indices okt*N + node. The caller fills the
    double-sided lanes from leaf_tri.

    method: "sah" (binned SAH topology, default — fewest traversal steps)
    or "morton" (Karras radix tree, faster to build)."""
    t = tri_verts.shape[0]

    centroids = tri_verts.mean(axis=1)
    lo = centroids.min(0)
    hi = centroids.max(0)
    norm = (centroids - lo) / np.maximum(hi - lo, 1e-12)
    codes = morton3(norm)
    order = np.argsort(codes, kind="stable").astype(np.int64)

    # Group Morton-consecutive triangles into quads (the leaf unit).
    q = -(-t // LEAF_K)
    pad = q * LEAF_K - t
    order_p = np.concatenate([order, np.full(pad, -1, np.int64)])
    quad_tri = order_p.reshape(q, LEAF_K)           # (Q, 4) orig ids, -1 pad
    qs = np.where(quad_tri >= 0, quad_tri, quad_tri[:, 0:1])
    quad_lo = tri_verts[qs].min(axis=(1, 2))
    quad_hi = tri_verts[qs].max(axis=(1, 2))

    def leaf_rows(quads):
        """(Qn, 4) orig ids -> (Qn, 48) leaf rows (geometry lanes only)."""
        qn = quads.shape[0]
        rows = np.zeros((qn, ROW_LANES), np.float32)
        for s in range(LEAF_K):
            tid = quads[:, s]
            ok = tid >= 0
            tv = tri_verts[np.maximum(tid, 0)]
            v0 = np.where(ok[:, None], tv[:, 0], 0.0)
            e1 = np.where(ok[:, None], tv[:, 1] - tv[:, 0], 0.0)
            e2 = np.where(ok[:, None], tv[:, 2] - tv[:, 0], 0.0)
            if s == 0:
                o9, oid = 0, 10
            else:
                o9, oid = _TRI1_OFF[s - 1], _ID1_OFF + s - 1
            rows[:, o9:o9 + 3] = v0
            rows[:, o9 + 3:o9 + 6] = e1
            rows[:, o9 + 6:o9 + 9] = e2
            rows[:, oid] = np.where(ok, tid, -1).astype(np.float32)
        rows[:, 12] = 1.0
        return rows

    if q == 1:
        row = leaf_rows(quad_tri)
        links = np.full((8, 2), -1.0, np.float32)
        return row, links, quad_tri

    if method == "sah":
        # SAH leaves replace the Morton quads (leaf count may differ —
        # SAH leaves are <= LEAF_K, not exactly LEAF_K)
        left, right, quad_tri = _sah_topology(tri_verts, LEAF_K)
        q = quad_tri.shape[0]
        qs = np.where(quad_tri >= 0, quad_tri, quad_tri[:, 0:1])
        quad_lo = tri_verts[qs].min(axis=(1, 2))
        quad_hi = tri_verts[qs].max(axis=(1, 2))
    else:
        qcodes = codes[qs[:, 0]]
        codes64 = (qcodes.astype(np.uint64) << np.uint64(32)) \
            | np.arange(q, dtype=np.uint64)
        left, right = _karras_topology(codes64, q)
    n_int = q - 1
    t = q                 # leaf count for the threading below

    # Bottom-up AABBs for internal nodes.
    tri_lo = quad_lo
    tri_hi = quad_hi
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

    # Threaded links over the unified table: internal node i -> row i,
    # sorted leaf j -> row n_int + j. Eight link sets, one per ray-direction
    # OCTANT: the near child (along the octant direction) is descended
    # first, so closest-hit t_best pruning cuts far subtrees — unordered
    # skip links left ~10% of rays wandering for hundreds of steps.
    def entry(c):
        return np.where(c < 0, n_int + (~c), c).astype(np.int64)

    l_e = entry(left)
    r_e = entry(right)
    n_total = n_int + t

    llo, lhi, _ = child_box(left)
    rlo, rhi, _ = child_box(right)
    c_l = 0.5 * (llo + lhi)
    c_r = 0.5 * (rlo + rhi)

    base = np.zeros((n_total, ROW_LANES), np.float32)
    base[:n_int, 0:3] = node_lo
    base[:n_int, 3:6] = node_hi
    base[n_int:] = leaf_rows(quad_tri)
    leaf_tri = np.concatenate([np.full((n_int, LEAF_K), -1, np.int64),
                               quad_tri])

    links = np.zeros((8 * n_total, 2), np.float32)
    idx_int = np.arange(n_int)
    for okt in range(8):
        sign = np.array([1.0 if not (okt >> a) & 1 else -1.0
                         for a in range(3)], np.float32)
        near_left = (c_l @ sign) <= (c_r @ sign)
        near = np.where(near_left, l_e, r_e)
        far = np.where(near_left, r_e, l_e)
        miss = np.full(n_total, -1, np.int64)
        miss[near] = far
        for _ in range(128):
            cur = miss.copy()
            cur[far] = cur[idx_int]
            if np.array_equal(cur, miss):
                break
            miss = cur
        off = okt * n_total
        links[off:off + n_int, 0] = (near + off).astype(np.float32)
        links[off:off + n_total, 1] = np.where(
            miss >= 0, miss + off, -1).astype(np.float32)
    return base, links, leaf_tri


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneBVH:
    rows: jnp.ndarray        # (N, 48) f32 threaded rows (module docstring);
    #                          merged=True: (8N, 48) per-octant copies with
    #                          (hit, miss) links inline at lanes 13/14;
    #                          wide=True: (N, 80) octant-INVARIANT rows —
    #                          boxes + local child ids + leaves (0..63)
    #                          and all 8 octants' [iperm, miss] thread
    #                          words (64..79) — ONE gather per step
    links: jnp.ndarray       # binary split layout only: (8N, 2) f32
    #                          per-octant (hit, miss) links ((1, 2) dummy
    #                          when merged or wide)
    merged: bool = dataclasses.field(metadata=dict(static=True),
                                     default=False)
    wide: bool = dataclasses.field(metadata=dict(static=True),
                                   default=False)


# Per-octant merged-row tables cost 8N x 192 B of HBM; above this node
# count (~400 MB; ~2M triangles with quad leaves) fall back to the split
# rows+links layout (1.6x slower steps).
_MERGE_LIMIT = 1 << 21


WIDE_LANES = 80
_W_FLAG = 48          # 1.0 = quad leaf, 0.0 = 8-wide internal
_W_MISS = 49          # unused (pre-r4 layout relic; kept for alignment)
_W_CHILD = 50         # 8 LOCAL child row ids (storage slot order)
_W_THREAD = 64        # 8 octants x (iperm word, miss link) packed as f32
WIDE_ARITY = 8


def _binary_boxes(left, right, quad_lo, quad_hi):
    """Bottom-up AABBs for the binary internal nodes (same fixpoint as the
    emit path). Returns (node_lo, node_hi) for internals."""
    n_int = left.shape[0]
    node_lo = np.full((n_int, 3), np.inf, np.float32)
    node_hi = np.full((n_int, 3), -np.inf, np.float32)
    ready = np.zeros(n_int, bool)

    def child_box(c):
        is_leaf = c < 0
        leaf_idx = np.where(is_leaf, ~c, 0)
        int_idx = np.where(is_leaf, 0, c)
        lo_ = np.where(is_leaf[:, None], quad_lo[leaf_idx],
                       node_lo[int_idx])
        hi_ = np.where(is_leaf[:, None], quad_hi[leaf_idx],
                       node_hi[int_idx])
        ok = is_leaf | ready[int_idx]
        return lo_, hi_, ok

    for _ in range(n_int + 1):
        if ready.all():
            break
        llo, lhi, lok = child_box(left)
        rlo, rhi, rok = child_box(right)
        new = lok & rok & ~ready
        node_lo = np.where(new[:, None], np.minimum(llo, rlo), node_lo)
        node_hi = np.where(new[:, None], np.maximum(lhi, rhi), node_hi)
        ready |= new
    assert ready.all(), "binary BVH box fixpoint did not converge"
    return node_lo, node_hi


def build_wide(tri_verts: np.ndarray, method: str = "sah"):
    """8-wide threaded BVH: collapse the binary SAH tree 3 levels at a
    time. Each internal ROW carries its (up to) 8 grandchildren boxes +
    row ids, pre-sorted near-to-far per ray-direction OCTANT, so one
    traversal step tests 8 boxes and jumps STRAIGHT to the first hit
    child; a child subtree's miss link continues at the next octant-
    ordered sibling. Depth (and so step count) drops ~3x vs the binary
    skip-link walk — the stackless binary descent pays >= tree depth
    steps per subtree, which dominated atrium traversal (survival curve:
    median 70 steps).

    Returns (geo (N, 64) f32 octant-invariant rows,
    thread (8N, 2) i32 per-octant [iperm word, miss link] rows,
    leaf_tri (N, 4)).
    """
    t = tri_verts.shape[0]
    if t <= LEAF_K:
        quad = np.full((1, LEAF_K), -1, np.int64)
        quad[0, :t] = np.arange(t)
        row = np.zeros((1, WIDE_LANES), np.float32)
        row[:, :ROW_LANES] = _leaf_rows_for(tri_verts, quad)
        row[:, _W_FLAG] = 1.0
        row[:, _W_THREAD + 1:_W_THREAD + 16:2] = -1.0    # all-octant miss
        return row, quad

    if method == "sah":
        left, right, quad_tri = _sah_topology(tri_verts, LEAF_K)
    else:
        rows_, links_, quad_tri = build_lbvh(tri_verts, method="morton")
        raise NotImplementedError("wide build requires the sah topology")
    q = quad_tri.shape[0]
    qs = np.where(quad_tri >= 0, quad_tri, quad_tri[:, 0:1])
    quad_lo = tri_verts[qs].min(axis=(1, 2)).astype(np.float32)
    quad_hi = tri_verts[qs].max(axis=(1, 2)).astype(np.float32)
    node_lo, node_hi = _binary_boxes(left, right, quad_lo, quad_hi)

    # ---- collapse to wide nodes (BFS; children = depth<=3 frontier) ----
    def expand(c, depth):
        if c < 0 or depth == 0:
            return [c]
        return expand(left[c], depth - 1) + expand(right[c], depth - 1)

    wide_children = []          # per wide node: list of binary refs
    wide_of_binary = {0: 0}
    queue = [0]
    while queue:
        nxt = []
        for b in queue:
            kids = expand(b, 3)
            while len(kids) < WIDE_ARITY:
                kids.append(None)
            wide_children.append(kids)
            for k in kids:
                if k is not None and k >= 0:
                    wide_of_binary[k] = len(wide_children) + len(nxt) - 1
                    nxt.append(k)
        # assign wide ids to queued internals in BFS order
        queue = nxt
    n_wide = len(wide_children)
    # wide ids were implicitly assigned in BFS append order of `nxt`;
    # rebuild the mapping deterministically
    wide_ids = {}
    order = [0]
    idx = 0
    count = 1
    while idx < len(order):
        b = order[idx]
        wide_ids[b] = idx
        for k in wide_children[idx]:
            if k is not None and k >= 0:
                order.append(k)
        idx += 1
    assert len(order) == n_wide

    # rows: wide internals first, then the q leaf rows
    n_rows = n_wide + q

    def row_of(c):
        return wide_ids[c] if c >= 0 else n_wide + (~c)

    # per wide node: child row ids, boxes, centroids (storage order)
    ch_row = np.full((n_wide, WIDE_ARITY), -1, np.int64)
    ch_lo = np.full((n_wide, WIDE_ARITY, 3), 1e30, np.float32)
    ch_hi = np.full((n_wide, WIDE_ARITY, 3), -1e30, np.float32)
    for w in range(n_wide):
        for s, c in enumerate(wide_children[w]):
            if c is None:
                continue
            ch_row[w, s] = row_of(c)
            if c < 0:
                ch_lo[w, s] = quad_lo[~c]
                ch_hi[w, s] = quad_hi[~c]
            else:
                ch_lo[w, s] = node_lo[c]
                ch_hi[w, s] = node_hi[c]
    ch_cent = 0.5 * (ch_lo + ch_hi)
    ch_valid = ch_row >= 0

    # parent wide-row + BFS level of every row (for the level-ordered
    # threading sweep)
    parent_row = np.full(n_rows, -1, np.int64)
    parent_slot = np.full(n_rows, -1, np.int64)
    for w in range(n_wide):
        for s in range(WIDE_ARITY):
            if ch_valid[w, s]:
                parent_row[ch_row[w, s]] = w
                parent_slot[ch_row[w, s]] = s
    level = np.zeros(n_rows, np.int64)
    for rrow in range(1, n_rows):
        p = parent_row[rrow]
        if p >= 0:
            level[rrow] = level[p] + 1
    max_level = int(level.max()) if n_rows > 1 else 0

    leaf_base = np.zeros((q, ROW_LANES), np.float32)
    leaf_base = _leaf_rows_for(tri_verts, quad_tri)
    leaf_tri = np.concatenate(
        [np.full((n_wide, LEAF_K), -1, np.int64), quad_tri])

    # ONE octant-invariant table: boxes + LOCAL child ids + leaf payload
    # (lanes 0..63) plus all 8 octants' traversal words packed into lanes
    # 64..79 — the former per-octant 8x row replication put the atrium
    # table at 216 MB where random row gathers measured 127 ns/idx vs 21
    # at <= 72 MB, and a SEPARATE thread table costs a second full
    # per-step gather (~7.3 ms at 230k rays) — row BYTES are nearly free,
    # extra GATHERS are not (tools/bvh_gather_bench.py). Per octant the
    # word pair is [iperm (8 x 3-bit slot->position), miss link]; both
    # fit f32 exactly (< 2^24).
    geo = np.zeros((n_rows, WIDE_LANES), np.float32)
    boxes = np.concatenate([ch_lo, ch_hi], axis=-1)      # (n_wide, 8, 6)
    geo[:n_wide, :48] = boxes.reshape(n_wide, 48)
    geo[:n_wide, _W_CHILD:_W_CHILD + 8] = np.where(
        ch_valid, ch_row, -1).astype(np.float32)
    geo[n_wide:, :ROW_LANES] = leaf_base
    geo[n_wide:, _W_FLAG] = 1.0

    for okt in range(8):
        sign = np.array([1.0 if not (okt >> a) & 1 else -1.0
                         for a in range(3)], np.float32)
        key = np.where(ch_valid, ch_cent @ sign, np.inf)
        perm = np.argsort(key, axis=1, kind="stable")    # (n_wide, 8)
        p_row = np.take_along_axis(ch_row, perm, axis=1)
        counts = (p_row >= 0).sum(axis=1)
        # iperm word: 3-bit octant POSITION of each storage slot, so the
        # step picks the hit child with minimal position (= near-to-far
        # first hit) without per-octant box copies
        inv_full = np.argsort(perm, axis=1)              # slot -> position
        iperm = np.zeros(n_wide, np.int64)
        for s in range(WIDE_ARITY):
            iperm |= inv_full[:, s].astype(np.int64) << (3 * s)
        geo[:n_wide, _W_THREAD + 2 * okt] = iperm.astype(np.float32)

        # threading: parent-before-child level sweep; child k's miss =
        # next octant-ordered sibling, last child inherits parent's miss
        miss = np.full(n_rows, -1, np.int64)
        for lvl in range(1, max_level + 1):
            sel = np.flatnonzero(level == lvl)
            if sel.size == 0:
                continue
            pw = parent_row[sel]
            # position of each row among its parent's ordered children
            # (invert the permutation)
            slot = parent_slot[sel]
            inv = np.argsort(perm[pw], axis=1)
            pos = inv[np.arange(sel.size), slot]
            nxt_row = np.where(
                pos + 1 < counts[pw],
                p_row[pw, np.minimum(pos + 1, WIDE_ARITY - 1)],
                -2)                                       # -2 = inherit
            inherit = nxt_row == -2
            miss[sel] = np.where(inherit, miss[pw], nxt_row)
        geo[:, _W_THREAD + 2 * okt + 1] = miss.astype(np.float32)
    return geo, leaf_tri


def _leaf_rows_for(tri_verts, quads):
    """(Qn, 4) orig ids -> (Qn, 48) quad leaf rows (shared with the
    binary build's layout)."""
    qn = quads.shape[0]
    rows = np.zeros((qn, ROW_LANES), np.float32)
    for s in range(LEAF_K):
        tid = quads[:, s]
        ok = tid >= 0
        tv = tri_verts[np.maximum(tid, 0)]
        v0 = np.where(ok[:, None], tv[:, 0], 0.0)
        e1 = np.where(ok[:, None], tv[:, 1] - tv[:, 0], 0.0)
        e2 = np.where(ok[:, None], tv[:, 2] - tv[:, 0], 0.0)
        if s == 0:
            o9, oid = 0, 10
        else:
            o9, oid = _TRI1_OFF[s - 1], _ID1_OFF + s - 1
        rows[:, o9:o9 + 3] = v0
        rows[:, o9 + 3:o9 + 6] = e1
        rows[:, o9 + 6:o9 + 9] = e2
        rows[:, oid] = np.where(ok, tid, -1).astype(np.float32)
    rows[:, 12] = 1.0
    return rows


def build_scene_bvh(scene, method: str = "sah",
                    use_cache: bool = True, wide: bool = True) -> SceneBVH:
    """World-space threaded BVH over the packed scene's real triangles.

    wide=True (default) emits the 8-wide per-octant rows (build_wide);
    wide=False keeps the binary quad-leaf layout. The SAH build costs tens
    of seconds host-side at 300k triangles, so the emitted rows are
    disk-cached keyed on the world geometry (the equivalent of the
    reference's driver-side BLAS cache)."""
    m = scene.meta
    pos = np.asarray(scene.positions)
    xf = np.asarray(scene.mesh_transforms)
    vm = np.asarray(scene.vtx_mesh)
    world = np.einsum("vi,vij->vj",
                      np.concatenate([pos, np.ones_like(pos[:, :1])], -1),
                      xf[vm])[:, :3]
    tv = np.asarray(scene.tri_vtx)[:m.num_triangles]
    tris = world[tv]                                     # (T, 3, 3)
    prim = np.asarray(scene.tri_prim)[:m.num_triangles]
    ds = np.asarray(scene.prim_double_sided)[np.maximum(prim, 0)]

    cache_file = None
    if use_cache:
        import hashlib
        from ..scene import cache as cache_mod
        h = hashlib.sha1()
        h.update(tris.tobytes())
        h.update(ds.tobytes())
        h.update(f"bvh-v5-{method}-{LEAF_K}-{int(wide)}".encode())
        cache_file = cache_mod.CACHE_DIR / f"bvh-{h.hexdigest()[:20]}.npz"
        if cache_file.exists():
            z = np.load(cache_file)
            if wide:
                return SceneBVH(rows=jnp.asarray(z["rows"]),
                                links=jnp.zeros((1, 2), jnp.float32),
                                merged=False, wide=True)
            return _finish_bvh(z["rows"], z["links"])

    if wide:
        geo, leaf_tri = build_wide(tris, method=method)
        # Per-slot double-sided flags (geo is octant-invariant: once)
        for s in range(LEAF_K):
            tid = leaf_tri[:, s]
            ok = tid >= 0
            lane = 11 if s == 0 else _DS1_OFF + s - 1
            geo[ok, lane] = ds[tid[ok]].astype(np.float32)
        if cache_file is not None:
            cache_file.parent.mkdir(exist_ok=True)
            np.savez(cache_file, rows=geo)
        return SceneBVH(rows=jnp.asarray(geo),
                        links=jnp.zeros((1, 2), jnp.float32),
                        merged=False, wide=True)

    rows, links, leaf_tri = build_lbvh(tris, method=method)
    # Per-slot double-sided flags: backface culling matches the reference's
    # RAY_FLAG_CULL_BACK_FACING_TRIANGLES for single-sided.
    for s in range(LEAF_K):
        tid = leaf_tri[:, s]
        ok = tid >= 0
        lane = 11 if s == 0 else _DS1_OFF + s - 1
        rows[ok, lane] = ds[tid[ok]].astype(np.float32)
    if cache_file is not None:
        cache_file.parent.mkdir(exist_ok=True)
        np.savez(cache_file, rows=rows, links=links)
    return _finish_bvh(rows, links)


def apply_mesh_visibility(bvh: SceneBVH, scene, mesh_visible) -> SceneBVH:
    """Re-emit the BVH's leaf slots with hidden meshes' triangles
    degenerated — the TPU-native equivalent of the reference's per-frame
    TLAS rebuild over its visible list (ref:
    render-jobs/update-tlas.inl:24 m_visibleList[meshIndex]): a mesh
    hidden in the scene no longer produces PT hits, shadow-ray occlusion,
    or HBAO occlusion. Host-side numpy over the cached rows (the visible
    set changes rarely — a viewer toggle); interior boxes stay
    conservative, costing only traversal steps, never correctness.

    mesh_visible: (num_meshes,) 0/1. Returns a new SceneBVH sharing the
    layout; with everything visible, returns `bvh` unchanged."""
    vis = np.asarray(mesh_visible)
    if vis.astype(bool).all():
        return bvh
    tri_prim = np.asarray(scene.tri_prim)
    prim_mesh = np.asarray(scene.prim_mesh)
    tri_hidden = ~vis.astype(bool)[
        np.maximum(prim_mesh[np.maximum(tri_prim, 0)], 0)]
    rows = np.asarray(bvh.rows).copy()
    # Leaf slot lanes: (id lane, geometry base) per quad slot — identical
    # in the binary and wide layouts (module docstring).
    slots = [(10, 0)] + [(_ID1_OFF + s, _TRI1_OFF[s]) for s in range(3)]
    leaf = (rows[:, _W_FLAG] > 0.5) if bvh.wide else (rows[:, 12] > 0.5)
    for lane, o9 in slots:
        tid = rows[:, lane].astype(np.int64)
        hide = leaf & (tid >= 0) \
            & tri_hidden[np.clip(tid, 0, tri_hidden.shape[0] - 1)]
        rows[hide, lane] = -1.0
        rows[hide, o9:o9 + 9] = 0.0     # degenerate: det 0, never accepted
    return dataclasses.replace(bvh, rows=jnp.asarray(rows))


def _finish_bvh(rows: np.ndarray, links: np.ndarray) -> SceneBVH:
    n_total = rows.shape[0]
    if n_total <= _MERGE_LIMIT:
        rows8 = np.tile(rows, (8, 1))
        rows8[:, 13:15] = links
        return SceneBVH(rows=jnp.asarray(rows8),
                        links=jnp.zeros((1, 2), jnp.float32), merged=True)
    return SceneBVH(rows=jnp.asarray(rows), links=jnp.asarray(links))


# ---------------------------------------------------------------------------
# Traversal (traced; vectorized over rays; stackless skip links)
# ---------------------------------------------------------------------------

def _tri_intersect(tri_row, o, d, cull_backface):
    """Moller-Trumbore. tri_row (..., >=9) = [v0, e1, e2].
    Returns (t or inf, u, v)."""
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


def _step(rows, links, okt_off, o, d, inv_d, tmax_eff, state,
          any_hit: bool, alpha_of=None):
    """One threaded-traversal step over the whole ray batch.

    cur holds LOCAL node ids; okt_off (R,) = okt * N picks each ray's
    ordered link set (links are stored as global okt*N + node indices).
    links=None means `rows` is the per-octant MERGED table (8N, 16) with
    the octant's (hit, miss) links inline at lanes 13/14 — ONE row gather
    per step instead of a row + a link gather (gather cost on TPU is
    per-row; traversal is gather-bound at full ray width)."""
    cur, t_best, best_tri, uo, vo, alive = state
    safe = jnp.maximum(cur, 0)
    if links is None:
        row = rows[safe + okt_off]                       # (R, 48) gather
        lnk = row[:, 13:15]
    else:
        row = rows[safe]                                 # (R, 48) gather
        lnk = links[safe + okt_off]                      # (R, 2) gather
    leaf = row[:, 12] > 0.5

    # Leaf: Moller-Trumbore against the 4 inline quad slots (empty slots
    # hold degenerate triangles with det 0 and id -1 — never accepted).
    for s in range(4):
        if s == 0:
            o9, oid, ods = 0, 10, 11
        else:
            o9 = _TRI1_OFF[s - 1]
            oid = _ID1_OFF + s - 1
            ods = _DS1_OFF + s - 1
        cull = row[:, ods] < 0.5
        t_hit, u, v = _tri_intersect(row[:, o9:o9 + 9], o, d, cull)
        tri = row[:, oid].astype(jnp.int32)
        accept = (leaf & alive & (tri >= 0) & (t_hit < t_best)
                  & (t_hit <= tmax_eff))
        if alpha_of is not None:
            accept &= alpha_of(tri, u, v)
        t_best = jnp.where(accept, t_hit, t_best)
        best_tri = jnp.where(accept, tri, best_tri)
        uo = jnp.where(accept, u, uo)
        vo = jnp.where(accept, v, vo)
        if any_hit:
            alive = alive & ~accept

    # Internal: slab test against the node's own box (pruned by t_best).
    t0 = (row[:, 0:3] - o) * inv_d
    t1 = (row[:, 3:6] - o) * inv_d
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1),
                     jnp.minimum(t_best, tmax_eff))
    box_hit = (tn <= tf) & ~leaf

    nxt = jnp.where(leaf | ~box_hit,
                    lnk[:, 1].astype(jnp.int32),         # miss link
                    lnk[:, 0].astype(jnp.int32))         # hit link
    alive = alive & (nxt >= 0)
    cur = jnp.where(alive, nxt - okt_off, 0)
    return cur, t_best, best_tri, uo, vo, alive


def _row_lanes(row, n_lanes: int):
    """Gathered (R, n_lanes) row -> per-lane (R,) arrays, consumed through
    a 3-D reshape. Measured (r4, /tmp lane experiments + commit log):
    slicing a gather's output directly costs ~0.45 ms PER LANE per 230k
    rows (each slice re-reads the materialized gather), while slicing the
    RESHAPED buffer is vector-rate — 24 lanes: 18.2 -> 7.4 ms/step."""
    assert n_lanes % 16 == 0
    r3 = row.reshape(row.shape[0], n_lanes // 16, 16)
    return [r3[:, i // 16, i % 16] for i in range(n_lanes)]


def _step_wide(rows, links, okt, o, d, inv_d, tmax_eff, state,
               any_hit: bool, alpha_of=None):
    """One 8-wide traversal step: leaf rows intersect the 4-triangle quad
    exactly like the binary walk; internal rows test the 8 child boxes in
    STORAGE slot order and jump STRAIGHT to the hit child with minimal
    per-octant POSITION (the near-to-far order) from the row's packed
    per-octant thread words. ONE gather per step (`links` unused; `okt`
    carries each ray's octant 0..7): row bytes are nearly free, extra
    gathers are not (tools/bvh_gather_bench.py)."""
    del links
    cur, t_best, best_tri, uo, vo, alive = state
    safe = jnp.maximum(cur, 0)
    lanes = _row_lanes(rows[safe], WIDE_LANES)           # ONE (R, 80) gather
    leaf = lanes[_W_FLAG] > 0.5

    # own octant's [iperm, miss] from the packed thread lanes (dense
    # 8-way select — a per-ray dynamic lane index would be a gather)
    iperm_f = lanes[_W_THREAD]
    miss_f = lanes[_W_THREAD + 1]
    for k in range(1, 8):
        sel = okt == k
        iperm_f = jnp.where(sel, lanes[_W_THREAD + 2 * k], iperm_f)
        miss_f = jnp.where(sel, lanes[_W_THREAD + 2 * k + 1], miss_f)
    iperm = iperm_f.astype(jnp.int32)
    miss = miss_f.astype(jnp.int32)

    def stack9(o9):
        return jnp.stack([lanes[o9 + i] for i in range(9)], axis=-1)

    for s in range(4):
        if s == 0:
            o9, oid, ods = 0, 10, 11
        else:
            o9 = _TRI1_OFF[s - 1]
            oid = _ID1_OFF + s - 1
            ods = _DS1_OFF + s - 1
        cull = lanes[ods] < 0.5
        t_hit, u, v = _tri_intersect(stack9(o9), o, d, cull)
        tri = lanes[oid].astype(jnp.int32)
        accept = (leaf & alive & (tri >= 0) & (t_hit < t_best)
                  & (t_hit <= tmax_eff))
        if alpha_of is not None:
            accept &= alpha_of(tri, u, v)
        t_best = jnp.where(accept, t_hit, t_best)
        best_tri = jnp.where(accept, tri, best_tri)
        uo = jnp.where(accept, u, uo)
        vo = jnp.where(accept, v, vo)
        if any_hit:
            alive = alive & ~accept

    # Internal: 8 child slab tests in STORAGE slot order; the hit child
    # with minimal per-octant position (iperm 3-bit field) wins — exactly
    # the near-to-far first-hit of the former octant-sorted copies.
    nxt_int = miss
    best_pos = jnp.full_like(cur, WIDE_ARITY)
    limit = jnp.minimum(t_best, tmax_eff)
    for k in range(WIDE_ARITY):
        tn = jnp.zeros_like(t_best)
        tf = limit
        for a in range(3):
            t0 = (lanes[6 * k + a] - o[:, a]) * inv_d[:, a]
            t1 = (lanes[6 * k + 3 + a] - o[:, a]) * inv_d[:, a]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        cid = lanes[_W_CHILD + k].astype(jnp.int32)
        pos = (iperm >> (3 * k)) & 7
        hit_k = (tn <= tf) & (cid >= 0) & (pos < best_pos)
        best_pos = jnp.where(hit_k, pos, best_pos)
        nxt_int = jnp.where(hit_k, cid, nxt_int)

    nxt = jnp.where(leaf, miss, nxt_int)
    alive = alive & (nxt >= 0)
    cur = jnp.where(alive, nxt, 0)
    return cur, t_best, best_tri, uo, vo, alive


def _compact(alive, cap, arrays):
    """Pack rays where `alive` into `cap` slots. Returns (orig_idx (cap,),
    out-of-range r for empty slots so scatter-back drops them;
    slot_valid (cap,), packed arrays, overflow_count)."""
    r = alive.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)[:, 0]
    pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
    dest = jnp.where(alive & (pos < cap), pos, cap)
    orig = jnp.full((cap + 1,), r, jnp.int32).at[dest].set(
        iota, mode="drop")[:cap]
    count = jnp.sum(alive.astype(jnp.int32))
    slot_valid = (jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
                  < jnp.minimum(count, cap))
    packed = [a[jnp.minimum(orig, r - 1)] for a in arrays]
    return orig, slot_valid, packed, jnp.maximum(count - cap, 0)


# Step schedule: straight-line segment at full width, then a compaction
# ladder — each tier packs the surviving rays into a fraction of the width
# and runs more straight-line steps; the final (narrowest) tier runs an
# unrolled while_loop until the worst rays finish.
#
# Tuned for QUAD leaves (one leaf visit tests 4 triangles, halving total
# steps vs the r2 single-tri schedule) against the r2-measured survival
# curve shape (helmet primaries: ~73% of rays die in the first few steps,
# long tail thereafter). Each tier's capacity keeps >= 1.6x headroom over
# the curve so capacity truncation stays a dense-scene corner case
# (counted in `trunc`). Fewer unrolled steps also bound XLA compile time
# (the 4-slot leaf step is ~3x the program size of the r2 step; the r2
# 104-step schedule pushed PT compiles past 15 minutes).
_SEG0 = 3             # full-width steps
_TIERS = ((1, 10), (2, 16), (3, 28), (5, None))
#                     (width shift, steps); None = final while tier
_TAIL_UNROLL = 2
_TAIL_ITERS = 480     # up to 960 further steps for the worst rays
_MIN_COMPACT = 8192   # below this many rays, skip compaction machinery

# Schedules tuned to measured survival curves (tools/bvh_curve.py).
# Small trees (helmet-class): median ray dies in ~16 steps. Big trees
# (atrium-class 156k-node SAH): primaries 71% alive @64 / 23% @96 / 5.5%
# @128; incoherent bounce rays 40% @48 / 7% @96. Each tier keeps >= 1.25x
# capacity headroom over the curve; overflow is recovered (not dropped)
# by the full-width tail, so a mis-predicted curve costs time, not hits.
_BIG_NODES = 32768
_SCHEDULES = {
    # (big_tree, profile): (seg0, tiers)
    (False, "primary"): (_SEG0, _TIERS),
    (False, "incoherent"): (_SEG0, _TIERS),
    (False, "anyhit"): (_SEG0, _TIERS),
    (True, "primary"): (96, ((1, 48), (4, 64), (6, None))),
    (True, "incoherent"): (48, ((1, 32), (2, 48), (4, None))),
    # any-hit rays die on FIRST accepted hit — much earlier compaction;
    # capacity overflow is recovered, so a mis-guess costs time, not hits
    (True, "anyhit"): (16, ((1, 16), (2, 32), (3, 48), (5, None))),
}
# 8-wide trees reach matched survival in ~half the binary steps.
# Tier capacities may be FRACTIONS of the wavefront (floats) — the real
# bounce/shadow survival curves decay too slowly for power-of-two caps.
# Measured on the REAL path-tracer populations (tools/bvh_curve.py
# --atrium: bounce rays spawned at primary hits with parked misses, and
# the NEE+sky shadow mix — NOT synthetic box-interior rays, which die 2x
# faster and mis-sized the r4 ladder into a 123 ms full-width overflow
# recovery per trace):
#   primary:    98% @24 / 69% @32 / 22% @48 / 5.8% @64 / 0.03% @96
#   bounce:     81% flat to 16 / 73% @24 / 58% @32 / 23% @48 / 7% @64
#   shadow mix: 82% to 16 / 70% @24 / 57% @32 / 31% @48 / 12% @64
# Each tier keeps >= 1.1x capacity headroom over the curve at its entry
# step; overflow is still recovered (correct, just slow).
_SCHEDULES_WIDE = {
    (False, "primary"): (_SEG0, ((1, 8), (2, 12), (3, 16), (5, None))),
    (False, "incoherent"): (_SEG0, ((1, 8), (2, 12), (3, 16), (5, None))),
    (False, "anyhit"): (_SEG0, ((1, 8), (2, 12), (3, 16), (5, None))),
    # NOTE (r5, measured): a "safe" ladder tracking the real curves with
    # fractional caps — (16, ((0.9, 8), (0.82, 16), (0.48, 16),
    # (0.18, None))) — benched ~20% SLOWER than these nominally-
    # overflowing caps: rays that miss a tier ride their parent buffers
    # to the single end-of-ladder recovery (compacted r/4 while), which
    # amortizes better than carrying 0.8-width tiers for everyone. Keep
    # the overflow-recovery design; treat these caps as the tuned point.
    (True, "primary"): (48, ((2, 16), (4, 16), (6, None))),
    (True, "incoherent"): (16, ((1, 24), (2, 24), (3, 24), (5, None))),
    (True, "anyhit"): (16, ((1, 32), (2, 32), (3, None))),
}


def _run_steps(n, rows, links, okt_off, o, d, inv_d, tmax_eff, state,
               any_hit, alpha_of, step_fn=None):
    """n fixed traversal steps as a fori_loop (ONE step instantiation —
    straight-line unrolling of the 4-slot quad-leaf step pushed PT
    compiles past 15 minutes; the loop-carry overhead is noise next to the
    per-step HBM row gather)."""
    step_fn = step_fn or _step
    return jax.lax.fori_loop(
        0, n,
        lambda _, st: step_fn(rows, links, okt_off, o, d, inv_d, tmax_eff,
                              st, any_hit, alpha_of),
        state)


def _run_while(rows, links, okt_off, o, d, inv_d, tmax_eff, state, any_hit,
               alpha_of, step_fn=None):
    step_fn = step_fn or _step

    def w_body(s):
        it, st = s
        for _ in range(_TAIL_UNROLL):
            st = step_fn(rows, links, okt_off, o, d, inv_d, tmax_eff, st,
                         any_hit, alpha_of)
        return it + 1, st

    def w_cond(s):
        it, st = s
        return (it < _TAIL_ITERS) & st[5].any()

    _, state = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), state))
    return state


def trace(bvh: SceneBVH, origins, directions, tmin=0.0, tmax=1e30,
          any_hit: bool = False, alpha_of=None,
          profile: str = "incoherent"):
    """Trace rays against the BVH.

    origins/directions: (R, 3). Returns dict(t (R,), tri (R,) i32 [-1 miss],
    u, v, trunc () i32 — rays terminated by budget/capacity with only their
    best-so-far hit). any_hit=True stops at the first accepted hit (shadow
    rays, ref: lighting/common.hlsli:96-116). alpha_of(tri, u, v) -> bool:
    optional any-hit acceptance filter (alpha-masked geometry,
    ref: pathtracing.hlsl ahsMain). profile: "primary" for camera-coherent
    rays, "incoherent" for bounce/shadow rays — selects the compaction
    schedule tuned to that survival curve (static, per-jit-instance).
    """
    r = origins.shape[0]
    o = origins + directions * tmin
    inv_d = 1.0 / jnp.where(jnp.abs(directions) > 1e-12, directions,
                            jnp.where(directions >= 0, 1e-12, -1e-12))
    tmax_eff = tmax - tmin
    rows = bvh.rows
    links = None if (bvh.merged or bvh.wide) else bvh.links

    # Direction octant selects the ordered link/thread set. Binary layouts
    # address per-octant tables (okt_off = okt * N, cur stays local); the
    # wide layout packs all octants' thread words into its single row, so
    # okt_off carries the RAW octant 0..7.
    n_per = rows.shape[0] // 8 if bvh.merged else rows.shape[0]
    okt_scale = 1 if bvh.wide else n_per
    okt_off = okt_scale * ((directions[:, 0] < 0).astype(jnp.int32)
                           + 2 * (directions[:, 1] < 0).astype(jnp.int32)
                           + 4 * (directions[:, 2] < 0).astype(jnp.int32))
    if any_hit and profile != "primary":
        profile = "anyhit"
    sched = _SCHEDULES_WIDE if bvh.wide else _SCHEDULES
    step_fn = _step_wide if bvh.wide else _step
    seg0, tiers = sched[
        (n_per > _BIG_NODES,
         profile if profile in ("primary", "anyhit") else "incoherent")]
    state = (jnp.zeros((r,), jnp.int32),
             jnp.full((r,), jnp.inf),
             jnp.full((r,), -1, jnp.int32),
             jnp.zeros((r,)), jnp.zeros((r,)),
             jnp.ones((r,), bool))
    state = _run_steps(seg0, rows, links, okt_off, o, directions, inv_d,
                       tmax_eff, state, any_hit, alpha_of, step_fn)
    cur, t_best, best_tri, uo, vo, alive = state
    trunc = jnp.int32(0)

    if r < _MIN_COMPACT:
        state = _run_while(rows, links, okt_off, o, directions, inv_d,
                           tmax_eff,
                           (cur, t_best, best_tri, uo, vo, alive),
                           any_hit, alpha_of, step_fn)
        cur, t_best, best_tri, uo, vo, alive = state
        trunc += jnp.sum(alive.astype(jnp.int32))
        t_out = jnp.where(best_tri >= 0, t_best + tmin, jnp.inf)
        return dict(t=t_out, tri=best_tri, u=uo, v=vo, trunc=trunc)

    # Compaction ladder. Each tier packs the previous tier's survivors.
    # Scatter-back indices are remembered per tier and applied inner-first.
    # `alive` rides in the buffers so capacity OVERFLOW is safe: a ray that
    # didn't fit a tier keeps alive=True in its parent's buffers, the
    # unwind surfaces it, and the final full-width while-tail finishes it
    # (cost ~zero when the ladder fits the scene's survival curve — the
    # tail's first cond exits; the r2 ladder silently DROPPED overflow,
    # which truncated 97% of rays on the 289k-tri atrium interior).
    tier_stack = []   # (orig_idx, buffers-at-tier before overwrite)
    cur_bufs = (cur, t_best, best_tri, uo, vo, alive)
    cur_o, cur_d, cur_inv, cur_off, cur_alive = (o, directions, inv_d,
                                                 okt_off, alive)
    for shift, steps in tiers:
        # int = width shift (legacy); float = fraction of the wavefront,
        # rounded up to a whole 8-sublane group
        if isinstance(shift, float):
            cap = max((int(r * shift) + 7) & ~7, 8)
        else:
            cap = max(r >> shift, 1)
        orig, ok, packed, ov = _compact(
            cur_alive, cap,
            list(cur_bufs[:5]) + [cur_o, cur_d, cur_inv, cur_off])
        p_cur, p_t, p_tri, p_u, p_v, p_o, p_d, p_inv, p_off = packed
        st = (p_cur, p_t, p_tri, p_u, p_v, ok)
        if steps is None:
            st = _run_while(rows, links, p_off, p_o, p_d, p_inv, tmax_eff,
                            st, any_hit, alpha_of, step_fn)
        else:
            st = _run_steps(steps, rows, links, p_off, p_o, p_d, p_inv,
                            tmax_eff, st, any_hit, alpha_of, step_fn)
        tier_stack.append((orig, cur_bufs))
        cur_bufs = st
        cur_o, cur_d, cur_inv, cur_off, cur_alive = (p_o, p_d, p_inv, p_off,
                                                     st[5])
        if steps is None:
            break

    # Unwind: scatter each tier's results into its parent (empty slots
    # carry out-of-range indices and drop). Overflowed rays keep their
    # parent-tier state with alive=True.
    child = cur_bufs
    for orig, parent in reversed(tier_stack):
        merged = tuple(
            pa.at[orig].set(ch, mode="drop")
            for pa, ch in zip(parent, child))
        child = merged
    cur, t_best, best_tri, uo, vo, alive = child

    # Overflow-recovery: first COMPACTED (cap r/4 — overflow survivors are
    # stragglers), then a full-width while whose cond exits immediately in
    # the common all-done case. Keeps mis-tuned ladders correct without
    # paying full width for a handful of wandering rays.
    rec_cap = max(r >> 2, 1)
    orig, ok, packed, _ = _compact(
        alive, rec_cap,
        [cur, t_best, best_tri, uo, vo, o, directions, inv_d, okt_off])
    p_cur, p_t, p_tri, p_u, p_v, p_o, p_d, p_inv, p_off = packed
    st = _run_while(rows, links, p_off, p_o, p_d, p_inv, tmax_eff,
                    (p_cur, p_t, p_tri, p_u, p_v, ok), any_hit, alpha_of,
                    step_fn)
    parent = (cur, t_best, best_tri, uo, vo, alive)
    merged = tuple(pa.at[orig].set(ch, mode="drop")
                   for pa, ch in zip(parent, st))
    cur, t_best, best_tri, uo, vo, alive = merged

    st = _run_while(rows, links, okt_off, o, directions, inv_d, tmax_eff,
                    (cur, t_best, best_tri, uo, vo, alive),
                    any_hit, alpha_of, step_fn)
    _, t_best, best_tri, uo, vo, alive = st
    trunc += jnp.sum(alive.astype(jnp.int32))

    t_out = jnp.where(best_tri >= 0, t_best + tmin, jnp.inf)
    return dict(t=t_out, tri=best_tri, u=uo, v=vo, trunc=trunc)


def occluded(bvh: SceneBVH, origins, directions, tmin=0.1, tmax=1000.0,
             alpha_of=None):
    """Boolean shadow query (ref: lighting/common.hlsli:98-116: TMin 0.1,
    TMax 1000, backface culling). alpha_of: optional any-hit alpha filter."""
    return trace(bvh, origins, directions, tmin=tmin, tmax=tmax,
                 any_hit=True, alpha_of=alpha_of)["tri"] >= 0
