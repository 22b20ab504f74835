"""Tile-binned software rasterizer -> R32-int visibility buffer.

TPU-native replacement for the reference's hardware raster path
(ref: render-jobs/visibility-pass.inl + shaders/geo-raster/visibility-pass.hlsl):
instead of ExecuteIndirect draws with GPU-written args, culling and binning
produce bounded per-tile triangle lists (sort/compaction replaces the
reference's InterlockedAdd appends, SURVEY.md §2.4), and a Pallas kernel
rasterizes each screen tile with vectorized edge functions and a z-argmax
merge (no depth-test write races — reverse-Z GREATER_EQUAL semantics,
ref: visibility-pass.inl:133-155).

Pipeline (all shapes static):
1. vertex_transform    — object -> clip space, one batched matmul per frame.
2. triangle_setup      — 2D homogeneous edge coefficients (Olano-Greer
                         style): no near-plane clipping needed for coverage;
                         triangles with any w <= eps are culled for now.
3. bin_triangles       — per-tile triangle lists via sort-by-tile-key;
                         triangles spanning > max_span tiles go to a global
                         "big" list processed by every tile.
4. rasterize_tiles     — Pallas kernel: per tile, loop binned chunks, eval
                         4 linear forms (3 edges + depth) per triangle over
                         the whole tile, reduce closest hit.

The visibility id encoding matches the reference: prim << 20 | triangle
(ref: shaders/geo-raster/encoding.hlsli:4-12), clear = 0xFFFFF000.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import mathutils as mu

# Setup row layout (see triangle_setup): 12 f32 per triangle.
_SETUP_ROWS = 12
_W_EPS = 1e-3  # minimum clip w (triangles crossing the w=eps plane are culled)


class RasterParams(NamedTuple):
    """Static rasterizer configuration (part of the jit cache key)."""
    width: int
    height: int
    tile_h: int = 16
    tile_w: int = 128
    bin_capacity: int = 1024
    bin_max_span: int = 16
    big_tri_capacity: int = 512
    chunk: int = 32           # triangles evaluated per kernel inner step

    @property
    def tiles_x(self) -> int:
        return pl.cdiv(self.width, self.tile_w)

    @property
    def tiles_y(self) -> int:
        return pl.cdiv(self.height, self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def padded_width(self) -> int:
        return self.tiles_x * self.tile_w

    @property
    def padded_height(self) -> int:
        return self.tiles_y * self.tile_h


# ---------------------------------------------------------------------------
# 1. Vertex transform
# ---------------------------------------------------------------------------

def vertex_transform(positions, vtx_mesh, mesh_transforms, scene_rotation,
                     view_proj):
    """Object-space positions -> (clip (V,4), world (V,3)).

    The reference does localToWorld = local * sceneRotation and
    localToClip = localToWorld * viewProj per draw
    (ref: geo-raster/visibility-pass.hlsl:60-66); here the combined matrices
    are built once per mesh instance and applied in one gathered matmul.
    """
    local_to_world = jnp.einsum("mij,jk->mik", mesh_transforms,
                                scene_rotation)
    local_to_clip = jnp.einsum("mij,jk->mik", local_to_world, view_proj)
    h = jnp.concatenate(
        [positions, jnp.ones_like(positions[:, :1])], axis=-1)
    m_clip = local_to_clip[vtx_mesh]       # (V, 4, 4)
    m_world = local_to_world[vtx_mesh]
    clip = jnp.einsum("vi,vij->vj", h, m_clip)
    world = jnp.einsum("vi,vij->vj", h, m_world)[:, :3]
    return clip, world


# ---------------------------------------------------------------------------
# 2. Triangle setup (2D homogeneous)
# ---------------------------------------------------------------------------

def triangle_setup(clip, scene, prim_visible, params: RasterParams):
    """Per-triangle edge/depth linear forms + screen bbox.

    Returns:
      setup_t: (_SETUP_ROWS, T) f32 — rows 0-2/3-5/6-8 the three edge
               coefficient triples (a, b, c) over pixel coords (px, py, 1),
               rows 9-11 the depth plane (z_ndc = a*px + b*py + c).
      ids:     (T,) int32 global triangle indices (the raster output; the
               reference's prim << 20 | tri visibility encoding is derived
               from these on demand — see visibility_from_tri).
      valid:   (T,) bool — in front of camera, front-facing or double-sided,
               non-degenerate, bbox intersects screen, primitive visible.
      bbox:    (T, 4) int32 — inclusive pixel-space x0, y0, x1, y1.
    """
    w, h = params.width, params.height
    tv = scene.tri_vtx
    c0, c1, c2 = clip[tv[:, 0]], clip[tv[:, 1]], clip[tv[:, 2]]

    # Screen-homogeneous coords: (sx, sy, sw) with sx/sw = pixel x.
    def screen_h(c):
        sx = (0.5 * c[:, 0] + 0.5 * c[:, 3]) * w
        sy = (-0.5 * c[:, 1] + 0.5 * c[:, 3]) * h   # y flips: NDC up, pixels down
        return jnp.stack([sx, sy, c[:, 3]], axis=-1)

    p0, p1, p2 = screen_h(c0), screen_h(c1), screen_h(c2)
    e0 = jnp.cross(p1, p2)
    e1 = jnp.cross(p2, p0)
    e2 = jnp.cross(p0, p1)
    det = jnp.sum(p0 * e0, axis=-1)

    prim = scene.tri_prim
    safe_prim = jnp.maximum(prim, 0)
    double_sided = scene.prim_double_sided[safe_prim] > 0
    # Front faces: glTF CCW front in RH becomes, after the RH->LH root flip
    # and the y-down screen mapping above, det < 0 (D3D
    # FrontCounterClockwise=TRUE equivalent; ref: visibility-pass.inl:111-112).
    front = det < 0.0
    wmin = jnp.minimum(jnp.minimum(c0[:, 3], c1[:, 3]), c2[:, 3])

    valid = (prim >= 0)
    valid &= prim_visible[safe_prim]
    valid &= wmin > _W_EPS
    valid &= jnp.abs(det) > 1e-12
    valid &= front | double_sided

    # Flip edge signs so the interior is E >= 0 regardless of winding.
    s = jnp.where(det >= 0.0, 1.0, -1.0)[:, None]
    e0, e1, e2 = e0 * s, e1 * s, e2 * s
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.abs(det), 0.0)

    # Depth plane: z_ndc(p) = sum_i E_i(p) * z_clip_i / |det|.
    z = jnp.stack([c0[:, 2], c1[:, 2], c2[:, 2]], axis=-1) * inv_det[:, None]
    zplane = e0 * z[:, 0:1] + e1 * z[:, 1:2] + e2 * z[:, 2:3]

    # Pixel bbox from projected verts (w > eps guaranteed where valid).
    sp = jnp.stack([p0, p1, p2], axis=1)              # (T, 3, 3)
    xy = sp[..., :2] / jnp.maximum(sp[..., 2:3], _W_EPS)
    mn = jnp.floor(jnp.min(xy, axis=1)).astype(jnp.int32)
    mx = jnp.floor(jnp.max(xy, axis=1)).astype(jnp.int32)
    x0 = jnp.clip(mn[:, 0], 0, w - 1)
    y0 = jnp.clip(mn[:, 1], 0, h - 1)
    x1 = jnp.clip(mx[:, 0], 0, w - 1)
    y1 = jnp.clip(mx[:, 1], 0, h - 1)
    valid &= (mx[:, 0] >= 0) & (mn[:, 0] <= w - 1)
    valid &= (mx[:, 1] >= 0) & (mn[:, 1] <= h - 1)

    ids = jax.lax.broadcasted_iota(jnp.int32, (prim.shape[0], 1), 0)[:, 0]

    setup_t = jnp.concatenate([e0.T, e1.T, e2.T, zplane.T], axis=0)
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)
    return setup_t.astype(jnp.float32), ids, valid, bbox


# Attribute-plane row layout (triangle_attributes): 32 f32 per triangle.
ATTR_ROWS = 32
# slices: uv numerator planes (0:6), world-normal planes (6:15),
# world-tangent planes (15:24), denominator plane (24:27),
# tangent sign (27), material id (28), uv at vertex 0 for degenerate
# fallback (29:31), spare (31)


def triangle_attributes(clip, scene, world_n_v, world_t_v,
                        params: RasterParams):
    """Per-triangle screen-space attribute planes (T, 32).

    With 2D-homogeneous edge forms E_i, any vertex attribute f interpolates
    perspective-correctly as f(p) = sum_i E_i(p) f_i / sum_i E_i(p) — so each
    attribute channel needs only the 3-coefficient numerator plane
    sum_i f_i e_i, and one shared denominator plane sum_i e_i. This replaces
    the reference's per-pixel triangle fetch + CalcBarycentrics
    (ref: gbuffer-compute.hlsl:23-47, 94-121) with per-triangle setup that the
    resolve reads back with a single gather per pixel — per-pixel random
    access is the scarce resource on TPU, not FLOPs.
    """
    w, h = params.width, params.height
    tv = scene.tri_vtx
    c0, c1, c2 = clip[tv[:, 0]], clip[tv[:, 1]], clip[tv[:, 2]]

    def screen_h(c):
        sx = (0.5 * c[:, 0] + 0.5 * c[:, 3]) * w
        sy = (-0.5 * c[:, 1] + 0.5 * c[:, 3]) * h
        return jnp.stack([sx, sy, c[:, 3]], axis=-1)

    p0, p1, p2 = screen_h(c0), screen_h(c1), screen_h(c2)
    e0 = jnp.cross(p1, p2)
    e1 = jnp.cross(p2, p0)
    e2 = jnp.cross(p0, p1)
    det = jnp.sum(p0 * e0, axis=-1)
    s = jnp.where(det >= 0.0, 1.0, -1.0)[:, None]
    e0, e1, e2 = e0 * s, e1 * s, e2 * s

    def planes(f0, f1, f2):
        # (T, C) per-channel -> (T, C, 3) numerator planes
        return (f0[..., None] * e0[:, None, :]
                + f1[..., None] * e1[:, None, :]
                + f2[..., None] * e2[:, None, :])

    i0, i1, i2 = tv[:, 0], tv[:, 1], tv[:, 2]
    uv_p = planes(scene.uvs[i0], scene.uvs[i1], scene.uvs[i2])
    wn_p = planes(world_n_v[i0], world_n_v[i1], world_n_v[i2])
    wt_p = planes(world_t_v[i0], world_t_v[i1], world_t_v[i2])
    denom = e0 + e1 + e2

    t = tv.shape[0]
    prim = jnp.maximum(scene.tri_prim, 0)
    attr = jnp.concatenate([
        uv_p.reshape(t, 6),
        wn_p.reshape(t, 9),
        wt_p.reshape(t, 9),
        denom,
        scene.tangents[i0][:, 3:4],
        scene.prim_material[prim].astype(jnp.float32)[:, None],
        scene.uvs[i0],
        jnp.zeros((t, 1), jnp.float32),
    ], axis=-1)
    return attr.astype(jnp.float32)


# ---------------------------------------------------------------------------
# 3. Binning
# ---------------------------------------------------------------------------

_INVALID_ROW = np.zeros((_SETUP_ROWS,), np.float32)
_INVALID_ROW[2] = -1.0  # E0 == -1 everywhere -> never covered


class Bins(NamedTuple):
    setup: jnp.ndarray        # (NT, C, _SETUP_ROWS) f32
    ids: jnp.ndarray          # (NT, C, 1) i32
    counts: jnp.ndarray       # (NT,) i32 (clamped to C)
    big_setup: jnp.ndarray    # (BIG, _SETUP_ROWS) f32
    big_ids: jnp.ndarray      # (BIG, 1) i32
    big_count: jnp.ndarray    # (1,) i32
    overflow: jnp.ndarray     # () i32 — dropped tile-list entries
    big_overflow: jnp.ndarray  # () i32 — dropped big triangles


def bin_triangles(setup_t, ids, valid, bbox, params: RasterParams) -> Bins:
    """Build bounded per-tile triangle lists (replaces GPU atomic appends,
    ref: culling/batch-culling.hlsl:85-116)."""
    p = params
    t = ids.shape[0]
    span_cap = p.bin_max_span

    tx0 = bbox[:, 0] // p.tile_w
    ty0 = bbox[:, 1] // p.tile_h
    tx1 = bbox[:, 2] // p.tile_w
    ty1 = bbox[:, 3] // p.tile_h
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h

    small = valid & (span <= span_cap)
    big = valid & (span > span_cap)

    # (T, span_cap) candidate tile keys; invalid slots get sentinel NT.
    k = jax.lax.broadcasted_iota(jnp.int32, (t, span_cap), 1)
    dy = k // span_w[:, None]
    dx = k - dy * span_w[:, None]
    tile = (ty0[:, None] + dy) * p.tiles_x + tx0[:, None] + dx
    pair_ok = small[:, None] & (k < span[:, None])
    keys = jnp.where(pair_ok, tile, p.num_tiles).reshape(-1)
    vals = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0), (t, span_cap)
    ).reshape(-1)

    keys_s, tri_s = jax.lax.sort_key_val(keys, vals)

    tile_range = jax.lax.broadcasted_iota(jnp.int32, (p.num_tiles, 1), 0)[:, 0]
    starts = jnp.searchsorted(keys_s, tile_range, side="left")
    ends = jnp.searchsorted(keys_s, tile_range, side="right")
    counts_full = (ends - starts).astype(jnp.int32)
    counts = jnp.minimum(counts_full, p.bin_capacity)
    overflow = jnp.sum(counts_full - counts)

    slot = jax.lax.broadcasted_iota(jnp.int32, (p.num_tiles, p.bin_capacity),
                                    1)
    gather_idx = jnp.clip(starts[:, None] + slot, 0, keys_s.shape[0] - 1)
    tri_dense = tri_s[gather_idx]                      # (NT, C)
    slot_ok = slot < counts[:, None]

    # Gather setup rows; invalid slots get the never-covered row.
    binned = setup_t.T[tri_dense]                      # (NT, C, 12)
    binned = jnp.where(slot_ok[..., None], binned,
                       jnp.asarray(_INVALID_ROW)[None, None, :])
    ids_dense = jnp.where(slot_ok, ids[tri_dense], 0)[..., None]

    # Big-triangle list via cumsum compaction (no atomics on TPU).
    big_i = big.astype(jnp.int32)
    pos = jnp.cumsum(big_i) - 1
    n_big = jnp.sum(big_i)
    cap = p.big_tri_capacity
    scatter_to = jnp.where(big & (pos < cap), pos, cap)
    tri_iota = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0]
    big_tris = jnp.zeros((cap + 1,), jnp.int32).at[scatter_to].set(
        tri_iota, mode="drop")[:cap]
    big_count = jnp.minimum(n_big, cap)
    big_slot_ok = (jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
                   < big_count)
    big_setup = jnp.where(big_slot_ok[:, None], setup_t.T[big_tris],
                          jnp.asarray(_INVALID_ROW)[None, :])
    big_ids = jnp.where(big_slot_ok, ids[big_tris], 0)[:, None]

    return Bins(setup=binned, ids=ids_dense, counts=counts,
                big_setup=big_setup, big_ids=big_ids,
                big_count=big_count.reshape(1).astype(jnp.int32),
                overflow=overflow, big_overflow=n_big - big_count)


# ---------------------------------------------------------------------------
# 4. Fine raster (Pallas)
# ---------------------------------------------------------------------------

def _raster_kernel(counts_ref, bigcount_ref, setup_ref, ids_ref,
                   big_setup_ref, big_ids_ref, tri_ref, z_ref,
                   *, params: RasterParams):
    p = params
    ti = pl.program_id(0)
    ty = ti // p.tiles_x
    tx = ti - ty * p.tiles_x

    n = p.tile_h * p.tile_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    py = pix // p.tile_w
    px = pix - py * p.tile_w
    colf = (px + tx * p.tile_w).astype(jnp.float32) + 0.5
    rowf = (py + ty * p.tile_h).astype(jnp.float32) + 0.5

    clear = jnp.full((1, n), -1, jnp.int32)

    def eval_chunk(rows, rid, zb, vb):
        """rows: (K, 12) coefficient slab; rid: (K, 1) ids."""
        e0 = rows[:, 0:1] * colf + rows[:, 1:2] * rowf + rows[:, 2:3]
        e1 = rows[:, 3:4] * colf + rows[:, 4:5] * rowf + rows[:, 5:6]
        e2 = rows[:, 6:7] * colf + rows[:, 7:8] * rowf + rows[:, 8:9]
        z = rows[:, 9:10] * colf + rows[:, 10:11] * rowf + rows[:, 11:12]
        cov = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
        mz = jnp.where(cov, z, -1.0)                     # (K, n)
        zc = jnp.max(mz, axis=0, keepdims=True)          # (1, n)
        win = (mz >= zc) & cov                           # ties: max id wins
        idc = jnp.max(jnp.where(win, rid, jnp.int32(-2**31)),
                      axis=0, keepdims=True)
        passed = (zc >= 0.0) & (zc >= zb)
        return (jnp.where(passed, zc, zb),
                jnp.where(passed, idc, vb))

    def chunk_body(c, carry):
        zb, vb = carry
        base = c * p.chunk
        rows = setup_ref[0, pl.ds(base, p.chunk), :]
        rid = ids_ref[0, pl.ds(base, p.chunk), :]
        return eval_chunk(rows, rid, zb, vb)

    def big_body(c, carry):
        zb, vb = carry
        base = c * p.chunk
        rows = big_setup_ref[pl.ds(base, p.chunk), :]
        rid = big_ids_ref[pl.ds(base, p.chunk), :]
        return eval_chunk(rows, rid, zb, vb)

    count = counts_ref[ti]
    zb, vb = jax.lax.fori_loop(
        0, pl.cdiv(count, p.chunk), chunk_body,
        (jnp.zeros((1, n), jnp.float32), clear))
    zb, vb = jax.lax.fori_loop(
        0, pl.cdiv(bigcount_ref[0], p.chunk), big_body, (zb, vb))

    tri_ref[:, :] = vb.reshape(p.tile_h, p.tile_w)
    z_ref[:, :] = zb.reshape(p.tile_h, p.tile_w)


def rasterize_tiles(bins: Bins, params: RasterParams):
    """Run the fine-raster kernel. Returns (tri (H,W) i32 global triangle
    index, -1 = no geometry; depth (H,W) f32) cropped to the resolution."""
    p = params
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p.num_tiles,),
        in_specs=[
            pl.BlockSpec((1, p.bin_capacity, _SETUP_ROWS),
                         lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p.bin_capacity, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((p.big_tri_capacity, _SETUP_ROWS),
                         lambda i, *_: (0, 0)),
            pl.BlockSpec((p.big_tri_capacity, 1), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((p.tile_h, p.tile_w),
                         lambda i, *_: (i // p.tiles_x, i % p.tiles_x)),
            pl.BlockSpec((p.tile_h, p.tile_w),
                         lambda i, *_: (i // p.tiles_x, i % p.tiles_x)),
        ],
    )
    tri, depth = pl.pallas_call(
        functools.partial(_raster_kernel, params=p),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p.padded_height, p.padded_width),
                                 jnp.int32),
            jax.ShapeDtypeStruct((p.padded_height, p.padded_width),
                                 jnp.float32),
        ],
        interpret=_should_interpret(),
    )(bins.counts, bins.big_count, bins.setup, bins.ids,
      bins.big_setup, bins.big_ids)
    return tri[:p.height, :p.width], depth[:p.height, :p.width]


def _should_interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on non-TPU backends
    (tests run on the virtual CPU mesh, SURVEY.md §4). jax_default_device is
    consulted because this machine registers a TPU platform that cannot be
    disabled via JAX_PLATFORMS (see tests/conftest.py)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform != "tpu"
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# End-to-end visibility pass
# ---------------------------------------------------------------------------

def render_visibility(scene, vtx_mesh, scene_rotation, view_proj,
                      prim_visible, params: RasterParams):
    """Full visibility-buffer pass: transform, setup, bin, rasterize.

    Returns (tri (H,W) i32, depth, clip, world, stats_dict).
    """
    clip, world = vertex_transform(scene.positions, vtx_mesh,
                                   scene.mesh_transforms, scene_rotation,
                                   view_proj)
    setup_t, ids, valid, bbox = triangle_setup(clip, scene, prim_visible,
                                               params)
    bins = bin_triangles(setup_t, ids, valid, bbox, params)
    tri, depth = rasterize_tiles(bins, params)
    stats = dict(bin_overflow=bins.overflow, big_overflow=bins.big_overflow,
                 culled_triangles=jnp.sum(~valid))
    return tri, depth, clip, world, stats


def visibility_from_tri(tri, scene):
    """Global triangle index map -> the reference's visibility-buffer ids
    (prim << 20 | local_tri, clear 0xFFFFF000 —
    ref: shaders/geo-raster/encoding.hlsli). Used by debug view modes and
    parity tests; the hot path consumes the triangle index directly."""
    mask = tri >= 0
    safe = jnp.maximum(tri, 0)
    prim = jnp.maximum(scene.tri_prim[safe], 0)
    local = safe - scene.prim_tri_offset[prim]
    vis = mu.encode_primitive_visibility(prim, local)
    return jnp.where(mask, vis, mu.VIS_CLEAR_INT32)
