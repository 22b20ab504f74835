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
_W_EPS = 1e-3  # clip-w epsilon: triangles with ALL w <= eps are culled;
#                triangles CROSSING w = eps rasterize unclipped via the 2D
#                homogeneous edge forms (Olano-Greer) with the EXACT bbox
#                of their w >= eps clipped polygon — the kernel's
#                z <= 1 bound supplies the near-plane clip.


class RasterParams(NamedTuple):
    """Static rasterizer configuration (part of the jit cache key)."""
    width: int
    height: int
    tile_h: int = 16
    tile_w: int = 128
    pair_capacity: int = 1 << 20  # total (tile, triangle) pairs per frame
    bin_max_span: int = 16
    big_tri_capacity: int = 512
    bin_mid_span: int = 64    # triangles spanning (bin_max_span, mid] tiles
    #                           bin exactly via a second compacted expansion
    #                           (capacity mid_tri_capacity) instead of the
    #                           every-tile big list — at 1080p the big list
    #                           saturated at 512 triangles and its broadcast
    #                           evaluation was ~20 ms of the honest frame.
    #                           <= bin_max_span disables the mid tier.
    mid_tri_capacity: int = 1024
    chunk: int = 128          # triangles per kernel DMA chunk (multiple of 8)
    interpret: bool = None    # force Pallas interpret mode (None = auto by
    #                           the default device; set by the band sharder
    #                           from the mesh's platform)
    depth_only: bool = False  # depth/coverage only: no attribute stream is
    #                           built or selected (shadow-map passes — the
    #                           kernel's second pass and its DMA are skipped)

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
    # HIGHEST is required: the TPU MXU default truncates these matrices
    # to bf16, displacing every vertex ~0.2-0.4% (pixels at 1080p) and
    # wrecking the UV plane coefficients downstream (conformance measured
    # 0.52 rel err on interpolated UVs from exactly this).
    local_to_world = jnp.einsum("mij,jk->mik", mesh_transforms,
                                scene_rotation,
                                precision=jax.lax.Precision.HIGHEST)
    local_to_clip = jnp.einsum("mij,jk->mik", local_to_world, view_proj,
                               precision=jax.lax.Precision.HIGHEST)
    # One wide-row gather of both matrices per vertex, then explicit
    # multiply-adds (cheaper than per-vertex batched matmuls on TPU).
    packed = jnp.concatenate([local_to_clip.reshape(-1, 16),
                              local_to_world.reshape(-1, 16)], axis=-1)
    m = packed[vtx_mesh]                   # (V, 32)
    mc = m[:, :16].reshape(-1, 4, 4)
    mw = m[:, 16:].reshape(-1, 4, 4)
    x, y, z = positions[:, 0:1], positions[:, 1:2], positions[:, 2:3]
    clip = x * mc[:, 0] + y * mc[:, 1] + z * mc[:, 2] + mc[:, 3]
    world = (x * mw[:, 0, :3] + y * mw[:, 1, :3] + z * mw[:, 2, :3]
             + mw[:, 3, :3])
    return clip, world


# ---------------------------------------------------------------------------
# 2. Triangle setup (2D homogeneous)
# ---------------------------------------------------------------------------

def triangle_setup(clip, scene, prim_visible, params: RasterParams,
                   tri_visible=None):
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
    wmax = jnp.maximum(jnp.maximum(c0[:, 3], c1[:, 3]), c2[:, 3])
    # Near-plane-crossing triangles rasterize unclipped (2DH edge forms);
    # their projected bbox is meaningless, so they get the full screen and
    # route to the big-triangle list. The facing test is skipped for them:
    # a vertex behind the eye flips the projected winding, making det's
    # sign unreliable (hardware culls after clipping; reverse-Z kills the
    # behind-eye part here instead).
    crossing = (wmin <= _W_EPS) & (wmax > _W_EPS)

    valid = (prim >= 0)
    valid &= prim_visible[safe_prim]
    if tri_visible is not None:
        valid &= tri_visible
    valid &= wmax > _W_EPS
    valid &= jnp.abs(det) > 1e-12
    valid &= front | double_sided | crossing

    # Flip edge signs so the interior is E >= 0 regardless of winding.
    s = jnp.where(det >= 0.0, 1.0, -1.0)[:, None]
    e0, e1, e2 = e0 * s, e1 * s, e2 * s
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.abs(det), 0.0)

    # Depth plane: z_ndc(p) = sum_i E_i(p) * z_clip_i / |det|.
    z = jnp.stack([c0[:, 2], c1[:, 2], c2[:, 2]], axis=-1) * inv_det[:, None]
    zplane = e0 * z[:, 0:1] + e1 * z[:, 1:2] + e2 * z[:, 2:3]

    # Pixel bbox. Near-plane-crossing triangles get the EXACT bbox of the
    # w >= eps clipped polygon (in-front vertices + the two crossing-edge
    # intersections at w = eps) instead of the former conservative
    # full-screen bbox — a camera inside foliage put hundreds of crossing
    # triangles on the every-tile big list (~2 ms/pass of broadcast
    # evaluation each at 1080p). The raster itself stays unclipped 2DH.
    sp = jnp.stack([p0, p1, p2], axis=1)              # (T, 3, 3)
    ws = sp[..., 2]
    in_front = ws > _W_EPS
    xy_v = sp[..., :2] / jnp.maximum(ws, _W_EPS)[..., None]
    nxt = jnp.roll(sp, -1, axis=1)
    w_a, w_b = ws, jnp.roll(ws, -1, axis=1)
    cross_e = in_front != (w_b > _W_EPS)
    den = w_a - w_b
    te = (w_a - _W_EPS) / jnp.where(jnp.abs(den) > 1e-20, den, 1.0)
    xy_e = (sp[..., :2] + te[..., None] * (nxt[..., :2] - sp[..., :2])) \
        / _W_EPS
    cand = jnp.concatenate([xy_v, xy_e], axis=1)      # (T, 6, 2)
    cok = jnp.concatenate([in_front, cross_e], axis=1)[..., None]
    big_f = jnp.float32(2.0e6)
    mn = jnp.min(jnp.where(cok, cand, big_f), axis=1)
    mx = jnp.max(jnp.where(cok, cand, -big_f), axis=1)
    mn = jnp.floor(jnp.clip(mn, -big_f, big_f)).astype(jnp.int32)
    mx = jnp.floor(jnp.clip(mx, -big_f, big_f)).astype(jnp.int32)
    x0 = jnp.clip(mn[:, 0], 0, w - 1)
    y0 = jnp.clip(mn[:, 1], 0, h - 1)
    x1 = jnp.clip(mx[:, 0], 0, w - 1)
    y1 = jnp.clip(mx[:, 1], 0, h - 1)
    onscreen = ((mx[:, 0] >= 0) & (mn[:, 0] <= w - 1)
                & (mx[:, 1] >= 0) & (mn[:, 1] <= h - 1))
    valid &= onscreen

    ids = jax.lax.broadcasted_iota(jnp.int32, (prim.shape[0], 1), 0)[:, 0]

    setup_t = jnp.concatenate([e0.T, e1.T, e2.T, zplane.T], axis=0)
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)
    return setup_t.astype(jnp.float32), ids, valid, bbox


# Per-triangle attribute planes (triangle_attributes): ONE (T, 29) f32 row.
# Per-pixel gathers of these rows are the slow path on TPU (wide rows from a
# >VMEM table run ~60 M rows/s); instead the rows ride the binned pair
# stream into the fine-raster kernel, which selects the WINNING pair's
# coefficients per pixel with an MXU matmul (match-mask x coefficient
# matrix) and evaluates the planes once per pixel — zero per-pixel random
# access for attributes.
# Layout: uv-U plane (0:3), uv-V plane (3:6), denominator plane (6:9),
# world-normal X/Y/Z planes (9:18), world-tangent X/Y/Z planes (18:27),
# tangent sign (27), material id (28).
ATTR_ROWS = 29

# Interpolated per-pixel attribute channels emitted by the kernel:
# u, v, wn.xyz, wt.xyz, sign, matid, dudx, dudy, dvdx, dvdy, spare x2.
INTERP_CHANNELS = 16


def _attr_flat(ch_p, denom, sign, matid):
    """(T, 29) attribute-plane rows from channel planes ch_p (T, 8, 3)
    ordered [u, v, wnx, wny, wnz, wtx, wty, wtz]."""
    t = ch_p.shape[0]
    return jnp.concatenate([
        ch_p[:, 0], ch_p[:, 1], denom,
        ch_p.reshape(t, 24)[:, 6:],                   # wn + wt planes
        sign, matid], axis=-1).astype(jnp.float32)


def triangle_attributes(clip, scene, world_n_v, world_t_v,
                        params: RasterParams):
    """Per-triangle screen-space attribute planes (T, 29).

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

    # Packed per-vertex attribute rows: ONE wide gather per corner instead of
    # four narrow ones (uv/wn/wt/sign).
    v = scene.positions.shape[0]
    vattr = jnp.concatenate([
        scene.uvs, world_n_v, world_t_v, scene.tangents[:, 3:4],
    ], axis=-1)                                    # (V, 9)
    a0, a1, a2 = vattr[tv[:, 0]], vattr[tv[:, 1]], vattr[tv[:, 2]]

    def planes(s0, s1, s2):
        # (T, C) per-channel -> (T, C, 3) numerator planes
        return (s0[..., None] * e0[:, None, :]
                + s1[..., None] * e1[:, None, :]
                + s2[..., None] * e2[:, None, :])

    ch_p = planes(a0[:, :8], a1[:, :8], a2[:, :8])  # uv(2) + wn(3) + wt(3)
    denom = e0 + e1 + e2

    prim = jnp.maximum(scene.tri_prim, 0)
    return _attr_flat(
        ch_p, denom, a0[:, 8:9],
        scene.prim_material[prim].astype(jnp.float32)[:, None])


# ---------------------------------------------------------------------------
# 3. Binning
# ---------------------------------------------------------------------------

_INVALID_ROW = np.zeros((_SETUP_ROWS,), np.float32)
_INVALID_ROW[2] = -1.0  # E0 == -1 everywhere -> never covered


_PAIR_STRIDE = 16   # f32 lanes per pair: 12 coefficients + id + 3 spare
_PAIRS_PER_ROW = 8  # 8 pairs x 16 lanes = one full 128-lane row, so the
#                     kernel's per-chunk DMA slices are Mosaic-aligned at any
#                     row offset without padding each pair to 128 lanes

# Attribute pair stream: 32 f32 lanes per pair (29 attr-plane values + the
# triangle id at lane 29), 4 pairs per 128-lane row. A separate stream keeps
# the z/id pass's DMA density unchanged.
_APAIR_STRIDE = 32
_APAIRS_PER_ROW = 4
_ID_LANE = 29


class Bins(NamedTuple):
    # CSR layout: pairs sorted by tile; tile i owns pair indices
    # [starts[i], starts[i] + counts[i]). Pairs are packed 8 to a 128-lane
    # row (pair j of a row at lanes 16j..16j+12: 12 setup coefficients +
    # exact-float triangle id); the fine-raster kernel streams whole rows
    # with double-buffered DMA and masks leading/trailing pairs — no dense
    # per-tile padding is ever materialized. `attr` carries the matching
    # attribute-plane stream (32 lanes/pair) consumed by the kernel's
    # second (attribute-select) pass.
    setup: jnp.ndarray        # (P_cap/8 + pad, 128) f32
    attr: jnp.ndarray         # (P_cap/4 + pad, 128) f32
    starts: jnp.ndarray       # (NT,) i32 pair index
    counts: jnp.ndarray       # (NT,) i32
    big_setup: jnp.ndarray    # (BIG, _SETUP_ROWS) f32
    big_ids: jnp.ndarray      # (BIG, 1) f32 (exact float triangle ids)
    big_attr: jnp.ndarray     # (BIG, _APAIR_STRIDE) f32
    big_count: jnp.ndarray    # (1,) i32
    overflow: jnp.ndarray     # () i32 — dropped pairs (pair_capacity hit)
    big_overflow: jnp.ndarray  # () i32 — dropped big triangles
    # masked-layer mode (emit_amask=True): per-pair [U(3), V(3), D(3),
    # matid] planes at the setup stream's 8-pairs-per-row packing, for the
    # kernel's in-race certainly-transparent rejection; (1, 128) dummies
    # otherwise. tile_mat: the tile's PRIMARY material (its first pair's)
    # — the kernel reads that one amask row with a scalar dynamic-slice
    # and only rejects fragments whose pair material matches (fragments
    # of minority materials in a mixed tile conservatively keep).
    amask: jnp.ndarray = None         # (P_cap/8 + pad, 128) f32
    big_amask: jnp.ndarray = None     # (BIG, 16) f32
    tile_mat: jnp.ndarray = None      # (NT,) i32


def bin_triangles(setup_t, ids, valid, bbox, params: RasterParams,
                  attr_flat=None) -> Bins:
    """Build per-tile triangle lists (replaces GPU atomic appends,
    ref: culling/batch-culling.hlsl:85-116).

    attr_flat: optional (T, ATTR_ROWS) attribute-plane rows to thread into
    the pair stream (zeros when absent — the kernel's interp output is then
    meaningless and ignored)."""
    return bin_triangles_layered(setup_t, ids, valid, bbox, params,
                                 attr_flat)[0]


def bin_triangles_layered(setup_t, ids, valid, bbox, params: RasterParams,
                          attr_flat=None, layer=None,
                          n_layers: int = 1,
                          emit_amask: bool = False) -> list:
    """Layered binning: ONE candidate expansion + ONE sort + ONE pair-row
    gather shared by every raster layer of the frame (opaque, masked depth
    peels, decals, forward-blend). The layers are disjoint triangle sets,
    so the merged pair stream is no longer than any-layer-alone's capacity,
    and each layer's tile lists are contiguous slices of the one sorted
    stream. Running the binning once instead of per layer removed ~21 ms
    from the profiled 180 ms honest-bench frame (3x pair gathers + 3x
    sorts + 3x candidate expansions -> 1x).

    layer: optional (T,) int32 in [0, n_layers) — the raster layer each
    triangle belongs to (pairs from layer l are only visible to layer l's
    tile lists). None = everything in layer 0.

    Returns a list of n_layers Bins sharing the same setup/attr pair
    arrays; only starts/counts/big_* differ per layer. The pair-capacity
    `overflow` count is global and reported on layer 0 (zeros elsewhere).
    """
    p = params
    t = ids.shape[0]
    span_cap = p.bin_max_span
    nl = n_layers

    tx0 = bbox[:, 0] // p.tile_w
    ty0 = bbox[:, 1] // p.tile_h
    tx1 = bbox[:, 2] // p.tile_w
    ty1 = bbox[:, 3] // p.tile_h
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h

    small = valid & (span <= span_cap)
    # Mid tier: spans in (span_cap, mid_span] are compacted to
    # mid_tri_capacity slots and expanded exactly (mid_cap x mid_span
    # candidate keys joining the same sort) — only spans > mid_span (a
    # handful of near-plane-crossing / giant triangles) pay the every-tile
    # big list. Mids beyond capacity fall back to the big list (counted in
    # its overflow), never dropped.
    use_mid = p.bin_mid_span > span_cap
    if use_mid:
        mid_cap = p.mid_tri_capacity
        mid = valid & (span > span_cap) & (span <= p.bin_mid_span)
        mpos = jnp.cumsum(mid.astype(jnp.int32)) - 1
        mid_fit = mid & (mpos < mid_cap)
        big = valid & ((span > p.bin_mid_span) | (mid & ~mid_fit))
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0]
        # Compact fitting mids to the head via ONE key sort (fits keep
        # index order; non-fits sort behind as t + i) — a scatter here
        # profiled 1.35 ms per binning at 290k triangles vs ~0.25 for the
        # sort.
        mkeys = jnp.where(mid_fit, iota_t, t + iota_t)
        if t < mid_cap:
            mkeys = jnp.pad(mkeys, (0, mid_cap - t), constant_values=2 * t)
        mid_tri = jax.lax.sort(mkeys, is_stable=False)[:mid_cap]
        mid_ok = mid_tri < t
        safe_mt = jnp.minimum(mid_tri, t - 1)
    else:
        big = valid & (span > span_cap)

    # (T, span_cap) candidate tile keys. Bucket layout after the sort:
    # buckets 0..L-1 = big triangles per layer (span > cap — every tile of
    # that layer processes them), then L + l*NT + tile for layer l's screen
    # tiles, bucket L + L*NT = invalid sentinel. Putting bigs at the HEAD
    # means capacity truncation can never drop them and each layer's big
    # list is a slice of the sorted stream — no separate cumsum/scatter
    # compaction pass (profiled ~1.3 ms at 262k triangles).
    k = jax.lax.broadcasted_iota(jnp.int32, (t, span_cap), 1)
    dy = k // span_w[:, None]
    dx = k - dy * span_w[:, None]
    tile = (ty0[:, None] + dy) * p.tiles_x + tx0[:, None] + dx
    pair_ok = small[:, None] & (k < span[:, None])
    big_slot = big[:, None] & (k == 0)
    if layer is None:
        lyr2 = jnp.zeros((t, 1), jnp.int32)
    else:
        lyr2 = layer.astype(jnp.int32)[:, None]
    sentinel = nl + nl * p.num_tiles
    bucket = jnp.where(big_slot, lyr2,
                       jnp.where(pair_ok,
                                 nl + lyr2 * p.num_tiles + tile, sentinel))
    tri_iota2 = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0), (t, span_cap))

    n_mid_pairs = jnp.int32(0)
    if use_mid:
        # (mid_cap, mid_span) candidate keys for the compacted mid tris —
        # same bucket formula, original triangle ids.
        km = jax.lax.broadcasted_iota(jnp.int32, (mid_cap, p.bin_mid_span), 1)
        m_sw = span_w[safe_mt][:, None]
        dym = km // m_sw
        dxm = km - dym * m_sw
        tile_m = ((ty0[safe_mt][:, None] + dym) * p.tiles_x
                  + tx0[safe_mt][:, None] + dxm)
        mid_ok2 = mid_ok[:, None] & (km < span[safe_mt][:, None])
        bucket_m = jnp.where(mid_ok2,
                             nl + lyr2[safe_mt] * p.num_tiles + tile_m,
                             sentinel)
        tri_m = jnp.broadcast_to(safe_mt[:, None],
                                 (mid_cap, p.bin_mid_span))
        n_mid_pairs = jnp.sum(mid_ok2)

    # Pack (bucket, tri) into one int32 key when the bits fit — a
    # single-array non-stable sort is substantially cheaper than a
    # key-value sort (no materialized iota companion).
    tri_bits = max(int(np.ceil(np.log2(max(t, 2)))), 1)
    tile_bits = int(np.ceil(np.log2(sentinel + 1)))
    if tri_bits + tile_bits <= 31:
        packed = ((bucket << tri_bits) | tri_iota2).reshape(-1)
        if use_mid:
            packed = jnp.concatenate(
                [packed, ((bucket_m << tri_bits) | tri_m).reshape(-1)])
        keys_s = jax.lax.sort(packed, is_stable=False)
        tri_s = keys_s & ((1 << tri_bits) - 1)
        tile_keys = keys_s >> tri_bits
    else:
        bucket_all = bucket.reshape(-1)
        tri_all = tri_iota2.reshape(-1)
        if use_mid:
            bucket_all = jnp.concatenate([bucket_all, bucket_m.reshape(-1)])
            tri_all = jnp.concatenate([tri_all, tri_m.reshape(-1)])
        tile_keys, tri_s = jax.lax.sort_key_val(bucket_all, tri_all)

    # Truncate the sorted pair list at pair_capacity (valid pairs sort
    # before the sentinel, so truncation only drops pairs when the total
    # exceeds the capacity; dropped pairs are counted in `overflow`).
    cap_pairs = p.pair_capacity
    n_big = jnp.sum(big)
    n_pairs = jnp.sum(pair_ok) + n_mid_pairs + n_big
    overflow = jnp.maximum(n_pairs - cap_pairs, 0)
    total = tri_s.shape[0]
    if total >= cap_pairs:
        tri_s = tri_s[:cap_pairs]
        tile_keys = tile_keys[:cap_pairs]
    else:
        tri_s = jnp.pad(tri_s, (0, cap_pairs - total))
        tile_keys = jnp.pad(tile_keys, (0, cap_pairs - total),
                            constant_values=sentinel)

    tile_range = jax.lax.broadcasted_iota(
        jnp.int32, (nl * p.num_tiles, 1), 0)[:, 0] + nl
    starts = jnp.searchsorted(tile_keys, tile_range, side="left") \
        .astype(jnp.int32)
    ends = jnp.searchsorted(tile_keys, tile_range, side="right") \
        .astype(jnp.int32)
    counts = ends - starts

    # One flat gather of setup rows in sorted-pair order, the triangle id
    # stored as an exact float in lane 12 (ids < 2^24; a bitcast of a lane
    # slice miscompiles in Mosaic), packed 8 pairs per 128-lane row (+ slack
    # rows so the kernel's fixed-size DMAs never run off the end). The id is
    # pre-packed into a (T, 16) table so the build is ONE 64-byte-row gather
    # (the TPU gather fast path) instead of a 12-wide + an id gather.
    ids_f = ids.astype(jnp.float32)[:, None]
    setup16 = jnp.concatenate([
        setup_t.T, ids_f,
        jnp.zeros((t, _PAIR_STRIDE - _SETUP_ROWS - 1), jnp.float32),
    ], axis=-1)                                        # (T, 16)
    if p.depth_only:
        # Shadow/depth passes: 16-lane pair rows only — the attribute
        # stream (2/3 of the pair-row gather bytes) is never built.
        row48 = setup16[tri_s]                         # (P, 16)
    else:
        # Attribute rows, id at lane _ID_LANE so the kernel's second pass
        # can match pairs against the winner id map.
        if attr_flat is None:
            attr_flat = jnp.zeros((t, ATTR_ROWS), jnp.float32)
        attr32 = jnp.concatenate([
            attr_flat, ids_f,
            jnp.zeros((t, _APAIR_STRIDE - ATTR_ROWS - 1), jnp.float32),
        ], axis=-1)                                    # (T, 32)
        # ONE 48-lane-row gather builds BOTH pair streams (gather cost on
        # TPU is ~per-row, so one 192 B row beats a 64 B + a 128 B row);
        # the slices after it are sequential.
        row48 = jnp.concatenate([setup16, attr32], axis=-1)[tri_s]  # (P, 48)
    flat = row48[:, :_PAIR_STRIDE].reshape(
        cap_pairs // _PAIRS_PER_ROW, _PAIRS_PER_ROW * _PAIR_STRIDE)
    flat = jnp.pad(flat, ((0, p.chunk // _PAIRS_PER_ROW + 1), (0, 0)))
    if p.depth_only:
        aflat = jnp.zeros((1, _APAIRS_PER_ROW * _APAIR_STRIDE), jnp.float32)
    else:
        aflat = row48[:, _PAIR_STRIDE:].reshape(
            cap_pairs // _APAIRS_PER_ROW, _APAIRS_PER_ROW * _APAIR_STRIDE)
        aflat = jnp.pad(aflat, ((0, p.chunk // _APAIRS_PER_ROW + 1), (0, 0)))
    uflat = jnp.zeros((1, _PAIRS_PER_ROW * 16), jnp.float32)
    if emit_amask and not p.depth_only:
        # Masked-layer side stream: [U(3), V(3), D(3), matid] per pair —
        # slices of the already-gathered attr columns repacked at the
        # setup stream's 8-pairs-per-row layout (sequential, vector-rate).
        um16 = jnp.concatenate([
            row48[:, _PAIR_STRIDE:_PAIR_STRIDE + 9],
            row48[:, _PAIR_STRIDE + ATTR_ROWS - 1:_PAIR_STRIDE + ATTR_ROWS],
            jnp.zeros((row48.shape[0], 6), jnp.float32)], axis=-1)
        uflat = um16.reshape(cap_pairs // _PAIRS_PER_ROW,
                             _PAIRS_PER_ROW * 16)
        uflat = jnp.pad(uflat, ((0, p.chunk // _PAIRS_PER_ROW + 1), (0, 0)))

    # Big-triangle lists = buckets 0..L-1 at the head of the sorted stream:
    # per-layer slices of the already-gathered rows (no cumsum/scatter
    # pass). With one layer the slice is static; with several, layer l's
    # slice starts at the l-th bucket boundary (a cheap dynamic_slice of
    # <= big_tri_capacity rows).
    cap = p.big_tri_capacity
    assert cap <= cap_pairs
    bnd = jnp.searchsorted(
        tile_keys, jax.lax.broadcasted_iota(jnp.int32, (nl + 1, 1), 0)[:, 0],
        side="left").astype(jnp.int32)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    zero = jnp.zeros((), jnp.int32)
    out = []
    for l in range(nl):
        big_total = bnd[l + 1] - bnd[l]
        big_count = jnp.minimum(big_total, cap)
        if nl == 1:
            br = row48[:cap]
        else:
            br = jax.lax.dynamic_slice(
                row48, (bnd[l], zero), (cap, row48.shape[1]))
        big_slot_ok = iota_cap < big_count
        big_setup = jnp.where(big_slot_ok[:, None], br[:, :_SETUP_ROWS],
                              jnp.asarray(_INVALID_ROW)[None, :])
        big_ids = jnp.where(big_slot_ok, br[:, _SETUP_ROWS], 0.0)[:, None]
        if p.depth_only:
            big_attr = jnp.zeros((cap, _APAIR_STRIDE), jnp.float32)
        else:
            big_attr = jnp.where(big_slot_ok[:, None],
                                 br[:, _PAIR_STRIDE:], 0.0)
        big_amask = jnp.zeros((1, 16), jnp.float32)
        starts_l = starts[l * p.num_tiles:(l + 1) * p.num_tiles]
        tile_mat = jnp.zeros((1,), jnp.int32)
        if emit_amask and not p.depth_only:
            big_amask = jnp.where(big_slot_ok[:, None], jnp.concatenate([
                br[:, _PAIR_STRIDE:_PAIR_STRIDE + 9],
                br[:, _PAIR_STRIDE + ATTR_ROWS - 1:
                   _PAIR_STRIDE + ATTR_ROWS],
                jnp.zeros((cap, 6), jnp.float32)], axis=-1), 0.0)
            tile_mat = row48[
                jnp.minimum(starts_l, cap_pairs - 1),
                _PAIR_STRIDE + ATTR_ROWS - 1].astype(jnp.int32)
        out.append(Bins(
            setup=flat, attr=aflat,
            starts=starts_l,
            counts=counts[l * p.num_tiles:(l + 1) * p.num_tiles],
            big_setup=big_setup, big_ids=big_ids, big_attr=big_attr,
            big_count=big_count.reshape(1).astype(jnp.int32),
            overflow=overflow if l == 0 else zero,
            big_overflow=big_total - big_count,
            amask=uflat, big_amask=big_amask, tile_mat=tile_mat))
    return out


# ---------------------------------------------------------------------------
# 4. Fine raster (Pallas)
# ---------------------------------------------------------------------------

def _raster_kernel(starts_ref, counts_ref, bigcount_ref, *refs,
                   params: RasterParams, has_zlim: bool = False,
                   masked: bool = False, has_zfloor: bool = False):
    """Per-tile fine raster + attribute select. The CSR pair arrays stay in
    HBM; each tile streams its contiguous slice with double-buffered async
    DMA (the Pallas analogue of ExecuteIndirect consuming GPU-built draw
    lists, ref: visibility-pass.inl:160-187).

    Pass 1 finds the closest hit (z/id) per pixel. Pass 2 re-streams the
    pairs' attribute-plane rows and accumulates the WINNING pair's 32
    coefficients per pixel as one (32 x K) @ (K x N) MXU matmul per chunk
    (match masks are 0/1, each pixel matches exactly its winner), then
    evaluates uv/normal/tangent planes + analytic UV derivatives once per
    pixel — replacing the per-pixel attribute-row gathers of the resolve
    (the slow path on TPU) with sequential DMA + matmuls.

    has_zlim: extra per-pixel depth upper bound input (strict z < limit) —
    the masked-geometry depth-peel layers use it to find the next fragment
    behind a failed alpha test.

    masked: alpha-masked-layer mode. A third per-pair stream carries the
    pair's UV / denominator planes + material id; each covered fragment
    tests its UV cell's bit in the material's conservative
    certainly-transparent bitplane (scene/textures.py
    MaterialTextureStack.amask) and drops IN the race when set. The
    reference alpha-clips every fragment in its PS (ref:
    visibility-pass.hlsl:101-111); rejecting certain cells in-kernel keeps
    the depth-peel ladder off the (deep) stacks of fully-transparent
    fragments — only fragments that might pass are peeled and
    alpha-tested exactly by the caller.

    params.depth_only statically drops pass 2: no attribute inputs, interp
    output, or attribute DMA exist (shadow-map rendering)."""
    assert not (masked and params.depth_only)
    zlim_ref = None
    amask_hbm = mask_table_ref = big_amask_ref = None
    amask_scratch = msems = None
    if params.depth_only:
        setup_hbm, big_setup_ref, big_ids_ref, *rest = refs
        attr_hbm = big_attr_ref = None
        if has_zlim:
            zlim_ref, *rest = rest
        tri_ref, z_ref, setup_scratch, sems = rest
        interp_ref = attr_scratch = asems = None
    elif masked:
        (tile_mat_ref, setup_hbm, attr_hbm, amask_hbm, big_setup_ref,
         big_ids_ref, big_attr_ref, big_amask_ref, mask_table_ref,
         *rest) = refs
        if has_zlim:
            zlim_ref, *rest = rest
        (tri_ref, z_ref, interp_ref,
         setup_scratch, attr_scratch, amask_scratch,
         sems, asems, msems) = rest
    else:
        (setup_hbm, attr_hbm, big_setup_ref, big_ids_ref, big_attr_ref,
         *rest) = refs
        if has_zlim:
            zlim_ref, *rest = rest
        (tri_ref, z_ref, interp_ref,
         setup_scratch, attr_scratch, sems, asems) = rest
    p = params
    k = p.chunk
    ti = pl.program_id(0)
    ty = ti // p.tiles_x
    tx = ti - ty * p.tiles_x

    n = p.tile_h * p.tile_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    py = pix // p.tile_w
    px = pix - py * p.tile_w
    colf = (px + tx * p.tile_w).astype(jnp.float32) + 0.5
    rowf = (py + ty * p.tile_h).astype(jnp.float32) + 0.5
    zlim = (zlim_ref[:, :].reshape(1, n) if zlim_ref is not None else None)

    clear = jnp.full((1, n), -1.0, jnp.float32)
    start = starts_ref[ti]
    count = counts_ref[ti]
    bigcnt = bigcount_ref[0]
    if zlim is not None:
        # Depth-peel early-out: a tile where every pixel's z_limit is 0
        # (reverse-Z "accept nothing") can produce no fragment — zero the
        # pair/big counts so all stream loops (and their DMAs) drop out and
        # the carry inits (tri=-1, depth=0, coeffs=0) land as the outputs.
        # Peel layers beyond the first then cost only tiles that still have
        # continuing pixels (the foliage tail: continuing pixels shrink
        # ~2.5x/layer, measured on the atrium scene).
        tile_live = jnp.max(zlim) > 0.0
        start = jnp.where(tile_live, start, 0)
        count = jnp.where(tile_live, count, 0)
        bigcnt = jnp.where(tile_live, bigcnt, 0)
    # Chunks are defined on whole packed rows; the tile's range may start
    # mid-row, so chunk pair-slots are masked against [row_off, row_off+count)
    row_start = start // _PAIRS_PER_ROW
    row_off = start - row_start * _PAIRS_PER_ROW
    kr = k // _PAIRS_PER_ROW                      # rows per chunk
    nch = pl.cdiv(count + row_off, k)

    def slab_geom(rows13, slot_ok):
        """rows13: (rows, 13) one pair-slab -> (z, cov)."""
        e0 = rows13[:, 0:1] * colf + rows13[:, 1:2] * rowf + rows13[:, 2:3]
        e1 = rows13[:, 3:4] * colf + rows13[:, 4:5] * rowf + rows13[:, 5:6]
        e2 = rows13[:, 6:7] * colf + rows13[:, 7:8] * rowf + rows13[:, 8:9]
        z = (rows13[:, 9:10] * colf + rows13[:, 10:11] * rowf
             + rows13[:, 11:12])
        # z <= 1 is the near-plane clip (reverse-Z: near = 1); the z > 0
        # init of the depth race kills the behind-eye part of unclipped
        # near-crossing triangles.
        cov = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (z <= 1.0) & slot_ok
        if zlim_ref is not None:
            cov &= z < zlim
        return z, cov

    def race(z, cov, rid, best_z, best_id):
        mz = jnp.where(cov, z, -1.0)
        upd = mz > best_z
        return jnp.where(upd, mz, best_z), jnp.where(upd, rid, best_id)

    def eval_slab(rows13, rid, slot_ok, best_z, best_id):
        z, cov = slab_geom(rows13, slot_ok)
        return race(z, cov, rid, best_z, best_id)

    def merge(best_z, best_id, zb, vb):
        zc = jnp.max(best_z, axis=0, keepdims=True)
        win = best_z >= zc
        idc = jnp.max(jnp.where(win, best_id, -1.0), axis=0, keepdims=True)
        passed = (zc >= 0.0) & (zc >= zb)
        return (jnp.where(passed, zc, zb), jnp.where(passed, idc, vb))

    if masked:
        # The tile's PRIMARY material row, read ONCE with a scalar
        # dynamic-slice (a per-fragment material select was thousands of
        # tiny latency-bound MXU matmuls per masked pass). Fragments of
        # other materials in the tile conservatively keep.
        tmat = tile_mat_ref[ti]
        mrow = mask_table_ref[pl.ds(tmat, 1), :][0]   # (AMASK_LANES,) i32
        addr_mode = mrow[32]

        def mask_reject(usl):
            """usl: (rows, 16) [U(3), V(3), D(3), matid] pair-slab ->
            (rows, n) bool: fragment certainly fails the alpha test
            (module docstring). The word pick is a 32-way select against
            the tile row's scalar words; the bit extract a per-pixel
            variable shift."""
            d = usl[:, 6:7] * colf + usl[:, 7:8] * rowf + usl[:, 8:9]
            inv = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, 0.0)
            u = (usl[:, 0:1] * colf + usl[:, 1:2] * rowf + usl[:, 2:3]) * inv
            v = (usl[:, 3:4] * colf + usl[:, 4:5] * rowf + usl[:, 5:6]) * inv

            def addr01(x):
                wrap = x - jnp.floor(x)
                clamp = jnp.clip(x, 0.0, 1.0 - 1e-6)
                period = x - 2.0 * jnp.floor(0.5 * x)
                mir = jnp.where(period < 1.0, period, 2.0 - period)
                return jnp.where(addr_mode == 1, clamp,
                                 jnp.where(addr_mode == 2,
                                           jnp.clip(mir, 0.0, 1.0 - 1e-6),
                                           wrap))

            cu = jnp.clip((addr01(u) * 32.0).astype(jnp.int32), 0, 31)
            cv = jnp.clip((addr01(v) * 32.0).astype(jnp.int32), 0, 31)
            cell = cv * 32 + cu
            w = cell >> 5
            word = jnp.zeros_like(cell)
            for wi in range(32):
                word = jnp.where(w == wi, mrow[wi], word)
            bit = (word >> (cell & 31)) & 1
            same = usl[:, 9:10].astype(jnp.int32) == tmat
            return same & (bit > 0)

    def dma(slot, c):
        return pltpu.make_async_copy(
            setup_hbm.at[pl.ds(row_start + c * kr, kr), :],
            setup_scratch.at[slot], sems.at[slot])

    if masked:
        def mdma(slot, c):
            # uv/mask pair stream: same 8-pairs-per-row packing and row
            # addressing as the setup stream
            return pltpu.make_async_copy(
                amask_hbm.at[pl.ds(row_start + c * kr, kr), :],
                amask_scratch.at[slot], msems.at[slot])

    # Pass-2 DMA plumbing is declared here so its FIRST chunk can prefetch
    # during pass-1 compute (the per-tile DMA latency was serialized
    # between the passes otherwise).
    if not params.depth_only:
        akr = k // _APAIRS_PER_ROW                # attr rows per chunk
        arow_start = start // _APAIRS_PER_ROW
        arow_off = start - arow_start * _APAIRS_PER_ROW
        anch = pl.cdiv(count + arow_off, k)

        def adma(slot, c):
            return pltpu.make_async_copy(
                attr_hbm.at[pl.ds(arow_start + c * akr, akr), :],
                attr_scratch.at[slot], asems.at[slot])

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()
        if masked:
            mdma(0, 0).start()

    if not params.depth_only:
        @pl.when(anch > 0)
        def _():
            adma(0, 0).start()

    def chunk_body(c, carry):
        zb, vb = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(1 - slot, c + 1).start()
            if masked:
                mdma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        rows = setup_scratch[slot]                # (K/8, 128)
        if masked:
            mdma(slot, c).wait()
            urows = amask_scratch[slot]
        riota = jax.lax.broadcasted_iota(jnp.int32, (kr, 1), 0)
        best_z = jnp.full((kr, n), -1.0, jnp.float32)
        best_id = jnp.full((kr, n), -1.0, jnp.float32)
        for j in range(_PAIRS_PER_ROW):
            sl = rows[:, _PAIR_STRIDE * j:_PAIR_STRIDE * j + 13]
            rid = sl[:, 12:13]
            gidx = c * k + riota * _PAIRS_PER_ROW + j
            slot_ok = (gidx >= row_off) & (gidx < row_off + count)
            z, cov = slab_geom(sl[:, :13], slot_ok)
            if masked:
                cov &= ~mask_reject(urows[:, 16 * j:16 * j + 16])
            best_z, best_id = race(z, cov, rid, best_z, best_id)
        return merge(best_z, best_id, zb, vb)

    zb, vb = jax.lax.fori_loop(
        0, nch, chunk_body, (jnp.zeros((1, n), jnp.float32), clear))

    # Big triangles broadcast to every tile; with the mid-tier binning the
    # list is a handful of rows, so its loop granularity is 8 (the sublane
    # height) — a 128-row chunk would cost every tile a full chunk of
    # evaluation even for bigcnt == 1.
    kb = 8

    def big_body(c, carry):
        zb, vb = carry
        base = c * kb
        rows = big_setup_ref[pl.ds(base, kb), :]
        rid = big_ids_ref[pl.ds(base, kb), :]
        row_ok = (jax.lax.broadcasted_iota(jnp.int32, (kb, 1), 0)
                  < bigcnt - base)
        rows13 = jnp.concatenate(
            [rows, jnp.zeros((kb, 1), jnp.float32)], axis=1)
        z, cov = slab_geom(rows13, row_ok)
        if masked:
            cov &= ~mask_reject(big_amask_ref[pl.ds(base, kb), :])
        best_z = jnp.full((kb, n), -1.0, jnp.float32)
        best_id = jnp.full((kb, n), -1.0, jnp.float32)
        best_z, best_id = race(z, cov, rid, best_z, best_id)
        return merge(best_z, best_id, zb, vb)

    zb, vb = jax.lax.fori_loop(
        0, pl.cdiv(bigcnt, kb), big_body, (zb, vb))

    tri_ref[:, :] = vb.reshape(p.tile_h, p.tile_w).astype(jnp.int32)
    z_ref[:, :] = zb.reshape(p.tile_h, p.tile_w)

    if params.depth_only:
        return

    # ---- Pass 2: attribute select (winning pair's coefficients) ----
    # (first chunk DMA already in flight — started before pass 1)

    def attr_chunk(c, coeffs):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < anch)
        def _():
            adma(1 - slot, c + 1).start()

        adma(slot, c).wait()
        rows = attr_scratch[slot]                 # (K/4, 128)
        riota = jax.lax.broadcasted_iota(jnp.int32, (akr, 1), 0)
        for j in range(_APAIRS_PER_ROW):
            sl = rows[:, _APAIR_STRIDE * j:_APAIR_STRIDE * (j + 1)]
            rid = sl[:, _ID_LANE:_ID_LANE + 1]    # (akr, 1)
            gidx = c * k + riota * _APAIRS_PER_ROW + j
            slot_ok = (gidx >= arow_off) & (gidx < arow_off + count)
            match = ((rid == vb) & slot_ok).astype(jnp.float32)  # (akr, n)
            # precision=HIGHEST is NOT optional: the TPU MXU default
            # truncates the f32 plane coefficients (|a| up to ~1e5, with
            # ~100-1000x cancellation at evaluation) to bf16, which turns
            # interpolated UVs into garbage (conformance measured 0.52 rel
            # err vs f64). The match matrix is exactly bf16-representable
            # (0/1), so the 3-pass product reduces to an EXACT f32 row
            # select: hi(a)*m + lo(a)*m + a_hi*lo(m)=0.
            coeffs = coeffs + jax.lax.dot_general(
                sl, match, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)             # (32, n)
        return coeffs

    coeffs = jax.lax.fori_loop(
        0, anch, attr_chunk, jnp.zeros((_APAIR_STRIDE, n), jnp.float32))

    def big_attr_body(c, coeffs):
        base = c * kb
        rows = big_attr_ref[pl.ds(base, kb), :]   # (kb, 32)
        rid = rows[:, _ID_LANE:_ID_LANE + 1]
        row_ok = (jax.lax.broadcasted_iota(jnp.int32, (kb, 1), 0)
                  < bigcnt - base)
        match = ((rid == vb) & row_ok).astype(jnp.float32)
        # precision=HIGHEST: exact f32 row select (see attr_chunk above).
        return coeffs + jax.lax.dot_general(
            rows, match, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    coeffs = jax.lax.fori_loop(
        0, pl.cdiv(bigcnt, kb), big_attr_body, coeffs)

    # Evaluate the selected planes once per pixel.
    def lin(o):
        return (coeffs[o:o + 1, :] * colf + coeffs[o + 1:o + 2, :] * rowf
                + coeffs[o + 2:o + 3, :])

    d = lin(6)
    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, 0.0)
    u = lin(0) * inv_d
    v = lin(3) * inv_d
    # Analytic UV screen derivatives: d(P/D)/dx = (P_x - f * D_x) / D.
    dudx = (coeffs[0:1, :] - u * coeffs[6:7, :]) * inv_d
    dudy = (coeffs[1:2, :] - u * coeffs[7:8, :]) * inv_d
    dvdx = (coeffs[3:4, :] - v * coeffs[6:7, :]) * inv_d
    dvdy = (coeffs[4:5, :] - v * coeffs[7:8, :]) * inv_d
    chans = [u, v,
             lin(9) * inv_d, lin(12) * inv_d, lin(15) * inv_d,   # wn
             lin(18) * inv_d, lin(21) * inv_d, lin(24) * inv_d,  # wt
             coeffs[27:28, :], coeffs[28:29, :],                 # sign, matid
             dudx, dudy, dvdx, dvdy,
             jnp.zeros((1, n), jnp.float32), jnp.zeros((1, n), jnp.float32)]
    interp_ref[:, :, :] = jnp.concatenate(chans, axis=0).reshape(
        INTERP_CHANNELS, p.tile_h, p.tile_w)


def rasterize_tiles(bins: Bins, params: RasterParams, z_limit=None,
                    name: str = "fine_raster", mask_table=None):
    """Run the fine-raster kernel. Returns (tri (H,W) i32 global triangle
    index, -1 = no geometry; depth (H,W) f32; interp (16, H, W) f32
    per-pixel attribute channels) cropped to the resolution.

    z_limit: optional (H, W) f32 — per-pixel strict depth upper bound
    (depth-peel layer support for alpha-masked geometry).
    mask_table: optional (M, AMASK_LANES) per-material certainly-
    transparent cell bitplane (MaterialTextureStack.amask) — masked-layer
    mode: fragments in certainly-transparent UV cells drop in the race
    (bins must carry the amask stream, bin_triangles_layered
    emit_amask=True).
    name: kernel name shown in profiler traces (per-layer attribution)."""
    p = params
    masked = mask_table is not None
    assert not (masked and p.depth_only)
    tile_spec = pl.BlockSpec((p.tile_h, p.tile_w),
                             lambda i, *_: (i // p.tiles_x, i % p.tiles_x))

    def _pad_screen(x):
        return jnp.pad(x, ((0, p.padded_height - p.height),
                           (0, p.padded_width - p.width)))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]   # setup pairs (HBM)
    inputs = [bins.setup]
    if not p.depth_only:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # attr pairs
        inputs.append(bins.attr)
    if masked:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # amask pairs
        inputs.append(bins.amask)
    in_specs += [
        pl.BlockSpec((p.big_tri_capacity, _SETUP_ROWS),
                     lambda i, *_: (0, 0)),
        pl.BlockSpec((p.big_tri_capacity, 1), lambda i, *_: (0, 0)),
    ]
    inputs += [bins.big_setup, bins.big_ids]
    if not p.depth_only:
        in_specs.append(pl.BlockSpec((p.big_tri_capacity, _APAIR_STRIDE),
                                     lambda i, *_: (0, 0)))
        inputs.append(bins.big_attr)
    if masked:
        in_specs.append(pl.BlockSpec((p.big_tri_capacity, 16),
                                     lambda i, *_: (0, 0)))
        inputs.append(bins.big_amask)
        mt = jnp.asarray(mask_table, jnp.int32)
        in_specs.append(pl.BlockSpec(mt.shape, lambda i, *_: (0, 0)))
        inputs.append(mt)
    if z_limit is not None:
        in_specs.append(tile_spec)
        inputs.append(_pad_screen(z_limit))
    out_specs = [tile_spec, tile_spec]
    out_shape = [
        jax.ShapeDtypeStruct((p.padded_height, p.padded_width), jnp.int32),
        jax.ShapeDtypeStruct((p.padded_height, p.padded_width), jnp.float32),
    ]
    if not p.depth_only:
        out_specs.append(pl.BlockSpec(
            (INTERP_CHANNELS, p.tile_h, p.tile_w),
            lambda i, *_: (0, i // p.tiles_x, i % p.tiles_x)))
        out_shape.append(jax.ShapeDtypeStruct(
            (INTERP_CHANNELS, p.padded_height, p.padded_width), jnp.float32))
    scratch_shapes = [
        pltpu.VMEM((2, p.chunk // _PAIRS_PER_ROW,
                    _PAIRS_PER_ROW * _PAIR_STRIDE), jnp.float32),
    ]
    if not p.depth_only:
        scratch_shapes.append(
            pltpu.VMEM((2, p.chunk // _APAIRS_PER_ROW,
                        _APAIRS_PER_ROW * _APAIR_STRIDE), jnp.float32))
    if masked:
        scratch_shapes.append(
            pltpu.VMEM((2, p.chunk // _PAIRS_PER_ROW,
                        _PAIRS_PER_ROW * 16), jnp.float32))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    if not p.depth_only:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    if masked:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    scalar_args = [bins.starts, bins.counts, bins.big_count]
    if masked:
        scalar_args.append(bins.tile_mat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(p.num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        functools.partial(_raster_kernel, params=p,
                          has_zlim=z_limit is not None,
                          masked=masked),
        grid_spec=grid_spec,
        out_shape=out_shape,
        name=name,
        interpret=(p.interpret if p.interpret is not None
                   else _should_interpret()),
    )(*scalar_args, *inputs)
    if p.depth_only:
        tri, depth = out
        return tri[:p.height, :p.width], depth[:p.height, :p.width], None
    tri, depth, interp = out
    return (tri[:p.height, :p.width], depth[:p.height, :p.width],
            interp[:, :p.height, :p.width])


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
                      prim_visible, params: RasterParams, tri_visible=None,
                      world_n_v=None, world_t_v=None):
    """Full visibility-buffer pass: transform, setup, bin, rasterize.

    world_n_v/world_t_v: optional per-vertex world normals/tangents — when
    given, the kernel also emits interpolated attributes (returned as the
    6th element; zeros otherwise).

    Returns (tri (H,W) i32, depth, clip, world, stats_dict, interp).
    """
    clip, world = vertex_transform(scene.positions, vtx_mesh,
                                   scene.mesh_transforms, scene_rotation,
                                   view_proj)
    setup_t, ids, valid, bbox = triangle_setup(clip, scene, prim_visible,
                                               params, tri_visible)
    attr_flat = None
    if world_n_v is not None:
        attr_flat = triangle_attributes(clip, scene, world_n_v, world_t_v,
                                        params)
    bins = bin_triangles(setup_t, ids, valid, bbox, params, attr_flat)
    tri, depth, interp = rasterize_tiles(bins, params)
    stats = dict(bin_overflow=bins.overflow, big_overflow=bins.big_overflow,
                 culled_triangles=jnp.sum(~valid))
    return tri, depth, clip, world, stats, interp


def _vertex_table(scene, scene_rotation, view_proj):
    """(V, 16) per-vertex table: clip position + uv + world-rotated normal/
    tangent + sign, built in one packed matrix gather + 2D multiply-adds
    (no (V, 4, 4) intermediates — 3D reshapes cost tiled-layout copies).

    The reference transforms normals by the 3x3 of localToWorld without
    inverse-transpose (ref: gbuffer-compute.hlsl:238-241); we match that.
    """
    # HIGHEST: see vertex_transform — bf16 MXU default displaces vertices.
    local_to_world = jnp.einsum("mij,jk->mik", scene.mesh_transforms,
                                scene_rotation,
                                precision=jax.lax.Precision.HIGHEST)
    local_to_clip = jnp.einsum("mij,jk->mik", local_to_world, view_proj,
                               precision=jax.lax.Precision.HIGHEST)
    packed = jnp.concatenate([
        local_to_clip.reshape(-1, 16),
        local_to_world[:, :3, :3].reshape(-1, 9)], axis=-1)   # (M, 25)
    m = packed[scene.vtx_mesh]                                # (V, 25)
    x, y, z = (scene.positions[:, 0:1], scene.positions[:, 1:2],
               scene.positions[:, 2:3])
    clip = (x * m[:, 0:4] + y * m[:, 4:8] + z * m[:, 8:12] + m[:, 12:16])
    n, t4 = scene.normals, scene.tangents
    wn = (n[:, 0:1] * m[:, 16:19] + n[:, 1:2] * m[:, 19:22]
          + n[:, 2:3] * m[:, 22:25])
    wt = (t4[:, 0:1] * m[:, 16:19] + t4[:, 1:2] * m[:, 19:22]
          + t4[:, 2:3] * m[:, 22:25])
    return jnp.concatenate([
        clip, scene.uvs, wn, wt, t4[:, 3:4],
        jnp.zeros((clip.shape[0], 3), jnp.float32)], axis=-1)


class PreparedGeometry(NamedTuple):
    """Per-frame triangle data shared by all raster layers (opaque +
    masked depth peels): setup planes, attribute planes, validity, bbox."""
    setup_t: jnp.ndarray    # (12, T)
    ids: jnp.ndarray        # (T,)
    valid: jnp.ndarray      # (T,) bool (before per-layer masks)
    bbox: jnp.ndarray       # (T, 4)
    attr_flat: jnp.ndarray  # (T, 29)


def raster_layer(prep: PreparedGeometry, params: RasterParams,
                 layer_valid=None, z_limit=None):
    """Bin + rasterize one layer of the prepared geometry.

    layer_valid: optional (T,) bool further restricting the layer (the
    masked-geometry passes raster MASK/BLEND prims separately);
    z_limit: per-pixel strict depth bound (depth peeling)."""
    valid = prep.valid if layer_valid is None else prep.valid & layer_valid
    bins = bin_triangles(prep.setup_t, prep.ids, valid, prep.bbox, params,
                         prep.attr_flat)
    tri, depth, interp = rasterize_tiles(bins, params, z_limit=z_limit)
    stats = dict(bin_overflow=bins.overflow, big_overflow=bins.big_overflow,
                 culled_triangles=jnp.sum(~valid))
    return tri, depth, interp, stats


def raster_depth(prep: PreparedGeometry, params: RasterParams,
                 layer_valid=None):
    """Depth-only raster (params.depth_only must be True): returns
    (tri, depth, stats) — the shadow-map pass."""
    assert params.depth_only
    valid = prep.valid if layer_valid is None else prep.valid & layer_valid
    bins = bin_triangles(prep.setup_t, prep.ids, valid, prep.bbox, params)
    tri, depth, _ = rasterize_tiles(bins, params,
                                    name="raster_shadow_depth")
    stats = dict(bin_overflow=bins.overflow, big_overflow=bins.big_overflow)
    return tri, depth, stats


def prepare_geometry(scene, scene_rotation, view_proj, prim_visible,
                     params: RasterParams, tri_visible=None,
                     meshlet_visible=None,
                     emit_attributes: bool = True) -> PreparedGeometry:
    """Fused vertex transform + triangle setup + attribute-plane build.

    Reads the STATIC per-triangle corner table (scene.tri_corner, built at
    load) sequentially and transforms each corner in place — zero per-frame
    vertex gathers. Transforming a vertex once per corner-use costs ~2x the
    FLOPs of the shared per-vertex table it replaced, but the three (T, 16)
    corner gathers it eliminates were ~8 ms of the profiled 1080p frame
    while VPU muladds over sequential rows are ~free."""
    p = params
    w, h = p.width, p.height
    # Per-triangle transform row: localToClip (16) + localToWorld 3x3 (9),
    # ONE gather of small rows (the mesh table is tiny and cache-resident).
    # The row gather is transposed once to (25, T) so all the setup math
    # below runs on DENSE 1-D (T,) lane vectors — (T, 3)-shaped arrays tile
    # as 3 of 128 lanes on TPU and were ~5.7 ms of the frame's prep.
    # HIGHEST: see vertex_transform — bf16 MXU default displaces vertices.
    local_to_world = jnp.einsum("mij,jk->mik", scene.mesh_transforms,
                                scene_rotation,
                                precision=jax.lax.Precision.HIGHEST)
    local_to_clip = jnp.einsum("mij,jk->mik", local_to_world, view_proj,
                               precision=jax.lax.Precision.HIGHEST)
    packed = jnp.concatenate([
        local_to_clip.reshape(-1, 16),
        local_to_world[:, :3, :3].reshape(-1, 9)], axis=-1)   # (M, 25)
    m = packed[scene.tri_mesh].T                              # (25, T)
    ctab = scene.tri_corner                                   # (36, T)

    def corner(k):
        o = 12 * k
        px_, py_, pz_ = ctab[o], ctab[o + 1], ctab[o + 2]
        clip = [px_ * m[c] + py_ * m[4 + c] + pz_ * m[8 + c] + m[12 + c]
                for c in range(4)]
        wn = [ctab[o + 3] * m[16 + c] + ctab[o + 4] * m[19 + c]
              + ctab[o + 5] * m[22 + c] for c in range(3)]
        wt = [ctab[o + 6] * m[16 + c] + ctab[o + 7] * m[19 + c]
              + ctab[o + 8] * m[22 + c] for c in range(3)]
        # [clip4, uv2, wn3, wt3, sign] as a list of dense (T,) rows
        return clip + [ctab[o + 10], ctab[o + 11]] + wn + wt + [ctab[o + 9]]

    r0, r1, r2 = corner(0), corner(1), corner(2)
    c0, c1, c2 = r0[:4], r1[:4], r2[:4]

    def screen_h(c):
        sx = (0.5 * c[0] + 0.5 * c[3]) * w
        sy = (-0.5 * c[1] + 0.5 * c[3]) * h
        return (sx, sy, c[3])

    p0, p1, p2 = screen_h(c0), screen_h(c1), screen_h(c2)

    def cross3(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    e0 = cross3(p1, p2)
    e1 = cross3(p2, p0)
    e2 = cross3(p0, p1)
    det = p0[0] * e0[0] + p0[1] * e0[1] + p0[2] * e0[2]

    # One (rows, 4) table gather per triangle carries double-sided flag,
    # visibility, and material id. When a meshlet-level mask is active the
    # table is keyed by tri_meshlet (meshlets never span primitives, so
    # per-prim data lifts to per-meshlet rows) — folding the meshlet mask
    # into the same gather instead of a second per-triangle expansion
    # (profiled ~1.9 ms at 262k triangles as a separate 1-wide gather).
    prim = scene.tri_prim
    if meshlet_visible is not None:
        mprim = jnp.maximum(scene.meshlet_prim, 0)
        ptable = jnp.stack([
            scene.prim_double_sided[mprim].astype(jnp.float32),
            (meshlet_visible & (prim_visible[mprim]))
            .astype(jnp.float32),
            scene.prim_material[mprim].astype(jnp.float32),
            jnp.zeros_like(mprim, jnp.float32)], axis=-1)
        prow = ptable[jnp.maximum(scene.tri_meshlet, 0)]
    else:
        ptable = jnp.stack([
            scene.prim_double_sided.astype(jnp.float32),
            prim_visible.astype(jnp.float32),
            scene.prim_material.astype(jnp.float32),
            jnp.zeros_like(prim_visible, jnp.float32)], axis=-1)
        prow = ptable[jnp.maximum(prim, 0)]
    pw = prow.T                                               # (4, T)
    double_sided = pw[0] > 0
    front = det < 0.0
    wmin = jnp.minimum(jnp.minimum(c0[3], c1[3]), c2[3])
    wmax = jnp.maximum(jnp.maximum(c0[3], c1[3]), c2[3])
    # Near-plane-crossing triangles: see triangle_setup — rasterized
    # unclipped with a full-screen bbox, facing cull skipped.
    crossing = (wmin <= _W_EPS) & (wmax > _W_EPS)

    valid = (prim >= 0)
    valid &= pw[1] > 0
    if tri_visible is not None:
        valid &= tri_visible
    valid &= wmax > _W_EPS
    valid &= jnp.abs(det) > 1e-12
    valid &= front | double_sided | crossing

    s = jnp.where(det >= 0.0, 1.0, -1.0)
    e0 = tuple(c * s for c in e0)
    e1 = tuple(c * s for c in e1)
    e2 = tuple(c * s for c in e2)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.abs(det), 0.0)
    z0, z1, z2 = c0[2] * inv_det, c1[2] * inv_det, c2[2] * inv_det
    zplane = tuple(e0[c] * z0 + e1[c] * z1 + e2[c] * z2 for c in range(3))

    # Exact clipped bbox for near-plane-crossing triangles (see
    # triangle_setup): candidates = in-front vertex projections + the
    # crossing-edge intersections at w = eps.
    big_f = jnp.float32(2.0e6)
    mnx = jnp.full_like(p0[0], big_f)
    mxx = jnp.full_like(p0[0], -big_f)
    mny = jnp.full_like(p0[0], big_f)
    mxy = jnp.full_like(p0[0], -big_f)

    def acc(x, y, ok):
        nonlocal mnx, mxx, mny, mxy
        mnx = jnp.where(ok, jnp.minimum(mnx, x), mnx)
        mxx = jnp.where(ok, jnp.maximum(mxx, x), mxx)
        mny = jnp.where(ok, jnp.minimum(mny, y), mny)
        mxy = jnp.where(ok, jnp.maximum(mxy, y), mxy)

    ps = (p0, p1, p2)
    for i in range(3):
        wv = ps[i][2]
        wsafe = jnp.maximum(wv, _W_EPS)
        acc(ps[i][0] / wsafe, ps[i][1] / wsafe, wv > _W_EPS)
    for i, j in ((0, 1), (1, 2), (2, 0)):
        wa, wb = ps[i][2], ps[j][2]
        oke = (wa > _W_EPS) != (wb > _W_EPS)
        den = wa - wb
        te = (wa - _W_EPS) / jnp.where(jnp.abs(den) > 1e-20, den, 1.0)
        acc((ps[i][0] + te * (ps[j][0] - ps[i][0])) / _W_EPS,
            (ps[i][1] + te * (ps[j][1] - ps[i][1])) / _W_EPS, oke)
    mnx = jnp.floor(jnp.clip(mnx, -big_f, big_f)).astype(jnp.int32)
    mxx = jnp.floor(jnp.clip(mxx, -big_f, big_f)).astype(jnp.int32)
    mny = jnp.floor(jnp.clip(mny, -big_f, big_f)).astype(jnp.int32)
    mxy = jnp.floor(jnp.clip(mxy, -big_f, big_f)).astype(jnp.int32)
    onscreen = ((mxx >= 0) & (mnx <= w - 1) & (mxy >= 0) & (mny <= h - 1))
    valid &= onscreen
    bbox = jnp.stack([jnp.clip(mnx, 0, w - 1),
                      jnp.clip(mny, 0, h - 1),
                      jnp.clip(mxx, 0, w - 1),
                      jnp.clip(mxy, 0, h - 1)],
                     axis=-1)

    t = ctab.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0]
    setup_t = jnp.stack(list(e0) + list(e1) + list(e2) + list(zplane)) \
        .astype(jnp.float32)                                  # (12, T)

    # Attribute planes: channel c's plane j = sum_k a_k[c] * e_k[j], all as
    # dense (T,) rows; ONE stack materializes the flat (T, 29) layout the
    # pair stream consumes (a single layout copy instead of narrow math).
    attr_flat = None
    if emit_attributes:
        a0, a1, a2 = r0[4:13], r1[4:13], r2[4:13]

        def plane(c):
            return [a0[c] * e0[j] + a1[c] * e1[j] + a2[c] * e2[j]
                    for j in range(3)]

        denom = [e0[j] + e1[j] + e2[j] for j in range(3)]
        rows = (plane(0) + plane(1) + denom
                + sum((plane(c) for c in range(2, 8)), [])
                + [a0[8], pw[2]])
        attr_flat = jnp.stack(rows, axis=-1).astype(jnp.float32)  # (T, 29)

    return PreparedGeometry(setup_t=setup_t, ids=ids, valid=valid, bbox=bbox,
                            attr_flat=attr_flat)


def visibility_and_attributes(scene, scene_rotation, view_proj, prim_visible,
                              params: RasterParams, tri_visible=None):
    """prepare_geometry + raster_layer over everything.

    Returns (tri, depth, interp (16, H, W) per-pixel attributes, stats).
    """
    prep = prepare_geometry(scene, scene_rotation, view_proj, prim_visible,
                            params, tri_visible)
    return raster_layer(prep, params)


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
