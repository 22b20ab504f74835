"""Clustered punctual lighting.

Port of the reference's light culling + clustered shading
(ref: shaders/culling/light-culling.hlsl, shaders/common/cluster-culling.hlsli,
shaders/lighting/clustered-lighting.hlsl): a 16x9x24 cluster grid with
exponential view-space Z slices; per-cluster world-space frustum planes from
unprojected corners; sphere-vs-frustum per light.

TPU-native restructuring: the reference compacts per-cluster light lists with
atomics (light-culling.hlsl:123-134); here each cluster keeps a LIGHT BITMASK
(ceil(L/32) int32 words) — the cull is one dense (clusters x lights) test,
and the shading pass gathers 1-2 mask words per pixel then iterates lights
with bit tests (SURVEY.md §2.4: fixed-capacity masks replace atomic
compaction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import shading
from ..core import mathutils as mu
from ..scene import lights as lights_mod

MAX_LIGHT_RANGE = 4.0  # ref: cluster-culling.hlsli:4

# Pallas shading blocks: each block loops only over the lights present in
# the union of its pixels' cluster masks (the reference's per-cluster light
# LIST walk, clustered-lighting.hlsl:37-58, reshaped to TPU blocks). The
# XLA fallback below loops all L lights at full resolution — 66 lights cost
# ~38 ms/frame on the atrium bench; the block walk does ~avg-lights-per-
# block full-block BRDF evaluations instead.
_BH, _BW = 32, 128


def cluster_grid_shape(config):
    return (config.light_cluster_dim_x, config.light_cluster_dim_y,
            config.light_cluster_dim_z)


def _cluster_corners(config, proj, inv_view_proj, near: float):
    """World-space corner points for every cluster: (Z, Y, X, 8, 3)."""
    gx, gy, gz = cluster_grid_shape(config)
    far = config.cluster_depth_extent

    ix = jnp.arange(gx, dtype=jnp.float32)
    iy = jnp.arange(gy, dtype=jnp.float32)
    iz = jnp.arange(gz, dtype=jnp.float32)

    # NDC xy of the cluster's top-left corner (ref: cluster-culling.hlsli:
    # 46-52: y is flipped so +stride moves down)
    ndc_x0 = 2.0 * ix / gx - 1.0
    ndc_y0 = -(2.0 * iy / gy - 1.0)
    sx = 2.0 / gx
    sy = 2.0 / gy

    # Exponential view-space slice depths projected to NDC z
    # (ref: cluster-culling.hlsli:54-67)
    z0_view = near * (far / near) ** (iz / gz)
    z1_view = near * (far / near) ** ((iz + 1.0) / gz)

    def ndc_z(zv):
        p = jnp.stack([jnp.zeros_like(zv), jnp.zeros_like(zv), zv,
                       jnp.ones_like(zv)], -1) @ proj
        return p[..., 2] / p[..., 3]

    nz0 = ndc_z(z0_view)   # (gz,)
    nz1 = ndc_z(z1_view)

    # 8 corners in NDC per cluster, matching the reference's ordering
    x0 = ndc_x0[None, None, :]
    y0 = ndc_y0[None, :, None]
    z_near = nz0[:, None, None]
    z_far = nz1[:, None, None]
    zero = jnp.zeros((gz, gy, gx), jnp.float32)

    def corner(x, y, z):
        return jnp.stack([x + zero, y + zero, z + zero,
                          jnp.ones_like(zero)], -1)

    corners_ndc = jnp.stack([
        corner(x0, y0 - sy, z_near),
        corner(x0 + sx, y0 - sy, z_near),
        corner(x0 + sx, y0, z_near),
        corner(x0, y0, z_near),
        corner(x0, y0 - sy, z_far),
        corner(x0 + sx, y0 - sy, z_far),
        corner(x0 + sx, y0, z_far),
        corner(x0, y0, z_far),
    ], axis=-2)                               # (gz, gy, gx, 8, 4)

    w = jnp.matmul(corners_ndc, inv_view_proj,
                   precision=jax.lax.Precision.HIGHEST)
    return w[..., :3] / w[..., 3:]


def build_light_clusters(lights: lights_mod.LightTable, config, proj,
                         inv_view_proj, near: float):
    """-> (mask (C, W32) int32, culled count). C = gx*gy*gz flattened with
    the reference's id scheme (x + gx*y + gx*gy*z)."""
    gx, gy, gz = cluster_grid_shape(config)
    p = _cluster_corners(config, proj, inv_view_proj, near)  # (gz,gy,gx,8,3)

    def plane(a, b, c):
        n = jnp.cross(b - a, c - a)
        d = -jnp.sum(n * a, -1, keepdims=True)
        return jnp.concatenate([n, d], -1)

    pts = p
    planes = jnp.stack([
        plane(pts[..., 0, :], pts[..., 1, :], pts[..., 3, :]),   # near
        plane(pts[..., 4, :], pts[..., 7, :], pts[..., 5, :]),   # far
        plane(pts[..., 0, :], pts[..., 3, :], pts[..., 4, :]),   # left
        plane(pts[..., 1, :], pts[..., 5, :], pts[..., 2, :]),   # right
        plane(pts[..., 2, :], pts[..., 6, :], pts[..., 3, :]),   # top
        plane(pts[..., 0, :], pts[..., 4, :], pts[..., 1, :]),   # bottom
    ], axis=-2)                                # (gz, gy, gx, 6, 4)
    planes = planes.reshape(-1, 6, 4)          # (C, 6, 4) [z-major = ref id]

    lp = lights.transform[:, 3, :3]            # (L, 3)
    lrange = jnp.where(lights.range > 0.0, lights.range, MAX_LIGHT_RANGE)
    punctual = (lights.type != lights_mod.LIGHT_DIRECTIONAL)
    li = jax.lax.broadcasted_iota(jnp.int32, (lights.type.shape[0], 1),
                                  0)[:, 0]
    active = punctual & (li < lights.count)

    # (C, 6, L): signed distance + radius * |n| >= 0
    # (ref: cluster-culling.hlsli FrustumCull)
    d = (jnp.einsum("cpk,lk->cpl", planes[..., :3], lp) + planes[..., 3:4]
         + jnp.linalg.norm(planes[..., :3], axis=-1, keepdims=True)
         * lrange[None, None, :])
    inside = jnp.all(d >= 0.0, axis=1) & active[None, :]    # (C, L)

    culled = jnp.sum(active) * planes.shape[0] - jnp.sum(inside)

    l_total = lights.type.shape[0]
    w32 = (l_total + 31) // 32
    pad = w32 * 32 - l_total
    bits = jnp.pad(inside, ((0, 0), (0, pad))).reshape(-1, w32, 32)
    weights = (1 << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
    mask = jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1)
    return mask.astype(jnp.int32), culled


def _slice_bounds(near: float, far: float, gz: int):
    """f32 view-z lower bounds of slices 1..gz-1 (exponential slicing,
    ref: cluster-culling.hlsli:54-67). Slice k holds view_z in
    [bounds[k-1], bounds[k]); comparisons against this one table keep the
    XLA paths and the Pallas kernel BIT-IDENTICAL (a floor(log(z)*s+b)
    form differs by 1 ulp between XLA's and Mosaic's log at slice
    boundaries — measured 0.017% of random pixels)."""
    import math
    return tuple(
        np.float32(near * math.exp(math.log(far / near) * k / gz))
        for k in range(1, gz))


def _slice_of(view_z, bounds):
    """Slice index by comparison against the shared boundary table."""
    cz = jnp.zeros(view_z.shape, jnp.int32)
    for b in bounds:
        cz = cz + (view_z >= b).astype(jnp.int32)
    return cz


def pixel_cluster_id(depth, config, near: float, width: int, height: int):
    """Per-pixel flattened cluster id (ref: cluster-culling.hlsli:30-42).
    depth: reverse-Z ndc depth; view z = near / depth."""
    gx, gy, gz = cluster_grid_shape(config)
    far = config.cluster_depth_extent
    view_z = near / jnp.maximum(depth, 1e-6)
    cz = _slice_of(view_z, _slice_bounds(near, far, gz))
    xs = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 0)
    cx = jnp.clip(xs * gx // width, 0, gx - 1)
    cy = jnp.clip(ys * gy // height, 0, gy - 1)
    return (gx * gy) * cz + gx * cy + cx


def clustered_lighting(gb, n, v, depth, lights: lights_mod.LightTable,
                       cluster_mask, config, near: float,
                       width: int, height: int):
    """Additive punctual-light radiance using the cluster bitmask grid
    (ref: lighting/clustered-lighting.hlsl). Dispatches to the Pallas
    block-list kernel when the frame tiles evenly; small/odd frames take
    the dense XLA loop.

    The Pallas path never materializes per-pixel mask words: the 2M-pixel
    `cluster_mask[cid]` gather + the channel-major layout copies it forced
    cost ~7 ms/frame at 1080p; instead the kernel reads a tiny
    (gx*gy, L) per-xy-cell Z-BITMASK table through scalar prefetch and
    computes each pixel's z slice in-register from depth (bit-identical
    gating — the bit tested is the same cluster bit)."""
    gx, gy, gz = cluster_grid_shape(config)
    # A block must span <= 2 cluster cells per axis for the kernel's 2x2
    # cell selector (true at 1080p: 120 px cells vs 128/32 px blocks);
    # frames where it doesn't hold take the dense path.
    if gz <= 31 and _pallas_cells_ok(width, height, gx, gy):
        return _clustered_lighting_pallas(gb, n, v, depth, cluster_mask,
                                          lights, config, near,
                                          width, height)
    cid = pixel_cluster_id(depth, config, near, width, height)
    words = cluster_mask[cid]                  # (H, W, W32) — 1-2 gathers
    return clustered_lighting_dense(gb, n, v, words, lights)


def clustered_lighting_dense(gb, n, v, words, lights: lights_mod.LightTable):
    """All-lights XLA loop (fallback + conformance reference)."""
    base = gb.base_color[..., :3]
    metallic = gb.mrao[..., 0]
    roughness = gb.mrao[..., 1]

    nl = lights.type.shape[0]

    def add_light(i, acc):
        word = words[..., i // 32]
        on_bit = ((word >> (i % 32)) & 1) > 0
        l, radiance = shading.punctual_light(
            lights.type[i], lights.transform[i], lights.color[i],
            lights.intensity[i], lights.range[i], lights.spot_angles[i],
            gb.world_pos)
        lit = shading.brdf_response(base, metallic, roughness, n, v, l,
                                    radiance)
        use = on_bit & gb.mask
        return acc + jnp.where(use[..., None], lit, 0.0)

    return jax.lax.fori_loop(0, nl, add_light,
                             jnp.zeros_like(base))


def _block_light_lists(words, nby, nbx, num_lights: int):
    """Per-block union of the pixel mask words -> (counts (NB,),
    lists (NB, L) light indices with the set bits packed first). Bits at
    or beyond num_lights are dropped (guards the kernel's SMEM row walk)."""
    h, w, w32 = words.shape
    wb = words.reshape(nby, _BH, nbx, _BW, w32)
    # OR-fold the block pixels (log2 tree; bitwise_or has no reduce)
    m = _BH
    while m > 1:
        wb = wb[:, :m // 2] | wb[:, m // 2:m]
        m //= 2
    m = _BW
    while m > 1:
        wb = wb[:, :, :, :m // 2] | wb[:, :, :, m // 2:m]
        m //= 2
    union = wb.reshape(nby * nbx, w32)                     # (NB, W32)
    l_pad = w32 * 32
    bit = ((union[:, :, None] >> jnp.arange(32)[None, None, :]) & 1)
    bits = bit.reshape(-1, l_pad)                          # (NB, Lpad)
    return _lists_from_bits(bits, num_lights, l_pad)


def _lists_from_bits(bits, num_lights: int, l_pad: int):
    bits = bits * (jnp.arange(l_pad)[None, :] < num_lights)
    counts = bits.sum(-1).astype(jnp.int32)
    # set bits first, ascending light index
    key = (1 - bits) * l_pad + jnp.arange(l_pad)[None, :]
    lists = jnp.argsort(key, axis=-1).astype(jnp.int32)
    return counts, lists


def _cluster_zmasks(cluster_mask, gx: int, gy: int, gz: int):
    """(C, W32) cluster bitmask -> (gx*gy, W32*32) i32 Z-BITMASK table:
    bit cz of zmask[cy*gx+cx, l] == light l's bit in cluster (cx, cy, cz).
    Tiny (144 x 96 at the default grid) — the Pallas shading kernel reads
    it with scalar loads instead of gathering per-pixel mask words."""
    w32 = cluster_mask.shape[-1]
    l_pad = w32 * 32
    m = cluster_mask.reshape(gz, gx * gy, w32)
    bits = ((m[..., None].astype(jnp.int32) >> jnp.arange(32)) & 1)
    bits = bits.reshape(gz, gx * gy, l_pad)                # (gz, XY, Lpad)
    return jnp.sum(bits << jnp.arange(gz)[:, None, None], axis=0) \
        .astype(jnp.int32)


def _block_cells_np(nby: int, nbx: int, gx: int, gy: int,
                    width: int, height: int):
    """Static per-block cluster-cell corners: (NB, 4) xy-cell ids in the
    order (top-left, top-right, bottom-left, bottom-right). Only valid
    when _pallas_cells_ok (every block spans <= 2 cells per axis)."""
    bys, bxs = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    cx0 = (bxs * _BW) * gx // width
    cx1 = (bxs * _BW + _BW - 1) * gx // width
    cy0 = (bys * _BH) * gy // height
    cy1 = (bys * _BH + _BH - 1) * gy // height
    cells = np.stack([cy0 * gx + cx0, cy0 * gx + cx1,
                      cy1 * gx + cx0, cy1 * gx + cx1], axis=-1)
    return cells.reshape(-1, 4).astype(np.int32)


def _pallas_cells_ok(width: int, height: int, gx: int, gy: int) -> bool:
    """True when every ALIGNED _BH x _BW block spans <= 2 cluster cells
    per axis (exact static check — holds at 1080p's 120 px cells; the
    kernel's 2x2 cell selector requires it)."""
    if height % _BH or width % _BW:
        return False
    x0 = np.arange(width // _BW) * _BW
    y0 = np.arange(height // _BH) * _BH
    xs = (x0 + _BW - 1) * gx // width - x0 * gx // width
    ys = (y0 + _BH - 1) * gy // height - y0 * gy // height
    return bool(xs.max() <= 1 and ys.max() <= 1)


def _pack_light_rows(lights: lights_mod.LightTable):
    """(L, 16) f32 scalar rows for the kernel's SMEM walk: pos(3), type,
    color(3), intensity, range, spot_dir(3), cos_inner, cos_outer."""
    pos = lights.transform[:, 3, :3]
    spot_dir = lights_mod.light_direction_toward(lights.transform)
    rows = jnp.concatenate([
        pos,
        lights.type[:, None].astype(jnp.float32),
        lights.color,
        lights.intensity[:, None],
        lights.range[:, None],
        spot_dir,
        jnp.cos(lights.spot_angles[:, 0:1]),
        jnp.cos(lights.spot_angles[:, 1:2]),
        jnp.zeros((lights.type.shape[0], 2), jnp.float32),
    ], axis=-1)
    return rows


def _clustered_block_kernel(count_ref, list_ref, light_ref, zmask_ref,
                            px_ref, out_ref, *, nbx: int, gx: int, gy: int,
                            gz: int, width: int, height: int,
                            near: float, bounds: tuple):
    """One (3, _BH, _BW) radiance block: walk this block's light list,
    gating each light per pixel with its cluster bit.

    The gate reads the per-(xy-cell, light) z-bitmask table (scalar
    prefetch) — 4 scalar loads per light for the block's <= 2x2 cells —
    and tests bit cz, where cz is the pixel's exponential depth slice
    computed in-register (ref: cluster-culling.hlsli:30-42). Exactly the
    same cluster bit as the per-pixel word gather this replaces."""
    by = pl.program_id(0)
    bx = pl.program_id(1)
    b = by * nbx + bx

    basr, basg, basb = px_ref[0], px_ref[1], px_ref[2]
    nx, ny, nz = px_ref[3], px_ref[4], px_ref[5]
    vx, vy, vz = px_ref[6], px_ref[7], px_ref[8]
    wpx, wpy, wpz = px_ref[9], px_ref[10], px_ref[11]
    metallic = px_ref[12]
    roughness = px_ref[13]
    maskb = px_ref[14] > 0.0
    depth = px_ref[15]

    # Pixel z slice (bit-identical to pixel_cluster_id: comparison against
    # the shared boundary table) + the block's 2x2 xy-cell selector masks.
    # Cell boundaries: first x with cell cx0+1 is ceil((cx0+1)*width/gx)
    # (cx = x*gx//width).
    view_z = jnp.float32(near) / jnp.maximum(depth, 1e-6)
    cz = _slice_of(view_z, bounds)
    cx0 = (bx * _BW) * gx // width
    cy0 = (by * _BH) * gy // height
    xb = ((cx0 + 1) * width + gx - 1) // gx
    yb = ((cy0 + 1) * height + gy - 1) // gy
    xg = jax.lax.broadcasted_iota(jnp.int32, (_BH, _BW), 1) + bx * _BW
    yg = jax.lax.broadcasted_iota(jnp.int32, (_BH, _BW), 0) + by * _BH
    right = xg >= xb
    lower = yg >= yb
    c00 = cy0 * gx + cx0
    c01 = jnp.minimum(c00 + 1, cy0 * gx + gx - 1)
    c10 = jnp.minimum(cy0 + 1, gy - 1) * gx + cx0
    c11 = jnp.minimum(c10 + 1, jnp.minimum(cy0 + 1, gy - 1) * gx + gx - 1)

    no_v = jnp.clip(nx * vx + ny * vy + nz * vz, 0.0, 1.0)
    f0r = metallic * basr + (1.0 - metallic) * 0.04
    f0g = metallic * basg + (1.0 - metallic) * 0.04
    f0b = metallic * basb + (1.0 - metallic) * 0.04
    alr = (1.0 - metallic) * basr * mu.INV_PI
    alg = (1.0 - metallic) * basg * mu.INV_PI
    alb = (1.0 - metallic) * basb * mu.INV_PI
    a = roughness * roughness
    a2 = a * a

    def body(k, acc):
        accr, accg, accb = acc
        i = list_ref[b, k]
        lx, ly, lz = light_ref[i, 0], light_ref[i, 1], light_ref[i, 2]
        ltype = light_ref[i, 3]
        cr, cg, cb = light_ref[i, 4], light_ref[i, 5], light_ref[i, 6]
        inten = light_ref[i, 7]
        rng = light_ref[i, 8]
        sdx, sdy, sdz = light_ref[i, 9], light_ref[i, 10], light_ref[i, 11]
        cos_in, cos_out = light_ref[i, 12], light_ref[i, 13]

        # punctual radiance (ref: lighting/common.hlsli:20-82; matches
        # shading.punctual_light incl. the spec-correct spot window)
        dx = lx - wpx
        dy = ly - wpy
        dz = lz - wpz
        dist_sq = dx * dx + dy * dy + dz * dz
        dist = jnp.sqrt(dist_sq)
        il = 1.0 / jnp.maximum(dist, 1e-8)
        ldx, ldy, ldz = dx * il, dy * il, dz * il
        q = dist / jnp.maximum(rng, 1e-8)
        q2 = q * q
        bounded = jnp.maximum(jnp.minimum(1.0 - q2 * q2, 1.0), 0.0) \
            / jnp.maximum(dist_sq, 1e-4)
        unbounded = 1.0 / jnp.maximum(dist_sq, 1e-4)
        radial = jnp.where(rng > 0.0, bounded, unbounded)
        cd = sdx * ldx + sdy * ldy + sdz * ldz
        scale = 1.0 / jnp.maximum(cos_in - cos_out, 1e-3)
        ang = jnp.clip(cd * scale - cos_out * scale, 0.0, 1.0)
        ang = ang * ang
        angular = jnp.where(
            ltype == float(lights_mod.LIGHT_SPOT),
            jnp.where(cd > cos_out, ang, 0.0), 1.0)
        rad = 10000.0 * inten * radial * angular

        # Cook-Torrance + Lambert (shading.brdf_response without the
        # transmission/clearcoat terms — the XLA path omits them too)
        hx = ldx + vx
        hy = ldy + vy
        hz = ldz + vz
        hl = 1.0 / jnp.sqrt(jnp.maximum(
            hx * hx + hy * hy + hz * hz, 1e-12))
        hx, hy, hz = hx * hl, hy * hl, hz * hl
        no_l = jnp.clip(nx * ldx + ny * ldy + nz * ldz, 0.0, 1.0)
        no_h = jnp.clip(nx * hx + ny * hy + nz * hz, 0.0, 1.0)
        vo_h = jnp.clip(vx * hx + vy * hy + vz * hz, 0.0, 1.0)
        denom = no_h * no_h * (a2 - 1.0) + 1.0
        d = a2 / jnp.maximum(jnp.float32(mu.PI) * denom * denom, 1e-4)
        fw = (1.0 - vo_h) ** 5
        # NOTE: g_smith_ggx_correlated uses roughness^2 (a), while the NDF
        # uses roughness^4 (a2) — matches shading.py / ref pbr.hlsli
        ggx_v = no_l * jnp.sqrt(no_v * no_v * (1.0 - a) + a)
        ggx_l = no_v * jnp.sqrt(no_l * no_l * (1.0 - a) + a)
        g = 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-5)
        spec = d * g / jnp.maximum(4.0 * no_v * no_l, 1e-3)

        # per-pixel cluster gate: bit cz of the light's z-bitmask at the
        # pixel's xy cell (4 scalar loads cover the block's 2x2 cells)
        zm00 = zmask_ref[c00, i]
        zm01 = zmask_ref[c01, i]
        zm10 = zmask_ref[c10, i]
        zm11 = zmask_ref[c11, i]
        zm = jnp.where(lower, jnp.where(right, zm11, zm10),
                       jnp.where(right, zm01, zm00))
        on = ((zm >> cz) & 1) > 0
        use = on & maskb & (no_l > 0.0)
        w = jnp.where(use, rad * no_l, 0.0)

        def chan(f0c, alc, cc):
            fr = (fw + f0c * (1.0 - fw))
            return (spec * fr + (1.0 - fr) * alc) * cc * w

        return (accr + chan(f0r, alr, cr),
                accg + chan(f0g, alg, cg),
                accb + chan(f0b, alb, cb))

    zero = jnp.zeros((_BH, _BW), jnp.float32)
    accr, accg, accb = jax.lax.fori_loop(
        0, count_ref[b], body, (zero, zero, zero))
    out_ref[0] = accr
    out_ref[1] = accg
    out_ref[2] = accb


def _clustered_lighting_pallas(gb, n, v, depth, cluster_mask, lights,
                               config, near: float, width, height):
    from .raster import _should_interpret
    import math
    gx, gy, gz = cluster_grid_shape(config)
    far = config.cluster_depth_extent
    nby, nbx = height // _BH, width // _BW
    nb = nby * nbx
    num_lights = lights.type.shape[0]

    zmask = _cluster_zmasks(cluster_mask, gx, gy, gz)      # (XY, Lpad) i32
    l_pad = zmask.shape[-1]

    # Per-block light lists: union over the block's <= 2x2 xy cells AND
    # its pixels' actual z range (masked pixels only) — the same lights
    # the per-pixel-word union walked, without materializing words.
    cells = jnp.asarray(_block_cells_np(nby, nbx, gx, gy, width, height))
    db = depth.reshape(nby, _BH, nbx, _BW)
    mb = gb.mask.reshape(nby, _BH, nbx, _BW)
    d_far = jnp.where(mb, db, 2.0).min(axis=(1, 3)).reshape(nb)
    d_near = jnp.where(mb, db, 0.0).max(axis=(1, 3)).reshape(nb)
    any_mask = mb.any(axis=(1, 3)).reshape(nb)

    bounds = _slice_bounds(near, far, gz)

    def _cz(d):
        return _slice_of(near / jnp.maximum(d, 1e-6), bounds)

    cz_min = _cz(d_near)                                   # closest pixel
    cz_max = _cz(d_far)
    full = jnp.int32((1 << gz) - 1) if gz < 31 else jnp.int32(-1)
    zrange = ((full >> (gz - 1 - cz_max)) &
              (full << cz_min).astype(jnp.int32))
    zrange = jnp.where(any_mask, zrange, 0)                # (NB,)
    zcells = zmask[cells]                                  # (NB, 4, Lpad)
    bits = ((zcells & zrange[:, None, None]) != 0).any(axis=1) \
        .astype(jnp.int32)                                 # (NB, Lpad)
    counts, lists = _lists_from_bits(bits, num_lights, l_pad)

    light_rows = _pack_light_rows(lights)
    px = jnp.concatenate([
        jnp.moveaxis(gb.base_color[..., :3], -1, 0),
        jnp.moveaxis(n, -1, 0),
        jnp.moveaxis(v, -1, 0),
        jnp.moveaxis(gb.world_pos, -1, 0),
        gb.mrao[None, ..., 0],
        gb.mrao[None, ..., 1],
        gb.mask[None].astype(jnp.float32),
        depth[None],
    ], axis=0)                                             # (16, H, W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nby, nbx),
        in_specs=[
            pl.BlockSpec((16, _BH, _BW), lambda by, bx, *_: (0, by, bx)),
        ],
        out_specs=pl.BlockSpec((3, _BH, _BW),
                               lambda by, bx, *_: (0, by, bx)),
    )
    out = pl.pallas_call(
        functools.partial(_clustered_block_kernel, nbx=nbx, gx=gx, gy=gy,
                          gz=gz, width=width, height=height,
                          near=near, bounds=bounds),
        name="clustered_lighting",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, height, width), jnp.float32),
        interpret=_should_interpret(),
    )(counts, lists, light_rows, zmask, px)
    return jnp.moveaxis(out, 0, -1)
