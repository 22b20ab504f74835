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

import jax
import jax.numpy as jnp

from . import shading
from ..scene import lights as lights_mod

MAX_LIGHT_RANGE = 4.0  # ref: cluster-culling.hlsli:4


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


def pixel_cluster_id(depth, config, near: float, width: int, height: int):
    """Per-pixel flattened cluster id (ref: cluster-culling.hlsli:30-42).
    depth: reverse-Z ndc depth; view z = near / depth."""
    gx, gy, gz = cluster_grid_shape(config)
    far = config.cluster_depth_extent
    view_z = near / jnp.maximum(depth, 1e-6)
    log_ratio = jnp.log(far / near)
    scale = gz / log_ratio
    bias = -gz * jnp.log(near) / log_ratio
    cz = jnp.clip(jnp.floor(jnp.log(view_z) * scale + bias).astype(jnp.int32),
                  0, gz - 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 0)
    cx = jnp.clip(xs * gx // width, 0, gx - 1)
    cy = jnp.clip(ys * gy // height, 0, gy - 1)
    return (gx * gy) * cz + gx * cy + cx


def clustered_lighting(gb, n, v, depth, lights: lights_mod.LightTable,
                       cluster_mask, config, near: float,
                       width: int, height: int):
    """Additive punctual-light radiance using the cluster bitmask grid
    (ref: lighting/clustered-lighting.hlsl)."""
    cid = pixel_cluster_id(depth, config, near, width, height)
    words = cluster_mask[cid]                  # (H, W, W32) — 1-2 gathers
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
