"""GBuffer material resolve: triangle-index buffer -> shaded surface attrs.

The reference's fullscreen material resolve decodes the visibility id,
re-fetches the triangle's three vertices, and reconstructs perspective-correct
barycentrics analytically per pixel (ref: shaders/geo-raster/
gbuffer-compute.hlsl). A literal port costs ~20 random gathers per pixel —
and per-pixel random access, not FLOPs, is the scarce TPU resource. The
TPU-native restructuring:

- Triangle setup precomputes screen-space *attribute planes* per triangle
  (kernels/raster.py triangle_attributes): every interpolant becomes
  numerator/denominator linear forms in pixel coordinates, mathematically
  identical to the reference's CalcBarycentrics interpolation
  (ref: gbuffer-compute.hlsl:23-67).
- The resolve gathers ONE 32-float attribute row per pixel and evaluates the
  planes (pure VPU math). UV screen derivatives for mip selection fall out
  analytically from the same planes.
- World position is reconstructed from depth + inverse view-projection, as
  the reference's lighting passes do (ref: lighting/sky-lighting.hlsl:66-77)
  instead of interpolating it.
- All material texture slots come back in one interleaved stack fetch
  (scene/textures.py sample_material_stack) plus one packed factor row
  (materials.py pack_material_params): 4-8 gathers total for texturing vs the
  reference's 9 separate bindless samples.

Output gbuffer matches the reference: base color, octahedral world normal,
metallic/roughness/ao/aoblend, emissive x20000
(ref: gbuffer-compute.hlsl:245-250).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import mathutils as mu
from ..scene import textures as tex_mod


class GBuffer(NamedTuple):
    base_color: jnp.ndarray    # (H, W, 4) f32 rgb + opacity
    normals: jnp.ndarray       # (H, W, 2) f32 octahedral world normal
    mrao: jnp.ndarray          # (H, W, 4) f32 metallic, roughness, ao, aoblend
    emissive: jnp.ndarray      # (H, W, 3) f32 (already x20000)
    mask: jnp.ndarray          # (H, W) bool geometry coverage
    world_pos: jnp.ndarray     # (H, W, 3) f32 reconstructed from depth
    uv: jnp.ndarray            # (H, W, 2) f32 (debug / alpha passes)
    extras: jnp.ndarray        # (H, W, 3) f32 transmission, clearcoat, ccrough


def world_from_depth(depth, inv_view_proj, width: int, height: int):
    """Reconstruct world position from reverse-Z depth
    (ref: sky-lighting.hlsl:66-77)."""
    xs = (jax.lax.broadcasted_iota(jnp.float32, depth.shape, 1) + 0.5)
    ys = (jax.lax.broadcasted_iota(jnp.float32, depth.shape, 0) + 0.5)
    ndc = jnp.stack([2.0 * xs / width - 1.0, -2.0 * ys / height + 1.0,
                     depth, jnp.ones_like(depth)], axis=-1)
    wp = ndc @ inv_view_proj
    return wp[..., :3] / jnp.where(jnp.abs(wp[..., 3:]) > 1e-20,
                                   wp[..., 3:], 1.0)


def resolve_gbuffer(tri, depth, scene, attr, inv_view_proj,
                    width: int, height: int,
                    trilinear: bool = True,
                    mip_dither=None) -> GBuffer:
    """tri: (H, W) int32 global triangle indices (-1 = background);
    attr: (T, 32) f32 per-triangle attribute planes."""
    mask = tri >= 0
    safe = jnp.maximum(tri, 0)
    row = attr[safe]                                  # (H, W, 32) ONE gather

    xs = (jax.lax.broadcasted_iota(jnp.float32, tri.shape, 1) + 0.5)
    ys = (jax.lax.broadcasted_iota(jnp.float32, tri.shape, 0) + 0.5)

    def lin(c):   # evaluate a plane (..., 3) at the pixel
        return c[..., 0] * xs + c[..., 1] * ys + c[..., 2]

    denom = lin(row[..., 24:27])
    inv_d = jnp.where(jnp.abs(denom) > 1e-20, 1.0 / denom, 0.0)

    def interp(start):
        return lin(row[..., start:start + 3]) * inv_d

    u = interp(0)
    v = interp(3)
    uv = jnp.stack([u, v], axis=-1)
    wn = jnp.stack([interp(6), interp(9), interp(12)], axis=-1)
    wt = jnp.stack([interp(15), interp(18), interp(21)], axis=-1)
    sign = row[..., 27:28]
    mat_id = row[..., 28].astype(jnp.int32)

    n = mu.normalize(wn)
    t = mu.normalize(wt)
    b = mu.normalize(jnp.cross(n, t) * sign)

    # Analytic UV screen derivatives for mip selection: for f = P.p / D.p,
    # df/dx = (P_x - f * D_x) / D.p — exact, unlike hardware quad diffs.
    meta = scene.mat_stack.meta[jnp.maximum(mat_id, 0)]
    size_f = meta[..., 1].astype(jnp.float32)
    dudx = (row[..., 0] - u * row[..., 24]) * inv_d
    dudy = (row[..., 1] - u * row[..., 25]) * inv_d
    dvdx = (row[..., 3] - v * row[..., 24]) * inv_d
    dvdy = (row[..., 4] - v * row[..., 25]) * inv_d
    rho = jnp.maximum(jnp.sqrt(dudx * dudx + dvdx * dvdx),
                      jnp.sqrt(dudy * dudy + dvdy * dvdy)) * size_f
    lod = jnp.log2(jnp.maximum(rho, 1e-8))
    if mip_dither is not None:
        # Stochastic single-level mip selection: dither the fractional mip
        # by a per-pixel blue-ish noise + TAA frame offset; the temporal
        # accumulation converges to trilinear at half the texture gathers.
        xs_i = jax.lax.broadcasted_iota(jnp.uint32, tri.shape, 1)
        ys_i = jax.lax.broadcasted_iota(jnp.uint32, tri.shape, 0)
        seed = jnp.asarray(mip_dither).astype(jnp.uint32) \
            * jnp.uint32(2654435761)
        h32 = ((xs_i * jnp.uint32(374761393)
                + ys_i * jnp.uint32(668265263)) ^ seed) & jnp.uint32(0xFFFF)
        lod = jnp.floor(lod + h32.astype(jnp.float32) / 65536.0)
        trilinear = False

    # One interleaved fetch for every texture slot
    chans = tex_mod.sample_material_stack(scene.mat_stack, mat_id, uv,
                                          lod=lod, trilinear=trilinear)
    tx = tex_mod.decode_stack_channels(chans)
    fac = scene.mat_params[jnp.maximum(mat_id, 0)]     # (H, W, 16)

    base_color = fac[..., 3:6] * tx["base_rgb"]
    opacity = fac[..., 6] * tx["opacity"]
    emissive = fac[..., 0:3] * tx["emissive_rgb"]
    metallic = fac[..., 7] * tx["metallic"]
    roughness = fac[..., 8] * tx["roughness"]
    ao = tx["ao"]
    ao_blend = fac[..., 9]

    # Normal mapping (z reconstructed from xy like the reference's BC5 path,
    # ref: material/common.hlsli:50-58)
    nxy = tx["normal_xy"] * fac[..., 10:11]
    nz = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(nxy * nxy, -1), 1e-6))
    n_mapped = mu.normalize(nxy[..., 0:1] * t + nxy[..., 1:2] * b
                            + nz[..., None] * n)

    wp = world_from_depth(depth, inv_view_proj, width, height)

    m = mask[..., None]
    return GBuffer(
        base_color=jnp.where(
            m, jnp.concatenate([base_color, opacity[..., None]], -1), 0.0),
        normals=jnp.where(m, mu.oct_encode(n_mapped), 0.0),
        mrao=jnp.where(m, jnp.stack(
            [metallic, roughness, ao, ao_blend], -1), 0.0),
        emissive=jnp.where(m, emissive * 20000.0, 0.0),
        mask=mask,
        world_pos=jnp.where(m, wp, 0.0),
        uv=uv,
        extras=jnp.where(m, jnp.stack(
            [fac[..., 13] * tx["transmission"], fac[..., 14] * tx["clearcoat"],
             fac[..., 15]], -1), 0.0),
    )


def vertex_world_attributes(scene, scene_rotation):
    """Per-vertex world-space normals/tangents, once per frame.

    The reference transforms normals by the 3x3 of localToWorld without
    inverse-transpose (ref: gbuffer-compute.hlsl:238-241); we match that.
    """
    rot = jnp.einsum("mij,jk->mik", scene.mesh_transforms[:, :3, :3],
                     scene_rotation[:3, :3])
    r = rot[scene.vtx_mesh]
    wn = jnp.einsum("vi,vij->vj", scene.normals, r)
    wt = jnp.einsum("vi,vij->vj", scene.tangents[:, :3], r)
    return wn, wt
