"""GBuffer material resolve: visibility buffer -> shaded surface attributes.

Port of the reference's fullscreen compute material resolve
(ref: shaders/geo-raster/gbuffer-compute.hlsl): decode the visibility id,
fetch the triangle's vertices, reconstruct perspective-correct screen-space
barycentrics analytically (ref: gbuffer-compute.hlsl:23-47, after
filmicworlds' visibility-buffer article), interpolate attributes, evaluate
the material (ref: shaders/material/common.hlsli EvaluateMaterialProperties),
and emit base color / octahedral normal / metallic-roughness-AO gbuffers plus
emissive into the HDR color target (x20000, ref: gbuffer-compute.hlsl:247).

On TPU this is a fused elementwise+gather pixel pipeline (XLA handles the
fusion); the per-pixel triangle-data fetch is a flat gather into the packed
scene arrays instead of bindless accessor chasing.
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
    world_pos: jnp.ndarray     # (H, W, 3) f32 reconstructed world position
    uv: jnp.ndarray            # (H, W, 2) f32 (debug / alpha passes)


def calc_barycentrics(p0, p1, p2, pixel_ndc):
    """Screen-space perspective-correct barycentrics + NDC-space derivative
    helpers (ref: gbuffer-compute.hlsl:23-47). p_i: (..., 4) clip coords.

    Returns (lambda (...,3), ddx (...,3), ddy (...,3), interp_w (...,)).
    """
    inv_w = 1.0 / jnp.stack([p0[..., 3], p1[..., 3], p2[..., 3]], axis=-1)
    ndc0 = p0[..., :2] * inv_w[..., 0:1]
    ndc1 = p1[..., :2] * inv_w[..., 1:2]
    ndc2 = p2[..., :2] * inv_w[..., 2:3]

    a = ndc2 - ndc1
    b = ndc0 - ndc1
    det = a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)[..., None]

    ddx = jnp.stack([ndc1[..., 1] - ndc2[..., 1],
                     ndc2[..., 1] - ndc0[..., 1],
                     ndc0[..., 1] - ndc1[..., 1]], axis=-1) * inv_det * inv_w
    ddy = jnp.stack([ndc2[..., 0] - ndc1[..., 0],
                     ndc0[..., 0] - ndc2[..., 0],
                     ndc1[..., 0] - ndc0[..., 0]], axis=-1) * inv_det * inv_w
    ddx_sum = jnp.sum(ddx, axis=-1, keepdims=True)
    ddy_sum = jnp.sum(ddy, axis=-1, keepdims=True)

    delta = pixel_ndc - ndc0
    interp_inv_w = (inv_w[..., 0] + delta[..., 0] * ddx_sum[..., 0]
                    + delta[..., 1] * ddy_sum[..., 0])
    interp_w = jnp.where(jnp.abs(interp_inv_w) > 1e-20,
                         1.0 / interp_inv_w, 0.0)

    lam0 = interp_w * (inv_w[..., 0] + delta[..., 0] * ddx[..., 0]
                       + delta[..., 1] * ddy[..., 0])
    lam1 = interp_w * (delta[..., 0] * ddx[..., 1]
                       + delta[..., 1] * ddy[..., 1])
    lam2 = interp_w * (delta[..., 0] * ddx[..., 2]
                       + delta[..., 1] * ddy[..., 2])
    return (jnp.stack([lam0, lam1, lam2], axis=-1), ddx, ddy, interp_w)


def _interp(v0, v1, v2, lam):
    return (v0 * lam[..., 0:1] + v1 * lam[..., 1:2] + v2 * lam[..., 2:3])


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


def resolve_gbuffer(vis, scene, clip, world_pos_v, world_n_v, world_t_v,
                    width: int, height: int) -> GBuffer:
    """vis: (H, W) int32 visibility buffer; clip/world*: per-vertex arrays."""
    mask = vis != mu.VIS_CLEAR_INT32
    prim, ltri = mu.decode_primitive_visibility(jnp.where(mask, vis, 0))
    gtri = scene.prim_tri_offset[prim] + ltri
    gtri = jnp.clip(gtri, 0, scene.tri_vtx.shape[0] - 1)
    tv = scene.tri_vtx[gtri]                      # (H, W, 3)
    i0, i1, i2 = tv[..., 0], tv[..., 1], tv[..., 2]

    p0, p1, p2 = clip[i0], clip[i1], clip[i2]     # (H, W, 4)

    # Pixel NDC (ref: gbuffer-compute.hlsl:222-226)
    xs = (jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5)
    ys = (jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5)
    pixel_ndc = jnp.stack([2.0 * xs / width - 1.0,
                           -2.0 * ys / height + 1.0], axis=-1)

    lam, ddx, ddy, _ = calc_barycentrics(p0, p1, p2, pixel_ndc)

    n = mu.normalize(_interp(world_n_v[i0], world_n_v[i1], world_n_v[i2],
                             lam))
    t = mu.normalize(_interp(world_t_v[i0], world_t_v[i1], world_t_v[i2],
                             lam))
    sign = scene.tangents[i0][..., 3:4]
    b = mu.normalize(jnp.cross(n, t) * sign)
    uv = _interp(scene.uvs[i0], scene.uvs[i1], scene.uvs[i2], lam)
    wp = _interp(world_pos_v[i0], world_pos_v[i1], world_pos_v[i2], lam)

    # Texture lod from analytic UV derivatives: with g_i the screen-linear
    # numerators, d(uv)/dndc = w * (sum ddx_i uv_i - uv * sum ddx_i).
    uvs3 = jnp.stack([scene.uvs[i0], scene.uvs[i1], scene.uvs[i2]], axis=-2)
    interp_w = 1.0  # folded into lam already; recompute derivative directly
    duv_dx = (jnp.sum(ddx[..., None] * uvs3, axis=-2)
              - uv * jnp.sum(ddx, axis=-1, keepdims=True))
    duv_dy = (jnp.sum(ddy[..., None] * uvs3, axis=-2)
              - uv * jnp.sum(ddy, axis=-1, keepdims=True))
    # NDC -> pixel scale; perspective factor w applied via lam's scale is
    # approximated with the lam-normalized derivative (adequate for mip
    # selection).
    size = scene.atlas.meta.size
    texel_dx = duv_dx * (2.0 / width) * size
    texel_dy = duv_dy * (2.0 / height) * size
    rho = jnp.maximum(jnp.linalg.norm(texel_dx, axis=-1),
                      jnp.linalg.norm(texel_dy, axis=-1))
    lod = jnp.log2(jnp.maximum(rho, 1e-8))

    mat_id = scene.prim_material[prim]
    gb = evaluate_material(scene, mat_id, uv, lod, n, t, b)

    oct_n = mu.oct_encode(gb["normal"])
    zero = jnp.zeros_like(gb["base_color"][..., :1])
    m = mask[..., None]
    return GBuffer(
        base_color=jnp.where(
            m, jnp.concatenate([gb["base_color"], gb["opacity"][..., None]],
                               axis=-1), 0.0),
        normals=jnp.where(m, oct_n, 0.0),
        mrao=jnp.where(m, jnp.stack(
            [gb["metallic"], gb["roughness"], gb["ao"], gb["aoblend"]],
            axis=-1), 0.0),
        emissive=jnp.where(m, gb["emissive"] * 20000.0, 0.0),
        mask=mask,
        world_pos=jnp.where(m, wp, 0.0),
        uv=uv,
    )


def evaluate_material(scene, mat_id, uv, lod, n, t, b) -> dict:
    """EvaluateMaterialProperties (ref: shaders/material/common.hlsli:28-117)
    over pixel arrays; all texture slots sampled through the scene atlas."""
    mt = scene.materials
    atlas = scene.atlas

    def sample(tex_ids):
        return tex_mod.sample_atlas(atlas, tex_ids, uv, lod=lod)

    def pick(tex_ids, sampled, fallback):
        has = (tex_ids >= 0)[..., None]
        return jnp.where(has, sampled, fallback)

    # Emissive
    t_em = mt.tex_emissive[mat_id]
    emissive = mt.emissive_factor[mat_id] * pick(
        t_em, sample(t_em)[..., :3], 1.0)

    # Base color + opacity
    t_bc = mt.tex_base_color[mat_id]
    bc_sample = sample(t_bc)
    base_color = mt.base_color_factor[mat_id][..., :3] * pick(
        t_bc, bc_sample[..., :3], 1.0)
    opacity = jnp.where(t_bc >= 0, bc_sample[..., 3],
                        mt.base_color_factor[mat_id][..., 3])

    # Normal map (glTF: rgb = tangent-space normal; the reference
    # reconstructs z from BC5 xy — ref: material/common.hlsli:50-58)
    t_nm = mt.tex_normal[mat_id]
    nm = sample(t_nm)
    nxy = (nm[..., :2] * 2.0 - 1.0) * mt.normal_scale[mat_id][..., None]
    nz = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(nxy * nxy, axis=-1), 1e-6))
    n_ts = jnp.concatenate([nxy, nz[..., None]], axis=-1)
    # tangentToWorld rows T, B, N (ref: gbuffer-compute.hlsl:238-241)
    n_mapped = mu.normalize(
        n_ts[..., 0:1] * t + n_ts[..., 1:2] * b + n_ts[..., 2:3] * n)
    normal = jnp.where((t_nm >= 0)[..., None], n_mapped, n)

    # Metallic (B) / roughness (G) per glTF spec (the reference swizzles
    # metallic into R at import; same values either way)
    t_mr = mt.tex_metallic_roughness[mat_id]
    mr = sample(t_mr)
    metallic = jnp.where(t_mr >= 0, mr[..., 2], mt.metallic_factor[mat_id])
    roughness = jnp.where(t_mr >= 0, mr[..., 1], mt.roughness_factor[mat_id])

    # AO
    t_ao = mt.tex_ao[mat_id]
    ao = jnp.where(t_ao >= 0, sample(t_ao)[..., 0], 1.0)

    return dict(emissive=emissive, base_color=base_color, opacity=opacity,
                normal=normal, metallic=metallic, roughness=roughness,
                ao=ao, aoblend=mt.ao_strength[mat_id])
