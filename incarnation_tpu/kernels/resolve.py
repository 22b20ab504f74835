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
    # HIGHEST: TPU matmul defaults to bf16 — too coarse for world-space
    # reconstruction (shadow-ray origins, reprojection).
    wp = jnp.matmul(ndc, inv_view_proj, precision=jax.lax.Precision.HIGHEST)
    return wp[..., :3] / jnp.where(jnp.abs(wp[..., 3:]) > 1e-20,
                                   wp[..., 3:], 1.0)


def _interp_lod(scene, mat_id, interp):
    """Mip level from the kernel's analytic UV screen derivatives (exact,
    unlike HW quad diffs)."""
    meta = tex_mod.stack_meta_lookup(scene.mat_stack, mat_id)
    size_f = meta[..., 1].astype(jnp.float32)
    dudx, dudy, dvdx, dvdy = interp[10], interp[11], interp[12], interp[13]
    rho = jnp.maximum(jnp.sqrt(dudx * dudx + dvdx * dvdx),
                      jnp.sqrt(dudy * dudy + dvdy * dvdy)) * size_f
    return jnp.log2(jnp.maximum(rho, 1e-8))


def _interp_lod_aniso(scene, mat_id, interp, max_aniso: float):
    """Anisotropic mip selection + major-axis tap vector.

    The reference samples material textures with a 16x anisotropic sampler
    (ref: src/demo.cpp:445-493 aniso static samplers). The TPU-native
    equivalent is STOCHASTIC anisotropy: pick the mip from the footprint's
    MINOR axis (clamped so the implied tap count <= max_aniso) and place
    the frame's single stochastic texel tap at a uniformly-jittered offset
    along the MAJOR axis — the TAA accumulation converges to the
    anisotropic line integral at ZERO extra gathers per pixel.

    Returns (lod, major) where major is the (..., 2) uv-per-pixel major
    footprint axis to jitter along."""
    meta = tex_mod.stack_meta_lookup(scene.mat_stack, mat_id)
    size_f = meta[..., 1].astype(jnp.float32)
    dudx, dudy, dvdx, dvdy = interp[10], interp[11], interp[12], interp[13]
    rx = jnp.sqrt(dudx * dudx + dvdx * dvdx)
    ry = jnp.sqrt(dudy * dudy + dvdy * dvdy)
    rmax = jnp.maximum(rx, ry)
    rmin = jnp.minimum(rx, ry)
    # minor-axis mip, clamped to at most max_aniso taps across the major
    rho = jnp.maximum(rmin, rmax / max_aniso) * size_f
    lod = jnp.log2(jnp.maximum(rho, 1e-8))
    x_major = rx >= ry
    major = jnp.stack([jnp.where(x_major, dudx, dudy),
                       jnp.where(x_major, dvdx, dvdy)], axis=-1)
    return lod, major


def masked_alpha(scene, tri, interp, mip_dither=None, uv_dither=False,
                 max_aniso: float = 16.0,
                 coverage_capacity: int | None = None):
    """Per-pixel opacity + pass-threshold for a masked raster layer.

    MASK prims alpha-clip at the material's alphaCutoff
    (ref: visibility-pass.hlsl:101-111, material/common.hlsli alpha clip);
    BLEND prims get a stochastic threshold (screen-door) that the TAA
    accumulation resolves toward true alpha blending.
    Returns (alpha, threshold) — the fragment survives iff alpha >= thresh.
    """
    mat_id = interp[9].astype(jnp.int32)
    uv = jnp.stack([interp[0], interp[1]], axis=-1)
    jitter = None
    if mip_dither is not None:
        if max_aniso > 1.0:
            lod, major = _interp_lod_aniso(scene, mat_id, interp, max_aniso)
            xi = _frame_noise(tri.shape, mip_dither, 2428444049)
            # The stochastic aniso tap for MASKED fragments is clamped to
            # HALF an alpha-classification cell (1/64 uv) so the kernel's
            # conservative reject bitplane (textures.py amask, half-cell
            # dilation) stays a sound bound on where this test can sample.
            from ..scene.textures import AMASK_CELLS
            half_cell = 0.5 / AMASK_CELLS
            major = jnp.clip(major, -half_cell, half_cell)
            uv = uv + major * (xi - 0.5)[..., None]
        else:
            lod = _interp_lod(scene, mat_id, interp)
        lod = jnp.floor(lod + _frame_noise(tri.shape, mip_dither, 741103597))
        if uv_dither:
            jitter = jnp.stack(
                [_frame_noise(tri.shape, mip_dither, 1181783497),
                 _frame_noise(tri.shape, mip_dither, 3267000013)], axis=-1)
    else:
        lod = _interp_lod(scene, mat_id, interp)
    # Clamp the alpha-test mip to texels no coarser than HALF an alpha-
    # classification cell: the kernel's conservative in-race reject
    # bitplane (textures.py amask) only covers those mips — coarser ones
    # would smear every cell's max. Distant foliage alpha thus samples a
    # slightly sharper mip than its footprint; TAA integrates the residual
    # aliasing.
    from ..scene.textures import AMASK_CELLS as _AC
    _meta = tex_mod.stack_meta_lookup(scene.mat_stack, mat_id)
    _lod_max = jnp.log2(jnp.maximum(
        _meta[..., 1].astype(jnp.float32) / (2.0 * _AC), 1.0))
    lod = jnp.minimum(lod, _lod_max)
    # Peel layers cover only the masked-geometry pixels; compact them at
    # CHUNK granularity (128-px rows, see _chunk_compact) so the
    # alpha-mirror gather costs capacity*128 indices, not H*W.
    # coverage_capacity counts chunks. Overflowing chunks read alpha 1.0
    # (fragment accepted solid — visually safer than vanishing geometry);
    # callers surface resolve.chunk_overflow as a stat.
    if coverage_capacity is not None:
        jx = jitter[..., 0] if jitter is not None else jnp.zeros(tri.shape)
        jy = jitter[..., 1] if jitter is not None else jnp.zeros(tri.shape)
        planes = jnp.stack(
            [uv[..., 0], uv[..., 1], lod,
             mat_id.astype(jnp.float32), jx, jy], -1)
        cid, sel, _ = _chunk_compact(tri >= 0, planes, coverage_capacity)
        a_k = tex_mod.sample_stack_alpha(
            scene.mat_stack, sel[..., 3].astype(jnp.int32), sel[..., 0:2],
            lod=sel[..., 2],
            jitter=(sel[..., 4:6] if jitter is not None else None))
        a_tex = _chunk_scatter(cid, a_k[..., None], tri.shape,
                               fill=1.0)[..., 0]
    else:
        a_tex = tex_mod.sample_stack_alpha(scene.mat_stack, mat_id, uv,
                                           lod=lod, jitter=jitter)
    fac = mu.onehot_lookup(scene.mat_params, jnp.maximum(mat_id, 0))
    alpha = fac[..., 6] * a_tex
    blend_noise = _frame_noise(
        tri.shape, 0 if mip_dither is None else mip_dither, 1597334677)
    thresh = jnp.where(fac[..., 12] >= 2.0,
                       jnp.maximum(blend_noise, 1e-3), fac[..., 11])
    return alpha, thresh


def _chunk_compact(active, planes, capacity: int):
    """Row-chunk compaction for sparse full-screen table fetches.

    Views the (H, W) image as (H*W/128, 128)-pixel chunks (rows of the TPU
    lane dimension) and gathers the chunks containing any active pixel.
    Chunk gathers are vector-rate ROW copies (128 px amortize one index),
    so the compaction itself costs ~nothing — unlike per-pixel
    nonzero/gather/scatter (measured 18+28+47 ms at 2M px on v5e, which is
    why the r2 per-pixel compaction was removed) — while the downstream
    per-pixel table gather then pays capacity*128 indices instead of H*W.

    active: (H, W) bool; planes: (H, W, C); capacity: max chunks kept.
    Returns (cid (capacity,), picked (capacity, 128, C), overflow count).
    Overflowing chunks are dropped — callers choose the scatter fill and
    surface the overflow as a stat."""
    h, w = active.shape
    nch = (h * w) // 128
    assert nch * 128 == h * w, "chunk compaction needs H*W % 128 == 0"
    chunk_any = active.reshape(nch, 128).any(axis=1)
    (cid,) = jnp.nonzero(chunk_any, size=capacity, fill_value=nch)
    picked = planes.reshape(nch, 128, planes.shape[-1])[
        jnp.minimum(cid, nch - 1)]
    overflow = (chunk_any.sum() - (cid < nch).sum()).astype(jnp.int32)
    return cid, picked, overflow


def _chunk_scatter(cid, values, shape, fill=0.0):
    """Scatter (capacity, 128, C) chunk values back to (H, W, C); chunks
    not selected (and overflow fill rows, cid == nch: out of bounds,
    dropped) read `fill`."""
    nch = (shape[0] * shape[1]) // 128
    out = jnp.full((nch, 128) + values.shape[2:], fill, values.dtype)
    out = out.at[cid].set(values, mode="drop")
    return out.reshape(shape + values.shape[2:])


def chunk_overflow(active, capacity: int):
    """How many active 128-px chunks exceed `capacity` (stat mirror of
    bin_overflow for the chunk-compacted sparse fetches)."""
    h, w = active.shape
    nch = (h * w) // 128
    n_active = active.reshape(nch, 128).any(axis=1).sum()
    return jnp.maximum(n_active - capacity, 0).astype(jnp.int32)


def _frame_noise(shape, frame_index, mult: int):
    """Per-pixel uniform in [0, 1) decorrelated across frames; `mult` picks
    an independent channel. Matches the reference's per-frame blue-ish dither
    role (the TAA jitter sequence resolves the expectation temporally)."""
    xs_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    ys_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    seed = jnp.asarray(frame_index).astype(jnp.uint32) * jnp.uint32(mult)
    h32 = ((xs_i * jnp.uint32(374761393)
            + ys_i * jnp.uint32(668265263)) ^ seed)
    h32 = (h32 ^ (h32 >> 13)) * jnp.uint32(1274126177)
    return ((h32 >> 16) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0


def resolve_gbuffer(tri, depth, scene, interp, inv_view_proj,
                    width: int, height: int,
                    trilinear: bool = True,
                    mip_dither=None, uv_dither: bool = False,
                    return_normal3: bool = False,
                    max_aniso: float = 16.0,
                    coverage_capacity: int | None = None,
                    checker_parity=None):
    """tri: (H, W) int32 global triangle indices (-1 = background);
    interp: (16, H, W) f32 per-pixel attributes emitted by the raster
    kernel's attribute-select pass (raster.INTERP_CHANNELS layout:
    u, v, wn.xyz, wt.xyz, sign, matid, dudx, dudy, dvdx, dvdy) — the
    per-pixel attribute-row gather is gone (it was the TPU slow path).

    mip_dither: frame index enabling stochastic single-mip selection;
    uv_dither: additionally jitter the bilinear footprint so the whole
    material stack is ONE texel gather per pixel (requires mip_dither + TAA
    to converge — stochastic texture filtering);
    checker_parity: optional (frame & 1) enabling the checkerboard
    half-rate STACK fetch (kernels/checker.py — the fetch is index-rate
    bound, so half the indices is half the 2M-px gather cost; the skipped
    parity takes the horizontal tent of its gathered neighbors in storage
    space and TAA alternates parity, same estimator family as the probe
    and shadow checkerboards);
    return_normal3: also return the mapped world normal as 3 channels
    without the octahedral round trip (the forward path shades from this,
    matching the reference's forward PS which never encodes the normal,
    ref: geo-raster/forward-pass.hlsl:108-114)."""
    mask = tri >= 0

    u = interp[0]
    v = interp[1]
    uv = jnp.stack([u, v], axis=-1)
    wn = jnp.stack([interp[2], interp[3], interp[4]], axis=-1)
    wt = jnp.stack([interp[5], interp[6], interp[7]], axis=-1)
    sign = interp[8][..., None]
    mat_id = interp[9].astype(jnp.int32)

    n = mu.normalize(wn)
    t = mu.normalize(wt)
    b = mu.normalize(jnp.cross(n, t) * sign)

    jitter = None
    if mip_dither is not None:
        # Stochastic single-level mip selection: dither the fractional mip
        # by a per-pixel noise + TAA frame offset; the temporal accumulation
        # converges to trilinear at half the texture gathers. max_aniso > 1
        # additionally jitters the tap along the footprint's major axis
        # (stochastic anisotropic filtering — see _interp_lod_aniso).
        if max_aniso > 1.0:
            lod, major = _interp_lod_aniso(scene, mat_id, interp, max_aniso)
            xi = _frame_noise(tri.shape, mip_dither, 2428444049)
            uv = uv + major * (xi - 0.5)[..., None]
        else:
            lod = _interp_lod(scene, mat_id, interp)
        lod = jnp.floor(lod + _frame_noise(tri.shape, mip_dither, 2654435761))
        trilinear = False
        if uv_dither:
            jitter = jnp.stack(
                [_frame_noise(tri.shape, mip_dither, 1181783497),
                 _frame_noise(tri.shape, mip_dither, 3267000013)], axis=-1)
    else:
        lod = _interp_lod(scene, mat_id, interp)

    # One interleaved fetch for every texture slot. For sparse layers
    # (decals: most pixels are background) the HBM stack gather is
    # index-bound (~9 ms at 2M indices into the full-scene stack), so
    # coverage_capacity compacts covered CHUNKS first (128-px rows, see
    # _chunk_compact) — the fetch then costs capacity*128 indices, not
    # H*W. Overflowing chunks degrade to untextured (callers report
    # resolve.chunk_overflow as a stat).
    if coverage_capacity is not None:
        jx = jitter[..., 0] if jitter is not None else jnp.zeros(tri.shape)
        jy = jitter[..., 1] if jitter is not None else jnp.zeros(tri.shape)
        planes = jnp.stack(
            [uv[..., 0], uv[..., 1], lod,
             mat_id.astype(jnp.float32), jx, jy], -1)
        cid, sel, _ = _chunk_compact(mask, planes, coverage_capacity)
        chans_k = tex_mod.sample_material_stack(
            scene.mat_stack, sel[..., 3].astype(jnp.int32), sel[..., 0:2],
            lod=sel[..., 2], trilinear=trilinear,
            jitter=(sel[..., 4:6] if jitter is not None else None))
        chans = _chunk_scatter(cid, chans_k, tri.shape)
    elif (checker_parity is not None and jitter is not None
          and tri.shape[1] % 2 == 0):
        from . import checker
        cp = checker_parity
        chans = checker.expand(cp, tex_mod.sample_material_stack(
            scene.mat_stack,
            checker.compact(cp, mat_id), checker.compact(cp, uv),
            lod=checker.compact(cp, lod), trilinear=trilinear,
            jitter=checker.compact(cp, jitter)))
    else:
        chans = tex_mod.sample_material_stack(scene.mat_stack, mat_id, uv,
                                              lod=lod, trilinear=trilinear,
                                              jitter=jitter)
    tx = tex_mod.decode_stack_channels(chans)
    fac = mu.onehot_lookup(scene.mat_params,
                           jnp.maximum(mat_id, 0))     # (H, W, 16)

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
    gb = GBuffer(
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
    if return_normal3:
        return gb, jnp.where(m, n_mapped, 0.0)
    return gb


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
