"""Sun shadow map: TPU-native always-on sun visibility.

The reference traces a per-pixel DXR shadow ray toward the sun in its
DirectLighting pass (ref: shaders/lighting/common.hlsli:91-116 +
lighting/direct-lighting.hlsl) — cheap on RT cores, but a BVH walk is
HBM-gather-bound on TPU (hundreds of ms at 2M rays). The TPU-first design
for the same capability (per-pixel sun visibility every frame) is a
rasterized orthographic shadow map: the existing Pallas fine-raster renders
sun-view depth in depth-only mode (no attribute stream — raster.py
depth_only), and the screen pass compares each pixel's sun-space depth with
ONE stochastic PCF tap that TAA integrates into a soft penumbra. The exact
BVH path remains available (Config.sun_shadow_mode = "rt") and is used for
raster-vs-raytrace parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu
from . import raster as raster_mod


def sun_view_proj(sun_dir, center, radius) -> np.ndarray:
    """Orthographic reverse-Z view-proj (row-vector convention) looking
    along -sun_dir, fitted to the bounding sphere (center, radius).

    NDC z = (far - z_view) / (far - near): 1 nearest the sun, 0 at the far
    side — the same max-wins depth convention as the camera rasterizer.
    Host-side (numpy): runs once per frame in FrameConstants.make."""
    sun_dir = np.asarray(sun_dir, np.float32)
    sun_dir = sun_dir / max(np.linalg.norm(sun_dir), 1e-8)
    center = np.asarray(center, np.float32)
    radius = float(radius)
    look = -sun_dir                       # light travel direction
    up_hint = np.asarray([0.0, 1.0, 0.0], np.float32)
    if abs(float(look @ up_hint)) > 0.95:
        up_hint = np.asarray([1.0, 0.0, 0.0], np.float32)
    right = np.cross(up_hint, look)
    right /= max(np.linalg.norm(right), 1e-8)
    up = np.cross(look, right)
    pos = center + sun_dir * (radius * 1.05)
    view = mu.view_matrix(pos, right, up, look)
    near, far = 0.0, 2.1 * radius
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 1.0 / radius
    proj[1, 1] = 1.0 / radius
    proj[2, 2] = -1.0 / (far - near)
    proj[3, 2] = far / (far - near)
    proj[3, 3] = 1.0
    return (view @ proj).astype(np.float32)


def shadow_params(resolution: int, config) -> raster_mod.RasterParams:
    """Raster params for the sun depth pass (square, depth-only)."""
    # tile_h 16 (not the config's display tile height): the depth pass is
    # VPU-bound in pairs x tile-pixels, and the sun view's pair lists are
    # dense enough that halving the tile beats halving the grid (measured
    # 4.75 -> ~3 ms at 1024^2 with ~125k pairs).
    return raster_mod.RasterParams(
        width=resolution, height=resolution,
        tile_h=16, tile_w=config.raster_tile_w,
        pair_capacity=config.shadow_pair_capacity,
        bin_max_span=config.bin_max_span,
        big_tri_capacity=config.big_tri_capacity,
        depth_only=True)


def render_sun_shadow_map(scene, scene_rotation, sun_vp,
                          params: raster_mod.RasterParams):
    """Rasterize sun-view depth for the whole scene (every visible prim —
    shadow casters are never frustum-culled against the camera).

    Alpha-masked prims cast opaque shadows here (the alpha-tested peel is a
    camera-pass refinement; a divergence from the reference's any-hit alpha
    shadow rays, documented in COMPONENTS.md). Returns ((S, S) depth, stats).
    """
    prim_visible = ((scene.mesh_visible[jnp.maximum(scene.prim_mesh, 0)] > 0)
                    & (scene.prim_is_decal == 0))
    prep = raster_mod.prepare_geometry(scene, scene_rotation, sun_vp,
                                       prim_visible, params,
                                       emit_attributes=False)
    tri, depth, stats = raster_mod.raster_depth(prep, params)
    return pack_depth_u16(depth), stats


def pack_depth_u16(depth):
    """Quantize NDC depth to u16 and pack two texels per i32 word.

    The per-pixel visibility gather is HBM-index-bound with a strong
    table-SIZE term, so halving the map's bytes (f32 -> packed u16) makes
    the 2M-index fetch measurably cheaper. The quantization step (1/65535)
    sits ~50x below the smallest shadow bias (1.5 * 2/resolution at
    resolution <= 4096), so the depth compare is unaffected."""
    q = jnp.clip(jnp.round(depth.astype(jnp.float32) * 65535.0),
                 0, 65535).astype(jnp.uint32)
    q = q.reshape(-1, 2)
    return (q[:, 0] | (q[:, 1] << 16)).astype(jnp.int32)


def sun_visibility(world_pos, n_dot_l, shadow_depth, sun_vp,
                   resolution: int, dither=None, checker_parity=None):
    """Per-pixel sun visibility from the shadow map.

    world_pos: (H, W, 3) in the same (rotated) space the map was rendered
    in; n_dot_l: (H, W) for slope-scaled bias; shadow_depth: the packed-u16
    map from render_sun_shadow_map (pack_depth_u16); dither: optional frame
    index enabling the stochastic 1-texel PCF jitter (TAA resolves the
    penumbra); checker_parity: optional (frame & 1) enabling the
    checkerboard half-rate fetch (kernels/checker.py — halves the
    index-bound map gather; pair with TAA). Returns (H, W) float32 in
    [0, 1].
    """
    if checker_parity is not None:
        from . import checker
        vis_half = sun_visibility(
            checker.compact(checker_parity, world_pos),
            checker.compact(checker_parity, n_dot_l),
            shadow_depth, sun_vp, resolution, dither=dither)
        return checker.expand(checker_parity, vis_half)
    h, w = world_pos.shape[:2]
    wp_h = jnp.concatenate([world_pos,
                            jnp.ones(world_pos.shape[:-1] + (1,))], -1)
    s = jnp.matmul(wp_h, sun_vp, precision=jax.lax.Precision.HIGHEST)
    # orthographic: s[..., 3] == 1
    u = (s[..., 0] * 0.5 + 0.5) * resolution
    v = (0.5 - s[..., 1] * 0.5) * resolution
    z = s[..., 2]
    if dither is not None:
        # one jittered tap in a 2-texel box around the sample: expectation
        # = 2x2-box PCF; TAA integrates it (stochastic filtering design)
        jx = _noise(world_pos.shape[:2], dither, 2246822519)
        jy = _noise(world_pos.shape[:2], dither, 3266489917)
        u = u + (jx - 0.5) * 2.0
        v = v + (jy - 0.5) * 2.0
    xi = jnp.clip(u.astype(jnp.int32), 0, resolution - 1)
    yi = jnp.clip(v.astype(jnp.int32), 0, resolution - 1)
    # linear-index gather of the packed map (a 2-D [yi, xi] gather lowers
    # to a slower two-coordinate gather on TPU); each word carries two
    # u16 depths, halving the gathered table
    lin = yi * resolution + xi
    word = shadow_depth[lin >> 1].astype(jnp.uint32)
    half = (lin & 1).astype(jnp.uint32) * 16
    d = ((word >> half) & 0xFFFF).astype(jnp.float32) * (1.0 / 65535.0)
    # Slope-scaled bias in NDC-z units (depth range spans 2.1 * radius;
    # 2-texel worst-case slope + constant offset).
    bias = (1.5 + 2.0 * (1.0 - jnp.clip(n_dot_l, 0.0, 1.0))) * (2.0
                                                                / resolution)
    occluded = d > z + bias
    inside = (s[..., 0] >= -1.0) & (s[..., 0] <= 1.0) \
        & (s[..., 1] >= -1.0) & (s[..., 1] <= 1.0)
    return jnp.where(inside & occluded, 0.0, 1.0)


def _noise(shape, frame_index, mult: int):
    xs_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    ys_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    seed = jnp.asarray(frame_index).astype(jnp.uint32) * jnp.uint32(mult)
    h32 = ((xs_i * jnp.uint32(374761393)
            + ys_i * jnp.uint32(668265263)) ^ seed)
    h32 = (h32 ^ (h32 >> 13)) * jnp.uint32(1274126177)
    return ((h32 >> 16) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
