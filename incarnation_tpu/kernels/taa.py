"""Temporal anti-aliasing resolve.

Port of the reference's TAA (ref: shaders/postprocess/taa-resolve.hlsl +
render-jobs/taa-resolve.inl): depth-based reprojection through
invViewProj x prevViewProj, bilinear history fetch, 3x3 neighborhood clamp,
luminance-weighted 0.1/0.9 blend; the camera is jittered by Halton(2,3)
sub-pixel offsets (ref: src/renderer.cpp:126-132, 1625-1631). Pure jnp —
elementwise + rolls + one gather for the bilinear history fetch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resolve import world_from_depth


def _bilinear_image(img, uv, width: int, height: int, jitter=None):
    """Bilinear sample of (H, W, C) at uv in [0,1]^2 (clamp address).

    jitter: optional (..., 2) uniforms — stochastic-bilinear single-texel
    fetch: ONE row gather instead of four, unbiased in expectation; the TAA
    accumulation realizes the filtered result. (Quad-packing the history was
    tried and is SLOWER here: the packed table is ~100 MB at 1080p and the
    gather becomes locality-bound.)"""
    fx = uv[..., 0] * width - 0.5
    fy = uv[..., 1] * height - 0.5
    flat = img.reshape(-1, img.shape[-1])
    if jitter is not None:
        x = jnp.clip(jnp.floor(fx + jitter[..., 0]).astype(jnp.int32),
                     0, width - 1)
        y = jnp.clip(jnp.floor(fy + jitter[..., 1]).astype(jnp.int32),
                     0, height - 1)
        return flat[y * width + x]
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0c = jnp.clip(x0, 0, width - 1)
    x1c = jnp.clip(x0 + 1, 0, width - 1)
    y0c = jnp.clip(y0, 0, height - 1)
    y1c = jnp.clip(y0 + 1, 0, height - 1)
    f = lambda y, x: flat[y * width + x]
    top = f(y0c, x0c) * (1 - tx) + f(y0c, x1c) * tx
    bot = f(y1c, x0c) * (1 - tx) + f(y1c, x1c) * tx
    return top * (1 - ty) + bot * ty


def _neighborhood_minmax(img):
    """3x3 min/max via shifted rolls (edge-clamped by padding)."""
    padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    mins = img
    maxs = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            s = padded[1 + dy:padded.shape[0] - 1 + dy,
                       1 + dx:padded.shape[1] - 1 + dx]
            mins = jnp.minimum(mins, s)
            maxs = jnp.maximum(maxs, s)
    return mins, maxs


def _luminance_weight(c):
    lum = (c[..., 0] * 0.299 + c[..., 1] * 0.587 + c[..., 2] * 0.114)
    return (1.0 / (1.0 + lum))[..., None]


def taa_resolve(current_hdr, history, depth, inv_view_proj, prev_view_proj,
                history_valid, width: int, height: int, dither=None):
    """-> new accumulation buffer (H, W, 3).

    history_valid: () bool/int — frame 0 passes current through
    (ref: taa-resolve.hlsl:101-104).
    dither: frame index enabling the stochastic single-texel history fetch
    (noise is bounded by the 3x3 neighborhood clamp and averaged out by the
    accumulation itself).
    """
    wp = world_from_depth(depth, inv_view_proj, width, height)
    prev_clip = jnp.concatenate([wp, jnp.ones_like(wp[..., :1])],
                                -1) @ prev_view_proj
    prev_ndc = prev_clip[..., :3] / jnp.where(
        jnp.abs(prev_clip[..., 3:]) > 1e-20, prev_clip[..., 3:], 1.0)
    prev_uv = jnp.stack([0.5 * prev_ndc[..., 0] + 0.5,
                         -0.5 * prev_ndc[..., 1] + 0.5], axis=-1)

    jitter = None
    if dither is not None:
        from .resolve import _frame_noise
        jitter = jnp.stack(
            [_frame_noise(depth.shape, dither, 2911329625),
             _frame_noise(depth.shape, dither, 3042594569)], axis=-1)
    prev_color = _bilinear_image(history, prev_uv, width, height,
                                 jitter=jitter)
    mins, maxs = _neighborhood_minmax(current_hdr)
    clamped = jnp.clip(prev_color, mins, maxs)

    w_cur = 0.1 * _luminance_weight(current_hdr)
    w_prev = 0.9 * _luminance_weight(clamped)
    blended = (current_hdr * w_cur + clamped * w_prev) / (w_cur + w_prev)

    return jnp.where(jnp.asarray(history_valid), blended, current_hdr)
