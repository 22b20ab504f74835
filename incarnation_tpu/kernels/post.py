"""Post-processing: tonemap (+ TAA later in this module's sibling taa.py).

Tonemap pass (ref: shaders/postprocess/tonemap.hlsl + render-jobs/
tonemap.inl): EV100 exposure, ACES filmic fit, sRGB encode into the
display buffer. The NaN-check view mode paints non-finite pixels red
(ref: tonemap.hlsl:46-56).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import shading
from ..scene.textures import linear_to_srgb


def tonemap(hdr, ev100, nan_check: bool = False):
    """(H, W, 3) linear HDR -> (H, W, 3) sRGB in [0, 1]."""
    exposure = shading.exposure_from_ev100(ev100)
    ldr = shading.aces_film(hdr * exposure)
    out = linear_to_srgb(ldr)
    if nan_check:
        bad = ~jnp.isfinite(hdr).all(axis=-1, keepdims=True)
        out = jnp.where(bad, jnp.asarray([1.0, 0.0, 0.0]), out)
    return out


def to_uint8(img):
    return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
