"""Preetham analytic sky.

Port of the reference's dynamic sky (ref: shaders/environment-sky/
preetham.hlsli + renderer.cpp:294-359 GenerateDynamicSkyTexture): Perez
distribution coefficients computed from turbidity on the host, per-direction
Yxy radiance evaluated vectorized, converted through XYZ to linear RGB.

Scale conventions copied from the reference:
- the dynamic-sky lat-long texture (probe source) stores 0.04 * radiance
  (ref: dynamic-sky-spherical-projection.hlsl:47),
- the raster background pass evaluates 1000 * radiance directly
  (ref: preetham.hlsl:133); with the default SkyBrightness 25000 both paths
  agree (25000 * 0.04 == 1000).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core import mathutils as mu


class PerezCoefficients(NamedTuple):
    a: np.ndarray  # (3,) for Yxy channels
    b: np.ndarray
    c: np.ndarray
    d: np.ndarray
    e: np.ndarray


def perez_coefficients(turbidity: float) -> PerezCoefficients:
    """(ref: renderer.cpp:329-334)."""
    t = float(turbidity)
    return PerezCoefficients(
        a=np.array([0.1787 * t - 1.4630, -0.0193 * t - 0.2592,
                    -0.0167 * t - 0.2608], np.float32),
        b=np.array([-0.3554 * t + 0.4275, -0.0665 * t + 0.0008,
                    -0.0950 * t + 0.0092], np.float32),
        c=np.array([-0.0227 * t + 5.3251, -0.0004 * t + 0.2125,
                    -0.0079 * t + 0.2102], np.float32),
        d=np.array([0.1206 * t - 2.5771, -0.0641 * t - 0.8989,
                    -0.0441 * t - 1.6537], np.float32),
        e=np.array([-0.0670 * t + 0.3703, -0.0033 * t + 0.0452,
                    -0.0109 * t + 0.0529], np.float32),
    )


def _perez(theta, gamma, pc: PerezCoefficients):
    """(ref: preetham.hlsli:36-50). theta/gamma: (...,) -> (..., 3)."""
    t = theta[..., None]
    g = gamma[..., None]
    # cos(theta) clamped positive: theta is <= pi/2 by construction (the
    # reference saturates the dot product) but f32 cos(acos(0)) can land an
    # epsilon negative, which explodes exp(B / cos).
    cos_t = jnp.maximum(jnp.cos(t), 1e-5)
    return ((1.0 + pc.a * jnp.exp(pc.b / cos_t))
            * (1.0 + pc.c * jnp.exp(pc.d * g)
               + pc.e * jnp.cos(g) * jnp.cos(g)))


def _zenith_yxy(t: float, theta_s):
    """(ref: preetham.hlsli:52-75)."""
    chi = (4.0 / 9.0 - t / 120.0) * (mu.PI - 2.0 * theta_s)
    y_lum = (4.0453 * t - 4.9710) * jnp.tan(chi) - 0.2155 * t + 2.4192
    th, th2, th3 = theta_s, theta_s ** 2, theta_s ** 3
    x_z = ((0.00165 * th3 - 0.00375 * th2 + 0.00209 * th) * t * t
           + (-0.02903 * th3 + 0.06377 * th2 - 0.03202 * th + 0.00394) * t
           + (0.11693 * th3 - 0.21196 * th2 + 0.06052 * th + 0.25886))
    y_z = ((0.00275 * th3 - 0.00610 * th2 + 0.00317 * th) * t * t
           + (-0.04214 * th3 + 0.08970 * th2 - 0.04153 * th + 0.00516) * t
           + (0.15346 * th3 - 0.26756 * th2 + 0.06670 * th + 0.26688))
    return jnp.stack([y_lum, x_z, y_z], axis=-1)


_XYZ2RGB = np.array([
    [3.2404542, -0.9692660, 0.0556434],
    [-1.5371385, 1.8760108, -0.2040259],
    [-0.4985314, 0.0415560, 1.0572252]], np.float32)


def _yxy_to_rgb(yxy):
    """(ref: preetham.hlsli:6-33)."""
    y_lum = yxy[..., 0]
    x = yxy[..., 1]
    y = jnp.maximum(yxy[..., 2], 1e-6)
    big_x = x * (y_lum / y)
    big_z = (1.0 - x - y) * (y_lum / y)
    xyz = jnp.stack([big_x, y_lum, big_z], axis=-1)
    return xyz @ _XYZ2RGB


def sky_radiance(sun_dir, directions, turbidity: float):
    """Preetham radiance for unit `directions` (..., 3), unscaled
    (ref: preetham.hlsli:77-91 CalculateSkyRadianceRGB)."""
    pc = perez_coefficients(turbidity)
    up = jnp.asarray([0.0, 1.0, 0.0])
    theta_s = jnp.arccos(jnp.clip(jnp.sum(sun_dir * up, -1), 0.0, 1.0))
    theta_e = jnp.arccos(jnp.clip(directions[..., 1], 0.0, 1.0))
    gamma_e = jnp.arccos(jnp.clip(
        jnp.sum(directions * sun_dir, axis=-1), 0.0, 1.0))
    yxy_zenith = _zenith_yxy(turbidity, theta_s)
    f = _perez(theta_e, gamma_e, pc)
    f0 = _perez(jnp.zeros_like(theta_s), theta_s, pc)
    return _yxy_to_rgb(yxy_zenith * (f / f0))


def sky_latlong(sun_dir, turbidity: float, width: int, height: int,
                scale: float = 0.04):
    """Dynamic-sky lat-long texture = scale * radiance
    (ref: dynamic-sky-spherical-projection.hlsl)."""
    us = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    vs = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uv = jnp.stack(jnp.meshgrid(us, vs, indexing="xy"), axis=-1)
    dirs = mu.latlong_uv_to_direction(uv)
    return scale * sky_radiance(sun_dir, dirs, turbidity)
