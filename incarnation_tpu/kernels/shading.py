"""PBR BRDF + analytic light evaluation over pixel arrays.

Ports the reference's BRDF library (ref: shaders/lighting/pbr.hlsli) and the
per-light radiance evaluation GetDirectRadiance
(ref: shaders/lighting/common.hlsli:8-145) including its non-physical scale
factors: directional x100, punctual x10000 (ref: lighting/common.hlsli:18,42).
All functions are elementwise jnp over (..., ) pixel arrays — XLA fuses them
into the lighting pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import mathutils as mu
from ..scene import lights as lights_mod

_PI = mu.PI


# -- BRDF pieces (ref: shaders/lighting/pbr.hlsli) ---------------------------

def ggx_distribution(no_h, roughness):
    """GGX NDF (ref: shaders/common/bxdf-sampling.hlsli:15-26)."""
    a = roughness * roughness
    a2 = a * a
    no_h = jnp.maximum(no_h, 0.0)
    denom = no_h * no_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(_PI * denom * denom, 1e-4)


def f_schlick(u, f0):
    f = (1.0 - u) ** 5
    return f + f0 * (1.0 - f)


def g_smith_ggx_correlated(no_v, no_l, roughness):
    a2 = roughness * roughness
    ggx_v = no_l * jnp.sqrt(no_v * no_v * (1.0 - a2) + a2)
    ggx_l = no_v * jnp.sqrt(no_l * no_l * (1.0 - a2) + a2)
    return 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-5)


def g_schlick_ggx(u, k):
    return u / (u * (1.0 - k) + k)


def g_smith_direct(no_v, no_l, roughness):
    a2 = roughness * roughness
    k = (a2 + 1.0) ** 2 / 8.0
    return g_schlick_ggx(no_v, k) * g_schlick_ggx(no_l, k)


def g_smith_ibl(no_v, no_l, roughness):
    a2 = roughness * roughness
    k = 0.5 * a2 * a2
    return g_schlick_ggx(no_v, k) * g_schlick_ggx(no_l, k)


def exposure_from_ev100(ev100):
    """1 / (2^EV100 * 1.2) (ref: pbr.hlsli:78-81)."""
    return 1.0 / (2.0 ** ev100 * 1.2)


def aces_film(x):
    """ACES filmic fit (ref: pbr.hlsli:84-92, Narkowicz)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def reinhard(x):
    return x / (x + 1.0)


# -- Surface response --------------------------------------------------------

def brdf_response(base_color, metallic, roughness, n, v, l, radiance_in,
                  visibility=1.0, transmission=None, clearcoat=None,
                  cc_roughness=None):
    """Cook-Torrance specular + Lambert diffuse exactly as the reference's
    deferred direct lighting (ref: lighting/common.hlsli:118-139).

    transmission: KHR_materials_transmission factor — removes transmitted
    energy from the diffuse albedo exactly as the reference's forward pass
    does (ref: forward-pass.hlsl:160 albedo = (1-metallic)(1-transmission)
    * basecolor).
    clearcoat/cc_roughness: KHR_materials_clearcoat — the reference LOADS
    these (material/common.hlsli:90-103) but its shaders never evaluate
    them; this adds the glTF-spec second GGX lobe at IOR 1.5 (F0 = 0.04)
    with base attenuation (1 - cc*Fc) — a documented spec-correct
    extension, off unless the scene carries clearcoat factors.

    All args broadcast over pixels; returns outgoing radiance (..., 3).
    """
    no_l = jnp.clip(jnp.sum(n * l, axis=-1, keepdims=True), 0.0, 1.0)
    no_v = jnp.clip(jnp.sum(n * v, axis=-1, keepdims=True), 0.0, 1.0)
    h = mu.normalize(l + v)
    no_h = jnp.clip(jnp.sum(n * h, axis=-1, keepdims=True), 0.0, 1.0)
    vo_h = jnp.clip(jnp.sum(v * h, axis=-1, keepdims=True), 0.0, 1.0)

    metallic = metallic[..., None] if metallic.ndim < n.ndim else metallic
    roughness = roughness[..., None] if roughness.ndim < n.ndim else roughness

    f0 = metallic * base_color + (1.0 - metallic) * 0.04
    albedo = (1.0 - metallic) * base_color
    if transmission is not None:
        t = (transmission[..., None] if transmission.ndim < n.ndim
             else transmission)
        albedo = albedo * (1.0 - t)

    d = ggx_distribution(no_h, roughness)
    f = f_schlick(vo_h, f0)
    g = g_smith_ggx_correlated(no_v, no_l, roughness)

    fr = (d * f * g) / jnp.maximum(4.0 * no_v * no_l, 1e-3)
    fd = albedo * mu.INV_PI
    out = fr + (1.0 - f) * fd
    if clearcoat is not None:
        cc = clearcoat[..., None] if clearcoat.ndim < n.ndim else clearcoat
        ccr = jnp.maximum(
            cc_roughness[..., None] if cc_roughness.ndim < n.ndim
            else cc_roughness, 0.03)
        fc = f_schlick(vo_h, jnp.full_like(vo_h, 0.04)) * cc
        d_cc = ggx_distribution(no_h, ccr)
        g_cc = g_smith_ggx_correlated(no_v, no_l, ccr)
        fr_cc = (d_cc * fc * g_cc) / jnp.maximum(4.0 * no_v * no_l, 1e-3)
        out = out * (1.0 - fc) + fr_cc
    out = out * radiance_in * no_l * visibility
    return jnp.where(no_l > 0.0, out, 0.0)


# -- Lights ------------------------------------------------------------------

def directional_light_radiance(color, intensity):
    """radianceIn = 100 * intensity * color (ref: lighting/common.hlsli:18)."""
    return 100.0 * intensity * color


def punctual_light(light_type, transform, color, intensity, rng, spot_angles,
                   world_pos):
    """Point/spot incoming radiance + direction toward the light, per the
    glTF punctual spec (ref: lighting/common.hlsli:20-82). Inputs broadcast
    over pixels.

    INTENTIONAL DIVERGENCE from the reference: its GetDirectRadiance
    re-declares radialAttenuation inside the spot+range branch
    (ref: lighting/common.hlsli:73 shadows the outer variable), which
    leaves spot lights with range > 0 black. This implements the
    spec-correct windowed attenuation instead — image diffs against
    reference captures of such spots are expected.

    Returns (l (...,3), radiance_in (...,3)).
    """
    light_pos = transform[..., 3, :3]
    lvec = light_pos - world_pos
    dist_sq = jnp.sum(lvec * lvec, axis=-1, keepdims=True)
    dist = jnp.sqrt(dist_sq)
    l = lvec / jnp.maximum(dist, 1e-8)

    bounded = jnp.maximum(
        jnp.minimum(1.0 - (dist / jnp.maximum(rng[..., None], 1e-8)) ** 4,
                    1.0), 0.0) / jnp.maximum(dist_sq, 1e-4)
    unbounded = 1.0 / jnp.maximum(dist_sq, 1e-4)
    radial = jnp.where(rng[..., None] > 0.0, bounded, unbounded)

    # Spot angular attenuation (ref: lighting/common.hlsli:55-66)
    spot_dir = lights_mod.light_direction_toward(transform)
    cd = jnp.sum(spot_dir * l, axis=-1, keepdims=True)
    cos_outer = jnp.cos(spot_angles[..., 1:2])
    cos_inner = jnp.cos(spot_angles[..., 0:1])
    scale = 1.0 / jnp.maximum(cos_inner - cos_outer, 1e-3)
    ang = jnp.clip(cd * scale - cos_outer * scale, 0.0, 1.0)
    ang = ang * ang
    angular = jnp.where(light_type[..., None] == lights_mod.LIGHT_SPOT,
                        jnp.where(cd > cos_outer, ang, 0.0), 1.0)

    radiance = 10000.0 * intensity[..., None] * color * radial * angular
    return l, radiance
