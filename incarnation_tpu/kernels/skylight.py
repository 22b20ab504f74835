"""Sky / image-based lighting pass + environment background.

Port of the reference's SkyLightingPass (ref: shaders/lighting/
sky-lighting.hlsl): diffuse = SH9 cosine-convolved irradiance x5, specular =
GGX-prefiltered envmap by roughness x env-BRDF LUT, both scaled by
SkyBrightness, AO-blended, additive into the HDR target. Background pixels
get the environment map (x SkyBrightness, ref: environment-sky/envmap.hlsl)
or the analytic Preetham sky (x1000, ref: environment-sky/preetham.hlsl:133).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import mathutils as mu
from . import ibl, sky as sky_mod


def sky_lighting(gb, n, v, probe: ibl.EnvironmentProbe, env_brdf,
                 sky_brightness, hbao=None, bent_normals=None,
                 diffuse_ibl: bool = True, specular_ibl: bool = True,
                 lighting_only: bool = False, dither=None, extras=None,
                 analytic_env_brdf: bool = False, uv_dither: bool = False,
                 checker_parity=None):
    """Additive sky radiance for covered pixels (ref: sky-lighting.hlsl).

    dither: frame index enabling stochastic single-mip sampling of the
    prefiltered specular cube (converges to trilinear under TAA; halves the
    cube gathers). uv_dither additionally jitters the bilinear footprint so
    the cube fetch is ONE 16-byte texel row per pixel (a third the gather
    bytes of the quad-packed rows; same stochastic-filtering scheme as
    textures.sample_material_stack).
    checker_parity: optional (frame & 1) enabling the checkerboard
    half-rate probe fetch (kernels/checker.py — the cube gather is
    index-rate bound; half the indices, neighbors fill, TAA integrates).
    Only applied to the single-mip stochastic path (needs TAA anyway).
    extras: gb.extras (transmission, clearcoat, ccRoughness) — transmission
    removes transmitted energy from the diffuse albedo as the reference's
    forward pass does (ref: forward-pass.hlsl:160); the clearcoat IBL lobe
    is the glTF-spec extension the reference loads but never shades
    (ref: material/common.hlsli:90-103). Pass None (the default) for exact
    deferred-reference behavior."""
    base = (jnp.full_like(gb.base_color[..., :3], 0.5) if lighting_only
            else gb.base_color[..., :3])  # ref: sky-lighting.hlsl:57-59
    metallic = gb.mrao[..., 0:1]
    roughness = gb.mrao[..., 1]
    ao = gb.mrao[..., 2:3]
    ao_blend = gb.mrao[..., 3:4]

    radiance = jnp.zeros_like(base)

    if diffuse_ibl:
        sampling_n = bent_normals if bent_normals is not None else n
        albedo = (1.0 - metallic) * base
        if extras is not None:
            albedo = albedo * (1.0 - extras[..., 0:1])
        sh_diffuse = (albedo * mu.INV_PI
                      * ibl.sh_irradiance(sampling_n, probe.sh) * 5.0)
        radiance += sky_brightness * (
            sh_diffuse * (1 - ao_blend) + ao * sh_diffuse * ao_blend)

    def _probe_fetch(r_, lod_, single_mip, jitter_):
        """Prefiltered-cube fetch, checkerboarded when allowed."""
        if checker_parity is None or not single_mip:
            return ibl.sample_cube(probe.prefiltered, r_, lod=lod_,
                                   single_mip=single_mip, jitter=jitter_)
        from . import checker
        cp = checker_parity
        return checker.expand(cp, ibl.sample_cube(
            probe.prefiltered, checker.compact(cp, r_),
            lod=checker.compact(cp, lod_), single_mip=True,
            jitter=None if jitter_ is None else checker.compact(cp, jitter_)))

    if specular_ibl:
        no_v = jnp.maximum(jnp.sum(n * v, -1), 0.01)
        f0 = metallic * base + (1.0 - metallic) * 0.04
        r = mu.normalize(2.0 * jnp.sum(v * n, -1, keepdims=True) * n - v)
        mips = probe.prefiltered.num_levels
        jitter = None
        if dither is not None and uv_dither:
            from .resolve import _frame_noise
            jitter = jnp.stack(
                [_frame_noise(roughness.shape, dither, 3323198485),
                 _frame_noise(roughness.shape, dither, 2654435769)],
                axis=-1)
        if extras is not None and dither is not None:
            # Stochastic lobe selection: the clearcoat IBL lobe would be a
            # SECOND full-screen probe gather (2M-index gathers cost ~10 ms
            # each regardless of table locality — tools/microbench.py), so
            # under TAA each pixel samples ONE lobe per frame: the coat lobe
            # with probability fc (its mix weight), the base lobe otherwise.
            # est = fc * pre(lod_cc) * k_cc  (picked w.p. fc)
            #     + (1-fc) * pre(lod_b) * k_b (picked w.p. 1-fc)
            # is exactly the single-sample estimator of the two-lobe mix —
            # unbiased, zero-variance where cc is 0 or 1, and the TAA
            # accumulation realizes the expectation (same scheme as the
            # stochastic mip/bilinear taps).
            from .shading import f_schlick
            from .resolve import _frame_noise
            cc = extras[..., 1:2]
            ccr = jnp.maximum(extras[..., 2], 0.03)
            fc = f_schlick(no_v[..., None], jnp.full_like(cc, 0.04)) * cc
            xi = _frame_noise(roughness.shape, dither, 2357136044)
            pick_cc = xi[..., None] < fc
            lod_pick = jnp.where(pick_cc[..., 0],
                                 ccr * (mips - 1), roughness * (mips - 1))
            lod_pick = lod_pick + _frame_noise(roughness.shape, dither,
                                               2246822519)
            pre = _probe_fetch(r, lod_pick, True, jitter)
            if analytic_env_brdf:
                ab_b = ibl.env_brdf_approx(no_v, 1.0 - roughness)
                ab_c = ibl.env_brdf_approx(no_v, 1.0 - ccr)
            else:
                ab_b = ibl.sample_env_brdf(env_brdf, no_v, roughness)
                ab_c = ibl.sample_env_brdf(env_brdf, no_v, ccr)
            k_b = f0 * ab_b[..., 0:1] + ab_b[..., 1:2]
            k_c = 0.04 * ab_c[..., 0:1] + ab_c[..., 1:2]
            spec = pre * jnp.where(pick_cc, k_c, k_b)
            radiance = radiance * (1.0 - fc)   # attenuate diffuse under coat
        else:
            lod = roughness * (mips - 1)
            if dither is not None:
                from .resolve import _frame_noise
                lod = lod + _frame_noise(roughness.shape, dither, 2246822519)
            pre = _probe_fetch(r, lod, dither is not None, jitter)
            if analytic_env_brdf:
                # evaluated at 1-roughness: the reference samples its LUT
                # (whose y axis stores 1-roughness) at v=roughness, i.e.
                # fetches the INVERTED row (sky-lighting.hlsl:124 vs
                # brdf-integration.hlsl:38) — the analytic path mimics that
                # quirk for image parity
                ab = ibl.env_brdf_approx(no_v, 1.0 - roughness)
            else:
                ab = ibl.sample_env_brdf(env_brdf, no_v, roughness)
            spec = pre * (f0 * ab[..., 0:1] + ab[..., 1:2])
            if extras is not None:
                from .shading import f_schlick
                cc = extras[..., 1:2]
                ccr = jnp.maximum(extras[..., 2], 0.03)
                fc = f_schlick(no_v[..., None], jnp.full_like(cc, 0.04)) * cc
                lod_cc = ccr * (mips - 1)
                pre_cc = ibl.sample_cube(probe.prefiltered, r, lod=lod_cc,
                                         single_mip=False, jitter=None)
                if analytic_env_brdf:
                    ab_cc = ibl.env_brdf_approx(no_v, 1.0 - ccr)
                else:
                    ab_cc = ibl.sample_env_brdf(env_brdf, no_v, ccr)
                spec_cc = pre_cc * (0.04 * ab_cc[..., 0:1] + ab_cc[..., 1:2])
                spec = spec * (1.0 - fc) + spec_cc * fc
                radiance = radiance * (1.0 - fc)  # attenuate diffuse w/ coat
        radiance += sky_brightness * (
            spec * (1 - ao_blend) + ao * spec * ao_blend)

    if hbao is not None:
        radiance = radiance * hbao[..., None]
    return jnp.where(gb.mask[..., None], radiance, 0.0)


def environment_background(mask, eye, inv_view_proj, width, height,
                           probe=None, sun_dir=None, turbidity: float = 2.0,
                           sky_brightness=25000.0,
                           dynamic_sky: bool = True):
    """Background radiance for uncovered pixels (rendered at far depth with
    GREATER_EQUAL in the reference — here a mask select).

    dynamic_sky: True -> 1000 x Preetham (ref: preetham.hlsl:133);
    False -> sky_brightness x envmap cube sample (ref: envmap.hlsl:50-53).
    """
    from .resolve import world_from_depth
    wp = world_from_depth(jnp.full((height, width), 1e-4, jnp.float32),
                          inv_view_proj, width, height)
    d = mu.normalize(wp - eye)
    if dynamic_sky:
        rad = 1000.0 * sky_mod.sky_radiance(sun_dir, d, turbidity)
    else:
        rad = sky_brightness * ibl.sample_cube(probe.envmap, d)
    return jnp.where(mask[..., None], 0.0, rad)
