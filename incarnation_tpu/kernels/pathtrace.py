"""Progressive wavefront path tracer.

Port of the reference's DXR path tracer (ref: shaders/raytracing/
pathtracing.hlsl + raytracing/common.hlsli + render-jobs/path-tracing.inl)
restructured wavefront-style for TPU (SURVEY.md §2.4): instead of recursive
TraceRay, one ray array per bounce is traced against the LBVH, shaded, and
respawned — the recursion becomes a python loop of at most MAX_BOUNCES
(ref: pathtracing.hlsl MAX_RECURSION_DEPTH) over fully vectorized batches.

Faithfully reproduced reference behavior:
- thin-lens camera with aperture disk sampling + focal plane
  (ref: raytracing/common.hlsli:25-53 GenerateCameraRay)
- correlated multi-jittered sample sequences per (pixel, sample-set)
  (ref: common.hlsli:8-22)
- emissive x20000 with scattering damped by emissive
  (ref: pathtracing.hlsl:210-212)
- NEE over all lights with shadow rays (ref: pathtracing.hlsl:231-243)
- cosine-sampled sky with the reference's world-axis hemisphere quirk and
  CosineHemispherePdf(L.z) division (ref: pathtracing.hlsl:246-251,
  lighting/common.hlsli GetSkyRadiance)
- 50/50 cosine / GGX-half-vector bounce with averaged pdf
  (ref: common.hlsli:56-131 GenerateIndirectRadianceRay)
- miss = skyBrightness x envmap or 1000 x Preetham
  (ref: pathtracing.hlsl:304-319)
- progressive accumulation history = ((n-1) h + cur) / n
  (ref: pathtrace-integrate.hlsl:16-31)
- textures sampled at mip 0 (ref: material/common.hlsli TEX_SAMPLE in
  PATH_TRACING mode)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu
from ..scene import lights as lights_mod
from ..scene import textures as tex_mod
from . import bvh as bvh_mod
from . import ibl, sampling, shading, sky as sky_mod

RAY_OFFSET = 1e-3   # ref: raytracing/common.hlsli k_rayOffset
MAX_BOUNCES = 4     # ref: pathtracing.hlsl:29 MAX_RECURSION_DEPTH
ALPHA_PEELS = 2     # masked-geometry any-hit continuations per trace
#                     (ref: pathtracing.hlsl ahsMain IgnoreHit)


def _alpha_at_hit(scene, tri, u, v, noise):
    """Opacity test at BVH hits for MASK/BLEND prims: True = accept
    (ref: pathtracing.hlsl:270-302 anyhit alpha test). BLEND prims use a
    stochastic threshold, which the progressive accumulation resolves to
    true alpha blending."""
    safe = jnp.maximum(tri, 0)
    tv = scene.tri_vtx[safe]
    uv = (scene.uvs[tv[..., 0]]
          + u[..., None] * (scene.uvs[tv[..., 1]] - scene.uvs[tv[..., 0]])
          + v[..., None] * (scene.uvs[tv[..., 2]] - scene.uvs[tv[..., 0]]))
    prim = jnp.maximum(scene.tri_prim[safe], 0)
    mode = scene.prim_alpha_mode[prim]
    mat_id = scene.prim_material[prim]
    a_tex = tex_mod.sample_stack_alpha(scene.mat_stack, mat_id, uv)
    fac = scene.mat_params[jnp.maximum(mat_id, 0)]
    alpha = fac[..., 6] * a_tex
    thresh = jnp.where(mode >= 2, jnp.maximum(noise, 1e-3), fac[..., 11])
    return (mode == 0) | (alpha >= thresh)


def _peel_noise(seed, peel, tri, noise_u):
    """BLEND stochastic-threshold noise for alpha peel `peel`. When the
    caller supplies a CMJ base value per ray (noise_u, sharing the pixel
    stratification of the accumulation sequence) the peels decorrelate via a
    golden-ratio Cranley-Patterson rotation; otherwise a hash of
    (seed, peel, tri) stands in (the raster sun-shadow path, where there is
    no per-pixel sample sequence)."""
    if noise_u is not None:
        x = noise_u + np.float32(peel) * np.float32(0.6180339887498949)
        return x - jnp.floor(x)
    h = ((jnp.asarray(seed, jnp.uint32) + jnp.uint32(peel * 747796405))
         * jnp.uint32(2891336453)
         ^ (tri.astype(jnp.uint32) * jnp.uint32(277803737)))
    return ((h >> 8) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0


def _trace_alpha(scene, bvh, o, d, tmin, tmax, seed, any_hit=False,
                 noise_u=None, profile="incoherent", peels=ALPHA_PEELS):
    """bvh.trace with alpha-masked continuation: a hit on a MASK/BLEND prim
    that fails the opacity test is skipped by re-tracing from just past it
    (up to `peels` times). Zero cost for scenes without masked prims."""
    res = bvh_mod.trace(bvh, o, d, tmin=tmin, tmax=tmax, any_hit=any_hit,
                        profile=profile)
    if not scene.meta.has_masked:
        return res
    r = o.shape[0]
    peel_cap = max(r >> 2, 8)
    keys = sorted(res.keys())
    for peel in range(peels):
        tri = res["tri"]
        hit = tri >= 0
        noise = _peel_noise(seed, peel, tri, noise_u)
        accept = _alpha_at_hit(scene, tri, res["u"], res["v"], noise)
        transparent = hit & ~accept
        # continue past the transparent hit — COMPACTED to r/4 before the
        # re-trace so the peel doesn't pay a full-width traversal schedule
        # for the (few) see-through rays; beyond-capacity transparents
        # (needs >25% of rays on a cutout texel simultaneously) keep the
        # opaque hit — same class of bound as ALPHA_PEELS itself.
        # The whole re-trace sits under lax.cond: a wavefront with ZERO
        # transparent hits (most shadow batches) skips the peel traversal
        # entirely instead of tracing parked rays (NEXT.md r4 item 1c).
        t_cont = jnp.where(transparent, res["t"] + RAY_OFFSET, 0.0)
        o2 = o + t_cont[..., None] * d

        def do_peel(args, transparent=transparent, res=res):
            o2, d = args
            orig, ok, packed, _ = bvh_mod._compact(
                transparent, peel_cap, [o2, d])
            p_o, p_d = packed
            p_o = jnp.where(ok[..., None], p_o, 1e29)  # park empty slots
            res2 = bvh_mod.trace(bvh, p_o, p_d, tmin=0.0, tmax=tmax,
                                 any_hit=any_hit, profile="anyhit")
            scattered = {
                k: res[k].at[orig].set(res2[k], mode="drop")
                if res[k].ndim else res[k] for k in res}
            return tuple(
                jnp.where(transparent, scattered[k], res[k])
                if res[k].ndim else res[k] for k in keys)

        def skip_peel(args, res=res):
            return tuple(res[k] for k in keys)

        merged = jax.lax.cond(transparent.any(), do_peel, skip_peel,
                              (o2, d))
        res = dict(zip(keys, merged))
    # rays whose last peel still failed count as misses through the cutout
    tri = res["tri"]
    hit = tri >= 0
    noise = _peel_noise(seed, peels, tri, noise_u)
    accept = _alpha_at_hit(scene, tri, res["u"], res["v"], noise)
    bad = hit & ~accept
    res["tri"] = jnp.where(bad, -1, res["tri"])
    res["t"] = jnp.where(bad, jnp.inf, res["t"])
    return res


def _hit_attributes(scene, world_n_v, world_t_v, tri, u, v):
    """Interpolated uv / world TBN at ray hits (ref: pathtracing.hlsl
    chsMain vertex fetch + HitAttribute lerp)."""
    safe = jnp.maximum(tri, 0)
    tv = scene.tri_vtx[safe]
    i0, i1, i2 = tv[..., 0], tv[..., 1], tv[..., 2]
    w_ = (1.0 - u - v)[..., None]
    uu = u[..., None]
    vv = v[..., None]

    def lerp(a):
        return a[i0] + uu * (a[i1] - a[i0]) + vv * (a[i2] - a[i0])

    n = mu.normalize(lerp(world_n_v))
    t = mu.normalize(lerp(world_t_v))
    sign = scene.tangents[i0][..., 3:4]
    b = jnp.cross(n, t) * sign
    uv = scene.uvs[i0] + uu * (scene.uvs[i1] - scene.uvs[i0]) \
        + vv * (scene.uvs[i2] - scene.uvs[i0])
    mat_id = scene.prim_material[jnp.maximum(scene.tri_prim[safe], 0)]
    del w_
    return uv, n, t, b, mat_id


def _eval_material(scene, mat_id, uv, jitter=None):
    """Material at hit points, mip 0 (ref: EvaluateMaterialProperties via
    TEX_SAMPLE SampleLevel 0). jitter: optional (..., 2) CMJ uniforms —
    stochastic-bilinear single-texel fetch (1 gather instead of the 4-tap
    bilinear; the progressive accumulation integrates the footprint)."""
    chans = tex_mod.sample_material_stack(scene.mat_stack, mat_id, uv,
                                          lod=None, jitter=jitter)
    tx = tex_mod.decode_stack_channels(chans)
    fac = scene.mat_params[jnp.maximum(mat_id, 0)]
    return dict(
        base_color=fac[..., 3:6] * tx["base_rgb"],
        emissive=fac[..., 0:3] * tx["emissive_rgb"],
        metallic=fac[..., 7] * tx["metallic"],
        roughness=fac[..., 8] * tx["roughness"],
        normal_xy=tx["normal_xy"] * fac[..., 10:11],
    )


def _tangent_mul(v3, t, b, n):
    """mul(v, float3x3(T, B, N)) row-vector semantics."""
    return v3[..., 0:1] * t + v3[..., 1:2] * b + v3[..., 2:3] * n


def _direct_light_sample(light_i, lights, wp):
    """Visibility-independent part of GetDirectRadiance for one light:
    (l, radiance_in) at wp (ref: lighting/common.hlsli:8-145). The shadow
    ray itself is traced BATCHED with the bounce's other shadow rays —
    small-wavefront traversal gathers have a per-step latency floor, so
    one K*R-ray trace beats K R-ray traces."""
    lt = lights.type[light_i]
    xform = lights.transform[light_i]
    inten = lights.intensity[light_i]
    color = lights.color[light_i]
    is_dir = lt == lights_mod.LIGHT_DIRECTIONAL
    if jnp.ndim(is_dir):            # light_i is a per-ray index array
        is_dir = is_dir[..., None]
        inten_d = inten[..., None]
    else:
        inten_d = inten
    l_dir = jnp.broadcast_to(lights_mod.light_direction_toward(xform),
                             wp.shape)
    l_pn, rad_pn = shading.punctual_light(
        lt, xform, color, inten,
        lights.range[light_i], lights.spot_angles[light_i], wp)
    rad_dir = shading.directional_light_radiance(color, inten_d)
    l = jnp.where(is_dir, l_dir, l_pn)
    radiance_in = jnp.where(is_dir, jnp.broadcast_to(rad_dir, wp.shape),
                            rad_pn)
    return l, radiance_in


def _direct_radiance_apply(l, radiance_in, vis, base, metallic, roughness,
                           n, v):
    """BRDF response once the batched shadow ray resolved `vis`."""
    return shading.brdf_response(base, metallic, roughness, n, v, l,
                                 radiance_in,
                                 visibility=vis[..., None].astype(jnp.float32))


def _sky_sample_term(probe, sky_brightness, u2, base, metallic, roughness,
                     n, v, sky_rot3=None):
    """GetSkyRadiance with the reference's cosine-sample quirk
    (ref: pathtracing.hlsl:246-251, lighting/common.hlsli:147-202),
    SPLIT from its shadow ray (traced batched): returns
    (sample_dir, term) with term missing only the visibility factor.

    sky_rot3: bvh-space -> world rotation (scene rotation): the sky stays
    fixed in world space while geometry rotates, so the hemisphere sample
    is drawn in world axes (the reference's quirk), fetched from the
    envmap in world space, and traced in bvh space."""
    sample_w = sampling.cosine_sample_hemisphere(u2)    # world axes as-is
    radiance_in = sky_brightness * ibl.sample_cube(probe.envmap, sample_w)
    sample_dir = sample_w if sky_rot3 is None else sample_w @ sky_rot3.T
    no_l = jnp.clip(jnp.sum(n * sample_dir, -1, keepdims=True), 0.0, 1.0)
    f0 = metallic[..., None] * base + (1 - metallic[..., None]) * 0.04
    albedo = (1 - metallic[..., None]) * base
    h = mu.normalize(sample_dir + v)
    no_v = jnp.sum(n * v, -1, keepdims=True)
    no_h = jnp.maximum(jnp.sum(n * h, -1, keepdims=True), 1e-4)
    vo_h = jnp.maximum(jnp.sum(v * h, -1, keepdims=True), 1e-4)
    d = shading.ggx_distribution(no_h, roughness[..., None])
    f = shading.f_schlick(vo_h, f0)
    g = shading.g_smith_direct(no_v, no_l, roughness[..., None])
    fr = (d * f * g) / jnp.maximum(4.0 * no_v * no_l, 1e-3)
    fd = albedo * mu.INV_PI
    out = (fr + (1.0 - f) * fd) * radiance_in * no_l
    out = jnp.where(no_l > 0.0, out, 0.0)
    pdf = sampling.cosine_hemisphere_pdf(sample_w[..., 2:3])
    return sample_dir, out / jnp.where(jnp.abs(pdf) > 1e-8, pdf, 1.0)


def _indirect_ray(u2, n, t, b, v, base, metallic, roughness):
    """50/50 cosine / GGX bounce (ref: common.hlsli:56-131). Returns
    (l, attenuation)."""
    ux, uy = u2[..., 0], u2[..., 1]
    use_cosine = ux < 0.5
    u_cos = jnp.stack([2.0 * ux, uy], -1)
    u_ggx = jnp.stack([2.0 * (ux - 0.5), uy], -1)

    l_cos = _tangent_mul(sampling.cosine_sample_hemisphere(u_cos), t, b, n)
    h_ggx = _tangent_mul(ibl.sample_ggx(u_ggx, roughness), t, b, n)
    l_ggx = mu.normalize(
        2.0 * jnp.sum(v * h_ggx, -1, keepdims=True) * h_ggx - v)
    l = mu.normalize(jnp.where(use_cosine[..., None], l_cos, l_ggx))
    h = jnp.where(use_cosine[..., None], mu.normalize(l + v), h_ggx)

    no_l = jnp.maximum(jnp.sum(n * l, -1), 1e-3)
    no_v = jnp.maximum(jnp.sum(n * v, -1), 1e-3)
    no_h = jnp.maximum(jnp.sum(n * h, -1), 1e-3)
    vo_h = jnp.maximum(jnp.sum(v * h, -1), 1e-3)

    ggx_pdf = (shading.ggx_distribution(no_h, roughness) * no_h
               / (4.0 * vo_h))
    pdf = 0.5 * sampling.cosine_hemisphere_pdf(no_l) + 0.5 * ggx_pdf

    f0 = metallic[..., None] * base + (1 - metallic[..., None]) * 0.04
    albedo = (1 - metallic[..., None]) * base
    d = shading.ggx_distribution(no_h, roughness)[..., None]
    f = shading.f_schlick(vo_h[..., None], f0)
    g = shading.g_smith_direct(no_v, no_l, roughness)[..., None]
    fr = (d * f * g) / jnp.maximum(4.0 * no_v * no_l, 1e-3)[..., None]
    fd = albedo * mu.INV_PI
    brdf = fr + (1.0 - f) * fd
    atten = brdf * no_l[..., None] / jnp.maximum(pdf, 1e-8)[..., None]
    return l, atten


def trace_sample(scene, bvh, world_n_v, world_t_v, fc, probe,
                 sample_index, width: int, height: int,
                 sqrt_sample_count: int = 16, dynamic_sky: bool = True,
                 turbidity: float = 2.0, viewmode: int = 0,
                 sky_rot3=None, sun_dir_world=None, return_rays=False,
                 pixel_base=0, full_height: int = None):
    """Progressive sample(s) for every pixel -> (H, W, 3) radiance.

    pixel_base/full_height: band-sharded tracing (dist/sharding.py
    pathtrace_band_sharded) — this call covers `height` rows of a
    `full_height`-row frame starting at linear pixel index `pixel_base`
    (may be traced, e.g. axis_index * band_pixels). Pixel ids, CMJ
    patterns, and camera NDC all use FULL-frame coordinates, so each
    pixel's sample is BIT-identical to the single-device trace.

    sample_index: scalar index, or a (S,) vector — S samples are traced
    as ONE S*H*W-ray wavefront (per-sample results bit-identical to S
    scalar calls: the CMJ patterns depend only on (pixel, set), the index
    rides per-ray). Traversal-gather cost per index FALLS with wavefront
    width (tools/gather_width.py: the per-step latency amortizes), so
    batching samples is the cheap way to buy throughput at small frames.
    Returns (S, H, W, 3) for vector input.

    return_rays=True: also return the COUNTED number of rays traced
    (alive rays entering each closest/shadow trace — dead/parked rays and
    alpha re-peels excluded, a conservative count for the Mray/s metric).

    viewmode 2/3/4/5 return roughness/metallic/basecolor/emissive at the
    primary hit (ref: pathtracing.hlsl VIEWMODE early returns).

    Scene rotation: the caller (renderer.frame.render_pathtrace) passes
    camera/sun/lights transformed into the BVH's unrotated space in `fc` /
    `scene.lights`, plus sky_rot3 (bvh -> world) so environment fetches
    stay in world space and sun_dir_world for the analytic sky — the
    BVH never rebuilds (the reference instead rebuilds its TLAS,
    ref: render-jobs/update-tlas.inl)."""
    wh = width * height
    if full_height is None:
        full_height = height
    scalar_index = jnp.ndim(sample_index) == 0
    sidx_v = jnp.atleast_1d(jnp.asarray(sample_index, jnp.uint32))
    s = sidx_v.shape[0]
    r = wh * s
    pixel = (jnp.tile(jnp.arange(wh, dtype=jnp.uint32), s)
             + jnp.asarray(pixel_base, jnp.uint32))
    px = (pixel % width).astype(jnp.float32)
    py = (pixel // width).astype(jnp.float32)
    num_pixels = jnp.uint32(width * full_height)

    set_counter = [np.uint32(0)]

    def sample_point(sidx):
        pattern = set_counter[0] * num_pixels + pixel
        set_counter[0] = np.uint32(set_counter[0] + 1)
        return sampling.cmj_sample2d(sidx, pattern, sqrt_sample_count)

    sidx = jnp.repeat(sidx_v, wh)
    n_rays = [jnp.zeros((), jnp.float32)]
    subpix = sample_point(sidx)
    aperture_u = sample_point(sidx)

    # Thin-lens camera ray (ref: GenerateCameraRay)
    xy = jnp.stack([px, py], -1) + subpix + 0.5
    screen = jnp.stack([2.0 * xy[..., 0] / width - 1.0,
                        -(2.0 * xy[..., 1] / full_height - 1.0)], -1)
    ndc = jnp.concatenate([screen, jnp.full((r, 1), 1e-4),
                           jnp.ones((r, 1))], -1)
    world = jnp.matmul(ndc, fc.inv_view_proj,
                       precision=jax.lax.Precision.HIGHEST)
    world = world[..., :3] / world[..., 3:]
    primary = mu.normalize(world - fc.eye)
    focal = fc.eye + fc.focal_length * primary
    disk = sampling.concentric_sample_disk(aperture_u)
    origin = (fc.eye + fc.aperture * disk[..., 0:1] * fc.camera_right
              + fc.aperture * disk[..., 1:2] * fc.camera_up)
    direction = mu.normalize(focal - origin)

    radiance = jnp.zeros((r, 3))
    beta = jnp.ones((r, 3))
    alive = jnp.ones((r,), bool)

    sun_w = fc.sun_dir if sun_dir_world is None else sun_dir_world

    # Alpha any-hit noise rides the CMJ sequence (one extra stratified draw
    # per trace) so BLEND thresholds share the accumulation sequence's
    # pixel stratification instead of an uncorrelated hash.
    masked = scene.meta.has_masked

    def shadow_batch(wp, dirs, alive, _seed=[0]):
        """ONE any-hit trace for all of a bounce's shadow rays (K lists of
        (R, 3)): the traversal's per-step gather cost has a latency floor
        at small wavefronts, so a K*R-ray trace is much cheaper than K
        R-ray traces. DEAD pixels' rays park at 1e29 (they die on their
        first traversal step, so they never reach the compaction tiers or
        tails). Returns K occlusion masks."""
        k = len(dirs)
        _seed[0] += 1
        n_rays[0] = n_rays[0] + k * jnp.sum(alive.astype(jnp.float32))
        wp_p = jnp.where(alive[..., None], wp, 1e29)
        o_all = jnp.concatenate([wp_p] * k, 0)
        d_all = jnp.concatenate(dirs, 0)
        noise = (jnp.concatenate(
            [sample_point(sidx)[..., 0] for _ in range(k)], 0)
            if masked else None)
        # Shadow occlusion needs ONE opaque-enough hit, so a single alpha
        # peel suffices (a ray crossing 2+ failing cutout layers before an
        # occluder reads occluded — a small conservative bias the
        # progressive accumulation dithers; the 4 extra 460k-wide peel
        # re-traces were ~0.25 s/sample in profile_pt).
        occ = _trace_alpha(scene, bvh, o_all, d_all, 0.1, 1000.0,
                           sidx * jnp.uint32(131) + jnp.uint32(_seed[0]),
                           any_hit=True, noise_u=noise, peels=1)["tri"] >= 0
        rn = wp.shape[0]
        return [occ[i * rn:(i + 1) * rn] for i in range(k)]

    for bounce in range(MAX_BOUNCES):
        if bounce > 0:
            # DEAD rays (escaped to the sky on an earlier bounce) park at
            # 1e29: they miss every box on their first step and walk the
            # root's miss chain out immediately, so they never survive
            # into the compaction tiers or while-tails.
            origin = jnp.where(alive[..., None], origin, 1e29)
        n_rays[0] = n_rays[0] + (jnp.float32(r) if bounce == 0
                                 else jnp.sum(alive.astype(jnp.float32)))
        hit = _trace_alpha(scene, bvh, origin, direction, RAY_OFFSET, 1e4,
                           sidx * jnp.uint32(17) + jnp.uint32(bounce),
                           noise_u=(sample_point(sidx)[..., 0] if masked
                                    else None),
                           profile=("primary" if bounce == 0
                                    else "incoherent"))
        tri = hit["tri"]
        missed = (tri < 0) & alive

        # miss: environment radiance (ref: msEnvmap / msDynamicSky) —
        # fetched in WORLD space (the sky does not rotate with the scene)
        d_w = direction if sky_rot3 is None else direction @ sky_rot3
        if dynamic_sky:
            env = 1000.0 * sky_mod.sky_radiance(sun_w, d_w, turbidity)
        elif probe is not None:
            env = fc.sky_brightness * ibl.sample_cube(probe.envmap, d_w)
        else:
            env = jnp.zeros_like(beta)
        radiance = radiance + jnp.where(missed[..., None], beta * env, 0.0)

        alive = alive & (tri >= 0)
        wp = origin + hit["t"][..., None] * direction
        wp = jnp.where(alive[..., None], wp, 0.0)

        uv, n, t, b, mat_id = _hit_attributes(scene, world_n_v, world_t_v,
                                              tri, hit["u"], hit["v"])
        m = _eval_material(scene, mat_id, uv, jitter=sample_point(sidx))

        if bounce == 0 and viewmode in (2, 3, 4, 5):
            # debug view modes short-circuit at the primary hit
            # (ref: pathtracing.hlsl:187-196)
            chan = {2: m["roughness"][..., None].repeat(3, -1),
                    3: m["metallic"][..., None].repeat(3, -1),
                    4: m["base_color"],
                    5: m["emissive"]}[viewmode]
            img = jnp.where(alive[..., None], chan, 0.0)
            img = (img.reshape(height, width, 3) if scalar_index
                   else img.reshape(s, height, width, 3))
            return (img, n_rays[0]) if return_rays else img

        # emissive + scattering damping (ref: pathtracing.hlsl:210-212)
        radiance = radiance + jnp.where(alive[..., None],
                                        beta * m["emissive"] * 20000.0, 0.0)
        beta = beta * jnp.where(alive[..., None],
                                jnp.clip(1.0 - m["emissive"], 0.0, 1.0), 1.0)

        # normal mapping
        nxy = m["normal_xy"]
        nz = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(nxy * nxy, -1), 1e-6))
        n = mu.normalize(_tangent_mul(
            jnp.concatenate([nxy, nz[..., None]], -1), t, b, n))
        v = -direction

        # NEE (ref: pathtracing.hlsl:231-243 loops all lights): small light
        # sets keep the exact all-lights loop (preserves crosspath parity);
        # larger sets pick ONE light uniformly per ray per bounce and weight
        # by the count (pdf 1/L) so cost stays at one shadow trace instead
        # of L full BVH passes. ALL of the bounce's shadow rays (NEE + sky
        # sample) go through ONE batched any-hit trace (shadow_batch).
        nl = scene.meta.num_lights
        shadow_dirs = []
        appliers = []       # vis -> radiance contribution

        def add_nee(li, gate, weight=1.0):
            l, rad_in = _direct_light_sample(li, scene.lights, wp)
            shadow_dirs.append(l)

            def apply(occ, l=l, rad_in=rad_in, gate=gate, weight=weight):
                contrib = _direct_radiance_apply(
                    l, rad_in, ~occ, m["base_color"], m["metallic"],
                    m["roughness"], n, v)
                return jnp.where(gate[..., None], beta * contrib * weight,
                                 0.0)
            appliers.append(apply)

        if 0 < nl <= 4:
            for li in range(nl):
                add_nee(li, alive & (li < scene.lights.count))
        elif nl > 4:
            cnt = scene.lights.count
            cnt_f = cnt.astype(jnp.float32)
            u_l = sample_point(sidx)[..., 0]
            li = jnp.minimum((u_l * cnt_f).astype(jnp.int32),
                             jnp.maximum(cnt - 1, 0))
            add_nee(li, alive & (cnt > 0), weight=cnt_f)

        if probe is not None:
            u_sky = sample_point(sidx)
            sky_dir, sky_term = _sky_sample_term(
                probe, fc.sky_brightness, u_sky,
                m["base_color"], m["metallic"], m["roughness"], n, v,
                sky_rot3=sky_rot3)
            shadow_dirs.append(sky_dir)

            def apply_sky(occ):
                t = sky_term * (~occ)[..., None].astype(jnp.float32)
                return jnp.where(alive[..., None], beta * t, 0.0)
            appliers.append(apply_sky)

        if shadow_dirs:
            occs = shadow_batch(wp, shadow_dirs, alive)
            for occ, apply in zip(occs, appliers):
                radiance = radiance + apply(occ)

        if bounce + 1 < MAX_BOUNCES:
            u_b = sample_point(sidx)
            l, atten = _indirect_ray(u_b, n, t, b, v, m["base_color"],
                                     m["metallic"], m["roughness"])
            beta = beta * jnp.where(alive[..., None], atten, 1.0)
            origin = wp
            direction = l
            alive = alive & (jnp.max(beta, -1) > 1e-3)

    img = (radiance.reshape(height, width, 3) if scalar_index
           else radiance.reshape(s, height, width, 3))
    return (img, n_rays[0]) if return_rays else img


def integrate(history, current, sample_index):
    """Progressive accumulation (ref: pathtrace-integrate.hlsl:16-31):
    history' = ((n-1) * history + current) / n with n = sample_index + 1.

    current may be a BATCH (S, H, W, 3) of consecutive samples starting at
    sample_index (trace_sample's vector mode) — the same rule applied S
    times collapses to ((n-1) * history + sum(cur)) / (n-1+S)."""
    if jnp.ndim(current) == 4:
        n0 = jnp.asarray(sample_index).astype(jnp.float32)
        sb = current.shape[0]
        return (history * n0 + current.sum(0)) / (n0 + sb)
    n = (sample_index + 1).astype(jnp.float32)
    return (history * (n - 1.0) + current) / n
