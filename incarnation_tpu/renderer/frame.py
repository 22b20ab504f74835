"""Jitted frame functions — the pass graph.

The reference's Renderer::Render spawns ~14 render jobs recorded on parallel
command lists and submitted in token order (ref: src/renderer.cpp:1358-2041,
render-jobs/job-sync.h). Here the whole frame is ONE traced function; pass
ordering is SSA data flow and XLA fuses/schedules (SURVEY.md §2.4). Transient
surfaces (vis buffer, gbuffers, HDR target) are just intermediate arrays —
the fence-pooled transient allocator (ref: backend-d3d12.cpp:616-789) has no
equivalent because XLA buffer-assigns them.

Frame graph (raster path, mirroring renderer.cpp:1676-2041):
  frustum cull -> visibility raster -> attribute resolve -> sky lighting
  (IBL probe) -> direct sun -> punctual lights -> environment background ->
  tonemap. Ray-traced passes (sun shadows, HBAO) attach when the BVH lands.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, EnvSkyMode, ViewMode
from ..core import mathutils as mu
from ..kernels import (clustered, cull, post, raster, resolve, shading,
                       skylight, taa)
from ..kernels import shadow as shadow_mod
from ..scene import lights as lights_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameConstants:
    """Per-frame constants (the analogue of FViewConstants + FSceneConstants
    uploads, ref: src/renderer.cpp:1597-1672)."""
    view_proj: jnp.ndarray       # (4, 4)
    inv_view_proj: jnp.ndarray   # (4, 4)
    proj: jnp.ndarray            # (4, 4) projection only (cluster z slices)
    eye: jnp.ndarray             # (3,)
    scene_rotation: jnp.ndarray  # (4, 4)
    exposure: jnp.ndarray        # () EV100
    sun_dir: jnp.ndarray         # (3,) toward the sun
    sun_color_intensity: jnp.ndarray  # (4,) rgb + intensity; intensity<=0
    #                                   disables the directional sun pass
    sky_brightness: jnp.ndarray  # ()
    turbidity: jnp.ndarray       # ()
    prev_view_proj: jnp.ndarray  # (4, 4) last frame's view-proj (TAA)
    history_valid: jnp.ndarray   # () f32: 1 after the first frame
    camera_right: jnp.ndarray    # (3,) camera basis (thin-lens aperture)
    camera_up: jnp.ndarray       # (3,)
    aperture: jnp.ndarray        # () path-tracer aperture
    focal_length: jnp.ndarray    # () path-tracer focal length
    frame_index: jnp.ndarray     # () i32 frame counter (jitter/dither)
    inv_scene_rotation: jnp.ndarray  # (4, 4) — rays are inverse-rotated into
    #   the BVH's unrotated world space instead of rebuilding the TLAS per
    #   frame like the reference (ref: render-jobs/update-tlas.inl)
    sun_view_proj: jnp.ndarray   # (4, 4) ortho sun-view VP for the shadow
    #   map (identity when shadow_bounds was not supplied to make())

    @staticmethod
    def make(view, config: Config, sun_dir=None, sun_color_intensity=None,
             scene_rotation=None, jitter=None, prev_view_proj=None,
             history_valid=False, frame_index=0, shadow_bounds=None):
        """shadow_bounds: optional (center (3,), radius) world bounding
        sphere — builds the sun shadow-map projection (rotation-invariant,
        so scene_rotation needs only the center rotated)."""
        vp = view.view_proj(jitter)
        sun_np = np.asarray(
            lights_mod.DEFAULT_SUN_DIR if sun_dir is None else sun_dir,
            np.float32)
        sun_vp = np.eye(4, dtype=np.float32)
        if config.sun_shadow_mode == "map" and shadow_bounds is None:
            raise ValueError(
                "sun_shadow_mode='map' needs shadow_bounds=(center, radius) "
                "— pass the HostScene's bounds to FrameConstants.make")
        if shadow_bounds is not None:
            from ..kernels import shadow as shadow_mod
            center, radius = shadow_bounds
            center = np.asarray(center, np.float32)
            if scene_rotation is not None:
                center = (np.append(center, 1.0)
                          @ np.asarray(scene_rotation))[:3]
            sun_vp = shadow_mod.sun_view_proj(sun_np, center, radius)
        return FrameConstants(
            view_proj=jnp.asarray(vp),
            inv_view_proj=jnp.asarray(np.linalg.inv(vp).astype(np.float32)),
            proj=jnp.asarray(view.projection_transform()),
            eye=jnp.asarray(np.asarray(view.position, np.float32)),
            scene_rotation=jnp.asarray(
                np.eye(4, dtype=np.float32) if scene_rotation is None
                else scene_rotation),
            exposure=jnp.asarray(np.float32(config.exposure)),
            sun_dir=jnp.asarray(sun_np),
            sun_color_intensity=jnp.asarray(
                np.asarray([1.0, 1.0, 1.0, 0.0], np.float32)
                if sun_color_intensity is None
                else np.asarray(sun_color_intensity, np.float32)),
            sky_brightness=jnp.asarray(np.float32(config.sky_brightness)),
            turbidity=jnp.asarray(np.float32(config.turbidity)),
            prev_view_proj=jnp.asarray(
                vp if prev_view_proj is None else prev_view_proj),
            history_valid=jnp.asarray(np.float32(history_valid)),
            camera_right=jnp.asarray(np.asarray(view.right, np.float32)),
            camera_up=jnp.asarray(np.asarray(view.up, np.float32)),
            aperture=jnp.asarray(
                np.float32(config.pathtracing_camera_aperture)),
            focal_length=jnp.asarray(
                np.float32(config.pathtracing_camera_focal_length)),
            frame_index=jnp.asarray(np.int32(frame_index)),
            inv_scene_rotation=jnp.asarray(np.linalg.inv(
                np.eye(4, dtype=np.float32) if scene_rotation is None
                else scene_rotation).astype(np.float32)),
            sun_view_proj=jnp.asarray(sun_vp),
        )


def render_frame(scene, fc: FrameConstants, *, config: Config,
                 params: raster.RasterParams, probe=None, env_brdf=None,
                 history=None, scene_bvh=None, band_axis=None,
                 band_n: int = 1):
    """Full raster-path frame. probe: optional EnvironmentProbe + env_brdf
    LUT enable the sky-lighting pass and envmap background.

    band_axis/band_n: set by the band sharder (dist/sharding.py) when this
    frame is one horizontal band of a mesh-sharded image — TAA exchanges
    clamp halos with neighbor bands over ICI.

    Returns dict with 'color' (H, W, 3) uint8 sRGB plus intermediate buffers
    and stats (the render-stats analogue, ref: inc/gpu-shared-types.h:251-255).
    """
    # Frustum culling covers ALL prims (decals included — their layer is
    # separated below; the sphere test is conservative so culling them
    # is image-identical).
    prim_visible = jnp.ones_like(scene.prim_is_decal, bool)
    culled_prims = jnp.int32(0)
    culled_meshlets = jnp.int32(0)
    meshlet_visible = None
    if config.frustum_culling:
        inside, culled_prims = cull.cull_primitives(
            scene.prim_bsphere, scene.prim_mesh, scene.mesh_transforms,
            scene.mesh_visible, fc.scene_rotation, fc.view_proj)
        prim_visible &= inside
        if config.use_meshlets:
            # Meshlet-granularity culling (ref: batch-culling.hlsl
            # USING_MESHLETS path) — finer masks over the same sphere test.
            # The mask stays at meshlet granularity; prepare_geometry folds
            # it into its per-triangle table gather (a separate per-triangle
            # expansion profiled ~1.9 ms at 262k triangles).
            meshlet_visible, culled_meshlets = cull.cull_primitives(
                scene.meshlet_bsphere, scene.meshlet_mesh,
                scene.mesh_transforms, scene.mesh_visible,
                fc.scene_rotation, fc.view_proj)

    taa_active = config.enable_taa and history is not None
    stoch = config.stochastic_mip and taa_active
    prep = raster.prepare_geometry(scene, fc.scene_rotation, fc.view_proj,
                                   prim_visible, params,
                                   meshlet_visible=meshlet_visible)

    # Raster-layer table: layer 0 = opaque; masked depth peels, decals, and
    # forward-blend each get their own layer. ONE layered binning (one
    # sort, one pair-row gather) serves every layer — the per-layer
    # bin_triangles calls this replaces were ~21 ms of the honest bench
    # frame (kernels/raster.py::bin_triangles_layered).
    tri_ok = scene.tri_prim >= 0
    safe_prim = jnp.maximum(scene.tri_prim, 0)
    tri_alpha = scene.prim_alpha_mode[safe_prim]
    tri_decal = (scene.prim_is_decal[safe_prim] > 0) & tri_ok
    has_blend_layer = config.forward_lighting and scene.meta.has_blend
    if has_blend_layer:
        # Forward: BLEND prims skip the screen-door peel; they are
        # shaded per layer and alpha-composited below (the capability
        # the reference reserves for forward rendering).
        tri_masked = (tri_alpha == 1) & tri_ok & ~tri_decal
        tri_blend = (tri_alpha >= 2) & tri_ok & ~tri_decal
    else:
        tri_masked = (tri_alpha > 0) & tri_ok & ~tri_decal
        tri_blend = None
    n_layers = 1
    masked_idx = decal_idx = blend_idx = None
    lyr = jnp.zeros_like(scene.tri_prim)
    if scene.meta.has_masked:
        masked_idx = n_layers
        n_layers += 1
        lyr = jnp.where(tri_masked, masked_idx, lyr)
    if scene.meta.has_decals:
        decal_idx = n_layers
        n_layers += 1
        lyr = jnp.where(tri_decal, decal_idx, lyr)
    if has_blend_layer:
        blend_idx = n_layers
        n_layers += 1
        lyr = jnp.where(tri_blend, blend_idx, lyr)
    layer_bins = raster.bin_triangles_layered(
        prep.setup_t, prep.ids, prep.valid, prep.bbox, params,
        prep.attr_flat, layer=(lyr if n_layers > 1 else None),
        n_layers=n_layers, emit_amask=scene.meta.has_masked)

    tri, depth, interp = raster.rasterize_tiles(layer_bins[0], params,
                                            name="raster_opaque")
    stats = dict(
        bin_overflow=layer_bins[0].overflow,
        big_overflow=sum(b.big_overflow for b in layer_bins),
        culled_triangles=jnp.sum(~prep.valid))
    stats["peel_overflow"] = jnp.zeros((), jnp.int32)
    stats["peel_chunk_overflow"] = jnp.zeros((), jnp.int32)
    if scene.meta.has_masked:
        # Alpha-masked geometry (ref: visibility-pass.hlsl:101-111 clip).
        # The kernel tests every masked fragment against its material's
        # conservative certainly-transparent cell bitplane (textures.py
        # amask): certain rejects (a foliage card's ~80% transparent
        # background — the deep fragment stacks) die IN the race, so the
        # K-peel ladder only sorts fragments that might pass, and its
        # winners are alpha-tested exactly as before. The peel count
        # therefore bounds the per-pixel stack of POSSIBLY-VISIBLE
        # fragments — peeling every fragment overflowed >100k pixels on
        # the atrium even at 8 peels.
        total_peels = max(1, config.masked_depth_peels)
        amask_tab = scene.mat_stack.amask
        # The masked layer's pairs are sparse (hundreds of tiles holding a
        # few pairs each) and the in-race rejection costs per CHUNK SLOT,
        # so masked passes run at a quarter chunk — a tile with 3 pairs
        # then evaluates 32 pair-slots, not 128. (The shared pair stream
        # is padded for the main chunk size, which covers this.)
        mparams = params._replace(chunk=min(params.chunk, 32))
        acc_tri = jnp.full_like(tri, -1)
        acc_depth = jnp.zeros_like(depth)
        acc_interp = jnp.zeros_like(interp)
        # Chunk-compact the per-peel alpha fetch when the frame is big
        # enough for it to pay (the gather is index-bound; sparse layers
        # shouldn't pay H*W indices — resolve._chunk_compact).
        n_chunks = (params.height * params.width) // 128
        peel_cap = config.peel_chunk_capacity
        use_chunks = (0 < peel_cap < n_chunks
                      and n_chunks * 128 == params.height * params.width)
        peel_chunk_overflow = jnp.zeros((), jnp.int32)
        for layer in range(total_peels):
            zlim = (jnp.full(depth.shape, 2.0, jnp.float32)
                    if layer == 0 else jnp.where(cont, m_depth, 0.0))
            m_tri, m_depth, m_interp = raster.rasterize_tiles(
                layer_bins[masked_idx], mparams, z_limit=zlim,
                name="raster_peel", mask_table=amask_tab)
            # With certain rejects dead in the race, peel coverage decays
            # fast (measured atrium: peel-0 covers ~40% of the former
            # masked footprint; continuing pixels shrink ~2.5x/layer), so
            # the compacted alpha gathers — whose cost is CAPACITY-sized,
            # not coverage-sized — get a steeply declining ladder
            # (overflow counted, CLI adapts).
            lcap = (peel_cap if layer == 0
                    else (2 * peel_cap) // 3 if layer == 1
                    else max((5 * peel_cap) >> (layer + 2), 512))
            alpha, thresh = resolve.masked_alpha(
                scene, m_tri, m_interp,
                mip_dither=(fc.frame_index if stoch else None),
                uv_dither=(config.stochastic_bilinear and stoch),
                max_aniso=float(config.max_anisotropy),
                coverage_capacity=(lcap if use_chunks else None))
            if use_chunks:
                peel_chunk_overflow = jnp.maximum(
                    peel_chunk_overflow,
                    resolve.chunk_overflow(m_tri >= 0, lcap))
            hit = m_tri >= 0
            passed = hit & (alpha >= thresh)
            newly = passed & (acc_tri < 0)
            acc_tri = jnp.where(newly, m_tri, acc_tri)
            acc_depth = jnp.where(newly, m_depth, acc_depth)
            acc_interp = jnp.where(newly[None], m_interp, acc_interp)
            cont = hit & ~passed & (acc_tri < 0)
        # Pixels whose LAST peel still alpha-failed fall through to the
        # opaque/background winner silently — count them (mirror of
        # bin_overflow; ref clip never truncates, visibility-pass.hlsl:101).
        stats["peel_overflow"] = cont.sum().astype(jnp.int32)
        stats["peel_chunk_overflow"] = peel_chunk_overflow
        # Merge: the surviving masked fragment wins where it is closer
        # than the opaque winner (reverse-Z: larger z = closer).
        win = (acc_tri >= 0) & (acc_depth > depth)
        tri = jnp.where(win, acc_tri, tri)
        depth = jnp.where(win, acc_depth, depth)
        interp = jnp.where(win[None], acc_interp, interp)
    stats["culled_primitives"] = culled_prims
    stats["culled_meshlets"] = culled_meshlets

    # Stochastic texture filtering only while TAA is accumulating (the
    # temporal resolve realizes the filtered expectation); single-shot
    # frames keep exact trilinear.
    n3 = None
    # Checkerboard half-rate parity shared by the index-bound full-screen
    # gathers (stack fetch here; probe + shadow in _shade_surface).
    resolve_cp = None
    if stoch and config.checkerboard_gathers and config.stochastic_bilinear \
            and params.width % 2 == 0:
        resolve_cp = fc.frame_index.astype(jnp.int32) & 1
    if config.forward_lighting:
        gb, n3 = resolve.resolve_gbuffer(
            tri, depth, scene, interp, fc.inv_view_proj,
            params.width, params.height,
            mip_dither=(fc.frame_index if stoch else None),
            uv_dither=(config.stochastic_bilinear and stoch),
            return_normal3=True, max_aniso=float(config.max_anisotropy),
            checker_parity=resolve_cp)
    else:
        gb = resolve.resolve_gbuffer(
            tri, depth, scene, interp, fc.inv_view_proj,
            params.width, params.height,
            mip_dither=(fc.frame_index if stoch else None),
            uv_dither=(config.stochastic_bilinear and stoch),
            max_aniso=float(config.max_anisotropy),
            checker_parity=resolve_cp)

    # Decal pass (ref: render-jobs/gbuffer-raster-pass.inl:126-191): decal
    # meshes raster on top with GREATER_EQUAL depth against the scene,
    # base color alpha-blended, normals/metal-rough overwritten where the
    # decal is opaque
    if scene.meta.has_decals:
        # Decal geometry shares the main pass's prep + layered binning
        # (its pairs live in the decal layer). Coverage compaction
        # was removed here: on v5e the nonzero+gather+scatter machinery
        # (~86 ms) loses badly to the direct full-screen stack gather
        # (~9 ms — per-pixel indices are screen-coherent).
        d_tri, d_depth, d_interp = raster.rasterize_tiles(
            layer_bins[decal_idx], params, name="raster_decal")
        n_chunks = (params.height * params.width) // 128
        d_cap = config.decal_chunk_capacity
        d_chunks = (0 < d_cap < n_chunks
                    and n_chunks * 128 == params.height * params.width)
        d_gb = resolve.resolve_gbuffer(d_tri, d_depth, scene, d_interp,
                                       fc.inv_view_proj, params.width,
                                       params.height,
                                       mip_dither=(fc.frame_index
                                                   if stoch else None),
                                       uv_dither=(config.stochastic_bilinear
                                                  and stoch),
                                       max_aniso=float(config.max_anisotropy),
                                       coverage_capacity=(d_cap if d_chunks
                                                          else None))
        stats["decal_overflow"] = (
            resolve.chunk_overflow(d_tri >= 0, d_cap) if d_chunks
            else jnp.zeros((), jnp.int32))
        covers = d_gb.mask & (d_depth >= depth - 1e-5)
        a = jnp.where(covers, d_gb.base_color[..., 3], 0.0)[..., None]
        opaque = (a > 0.5)
        gb = resolve.GBuffer(
            base_color=jnp.concatenate([
                gb.base_color[..., :3] * (1 - a)
                + d_gb.base_color[..., :3] * a,
                gb.base_color[..., 3:]], -1),
            normals=jnp.where(opaque, d_gb.normals, gb.normals),
            mrao=jnp.where(opaque, d_gb.mrao, gb.mrao),
            emissive=gb.emissive,
            mask=gb.mask,
            world_pos=gb.world_pos,
            uv=gb.uv,
            extras=gb.extras,
        )
        if n3 is not None:
            n3 = jnp.where(opaque, mu.oct_decode(d_gb.normals), n3)

    # Sun shadow map, rendered once per frame and sampled by every shaded
    # surface (TPU-native stand-in for the reference's per-pixel DXR sun
    # shadow ray, ref: lighting/common.hlsli:91-116; kernels/shadow.py)
    sun_shadow_map = None
    if (config.sun_shadow_mode == "map" and config.enable_direct_lighting):
        sm_params = shadow_mod.shadow_params(
            config.shadow_map_resolution, config)
        if params.interpret is not None:
            sm_params = sm_params._replace(interpret=params.interpret)
        sun_shadow_map, sm_stats = shadow_mod.render_sun_shadow_map(
            scene, fc.scene_rotation, fc.sun_view_proj, sm_params)
        stats["shadow_bin_overflow"] = sm_stats["bin_overflow"]

    # Light-cluster grid, built once per frame and shared by every shaded
    # surface (ref: render-jobs/light-culling.inl)
    mask_grid = None
    if config.enable_direct_lighting and scene.meta.num_lights > 0:
        mask_grid, culled_lights = clustered.build_light_clusters(
            scene.lights, config, fc.proj, fc.inv_view_proj,
            config.camera_near_plane)
        stats["culled_lights"] = culled_lights

    # Forward mode shades from the exact mapped normal (no octahedral round
    # trip — ref: forward-pass.hlsl:108-114 never encodes it); deferred
    # decodes the gbuffer like the reference's lighting passes.
    if config.forward_lighting and n3 is not None:
        n = n3
    else:
        n = mu.oct_decode(gb.normals)
    hdr, ao_map, bent_normals, v = _shade_surface(
        scene, gb, n, depth, fc, config=config, params=params, probe=probe,
        env_brdf=env_brdf, scene_bvh=scene_bvh, mask_grid=mask_grid,
        stoch=stoch, sun_shadow_map=sun_shadow_map)

    # Environment background at far depth (ref: renderer.cpp:1928-1960)
    if config.env_sky_mode == EnvSkyMode.DYNAMIC_SKY:
        hdr = hdr + skylight.environment_background(
            gb.mask, fc.eye, fc.inv_view_proj, params.width, params.height,
            sun_dir=fc.sun_dir, turbidity=config.turbidity,
            dynamic_sky=True)
    elif probe is not None:
        hdr = hdr + skylight.environment_background(
            gb.mask, fc.eye, fc.inv_view_proj, params.width, params.height,
            probe=probe, sky_brightness=fc.sky_brightness, dynamic_sky=False)

    # Forward alpha-composited BLEND layers: depth-peel the blend geometry
    # front to back, forward-shade each layer at full precision, and
    # under-composite radiance — the capability that motivates a forward
    # path (the reference's forward PSO ships BlendEnable=FALSE,
    # forward-pass.inl:134-139; this goes one step further).
    if has_blend_layer:
        c_acc = jnp.zeros_like(hdr)
        transmit = jnp.ones(hdr.shape[:2] + (1,), jnp.float32)
        # The blend layers raster from the shared layered binning as
        # sequential z_limit peels, one per configured masked layer (the
        # former min(.,3) cap was a k-buffer-era limit — ADVICE r3: the CLI
        # adaptive raise to 4 peels must not drop the 4th blend layer).
        blend_peels = max(1, config.masked_depth_peels)
        bzlim = jnp.full(depth.shape, 2.0, jnp.float32)
        for layer in range(blend_peels):
            b_tri, b_depth, b_interp = raster.rasterize_tiles(
                layer_bins[blend_idx], params, z_limit=bzlim,
                name="raster_blend")
            bzlim = jnp.where(b_tri >= 0, b_depth, 0.0)
            gb_b, n3_b = resolve.resolve_gbuffer(
                b_tri, b_depth, scene, b_interp, fc.inv_view_proj,
                params.width, params.height, return_normal3=True)
            hdr_b, _, _, _ = _shade_surface(
                scene, gb_b, n3_b, b_depth, fc, config=config,
                params=params, probe=probe, env_brdf=env_brdf,
                scene_bvh=scene_bvh, mask_grid=mask_grid, stoch=False,
                sun_shadow_map=sun_shadow_map)
            # Only fragments in front of the opaque winner contribute
            # (reverse-Z: larger z = closer).
            vis_b = gb_b.mask & (b_depth > depth)
            a = jnp.where(vis_b, gb_b.base_color[..., 3], 0.0)[..., None]
            c_acc = c_acc + transmit * a * hdr_b
            transmit = transmit * (1.0 - a)
        hdr = c_acc + transmit * hdr

    # TAA resolve (ref: render-jobs/taa-resolve.inl): reproject + clamp +
    # blend into the accumulation buffer, which becomes the display source
    accumulation = hdr
    if config.enable_taa and history is not None:
        accumulation = taa.taa_resolve(
            hdr, history, depth, fc.inv_view_proj, fc.prev_view_proj,
            fc.history_valid, params.width, params.height,
            dither=(fc.frame_index if taa_active and config.stochastic_taa
                    else None),
            band_axis=band_axis, band_n=band_n)

    color = _apply_viewmode(config, scene, gb, n, depth, tri, accumulation,
                            fc, v=v, probe=probe,
                            bent_normals=bent_normals)
    color_u8 = post.to_uint8(color)

    # Shader-appended debug draws (ref: debug-drawing/common.hlsli:33-95):
    # the cull and light-culling PASS RESULTS append wireframe rows to a
    # device-side buffer, expanded and splatted depth-tested in-trace —
    # the drawn set depends on device-computed masks the host never sees.
    if config.show_light_bounds or config.show_object_bounds:
        from . import debugdraw
        dbuf, dcount = debugdraw.ddraw_new()
        if config.show_light_bounds and mask_grid is not None:
            rows, rmask = debugdraw.light_bounds_rows(scene.lights,
                                                      mask_grid)
            dbuf, dcount = debugdraw.ddraw_append(dbuf, dcount, rows, rmask)
        if config.show_object_bounds:
            rows, rmask = debugdraw.object_bounds_rows(
                scene, fc.scene_rotation, prim_visible)
            dbuf, dcount = debugdraw.ddraw_append(dbuf, dcount, rows, rmask)
        color_u8 = debugdraw.ddraw_render(color_u8, depth, dbuf, dcount,
                                          fc.view_proj)
        stats["debug_draws"] = dcount

    return dict(color=color_u8, hdr=hdr,
                accumulation=accumulation, tri=tri, depth=depth,
                gbuffer=gb, stats=stats)


def _shade_surface(scene, gb, n, depth, fc, *, config: Config, params,
                   probe, env_brdf, scene_bvh, mask_grid, stoch,
                   sun_shadow_map=None):
    """Per-pixel shading shared by the deferred frame, the forward frame,
    and the forward blend layers: emissive + IBL + sun (ray-traced shadow) +
    clustered punctual. Deferred evaluates these as separate additive
    fullscreen jobs (ref: render-jobs/{sky-lighting,direct-lighting,
    clustered-lighting}.inl); the forward PS evaluates the same lobes
    inline (ref: geo-raster/forward-pass.hlsl:55-189) — here both are the
    same traced code, fused by XLA either way.

    Returns (hdr, ao_map, bent_normals, v)."""
    hdr = gb.emissive
    v = mu.normalize(fc.eye - gb.world_pos)
    base = gb.base_color[..., :3]
    metallic = gb.mrao[..., 0]
    roughness = gb.mrao[..., 1]
    m3 = gb.mask[..., None]
    # Checkerboard half-rate parity for the index-bound full-screen gathers
    # (probe fetch, shadow sample) — TAA alternates it (kernels/checker.py).
    checker_parity = None
    if stoch and config.checkerboard_gathers \
            and gb.mask.shape[1] % 2 == 0:
        checker_parity = fc.frame_index.astype(jnp.int32) & 1

    # Ray-traced HBAO + bent normals (ref: render-jobs/hbao.inl; AO cleared
    # to 1.0 when disabled, ref: renderer.cpp:1816-1840)
    ao_map = None
    bent_normals = None
    if config.enable_hbao and scene_bvh is not None:
        from ..kernels import hbao as hbao_mod
        ao_map, bent_oct = hbao_mod.hbao(scene_bvh, gb, depth, fc,
                                         params.width, params.height)
        if config.use_bent_normals:
            bent_normals = mu.oct_decode(bent_oct)

    # Sky / IBL (ref: render-jobs/sky-lighting.inl)
    if probe is not None and config.enable_sky_lighting \
            and env_brdf is not None:
        hdr = hdr + skylight.sky_lighting(
            gb, n, v, probe, env_brdf, fc.sky_brightness,
            hbao=ao_map, bent_normals=bent_normals,
            diffuse_ibl=config.enable_diffuse_ibl,
            specular_ibl=config.enable_specular_ibl,
            lighting_only=(config.viewmode == ViewMode.LIGHTING_ONLY),
            dither=(fc.frame_index if stoch else None),
            extras=(gb.extras if scene.meta.has_extras else None),
            analytic_env_brdf=config.analytic_env_brdf,
            uv_dither=config.stochastic_bilinear,
            checker_parity=checker_parity)

    # Direct (sun) lighting with inline ray-traced shadows when a BVH is
    # supplied (ref: lighting/direct-lighting.hlsl +
    # lighting/common.hlsli:91-116)
    if config.enable_direct_lighting:
        radiance_in = shading.directional_light_radiance(
            fc.sun_color_intensity[:3], fc.sun_color_intensity[3])
        sun_vis = 1.0
        rt_shadows = (scene_bvh is not None
                      and config.sun_shadow_mode in ("auto", "rt"))
        if sun_shadow_map is not None and not rt_shadows:
            # Shadow-map sun visibility (TPU-native replacement for the
            # reference's always-on DXR shadow ray — kernels/shadow.py)
            ndl = jnp.sum(n * fc.sun_dir, -1)
            sun_vis = shadow_mod.sun_visibility(
                gb.world_pos, ndl, sun_shadow_map, fc.sun_view_proj,
                config.shadow_map_resolution,
                dither=(fc.frame_index if stoch else None),
                checker_parity=checker_parity)[..., None]
        elif rt_shadows:
            r3 = fc.inv_scene_rotation[:3, :3]
            origins = gb.world_pos.reshape(-1, 3) @ r3 \
                + fc.inv_scene_rotation[3, :3]
            shadow_dir = jnp.broadcast_to(fc.sun_dir @ r3,
                                          origins.shape)
            from ..kernels import pathtrace as pt_mod
            occ = pt_mod._trace_alpha(
                scene, scene_bvh, origins, shadow_dir, 0.1, 1000.0,
                fc.frame_index.astype(jnp.uint32),
                any_hit=True)["tri"] >= 0
            sun_vis = 1.0 - occ.reshape(gb.mask.shape).astype(
                jnp.float32)[..., None]
        has_x = scene.meta.has_extras
        sun = shading.brdf_response(
            base, metallic, roughness, n, v, fc.sun_dir, radiance_in,
            visibility=sun_vis,
            transmission=gb.extras[..., 0] if has_x else None,
            clearcoat=gb.extras[..., 1] if has_x else None,
            cc_roughness=gb.extras[..., 2] if has_x else None)
        hdr = hdr + jnp.where(m3, sun, 0.0)

    # Clustered punctual lighting (ref: render-jobs/clustered-lighting.inl)
    if mask_grid is not None:
        hdr = hdr + clustered.clustered_lighting(
            gb, n, v, depth, scene.lights, mask_grid, config,
            config.camera_near_plane, params.width, params.height)

    return hdr, ao_map, bent_normals, v


def _apply_viewmode(config: Config, scene, gb, n, depth, tri, hdr, fc,
                    v=None, probe=None, bent_normals=None):
    """Debug visualization modes (ref: postprocess/debug-visualization.hlsl,
    inc/demo.h:7-23) resolved at trace time — each mode is its own jit cache
    entry like the reference's VIEWMODE shader define."""
    vm = config.viewmode
    if vm == ViewMode.REFLECTIONS and v is not None and probe is not None:
        # Mirror reflection of the prefiltered envmap at mip 0
        # (ref: geo-raster/forward-pass.hlsl:121-130 VIEWMODE == 7)
        from ..kernels import ibl as ibl_mod
        r = mu.normalize(2.0 * jnp.sum(n * v, -1, keepdims=True) * n - v)
        refl = ibl_mod.sample_cube(probe.prefiltered, r) * fc.sky_brightness
        return post.tonemap(jnp.where(gb.mask[..., None], refl, hdr),
                            fc.exposure)
    if vm == ViewMode.BENT_NORMALS:
        # Bent normals x0.5+0.5 (ref: debug-visualization.hlsl:193-199);
        # falls back to the shading normal when HBAO/bent normals are off
        # (the reference reads whatever is in the cleared texture).
        bn = n if bent_normals is None else bent_normals
        return jnp.where(gb.mask[..., None], bn * 0.5 + 0.5, 0.0)
    if vm == ViewMode.NORMAL or vm == ViewMode.LIGHTING_ONLY:
        return post.tonemap(hdr, fc.exposure)
    if vm == ViewMode.NAN_CHECK:
        return post.tonemap(hdr, fc.exposure, nan_check=True)
    if vm == ViewMode.BASE_COLOR:
        return gb.base_color[..., :3]
    if vm == ViewMode.ROUGHNESS:
        return jnp.repeat(gb.mrao[..., 1:2], 3, axis=-1)
    if vm == ViewMode.METALLIC:
        return jnp.repeat(gb.mrao[..., 0:1], 3, axis=-1)
    if vm == ViewMode.EMISSIVE:
        return post.tonemap(gb.emissive, fc.exposure)
    if vm == ViewMode.NORMALMAP:
        return n * 0.5 + 0.5
    if vm == ViewMode.AMBIENT_OCCLUSION:
        return jnp.repeat(gb.mrao[..., 2:3], 3, axis=-1)
    if vm in (ViewMode.OBJECT_IDS, ViewMode.TRIANGLE_IDS):
        vis = raster.visibility_from_tri(tri, scene)
        prim, ltri = mu.decode_primitive_visibility(
            jnp.where(gb.mask, vis, 0))
        key = prim if vm == ViewMode.OBJECT_IDS else ltri
        return jnp.where(gb.mask[..., None], _hash_color(key), 0.0)
    if vm == ViewMode.LIGHT_CLUSTER_SLICES:
        # color by exponential depth slice (ref: debug-visualization.hlsl
        # cluster-slices mode)
        h, w = depth.shape
        cid = clustered.pixel_cluster_id(depth, config,
                                         config.camera_near_plane, w, h)
        gxy = config.light_cluster_dim_x * config.light_cluster_dim_y
        return jnp.where(gb.mask[..., None], _hash_color(cid // gxy), 0.0)
    return post.tonemap(hdr, fc.exposure)


def pick(scene, tri_map, x: int, y: int):
    """Mouse picking: (primitive id, local triangle id, meshlet id) under a
    pixel, -1s when no geometry (ref: debug-visualization.hlsl:94-150 writes
    the picked id's draw args from the pixel shader; here the triangle-index
    buffer is read back directly)."""
    t = int(tri_map[y, x])
    if t < 0:
        return -1, -1, -1
    prim = int(scene.tri_prim[t])
    local = t - int(scene.prim_tri_offset[prim])
    meshlet = int(scene.tri_meshlet[t])
    return prim, local, meshlet


def highlight(color_u8, tri_map, scene, prim_id: int):
    """White overlay on the picked primitive's pixels
    (ref: render-jobs/highlight-pass.inl + geo-raster/highlight-pass.hlsl)."""
    safe = jnp.maximum(tri_map, 0)
    m = (tri_map >= 0) & (scene.tri_prim[safe] == prim_id)
    white = jnp.full_like(color_u8, 255)
    blended = (color_u8.astype(jnp.float32) * 0.35
               + white.astype(jnp.float32) * 0.65).astype(jnp.uint8)
    return jnp.where(m[..., None], blended, color_u8)


def _hash_color(key):
    """Integer id -> pseudo-random rgb (ref: debug-visualization.hlsl hashes
    ids to colors for the id view modes)."""
    h = ((key.astype(jnp.uint32) + np.uint32(1)) * np.uint32(2654435761)
         ) >> np.uint32(8)
    r = (h & 0xFF).astype(jnp.float32) / 255.0
    g = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b], axis=-1)


@functools.partial(jax.jit, static_argnames=("config", "params"))
def render_frame_jit(scene, fc, config: Config, params: raster.RasterParams,
                     probe=None, env_brdf=None, history=None,
                     scene_bvh=None):
    return render_frame(scene, fc, config=config, params=params, probe=probe,
                        env_brdf=env_brdf, history=history,
                        scene_bvh=scene_bvh)


def pathtrace_inputs(scene, fc):
    """Transform camera/sun/lights into the BVH's unrotated space and build
    UNROTATED world vertex attributes; pair with sky_rot3 =
    fc.scene_rotation[:3, :3] so environment fetches stay in world space."""
    from ..kernels import resolve as resolve_mod
    inv = fc.inv_scene_rotation
    r3 = inv[:3, :3]
    fc_b = dataclasses.replace(
        fc,
        eye=fc.eye @ r3 + inv[3, :3],
        camera_right=fc.camera_right @ r3,
        camera_up=fc.camera_up @ r3,
        sun_dir=fc.sun_dir @ r3,
        inv_view_proj=fc.inv_view_proj @ inv)
    scene_b = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights, transform=scene.lights.transform @ inv))
    world_n_v, world_t_v = resolve_mod.vertex_world_attributes(
        scene, jnp.eye(4, dtype=jnp.float32))
    return scene_b, fc_b, world_n_v, world_t_v


def render_pathtrace(scene, bvh, fc, history, sample_index, *,
                     config: Config, width: int, height: int, probe=None):
    """One progressive path-tracing sample + accumulation + tonemap
    (ref: renderer.cpp:1679-1710: PathTracing job + pathtrace-integrate +
    TonemapPass on the history buffer).

    Scene rotation: the BVH holds unrotated geometry, so the camera, sun,
    and lights are transformed INTO bvh space for the trace (the reference
    instead rebuilds the TLAS per frame, ref: render-jobs/update-tlas.inl);
    sky fetches stay in world space via sky_rot3."""
    from ..kernels import pathtrace

    scene_b, fc_b, world_n_v, world_t_v = pathtrace_inputs(scene, fc)
    current, rays = pathtrace.trace_sample(
        scene_b, bvh, world_n_v, world_t_v, fc_b, probe, sample_index,
        width, height,
        sqrt_sample_count=int(np.sqrt(config.max_sample_count)),
        dynamic_sky=(config.env_sky_mode == EnvSkyMode.DYNAMIC_SKY),
        turbidity=config.turbidity, viewmode=config.viewmode,
        sky_rot3=fc.scene_rotation[:3, :3], sun_dir_world=fc.sun_dir,
        return_rays=True)
    first = jnp.asarray(sample_index, jnp.float32).reshape(-1)[0]
    accumulated = pathtrace.integrate(history, current, first)
    color = post.tonemap(accumulated, fc.exposure,
                         nan_check=(config.viewmode == ViewMode.NAN_CHECK))
    return dict(color=post.to_uint8(color), history=accumulated, rays=rays)


@functools.partial(jax.jit,
                   static_argnames=("config", "width", "height"))
def render_pathtrace_jit(scene, bvh, fc, history, sample_index,
                         config: Config, width: int, height: int,
                         probe=None):
    return render_pathtrace(scene, bvh, fc, history, sample_index,
                            config=config, width=width, height=height,
                            probe=probe)
