"""Jitted frame functions — the pass graph.

The reference's Renderer::Render spawns ~14 render jobs recorded on parallel
command lists and submitted in token order (ref: src/renderer.cpp:1358-2041,
render-jobs/job-sync.h). Here the whole frame is ONE traced function; pass
ordering is SSA data flow and XLA fuses/schedules (SURVEY.md §2.4). Transient
surfaces (vis buffer, gbuffers, HDR target) are just intermediate arrays —
the fence-pooled transient allocator (ref: backend-d3d12.cpp:616-789) has no
equivalent because XLA buffer-assigns them.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ViewMode
from ..core import mathutils as mu
from ..kernels import post, raster, resolve, shading
from ..scene import lights as lights_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameConstants:
    """Per-frame constants (the analogue of FViewConstants + FSceneConstants
    uploads, ref: src/renderer.cpp:1597-1672)."""
    view_proj: jnp.ndarray       # (4, 4)
    eye: jnp.ndarray             # (3,)
    scene_rotation: jnp.ndarray  # (4, 4)
    exposure: jnp.ndarray        # () EV100
    sun_dir: jnp.ndarray         # (3,) toward the sun
    sun_color_intensity: jnp.ndarray  # (4,) rgb + intensity; intensity<=0
    #                                   disables the directional sun pass

    @staticmethod
    def make(view, config: Config, sun_dir=None, sun_color_intensity=None,
             scene_rotation=None, jitter=None):
        return FrameConstants(
            view_proj=jnp.asarray(view.view_proj(jitter)),
            eye=jnp.asarray(np.asarray(view.position, np.float32)),
            scene_rotation=jnp.asarray(
                np.eye(4, dtype=np.float32) if scene_rotation is None
                else scene_rotation),
            exposure=jnp.asarray(np.float32(config.exposure)),
            sun_dir=jnp.asarray(
                lights_mod.DEFAULT_SUN_DIR if sun_dir is None else
                np.asarray(sun_dir, np.float32)),
            sun_color_intensity=jnp.asarray(
                np.asarray([1.0, 1.0, 1.0, 0.0], np.float32)
                if sun_color_intensity is None
                else np.asarray(sun_color_intensity, np.float32)),
        )


def render_frame(scene, fc: FrameConstants, *, config: Config,
                 params: raster.RasterParams):
    """Full raster-path frame: visibility -> gbuffer -> lighting -> tonemap.

    Returns dict with 'color' (H, W, 3) uint8 sRGB plus intermediate buffers
    and stats (the render-stats analogue, ref: inc/gpu-shared-types.h:251-255).
    """
    prim_visible = jnp.ones(scene.prim_mesh.shape, bool)
    prim_visible &= scene.prim_is_decal == 0

    vis, depth, clip, _, stats = raster.render_visibility(
        scene, scene.vtx_mesh, fc.scene_rotation, fc.view_proj,
        prim_visible, params)

    # Per-vertex world attributes for the resolve
    world_rot = jnp.einsum("mij,jk->mik", scene.mesh_transforms,
                           fc.scene_rotation)
    h = jnp.concatenate([scene.positions,
                         jnp.ones_like(scene.positions[:, :1])], axis=-1)
    world_pos_v = jnp.einsum(
        "vi,vij->vj", h, world_rot[scene.vtx_mesh])[:, :3]
    world_n_v, world_t_v = resolve.vertex_world_attributes(
        scene, fc.scene_rotation)

    gb = resolve.resolve_gbuffer(vis, scene, clip, world_pos_v, world_n_v,
                                 world_t_v, params.width, params.height)

    hdr = gb.emissive
    n = mu.oct_decode(gb.normals)
    v = mu.normalize(fc.eye - gb.world_pos)
    base = gb.base_color[..., :3]
    metallic = gb.mrao[..., 0]
    roughness = gb.mrao[..., 1]
    m3 = gb.mask[..., None]

    # Deferred direct (sun) lighting (ref: lighting/direct-lighting.hlsl;
    # shadow rays arrive with the BVH milestone)
    if config.enable_direct_lighting:
        radiance_in = shading.directional_light_radiance(
            fc.sun_color_intensity[:3], fc.sun_color_intensity[3])
        sun = shading.brdf_response(base, metallic, roughness, n, v,
                                    fc.sun_dir, radiance_in)
        hdr = hdr + jnp.where(m3, sun, 0.0)

    # Brute-force punctual lights until the clustered path lands
    # (ref: lighting/clustered-lighting.hlsl iterates per-cluster lists)
    nl = scene.lights.type.shape[0]
    if config.enable_direct_lighting and nl > 0:
        def add_light(i, acc):
            lt = scene.lights
            l, radiance = shading.punctual_light(
                lt.type[i], lt.transform[i], lt.color[i], lt.intensity[i],
                lt.range[i], lt.spot_angles[i], gb.world_pos)
            lit = shading.brdf_response(base, metallic, roughness, n, v, l,
                                        radiance)
            on = (i < lt.count) & (lt.type[i] != lights_mod.LIGHT_DIRECTIONAL)
            return acc + jnp.where(on & gb.mask[..., None], lit, 0.0)

        hdr = jax.lax.fori_loop(0, nl, add_light, hdr)

    color = _apply_viewmode(config, gb, n, depth, vis, hdr, fc)
    return dict(color=post.to_uint8(color), hdr=hdr, vis=vis, depth=depth,
                gbuffer=gb, stats=stats)


def _apply_viewmode(config: Config, gb, n, depth, vis, hdr, fc):
    """Debug visualization modes (ref: postprocess/debug-visualization.hlsl,
    inc/demo.h:7-23) resolved at trace time — each mode is its own jit cache
    entry like the reference's VIEWMODE shader define."""
    vm = config.viewmode
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
        prim, tri = mu.decode_primitive_visibility(
            jnp.where(gb.mask, vis, 0))
        key = prim if vm == ViewMode.OBJECT_IDS else tri
        return jnp.where(gb.mask[..., None], _hash_color(key), 0.0)
    return post.tonemap(hdr, fc.exposure)


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
def render_frame_jit(scene, fc, config: Config, params: raster.RasterParams):
    return render_frame(scene, fc, config=config, params=params)
