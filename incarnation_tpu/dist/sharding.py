"""Multi-chip scaling: screen-band sharding over a device mesh.

The reference is single-GPU (SURVEY.md §2.4); this is the new TPU-native
scale-out design: the image is split into horizontal bands, one per device,
each device runs the FULL raster pipeline on its band, and outputs concatenate
over ICI. The trick that keeps the pipeline unmodified: each device applies a
post-projection band matrix that maps its NDC y-slice to the full [-1, 1]
range, so setup/binning/rasterize/resolve all see an ordinary
(H/n, W) viewport. Collectives: stats are psum-reduced; later passes (SPP
accumulation for the path tracer, SH reduction) ride the same mesh.

Works on the virtual CPU mesh for tests (SURVEY.md §4) and on real ICI.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels import raster as raster_mod
from ..renderer import frame as frame_mod


def band_projection(n_bands: int, band_index):
    """Post-projection matrix mapping band `band_index`'s NDC y-range to
    [-1, 1] (row-vector convention: clip' = clip @ J). Band 0 is the top of
    the image (NDC y near +1)."""
    t = (1.0 - n_bands + 2.0 * band_index).astype(jnp.float32)
    j = jnp.eye(4, dtype=jnp.float32)
    j = j.at[1, 1].set(float(n_bands))
    j = j.at[3, 1].set(t)
    return j


def make_mesh(n_devices: int = None, devices=None, axis: str = "band"):
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # Hosts that pre-register a TPU platform may still expose a
            # virtual CPU mesh (xla_force_host_platform_device_count);
            # fall back to it so multi-chip dry runs work anywhere.
            try:
                cpus = jax.devices("cpu")
                if len(cpus) >= n_devices:
                    devices = cpus
            except RuntimeError:
                pass
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def render_frame_sharded(scene, fc, *, config, params: raster_mod.RasterParams,
                         mesh: Mesh, axis: str = "band", probe=None,
                         env_brdf=None, history=None, scene_bvh=None):
    """Render with the image sharded into horizontal bands over `mesh`.

    params describes the FULL image; each device renders height/n rows.
    Returns the same dict as render_frame with 'color'/'vis'/'depth'/'hdr'
    assembled full-size (stats psum-reduced across devices).

    history: optional (H, W, 3) TAA accumulation, band-sharded like the
    image — the TAA fetch exchanges a 16-row history halo with neighbor
    bands over ICI (kernels/taa.py) so reprojection across band seams
    matches single-chip.
    scene_bvh: optional, replicated — enables ray-traced sun shadows/HBAO.
    """
    n = mesh.shape[axis]
    if params.height % (n * params.tile_h) != 0:
        raise ValueError(
            f"height {params.height} must divide into {n} bands of whole "
            f"{params.tile_h}-row tiles")
    on_tpu = all(d.platform == "tpu" for d in mesh.devices.ravel())
    band_params = raster_mod.RasterParams(
        width=params.width, height=params.height // n,
        tile_h=params.tile_h, tile_w=params.tile_w,
        pair_capacity=params.pair_capacity, bin_max_span=params.bin_max_span,
        big_tri_capacity=params.big_tri_capacity, chunk=params.chunk,
        interpret=(params.interpret if params.interpret is not None
                   else not on_tpu))
    has_history = history is not None
    has_bvh = scene_bvh is not None

    def body(scene, fc, probe, env_brdf, *rest):
        rest = list(rest)
        hist = rest.pop(0) if has_history else None
        bvh = rest.pop(0) if has_bvh else None
        idx = jax.lax.axis_index(axis)
        j = band_projection(n, idx)
        # inv(vp @ J) = inv(J) @ inv(vp); J is diagonal + one shear term.
        j_inv = jnp.eye(4, dtype=jnp.float32)
        j_inv = j_inv.at[1, 1].set(1.0 / n)
        j_inv = j_inv.at[3, 1].set(-j[3, 1] / n)
        fc_band = dataclasses.replace(
            fc, view_proj=fc.view_proj @ j,
            inv_view_proj=j_inv @ fc.inv_view_proj,
            prev_view_proj=fc.prev_view_proj @ j)
        out = frame_mod.render_frame(scene, fc_band, config=config,
                                     params=band_params, probe=probe,
                                     env_brdf=env_brdf, history=hist,
                                     scene_bvh=bvh, band_axis=axis,
                                     band_n=n)
        stats = {k: jax.lax.psum(v, axis) for k, v in out["stats"].items()}
        return dict(color=out["color"], tri=out["tri"], depth=out["depth"],
                    hdr=out["hdr"], accumulation=out["accumulation"],
                    stats=stats)

    out_specs = dict(color=P(axis), tri=P(axis), depth=P(axis), hdr=P(axis),
                     accumulation=P(axis), stats=P())
    in_specs = ((P(), P(), P(), P())
                + ((P(axis),) if has_history else ())
                + ((P(),) if has_bvh else ()))
    args = ((scene, fc, probe, env_brdf)
            + ((history,) if has_history else ())
            + ((scene_bvh,) if has_bvh else ()))
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return fn(*args)


@functools.lru_cache(maxsize=8)
def _sharded_jit(config, params, mesh, axis):
    # Cached so repeated frames reuse one traced program (a fresh jax.jit
    # wrapper per frame would re-trace the full sharded frame every call and
    # the multi-chip FPS metric would measure host retracing, not devices).
    return jax.jit(functools.partial(render_frame_sharded, config=config,
                                     params=params, mesh=mesh, axis=axis))


def render_frame_sharded_jit(scene, fc, config, params, mesh, axis="band",
                             probe=None, env_brdf=None, history=None,
                             scene_bvh=None):
    f = _sharded_jit(config, params, mesh, axis)
    return f(scene, fc, probe=probe, env_brdf=env_brdf, history=history,
             scene_bvh=scene_bvh)


def pathtrace_band_sharded(scene, bvh, fc, history, sample_index, *,
                           config, width: int, height: int, mesh: Mesh,
                           axis: str = "band", probe=None):
    """Pixel-band-sharded progressive path tracing: device i traces rows
    [i*H/n, (i+1)*H/n) of every sample, with FULL-frame pixel ids / CMJ
    patterns / NDC (trace_sample pixel_base + full_height), so the result
    is BIT-identical per sample to the single-device trace — rays are
    embarrassingly parallel, the only cross-band traffic is the counted-
    ray psum. sample_index may be a (S,) vector (batched wavefront).
    Returns dict(history, rays)."""
    from ..kernels import pathtrace
    from ..config import EnvSkyMode
    n_dev = mesh.shape[axis]
    if height % n_dev != 0:
        raise ValueError(f"height {height} must divide into {n_dev} bands")
    hb = height // n_dev

    def body(scene, bvh, fc, history_band, probe):
        idx = jax.lax.axis_index(axis)
        scene_b, fc_b, world_n_v, world_t_v = frame_mod.pathtrace_inputs(
            scene, fc)
        cur, rays = pathtrace.trace_sample(
            scene_b, bvh, world_n_v, world_t_v, fc_b, probe,
            jnp.asarray(sample_index, jnp.uint32), width, hb,
            sqrt_sample_count=int(np.sqrt(config.max_sample_count)),
            dynamic_sky=(config.env_sky_mode == EnvSkyMode.DYNAMIC_SKY),
            turbidity=config.turbidity,
            sky_rot3=fc.scene_rotation[:3, :3], sun_dir_world=fc.sun_dir,
            return_rays=True,
            pixel_base=idx.astype(jnp.uint32) * jnp.uint32(hb * width),
            full_height=height)
        first = jnp.asarray(sample_index, jnp.float32).reshape(-1)[0]
        new_hist = pathtrace.integrate(history_band, cur, first)
        return dict(history=new_hist, rays=jax.lax.psum(rays, axis))

    fn = shard_map(body, mesh=mesh, in_specs=(P(), P(), P(), P(axis), P()),
                   out_specs=dict(history=P(axis), rays=P()),
                   check_vma=False)
    return fn(scene, bvh, fc, history, probe)


@functools.lru_cache(maxsize=4)
def _pt_band_jit(config, width, height, mesh, axis):
    return jax.jit(functools.partial(
        pathtrace_band_sharded, config=config, width=width, height=height,
        mesh=mesh, axis=axis))


def pathtrace_band_sharded_jit(scene, bvh, fc, history, sample_index,
                               config, width, height, mesh, axis="band",
                               probe=None):
    f = _pt_band_jit(config, width, height, mesh, axis)
    return f(scene, bvh, fc, history, sample_index, probe=probe)


def pathtrace_spp_sharded(scene, bvh, fc, history, base_sample_index, *,
                          config, width: int, height: int, mesh: Mesh,
                          axis: str = "spp", probe=None):
    """SPP-sharded progressive path tracing: device i traces sample
    base + i for ALL pixels; the batch mean accumulates into the history
    with the reference's ((n-1)h + cur)/n rule generalized to n_dev samples
    per round. psum rides ICI (SURVEY §2.4's SPP-sharding design)."""
    from ..kernels import pathtrace
    from ..kernels import resolve as resolve_mod
    from ..config import EnvSkyMode
    n_dev = mesh.shape[axis]

    def body(scene, bvh, fc, history, probe):
        idx = jax.lax.axis_index(axis)
        scene_b, fc_b, world_n_v, world_t_v = frame_mod.pathtrace_inputs(
            scene, fc)
        cur = pathtrace.trace_sample(
            scene_b, bvh, world_n_v, world_t_v, fc_b, probe,
            jnp.asarray(base_sample_index, jnp.uint32) + idx.astype(
                jnp.uint32),
            width, height,
            sqrt_sample_count=int(np.sqrt(config.max_sample_count)),
            dynamic_sky=(config.env_sky_mode == EnvSkyMode.DYNAMIC_SKY),
            turbidity=config.turbidity,
            sky_rot3=fc.scene_rotation[:3, :3], sun_dir_world=fc.sun_dir)
        mean = jax.lax.pmean(cur, axis)
        n0 = jnp.asarray(base_sample_index, jnp.float32)
        new_hist = (history * n0 + mean * n_dev) / (n0 + n_dev)
        return new_hist

    fn = shard_map(body, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
                   out_specs=P(), check_vma=False)
    return fn(scene, bvh, fc, history, probe)
