"""HBIL-style ray-traced ambient occlusion + bent normals.

Port of the reference's HBAO pass (ref: shaders/postprocess/hbao.hlsl,
Mayaux HBIL): for each pixel, 4 azimuthal slices around the view direction;
per slice, the front and back horizon angles are found by a binary search of
up to 4 short occlusion rays (max length 1.0, 5-degree termination); AO and
bent normal integrate analytically from the horizon angles.

TPU-native: the binary search runs lock-step for all pixels (the trace count
is the static worst case 4 — the reference's early-exit threshold becomes a
"frozen interval" mask), each trace a batched any-hit BVH query.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu
from . import bvh as bvh_mod

NUM_SLICES = 4
MAX_TRACES_PER_SLICE = 4
TERMINATE_THRESHOLD = np.pi / 36.0
MAX_TRACE_LENGTH = 1.0


def _horizon_angle(bvh, start, origin, slice_x, slice_y, active):
    """Lock-step binary search (ref: hbao.hlsl ComputeHorizonAngle)."""
    lo = jnp.zeros_like(start)
    hi = start
    for _ in range(MAX_TRACES_PER_SLICE):
        searching = active & ((hi - lo) > TERMINATE_THRESHOLD)
        mid = lo + 0.5 * (hi - lo)
        d = (jnp.cos(mid)[..., None] * slice_y
             + jnp.sin(mid)[..., None] * slice_x)
        hit = bvh_mod.occluded(bvh, origin, d, tmin=0.1,
                               tmax=MAX_TRACE_LENGTH)
        hi = jnp.where(searching & hit, mid, hi)
        lo = jnp.where(searching & ~hit, mid, lo)
    return hi


def hbao(bvh, gb, depth, fc, width: int, height: int):
    """-> (ao (H, W) f32, bent_normals (H, W, 2) oct-encoded).

    Trace origins/directions are inverse-rotated into the BVH's unrotated
    world space (the TLAS-rebuild-per-rotation equivalent)."""
    r3 = fc.inv_scene_rotation[:3, :3]
    wp = gb.world_pos.reshape(-1, 3)
    n = mu.oct_decode(gb.normals).reshape(-1, 3)
    active = gb.mask.reshape(-1)

    at = mu.normalize(fc.eye - wp)
    right = mu.normalize(jnp.cross(at, fc.camera_up))
    up = jnp.cross(right, at)

    sum_ao = jnp.zeros(wp.shape[0])
    bent = jnp.zeros_like(wp)
    for i in range(NUM_SLICES):
        phi = i * (np.pi / NUM_SLICES)
        slice_x = np.cos(phi) * right + np.sin(phi) * up
        pn_x = jnp.sum(n * slice_x, -1)
        pn_y = jnp.sum(n * at, -1)
        t = -pn_x / jnp.where(jnp.abs(pn_y) > 1e-6, pn_y, 1e-6)
        start = jnp.arccos(jnp.clip(t / jnp.sqrt(1.0 + t * t), -1.0, 1.0))

        wp_b = wp @ r3 + fc.inv_scene_rotation[3, :3]
        th1 = _horizon_angle(bvh, start, wp_b, slice_x @ r3, at @ r3, active)
        th0 = -_horizon_angle(bvh, start, wp_b, -slice_x @ r3, at @ r3,
                              active)

        nx = 0.5 * (th1 - th0 + jnp.sin(th0) * jnp.cos(th0)
                    - jnp.sin(th1) * jnp.cos(th1))
        ny = 0.5 * (2.0 - jnp.cos(th0) ** 2 - jnp.cos(th1) ** 2)
        sum_ao = sum_ao + pn_x * nx + pn_y * ny
        bent = bent + mu.normalize(slice_x * nx[..., None]
                                   + at * ny[..., None])

    ao = jnp.clip(sum_ao / NUM_SLICES, 0.0, 1.0)
    ao = jnp.where(active, ao, 1.0)  # cleared to 1 when no geometry
    bent_n = mu.normalize(jnp.where(active[..., None], bent, n))
    return (ao.reshape(height, width),
            mu.oct_encode(bent_n).reshape(height, width, 2))
