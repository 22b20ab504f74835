"""Debug drawing: wireframe primitives and lines over the rendered frame.

The reference's FDebugDraw queues shape commands (cube/icosphere/sphere/
cylinder/cone/plane from content/debug/debug-primitives.gltf), expands them
to indirect draws in a compute shader, and ExecuteIndirects wireframes with
read-only GREATER_EQUAL depth (ref: src/renderer.cpp:724-1346,
shaders/debug-drawing/*). Shaders can self-append via reserved UAV slots.

TPU version: shape generators emit world-space line segments; segments are
projected, sampled parametrically, and splatted into the color image with a
depth test against the frame's depth buffer — one dense scatter instead of
indirect draws. Used by show_object_bounds / show_light_bounds
(ref: ui.cpp:584-630) and the picking highlight.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def box_edges(lo, hi):
    """AABB wireframe -> (12, 2, 3)."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    c = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                  [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                  [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                  [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]], np.float32)
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
         (0, 4), (1, 5), (2, 6), (3, 7)]
    return np.stack([c[list(p)] for p in e])


def sphere_edges(center, radius, segments: int = 24):
    """Three great circles -> (3 * segments, 2, 3)."""
    center = np.asarray(center, np.float32)
    t = np.linspace(0, 2 * np.pi, segments + 1)
    out = []
    for axes in [(0, 1), (0, 2), (1, 2)]:
        pts = np.zeros((segments + 1, 3), np.float32)
        pts[:, axes[0]] = np.cos(t)
        pts[:, axes[1]] = np.sin(t)
        pts = center + radius * pts
        out.append(np.stack([pts[:-1], pts[1:]], axis=1))
    return np.concatenate(out)


def draw_lines(color_u8, depth, segments, line_colors, view_proj,
               samples_per_segment: int = 128):
    """Splat line segments over the frame (GREATER_EQUAL read-only depth,
    matching the reference's debug-draw depth state).

    color_u8: (H, W, 3) uint8; depth: (H, W) reverse-Z; segments: (N, 2, 3);
    line_colors: (N, 3) float.
    """
    h, w = depth.shape
    seg = jnp.asarray(segments, jnp.float32)
    n = seg.shape[0]
    t = jnp.linspace(0.0, 1.0, samples_per_segment)
    pts = (seg[:, None, 0] * (1 - t[None, :, None])
           + seg[:, None, 1] * t[None, :, None])      # (N, S, 3)
    pts = pts.reshape(-1, 3)
    clipc = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])],
                            -1) @ view_proj
    wclip = clipc[:, 3]
    ok = wclip > 1e-3
    ndc = clipc[:, :3] / jnp.where(ok, wclip, 1.0)[:, None]
    px = ((ndc[:, 0] * 0.5 + 0.5) * w).astype(jnp.int32)
    py = ((-ndc[:, 1] * 0.5 + 0.5) * h).astype(jnp.int32)
    z = ndc[:, 2]
    inside = ok & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    # read-only GREATER_EQUAL depth test with small bias
    visible = inside & (z >= depth[pyc, pxc] - 1e-4)
    cols = jnp.repeat(jnp.asarray(line_colors, jnp.float32),
                      samples_per_segment, axis=0)
    cols_u8 = (jnp.clip(cols, 0, 1) * 255).astype(jnp.uint8)
    flat = color_u8.reshape(-1, 3)
    idx = jnp.where(visible, pyc * w + pxc, h * w)  # OOB drops
    return flat.at[idx].set(cols_u8, mode="drop").reshape(h, w, 3)


def scene_bounds_segments(scene, scene_rotation=None):
    """World-space wireframe spheres for every primitive's bounds
    (show_object_bounds; ref: ui.cpp:604-630 + debug-draw shapes)."""
    xf = np.asarray(scene.mesh_transforms)
    segs, cols = [], []
    m = scene.meta
    bs = np.asarray(scene.prim_bsphere)[:m.num_primitives]
    pm = np.asarray(scene.prim_mesh)[:m.num_primitives]
    for i in range(m.num_primitives):
        t = xf[pm[i]]
        c = bs[i, :3] @ t[:3, :3] + t[3, :3]
        scale = np.abs(t[:3, :3]).sum(axis=1).max()
        s = sphere_edges(c, bs[i, 3] * scale, segments=16)
        segs.append(s)
        cols.append(np.tile([1.0, 0.8, 0.1], (s.shape[0], 1)))
    return (np.concatenate(segs), np.concatenate(cols))


def light_bounds_segments(scene):
    """Green spheres at punctual lights (ref: light-culling.hlsl
    SHOW_LIGHT_BOUNDS debug path)."""
    lt = scene.lights
    n = int(np.asarray(lt.count))
    segs, cols = [], []
    for i in range(n):
        if int(np.asarray(lt.type[i])) == 0:   # directional
            continue
        pos = np.asarray(lt.transform[i])[3, :3]
        rng = float(np.asarray(lt.range[i])) or 4.0
        s = sphere_edges(pos, rng, segments=16)
        segs.append(s)
        cols.append(np.tile([0.0, 1.0, 0.0], (s.shape[0], 1)))
    if not segs:
        return None, None
    return np.concatenate(segs), np.concatenate(cols)
