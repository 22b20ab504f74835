import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.core import View, mathutils as mu
from incarnation_tpu.kernels import raster
from scene_util import make_scene

W, H = 128, 64
PARAMS = raster.RasterParams(width=W, height=H, tile_h=16, tile_w=128,
                             pair_capacity=256, bin_max_span=4,
                             big_tri_capacity=16, chunk=8)
EYE4 = jnp.eye(4)


def run(scene, params=PARAMS, view=None):
    if view is None:
        view = View.default(aspect=W / H)
    vp = jnp.asarray(view.view_proj())
    tri, depth, clip, world, stats, _ = raster.render_visibility(
        scene, scene.vtx_mesh, EYE4, vp,
        jnp.ones(scene.prim_mesh.shape, bool), params)
    vis = raster.visibility_from_tri(tri, scene)
    return np.asarray(vis), np.asarray(depth), stats


def tri_facing_camera(z=5.0, scale=4.0):
    """A triangle at depth z facing the default camera (look +z).

    glTF front faces are CCW seen from the camera side; camera looks +z so
    the camera sees the -z side: wind CCW when viewed from -z.
    """
    return np.array([
        [-scale, -scale * 0.5, z],
        [scale, -scale * 0.5, z],
        [0.0, scale, z],
    ], np.float32)


def test_single_triangle_coverage_and_depth():
    scene = make_scene(tri_facing_camera(z=5.0), [[0, 1, 2]])
    vis, depth, _ = run(scene)
    cx, cy = W // 2, H // 2
    assert vis[cy, cx] == mu.encode_primitive_visibility(0, 0)
    # depth = near / view_z = 1/20 (camera at -15, tri at +5)
    np.testing.assert_allclose(depth[cy, cx], 1.0 / 20.0, rtol=1e-4)
    # corners uncovered
    assert vis[0, 0] == mu.VIS_CLEAR_INT32
    assert depth[0, 0] == 0.0
    # roughly the right number of pixels covered (triangle area in pixels)
    covered = (vis != mu.VIS_CLEAR_INT32).sum()
    assert 100 < covered < 2000


def test_closer_triangle_wins():
    p1 = tri_facing_camera(z=5.0)
    p2 = tri_facing_camera(z=2.0, scale=2.0)  # closer, smaller
    scene = make_scene(np.concatenate([p1, p2]), [[0, 1, 2], [3, 4, 5]])
    vis, depth, _ = run(scene)
    cy, cx = H // 2, W // 2
    assert vis[cy, cx] == mu.encode_primitive_visibility(0, 1)
    np.testing.assert_allclose(depth[cy, cx], 1.0 / 17.0, rtol=1e-4)


def test_backface_culled():
    p = tri_facing_camera()
    scene = make_scene(p, [[0, 2, 1]])  # reversed winding -> back face
    vis, _, _ = run(scene)
    assert (vis == mu.VIS_CLEAR_INT32).all()
    # ... but drawn when double-sided
    scene2 = make_scene(p, [[0, 2, 1]], double_sided=True)
    vis2, _, _ = run(scene2)
    assert (vis2 != mu.VIS_CLEAR_INT32).any()


def test_behind_camera_culled():
    scene = make_scene(tri_facing_camera(z=-30.0), [[0, 1, 2]])
    vis, _, stats = run(scene)
    assert (vis == mu.VIS_CLEAR_INT32).all()
    assert int(stats["culled_triangles"]) >= 1


def test_big_triangle_path():
    # A triangle covering most of the screen spans > bin_max_span tiles and
    # must be routed through the big-triangle list.
    scene = make_scene(tri_facing_camera(z=5.0, scale=40.0), [[0, 1, 2]])
    vis, _, stats = run(scene)
    assert vis[H // 2, W // 2] == mu.encode_primitive_visibility(0, 0)
    assert int(stats["big_overflow"]) == 0


def test_visibility_id_uses_prim_local_triangle():
    p1 = tri_facing_camera(z=5.0)
    p2 = tri_facing_camera(z=2.0, scale=2.0)
    scene = make_scene(
        np.concatenate([p1, p2]), [[0, 1, 2], [3, 4, 5]],
        tri_prim=np.array([0, 1], np.int32), num_prims=2,
        prim_tri_offset=np.array([0, 1], np.int32))
    vis, _, _ = run(scene)
    # center pixel: prim 1, local triangle 0
    assert vis[H // 2, W // 2] == mu.encode_primitive_visibility(1, 0)


def test_adjacent_triangles_no_gap():
    # A quad split into two triangles must leave no seam pixels.
    q = np.array([[-4, -4, 5], [4, -4, 5], [4, 4, 5], [-4, 4, 5]], np.float32)
    scene = make_scene(q, [[0, 1, 2], [0, 2, 3]])
    vis, _, _ = run(scene)
    interior = vis[H // 2 - 10:H // 2 + 10, W // 2 - 10:W // 2 + 10]
    assert (interior != mu.VIS_CLEAR_INT32).all()


# ---------------------------------------------------------------------------
# Near-plane handling: crossing triangles rasterize unclipped (2DH edge
# forms + full-screen bbox via the big list); the kernel's z <= 1 bound is
# the near clip; fully-behind triangles are culled.
# ---------------------------------------------------------------------------

def test_near_crossing_triangle_rasters():
    # Camera sits at z=-15 (View.default); one vertex is BEHIND the eye.
    pts = np.array([
        [0.0, 2.0, -15.5],     # behind the camera
        [-6.0, -1.0, 5.0],
        [6.0, -1.0, 5.0],
    ], np.float32)
    scene = make_scene(pts, [[0, 1, 2]])
    vis, depth, stats = run(scene)
    covered = (vis != mu.VIS_CLEAR_INT32).sum()
    assert covered > 50, "crossing triangle must still rasterize"
    assert int(stats["culled_triangles"]) == 0
    # The visible part lies in front of the near plane: depth in (0, 1].
    d = depth[vis != mu.VIS_CLEAR_INT32]
    assert np.all(d > 0.0) and np.all(d <= 1.0)


def test_fully_behind_triangle_culled():
    pts = tri_facing_camera(z=5.0) - np.array([0, 0, 25.0], np.float32)
    scene = make_scene(pts, [[0, 1, 2]])
    vis, _, stats = run(scene)
    assert (vis != mu.VIS_CLEAR_INT32).sum() == 0
    assert int(stats["culled_triangles"]) == 1


def test_inside_near_plane_clipped():
    # Between the eye (z=-15) and the near plane (view z = 0.5 < near 1):
    # z_ndc = 2 > 1 everywhere -> the kernel's near bound discards it.
    scene = make_scene(tri_facing_camera(z=-14.5, scale=0.3), [[0, 1, 2]])
    vis, _, _ = run(scene)
    assert (vis != mu.VIS_CLEAR_INT32).sum() == 0


def _peel_scene(dup: bool = False):
    """Stacked triangles at distinct depths (plus an exact duplicate-depth
    triangle when dup=True — equal-z fragments collapse into one peel
    level)."""
    zs = [(2.0, 3.0), (4.0, 4.0)]
    if dup:
        zs.append((4.0, 4.0))
    zs += [(6.0, 5.0), (8.0, 6.0)]
    tris = np.concatenate([tri_facing_camera(z=z, scale=s) for z, s in zs])
    idx = [[3 * i, 3 * i + 1, 3 * i + 2] for i in range(len(zs))]
    return make_scene(tris, idx)


def test_sequential_depth_peels():
    """K z_limit-chained rasterize_tiles passes peel strictly decreasing
    reverse-Z depths, and EXACT equal-depth fragments collapse into one
    peel level (strict z < z_limit skips the tied twin) — the depth-peel
    semantics the masked/blend layers build on (ref:
    visibility-pass.hlsl:101-111 clip; a one-pass k-buffer variant was
    measured slower and deleted, r3 VERDICT item 7)."""
    for dup in (False, True):
        scene = _peel_scene(dup=dup)
        view = View.default(aspect=W / H)
        vp = jnp.asarray(view.view_proj())
        prep = raster.prepare_geometry(scene, EYE4, vp,
                                       jnp.ones(scene.prim_mesh.shape, bool),
                                       PARAMS)
        bins = raster.bin_triangles(prep.setup_t, prep.ids, prep.valid,
                                    prep.bbox, PARAMS, prep.attr_flat)
        zlim = jnp.full((H, W), 2.0, jnp.float32)
        cy, cx = H // 2, W // 2
        ds = []
        for k in range(3):
            s_tri, s_depth, _ = raster.rasterize_tiles(bins, PARAMS,
                                                       z_limit=zlim)
            assert int(np.asarray(s_tri)[cy, cx]) >= 0
            ds.append(float(np.asarray(s_depth)[cy, cx]))
            zlim = jnp.where(s_tri >= 0, s_depth, 0.0)
        # 4 distinct depths -> 3 strictly decreasing layers at the center;
        # with the duplicate, the tie consumed one level only
        assert ds[0] > ds[1] > ds[2] > 0
