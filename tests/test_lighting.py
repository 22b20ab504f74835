"""Clustered lighting + TAA tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.config import Config, EnvSkyMode
from incarnation_tpu.core import View
from incarnation_tpu.kernels import clustered, taa
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import frame as frame_mod
from incarnation_tpu.scene import lights as lights_mod
from scene_util import make_scene

W, H = 128, 64
PARAMS = RasterParams(width=W, height=H, tile_h=16, tile_w=128,
                      pair_capacity=256, bin_max_span=4, big_tri_capacity=16,
                      chunk=8)
CFG = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP)


def point_light_at(pos, intensity=5.0, rng=0.0):
    t = np.eye(4, dtype=np.float32)
    t[3, :3] = pos
    return lights_mod.build_light_table(
        [dict(type="point", color=[1, 1, 1], intensity=intensity,
              range=rng)], [t])


def quad_scene(lights=None):
    pts = np.array([[-6, -4, 5], [6, -4, 5], [6, 4, 5], [-6, 4, 5]],
                   np.float32)
    return make_scene(pts, [[0, 1, 2], [0, 2, 3]], lights=lights)


def render(scene, cfg=CFG):
    view = View.default(aspect=W / H)
    fc = frame_mod.FrameConstants.make(view, cfg)
    return frame_mod.render_frame_jit(scene, fc, cfg, PARAMS)


def test_point_light_illuminates_quad():
    # Light slightly camera-side of the quad center
    scene = quad_scene(lights=point_light_at([0.0, 0.0, 3.0],
                                             intensity=50.0))
    out = render(scene)
    color = np.asarray(out["color"]).astype(int)
    assert color[H // 2, W // 2].sum() > 20        # bright center
    assert color[H // 2, W // 2].sum() > 3 * color[5, 5].sum()
    assert "culled_lights" in out["stats"]


def test_cluster_grid_culls_far_light():
    # A tiny-range light far to the right only lights right-side clusters.
    cfg = CFG
    view = View.default(aspect=W / H)
    fc = frame_mod.FrameConstants.make(view, cfg)
    lights = point_light_at([30.0, 0.0, 5.0], intensity=1.0, rng=1.0)
    mask, culled = clustered.build_light_clusters(
        lights, cfg, fc.proj, fc.inv_view_proj, cfg.camera_near_plane)
    mask = np.asarray(mask)
    # some clusters culled it
    assert int(culled) > 0
    # but not every cluster (the ones containing the light keep it)...
    # light at x=30 with range 1 is outside the frustum entirely -> no
    # cluster should reference it
    assert mask.sum() == 0


def test_cluster_contains_in_frustum_light():
    cfg = CFG
    fc = frame_mod.FrameConstants.make(View.default(aspect=W / H), cfg)
    lights = point_light_at([0.0, 0.0, 5.0], intensity=1.0, rng=2.0)
    mask, _ = clustered.build_light_clusters(
        lights, cfg, fc.proj, fc.inv_view_proj, cfg.camera_near_plane)
    assert np.asarray(mask).sum() > 0


def test_pixel_cluster_id_slices():
    cfg = CFG
    near = cfg.camera_near_plane
    # view z == near -> slice 0; view z == depth extent -> last slice
    d_near = jnp.full((2, 2), 1.0)             # ndc depth 1 => z = near
    cid = clustered.pixel_cluster_id(d_near, cfg, near, 2, 2)
    assert int(np.asarray(cid).max()) < cfg.light_cluster_dim_x * \
        cfg.light_cluster_dim_y
    d_far = jnp.full((2, 2), near / cfg.cluster_depth_extent * 1.001)
    cid2 = clustered.pixel_cluster_id(d_far, cfg, near, 2, 2)
    gz = cfg.light_cluster_dim_z
    assert int(np.asarray(cid2).min()) >= (gz - 1) * \
        cfg.light_cluster_dim_x * cfg.light_cluster_dim_y


def test_taa_static_scene_converges():
    # Static camera, no jitter: TAA must be a near-identity fixed point.
    rng = np.random.default_rng(0)
    hdr = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    depth = jnp.full((H, W), 0.5, jnp.float32)
    fc = frame_mod.FrameConstants.make(View.default(aspect=W / H), CFG)
    out = taa.taa_resolve(hdr, hdr, depth, fc.inv_view_proj, fc.view_proj,
                          jnp.asarray(1.0), W, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(hdr), atol=2e-3)


def test_taa_first_frame_passthrough():
    hdr = jnp.ones((H, W, 3))
    hist = jnp.zeros((H, W, 3))
    depth = jnp.full((H, W), 0.5, jnp.float32)
    fc = frame_mod.FrameConstants.make(View.default(aspect=W / H), CFG)
    out = taa.taa_resolve(hdr, hist, depth, fc.inv_view_proj, fc.view_proj,
                          jnp.asarray(0.0), W, H)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(hdr))


def test_taa_rejects_stale_history():
    # History wildly different from the current neighborhood gets clamped.
    hdr = jnp.full((H, W, 3), 0.5)
    hist = jnp.full((H, W, 3), 100.0)
    depth = jnp.full((H, W), 0.5, jnp.float32)
    fc = frame_mod.FrameConstants.make(View.default(aspect=W / H), CFG)
    out = taa.taa_resolve(hdr, hist, depth, fc.inv_view_proj, fc.view_proj,
                          jnp.asarray(1.0), W, H)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_clustered_pallas_matches_dense():
    """The Pallas block-list clustered kernel must match the dense
    all-lights XLA loop (interpret mode on CPU). The Pallas path gates
    lights from the (xy-cell, light) z-bitmask table + in-kernel z slice
    (no per-pixel word gather), so this drives the full wrapper with a
    real cluster grid and a varying depth map."""
    import numpy as np
    from incarnation_tpu.kernels import resolve
    from incarnation_tpu.scene import lights as lights_mod

    # sized so every 32x128 block spans <= 2 cluster cells per axis
    # (the kernel's cell-selector requirement; _pallas_cells_ok)
    h, w = 288, 1024
    r = np.random.default_rng(3)
    defs, xforms = [], []
    for i in range(9):
        t = np.eye(4, dtype=np.float32)
        t[3, :3] = r.uniform(-6, 6, 3)
        kind = ["point", "spot", "point"][i % 3]
        d = {"type": kind, "intensity": float(r.uniform(5, 50)),
             "color": r.uniform(0.2, 1.0, 3).tolist()}
        if i % 2:
            d["range"] = float(r.uniform(2.0, 8.0))
        if kind == "spot":
            d["spot"] = {"innerConeAngle": 0.3, "outerConeAngle": 0.8}
        defs.append(d)
        xforms.append(t)
    lights = lights_mod.build_light_table(defs, xforms)

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    wp = r.uniform(-5, 5, (h, w, 3)).astype(np.float32)
    n = unit(r.normal(size=(h, w, 3))).astype(np.float32)
    v = unit(r.normal(size=(h, w, 3))).astype(np.float32)
    mask = r.random((h, w)) > 0.1
    gb = resolve.GBuffer(
        base_color=jnp.asarray(
            r.uniform(0, 1, (h, w, 4)).astype(np.float32)),
        normals=jnp.zeros((h, w, 2)),
        mrao=jnp.asarray(r.uniform(0.05, 1, (h, w, 4)).astype(np.float32)),
        emissive=jnp.zeros((h, w, 3)),
        mask=jnp.asarray(mask),
        world_pos=jnp.asarray(wp),
        uv=jnp.zeros((h, w, 2)),
        extras=jnp.zeros((h, w, 3)))
    cfg = CFG
    near = cfg.camera_near_plane
    fc = frame_mod.FrameConstants.make(View.default(aspect=w / h), cfg)
    cluster_mask, _ = clustered.build_light_clusters(
        lights, cfg, fc.proj, fc.inv_view_proj, near)
    # depth spanning several exponential z slices (reverse-Z in (0, 1])
    depth = jnp.asarray(
        r.uniform(0.02, 1.0, (h, w)).astype(np.float32))

    cid = clustered.pixel_cluster_id(depth, cfg, near, w, h)
    words = cluster_mask[cid]
    dense = clustered.clustered_lighting_dense(
        gb, jnp.asarray(n), jnp.asarray(v), words, lights)
    fast = clustered._clustered_lighting_pallas(
        gb, jnp.asarray(n), jnp.asarray(v), depth, cluster_mask, lights,
        cfg, near, w, h)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                               rtol=1e-4, atol=1e-3)
    # the production wrapper must route this frame shape to the kernel
    via_wrapper = clustered.clustered_lighting(
        gb, jnp.asarray(n), jnp.asarray(v), depth, lights, cluster_mask,
        cfg, near, w, h)
    np.testing.assert_array_equal(np.asarray(via_wrapper), np.asarray(fast))
