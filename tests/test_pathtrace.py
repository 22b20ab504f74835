"""Path tracer + sampling tests (tiny resolutions, CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.config import Config, EnvSkyMode
from incarnation_tpu.core import View
from incarnation_tpu.kernels import bvh as bvh_mod
from incarnation_tpu.kernels import ibl, pathtrace, sampling
from incarnation_tpu.renderer import frame as frame_mod
from incarnation_tpu.scene import lights as lights_mod
from scene_util import make_scene

W, H = 32, 16


def test_cmj_stratification():
    # 256 samples of one pattern must cover [0,1)^2 well (stratified).
    idx = jnp.arange(256, dtype=jnp.uint32)
    pts = np.asarray(sampling.cmj_sample2d(idx, jnp.uint32(7), 16))
    assert pts.shape == (256, 2)
    assert pts.min() >= 0.0 and pts.max() < 1.0
    # each of the 16 x-strata contains exactly 16 samples
    hist, _ = np.histogram(pts[:, 0], bins=16, range=(0, 1))
    assert (hist == 16).all()


def test_concentric_disk_in_unit_circle(rng):
    u = jnp.asarray(rng.uniform(0, 1, (512, 2)).astype(np.float32))
    d = np.asarray(sampling.concentric_sample_disk(u))
    assert (np.linalg.norm(d, axis=-1) <= 1.0 + 1e-5).all()


def test_cosine_hemisphere_distribution(rng):
    u = jnp.asarray(rng.uniform(0, 1, (4096, 2)).astype(np.float32))
    d = np.asarray(sampling.cosine_sample_hemisphere(u))
    assert (d[:, 2] >= 0).all()
    # mean cos(theta) of a cosine-weighted distribution is 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.03


def _pt_setup(lights=None, emissive=False):
    pts = np.array([[-6, -4, 5], [6, -4, 5], [6, 4, 5], [-6, 4, 5]],
                   np.float32)
    scene = make_scene(pts, [[0, 1, 2], [0, 2, 3]], lights=lights)
    if emissive:
        import dataclasses
        mp = np.array(scene.mat_params)
        mp[:, 0:3] = 0.001  # emissive factor (x20000 -> 20)
        scene = dataclasses.replace(scene, mat_params=jnp.asarray(mp))
    bvh = bvh_mod.build_scene_bvh(scene)
    cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP, max_sample_count=16)
    view = View.default(aspect=W / H)
    fc = frame_mod.FrameConstants.make(view, cfg)
    return scene, bvh, cfg, fc


def test_pathtrace_emissive_quad():
    scene, bvh, cfg, fc = _pt_setup(emissive=True)
    hist = jnp.zeros((H, W, 3))
    out = frame_mod.render_pathtrace_jit(scene, bvh, fc, hist,
                                         jnp.asarray(0, jnp.uint32),
                                         cfg, W, H)
    hdr = np.asarray(out["history"])
    # quad center pixels carry the emissive radiance (0.001*20000 = 20)
    assert hdr[H // 2, W // 2].mean() > 1.0
    assert np.isfinite(hdr).all()
    # background black (env mode without probe -> no sky)
    assert hdr[0, 0].mean() < 1e-3


def test_pathtrace_nee_point_light():
    scene, bvh, cfg, fc = _pt_setup(
        lights=_point_light([0.0, 0.0, 3.0], 50.0))
    hist = jnp.zeros((H, W, 3))
    out = frame_mod.render_pathtrace_jit(scene, bvh, fc, hist,
                                         jnp.asarray(0, jnp.uint32),
                                         cfg, W, H)
    hdr = np.asarray(out["history"])
    assert hdr[H // 2, W // 2].mean() > 1.0   # lit by NEE
    assert np.isfinite(hdr).all()


def _point_light(pos, intensity):
    t = np.eye(4, dtype=np.float32)
    t[3, :3] = pos
    return lights_mod.build_light_table(
        [dict(type="point", color=[1, 1, 1], intensity=intensity)], [t])


def test_progressive_integration_converges():
    h = jnp.zeros((4, 4, 3))
    vals = [jnp.full((4, 4, 3), v) for v in (1.0, 3.0, 5.0)]
    for i, v in enumerate(vals):
        h = pathtrace.integrate(h, v, jnp.asarray(float(i)))
    np.testing.assert_allclose(np.asarray(h), 3.0, atol=1e-5)


def test_pathtrace_deterministic():
    scene, bvh, cfg, fc = _pt_setup(emissive=True)
    hist = jnp.zeros((H, W, 3))
    a = frame_mod.render_pathtrace_jit(scene, bvh, fc, hist,
                                       jnp.asarray(0, jnp.uint32), cfg, W, H)
    b = frame_mod.render_pathtrace_jit(scene, bvh, fc, hist,
                                       jnp.asarray(0, jnp.uint32), cfg, W, H)
    np.testing.assert_array_equal(np.asarray(a["history"]),
                                  np.asarray(b["history"]))


def test_pathtrace_scene_rotation_matches_prerotated():
    """PT with scene_rotation R (rays inverse-rotated into the unrotated
    BVH) must match pre-rotating the mesh transforms and rebuilding the
    BVH (the reference's per-frame TLAS rebuild path)."""
    import dataclasses
    ang = 0.5
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, 0, -s, 0], [0, 1, 0, 0],
                    [s, 0, c, 0], [0, 0, 0, 1]], np.float32)

    pts = np.array([[-6, -4, 5], [6, -4, 5], [6, 4, 5], [-6, 4, 5]],
                   np.float32)
    scene = make_scene(pts, [[0, 1, 2], [0, 2, 3]])
    bvh = bvh_mod.build_scene_bvh(scene)
    cfg = Config(env_sky_mode=EnvSkyMode.DYNAMIC_SKY, max_sample_count=16)
    view = View.default(aspect=W / H)
    fc_rot = frame_mod.FrameConstants.make(view, cfg, scene_rotation=rot)
    out_a = frame_mod.render_pathtrace(
        scene, bvh, fc_rot, jnp.zeros((H, W, 3)), jnp.uint32(0),
        config=cfg, width=W, height=H)["history"]

    # ground truth: bake the rotation into the mesh transform + new BVH
    xf = np.asarray(scene.mesh_transforms)[0] @ rot
    scene2 = dataclasses.replace(
        scene, mesh_transforms=jnp.asarray(xf[None]))
    bvh2 = bvh_mod.build_scene_bvh(scene2)
    fc_id = frame_mod.FrameConstants.make(view, cfg)
    out_b = frame_mod.render_pathtrace(
        scene2, bvh2, fc_id, jnp.zeros((H, W, 3)), jnp.uint32(0),
        config=cfg, width=W, height=H)["history"]

    a, b = np.asarray(out_a), np.asarray(out_b)
    # identical sampling sequences -> near-bit-equal radiance
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2 * b.mean())


def test_pathtrace_checkpoint_resume_bit_identical(tmp_path):
    """Saving history + sample counter and resuming must reproduce the
    uninterrupted accumulation exactly (VERDICT r2 item 10; samples are
    keyed on their index so the stream is restartable)."""
    scene, bvh, cfg, fc = _pt_setup(emissive=True)

    def sample(history, s):
        out = frame_mod.render_pathtrace(
            scene, bvh, fc, history, jnp.asarray(s, jnp.uint32),
            config=cfg, width=W, height=H)
        return out["history"]

    straight = jnp.zeros((H, W, 3))
    for s in range(4):
        straight = sample(straight, s)

    half = jnp.zeros((H, W, 3))
    for s in range(2):
        half = sample(half, s)
    ck = tmp_path / "pt.npz"
    np.savez(ck, history=np.asarray(half), next_sample=2)
    loaded = np.load(ck)
    resumed = jnp.asarray(loaded["history"])
    for s in range(int(loaded["next_sample"]), 4):
        resumed = sample(resumed, s)

    np.testing.assert_array_equal(np.asarray(straight), np.asarray(resumed))
