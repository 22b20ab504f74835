"""Checkerboard half-rate gather helper (kernels/checker.py)."""

import numpy as np
import jax.numpy as jnp

from incarnation_tpu.kernels import checker


def _full(h, w, c=None):
    shape = (h, w) if c is None else (h, w, c)
    return jnp.asarray(
        np.random.default_rng(7).normal(size=shape).astype(np.float32))


def test_compact_picks_checkerboard_parity():
    a = _full(4, 8)
    an = np.asarray(a)
    for parity in (0, 1):
        c = np.asarray(checker.compact(parity, a))
        assert c.shape == (4, 4)
        for y in range(4):
            lane = (y + parity) & 1
            np.testing.assert_array_equal(c[y], an[y, lane::2])


def test_expand_keeps_gathered_and_fills_neighbors():
    a = _full(4, 8)
    for parity in (0, 1):
        half = checker.compact(parity, a)
        out = np.asarray(checker.expand(parity, half))
        an = np.asarray(a)
        for y in range(4):
            g = (y + parity) & 1
            # gathered pixels are exact
            np.testing.assert_array_equal(out[y, g::2], an[y, g::2])
            # skipped pixels are the mean of horizontal gathered neighbors
            # (edge-clamped)
            for x in range(1 - g, 8, 2):
                lo = an[y, max(x - 1, g)] if x - 1 < g else an[y, x - 1]
                hi = an[y, x + 1] if x + 1 < 8 else an[y, x - 1]
                np.testing.assert_allclose(out[y, x], 0.5 * (lo + hi),
                                           rtol=1e-6)


def test_expand_channels_roundtrip_constant():
    # a constant field survives checkerboarding exactly, channels included
    a = jnp.full((6, 10, 3), 2.5, jnp.float32)
    for parity in (0, 1):
        out = checker.expand(parity, checker.compact(parity, a))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(a))


def test_two_parity_average_is_horizontal_tent():
    # averaging both parities == convolving rows with [1/4, 1/2, 1/4]
    # (the TAA steady state of the alternating checkerboard), interior only
    a = _full(4, 16)
    an = np.asarray(a)
    avg = 0.5 * (np.asarray(checker.expand(0, checker.compact(0, a)))
                 + np.asarray(checker.expand(1, checker.compact(1, a))))
    tent = 0.25 * an[:, :-2] + 0.5 * an[:, 1:-1] + 0.25 * an[:, 2:]
    np.testing.assert_allclose(avg[:, 1:-1], tent, rtol=1e-5, atol=1e-6)


def _checker_frame_scene():
    from scene_util import make_scene
    positions = np.asarray(
        [[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10],
         [-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1]], np.float32)
    tris = np.asarray([[0, 2, 1], [0, 3, 2], [4, 6, 5], [4, 7, 6]], np.int32)
    normals = np.tile([0, 1, 0], (8, 1)).astype(np.float32)
    return make_scene(positions, tris, normals=normals, double_sided=True)


def test_checkerboard_frame_converges_close_to_full_rate():
    """A TAA loop with checkerboarded shadow/probe gathers stays close to
    the full-rate result (the steady state is a half-texel horizontal tent
    on those two terms only)."""
    from incarnation_tpu.config import Config
    from incarnation_tpu.core.view import View
    from incarnation_tpu.kernels import ibl, sky
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.utils.imageio import psnr

    scene = _checker_frame_scene()
    w, h = 128, 32
    params = RasterParams(width=w, height=h, pair_capacity=1 << 12,
                          bin_max_span=4, big_tri_capacity=16, chunk=8)
    view = View.from_lookat([0, 5, -14], [0, 0, 0], aspect=w / h)
    sun = np.asarray([0.3, 1.0, 0.2], np.float32)
    sun /= np.linalg.norm(sun)
    probe = ibl.build_probe(
        sky.sky_latlong(jnp.asarray(sun), 2.0, 32, 16), envmap_size=16)
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(32))

    def run(checkerboard):
        cfg = Config(sun_shadow_mode="map",
                     checkerboard_gathers=checkerboard)
        history = jnp.zeros((h, w, 3))
        prev_vp = None
        for i in range(6):
            fc = frame_mod.FrameConstants.make(
                view, cfg, sun_dir=sun,
                sun_color_intensity=[1, 1, 1, 50000.0],
                prev_view_proj=prev_vp, history_valid=(i > 0),
                frame_index=i, shadow_bounds=([0, 1, 0], 15.0))
            prev_vp = np.asarray(fc.view_proj)
            out = frame_mod.render_frame_jit(scene, fc, cfg, params,
                                             probe, env_brdf, history)
            history = out["accumulation"]
        return np.asarray(history)

    full = run(False)
    half = run(True)
    assert np.isfinite(half).all()
    p = psnr(half, full, peak=float(np.abs(full).max()))
    # Measured 33.1 dB on this 128x32 frame: the error is the expected
    # half-texel horizontal tent on the shadow/probe terms, and a tiny
    # frame is the worst case (shadow-edge pixels are a large fraction of
    # the image). The gate is a divergence alarm, not a quality target —
    # the 1080p golden gates cover quality.
    assert p > 32.0, f"checkerboard accumulation diverged: {p:.1f} dB"
