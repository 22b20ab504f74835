import numpy as np
import jax
import jax.numpy as jnp
import pytest

from incarnation_tpu.kernels import ibl, sky


def test_cube_dir_roundtrip():
    for face in range(6):
        uv = np.random.default_rng(face).uniform(0.05, 0.95, (16, 2)) \
            .astype(np.float32)
        d = ibl.get_env_dir(face, jnp.asarray(uv))
        f2, uv2 = ibl.dir_to_face_uv(d)
        np.testing.assert_array_equal(np.asarray(f2), face)
        np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-5)


def test_latlong_to_cube_constant():
    ll = jnp.full((16, 32, 3), 2.5, jnp.float32)
    cube = ibl.latlong_to_cubemap(ll, 8)
    np.testing.assert_allclose(np.asarray(cube.level(0)), 2.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cube.level(3)), 2.5, atol=1e-5)


def test_cube_sample_trilinear():
    ll = jnp.full((16, 32, 3), 1.0, jnp.float32)
    cube = ibl.latlong_to_cubemap(ll, 8)
    d = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3))
                    .astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = ibl.sample_cube(cube, d, lod=jnp.full((64,), 1.3))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_sh_uniform_radiance_gives_pi_irradiance():
    # Constant radiance R: E(n) = pi * R for every normal.
    ll = jnp.full((64, 128, 3), 3.0, jnp.float32)
    c = ibl.sh_project_latlong(ll)
    n = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0],
                     [0.0, -0.7071, 0.7071]])
    e = np.asarray(ibl.sh_irradiance(n, c))
    np.testing.assert_allclose(e, 3.0 * np.pi, rtol=2e-2)


def test_sh_directional_lobe_peaks_at_source():
    # Radiance concentrated at +y: irradiance at n=+y >> n=-y.
    h, w = 64, 128
    vs = (np.arange(h) + 0.5) / h
    ll = np.zeros((h, w, 3), np.float32)
    ll[vs < 0.1] = 10.0  # top of latlong = straight up
    c = ibl.sh_project_latlong(jnp.asarray(ll))
    e_up = np.asarray(ibl.sh_irradiance(jnp.asarray([0.0, 1.0, 0.0]), c))
    e_dn = np.asarray(ibl.sh_irradiance(jnp.asarray([0.0, -1.0, 0.0]), c))
    assert e_up[0] > 5.0 * abs(e_dn[0])


def test_env_brdf_lut_properties():
    lut = np.asarray(ibl.env_brdf_lut(size=64, num_samples=256))
    assert lut.shape == (64, 64, 2)
    assert np.all(lut >= 0.0)
    # mid-range energy conservation (grazing NoV can exceed 1 — the
    # reference has the same artifact, see its FIXME at sky-lighting.hlsl:119)
    mid = lut[8:, 8:]
    assert np.all(mid[..., 0] + mid[..., 1] < 1.2)
    # Smooth surface, frontal view: A ~ 1, B ~ 0 (y axis is 1-roughness ->
    # row -1 is roughness ~ 0)
    a, b = lut[-1, 32]
    assert a > 0.9 and b < 0.1


def test_prefilter_constant_env():
    ll = jnp.full((16, 32, 3), 2.0, jnp.float32)
    cube = ibl.latlong_to_cubemap(ll, 16)
    pref = ibl.prefilter_cubemap(cube, 8, num_samples=64)
    for l in range(pref.num_levels):
        np.testing.assert_allclose(np.asarray(pref.level(l)), 2.0, rtol=1e-3)


def test_preetham_sky_sane():
    sun = jnp.asarray([0.0, 0.8, 0.6]) / jnp.linalg.norm(
        jnp.asarray([0.0, 0.8, 0.6]))
    dirs = jnp.asarray([
        [0.0, 1.0, 0.0],        # zenith
        [0.0, 0.77, 0.64],      # near sun
        [0.71, 0.71, 0.0],      # away from sun, same elevation
    ])
    rad = np.asarray(sky.sky_radiance(sun, dirs, turbidity=2.0))
    assert np.all(np.isfinite(rad))
    assert np.all(rad[:, 1] > 0)          # positive luminance-ish
    assert rad[1].sum() > rad[2].sum()    # brighter toward the sun


def test_sky_latlong_shape_and_scale():
    sun = jnp.asarray([0.577, 0.577, 0.577])
    img = np.asarray(sky.sky_latlong(sun, 2.0, 64, 32))
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img).all()


def test_env_brdf_fit_matches_lut():
    """The fitted analytic env-BRDF (config default) must track the
    integrated LUT over the practical domain (NoV >= 1/16; the fit's error
    concentrates in the extreme-grazing mirror corner, which the
    frame-level PSNR gate below covers)."""
    lut = np.asarray(ibl.env_brdf_lut(64, num_samples=1024))
    s = 64
    no_v = np.broadcast_to((np.arange(s) / s)[None, :], (s, s))
    rough = np.broadcast_to((1.0 - np.arange(s) / s)[:, None], (s, s))
    ab = np.asarray(ibl.env_brdf_approx(
        jnp.asarray(no_v, jnp.float32), jnp.asarray(rough, jnp.float32)))
    dom = no_v >= 1.0 / 16.0
    rel_a = (np.abs(ab[..., 0] - lut[..., 0])
             / np.maximum(lut[..., 0], 5e-2))[dom]
    rel_b = (np.abs(ab[..., 1] - lut[..., 1])
             / np.maximum(lut[..., 1], 5e-2))[dom]
    assert rel_a.max() < 0.04, rel_a.max()
    assert rel_b.max() < 0.04, rel_b.max()


def test_env_brdf_fit_frame_psnr_vs_lut():
    """Frame-level gate for the analytic env-BRDF default: a probe-lit
    frame rendered with the fitted analytic path must stay within tight
    PSNR of the LUT-gather path (sky_lighting's only difference)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from scene_util import make_scene
    from incarnation_tpu.config import Config, EnvSkyMode
    from incarnation_tpu.core import View
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.utils.imageio import psnr

    w, h = 128, 64
    params = RasterParams(width=w, height=h, tile_h=16, tile_w=128,
                          pair_capacity=256, bin_max_span=4,
                          big_tri_capacity=16, chunk=8)
    pts = np.array([[-5, -3, 6], [5, -3, 6], [0, 4, 6]], np.float32)
    scene = make_scene(pts, [[0, 1, 2]])
    # mixed roughness via material params: moderately glossy metal-ish
    import dataclasses
    mp = np.array(scene.mat_params)
    mp[0, 7] = 0.6   # metallic
    mp[0, 8] = 0.25  # roughness
    scene = dataclasses.replace(scene, mat_params=jnp.asarray(mp))
    latlong = np.tile(np.asarray([0.4, 0.5, 0.9], np.float32), (16, 32, 1))
    probe = ibl.build_probe(jnp.asarray(latlong), envmap_size=16)
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128, num_samples=1024))
    view = View.default(aspect=w / h)

    outs = {}
    for analytic in (False, True):
        cfg = Config(env_sky_mode=EnvSkyMode.ENVIRONMENT_MAP,
                     analytic_env_brdf=analytic)
        fc = frame_mod.FrameConstants.make(
            view, cfg, sun_dir=[0.3, 0.5, -1.0],
            sun_color_intensity=[1.0, 1.0, 1.0, 100.0])
        outs[analytic] = np.asarray(frame_mod.render_frame_jit(
            scene, fc, cfg, params, probe=probe,
            env_brdf=env_brdf)["color"]).astype(np.float32)
    p = psnr(outs[True] / 255.0, outs[False] / 255.0)
    assert p > 42.0, f"analytic env-BRDF frame PSNR vs LUT = {p:.1f} dB"


def test_stochastic_clearcoat_lobe_converges():
    """Under TAA dithering, sky_lighting samples ONE probe lobe per pixel
    (base w.p. 1-fc, clearcoat w.p. fc) instead of two full-screen probe
    gathers. The estimator must be unbiased: the mean over many frames must
    match the exact two-fetch path (dither=None) within MC error."""
    from incarnation_tpu.kernels import skylight
    from incarnation_tpu.kernels.resolve import GBuffer

    h, w = 16, 128
    rng = np.random.default_rng(3)
    # smooth synthetic probe (low-variance so MC converges fast)
    y = np.linspace(0.2, 1.0, 16)[:, None, None]
    latlong = np.broadcast_to(
        y * np.asarray([0.5, 0.7, 1.0]), (16, 32, 3)).astype(np.float32)
    probe = ibl.build_probe(jnp.asarray(latlong), envmap_size=16)

    n = np.zeros((h, w, 3), np.float32)
    n[..., 1] = 1.0
    v = rng.normal(size=(h, w, 3)).astype(np.float32)
    v[..., 1] = np.abs(v[..., 1]) + 0.5
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    gb = GBuffer(
        base_color=jnp.asarray(
            np.concatenate([rng.random((h, w, 3), np.float32) * 0.8,
                            np.ones((h, w, 1), np.float32)], -1)),
        normals=jnp.zeros((h, w, 2)),
        mrao=jnp.asarray(np.stack(
            [rng.random((h, w), np.float32),
             0.2 + 0.6 * rng.random((h, w)).astype(np.float32),
             np.ones((h, w), np.float32), np.zeros((h, w), np.float32)],
            -1)),
        emissive=jnp.zeros((h, w, 3)),
        mask=jnp.ones((h, w), bool),
        world_pos=jnp.zeros((h, w, 3)),
        uv=jnp.zeros((h, w, 2)),
        extras=jnp.asarray(np.stack(
            [np.zeros((h, w), np.float32),
             rng.random((h, w)).astype(np.float32),          # clearcoat
             0.1 + 0.5 * rng.random((h, w)).astype(np.float32)], -1)),
    )
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(64, num_samples=256))
    kw = dict(probe=probe, env_brdf=env_brdf, sky_brightness=1.0,
              diffuse_ibl=False, extras=jnp.asarray(gb.extras))
    exact = np.asarray(skylight.sky_lighting(
        gb, jnp.asarray(n), jnp.asarray(v), dither=None, **kw))

    import functools
    f = jax.jit(functools.partial(skylight.sky_lighting, **kw))
    acc = np.zeros_like(exact)
    frames = 192
    for i in range(frames):
        acc += np.asarray(f(gb, jnp.asarray(n), jnp.asarray(v), dither=i))
    mean = acc / frames
    # unbiasedness: mean abs error well under the signal scale, and no
    # systematic offset
    scale = np.abs(exact).mean() + 1e-6
    assert np.abs(mean - exact).mean() / scale < 0.06, (
        np.abs(mean - exact).mean() / scale)
    assert abs((mean - exact).mean()) / scale < 0.02


def test_rgbe_roundtrip_relative_error():
    # The u32 RGBE probe table feeds the hot stochastic cube fetch; its
    # max-channel relative error must stay <= 0.4% over the HDR range the
    # Preetham probe produces (~1e-3 .. ~2e4).
    rng = np.random.default_rng(3)
    mags = 10.0 ** rng.uniform(-3, 4.5, (4096, 1))
    rgb = (rng.random((4096, 3)).astype(np.float32) * mags).astype(
        np.float32)
    dec = np.asarray(ibl.rgbe_decode(ibl.rgbe_encode(jnp.asarray(rgb))))
    m = rgb.max(axis=-1)
    rel = np.abs(dec.max(axis=-1) - m) / np.maximum(m, 1e-30)
    assert rel.max() < 0.004, rel.max()
    # zero encodes exactly
    z = np.asarray(ibl.rgbe_decode(ibl.rgbe_encode(jnp.zeros((1, 3)))))
    assert (z == 0).all()
    # stochastic cube fetch path decodes from the rgbe table bit-equal to
    # the f32 flat4 rows within encoding error
    cube = ibl.CubeMips.from_levels(
        [jnp.asarray(rng.random((6, 4, 4, 3)).astype(np.float32) * 100.0),
         jnp.asarray(rng.random((6, 2, 2, 3)).astype(np.float32)),
         jnp.asarray(rng.random((6, 1, 1, 3)).astype(np.float32))]
    ).with_packed()
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    jit = jnp.asarray(rng.random((64, 2)).astype(np.float32))
    got = np.asarray(ibl.sample_cube(cube, d, lod=jnp.zeros(64),
                                     single_mip=True, jitter=jit))
    import dataclasses
    cube_f32 = dataclasses.replace(cube, rgbe=None)
    want = np.asarray(ibl.sample_cube(cube_f32, d, lod=jnp.zeros(64),
                                      single_mip=True, jitter=jit))
    # shared-exponent: error bound is relative to the row's MAX channel
    bound = np.maximum(want.max(-1, keepdims=True) * 0.004, 1e-6)
    assert (np.abs(got - want) <= bound).all(), np.abs(got - want).max()
