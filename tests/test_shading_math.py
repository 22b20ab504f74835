"""Numeric parity spot-checks of the BRDF/tonemap math vs the reference
formulas (ref: shaders/lighting/pbr.hlsli, lighting/common.hlsli)."""

import numpy as np
import jax.numpy as jnp

from incarnation_tpu.kernels import shading


def test_exposure_ev100():
    # 1 / (2^13 * 1.2)  (ref: pbr.hlsli:78-81, FConfig default EV100=13)
    assert abs(float(shading.exposure_from_ev100(13.0))
               - 1.0 / (2 ** 13 * 1.2)) < 1e-10


def test_aces_constants():
    # saturate((x(2.51x+0.03))/(x(2.43x+0.59)+0.14)) at x=0.5
    x = 0.5
    expected = (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)
    assert abs(float(shading.aces_film(jnp.asarray(x))) - expected) < 1e-6
    assert float(shading.aces_film(jnp.asarray(100.0))) == 1.0  # saturates


def test_ggx_distribution_values():
    # D(NoH=1, r) = a2 / max(pi * a2^2, 1e-4) with a2 = r^4 — including the
    # reference's denominator clamp (ref: bxdf-sampling.hlsli:25)
    for r in (0.25, 0.5, 1.0):
        a2 = (r * r) ** 2
        expected = a2 / max(np.pi * a2 * a2, 1e-4)
        got = float(shading.ggx_distribution(jnp.asarray(1.0),
                                             jnp.asarray(r)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_smith_correlated_matches_formula():
    no_v, no_l, r = 0.7, 0.4, 0.3
    a2 = r * r
    ggx_v = no_l * np.sqrt(no_v ** 2 * (1 - a2) + a2)
    ggx_l = no_v * np.sqrt(no_l ** 2 * (1 - a2) + a2)
    expected = 0.5 / (ggx_v + ggx_l)
    got = float(shading.g_smith_ggx_correlated(
        jnp.asarray(no_v), jnp.asarray(no_l), jnp.asarray(r)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_directional_scale_x100():
    # ref: lighting/common.hlsli:18
    out = np.asarray(shading.directional_light_radiance(
        jnp.asarray([1.0, 0.5, 0.25]), jnp.asarray(2.0)))
    np.testing.assert_allclose(out, [200.0, 100.0, 50.0])


def test_punctual_scale_x10000_and_attenuation():
    # point light, unbounded range: radiance = 1e4 * I * C / d^2
    import jax.numpy as jnp
    t = jnp.eye(4)
    t = t.at[3, :3].set(jnp.asarray([0.0, 0.0, 0.0]))
    wp = jnp.asarray([[0.0, 0.0, 2.0]])
    l, rad = shading.punctual_light(
        jnp.asarray(1), t, jnp.asarray([1.0, 1.0, 1.0]),
        jnp.asarray(3.0), jnp.asarray(0.0), jnp.asarray([0.0, 0.785]), wp)
    np.testing.assert_allclose(np.asarray(l[0]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rad[0]),
                               10000.0 * 3.0 / 4.0, rtol=1e-5)


def test_bounded_range_cutoff():
    # glTF windowed attenuation: zero beyond range
    import jax.numpy as jnp
    t = jnp.eye(4)
    wp = jnp.asarray([[0.0, 0.0, 5.0]])
    _, rad = shading.punctual_light(
        jnp.asarray(1), t, jnp.asarray([1.0, 1.0, 1.0]),
        jnp.asarray(1.0), jnp.asarray(4.0), jnp.asarray([0.0, 0.785]), wp)
    np.testing.assert_allclose(np.asarray(rad[0]), 0.0, atol=1e-6)


def test_transmission_removes_diffuse_energy():
    """albedo = (1-metallic)(1-transmission) basecolor
    (ref: forward-pass.hlsl:160)."""
    import jax.numpy as jnp
    from incarnation_tpu.kernels import shading
    n = jnp.asarray([[0.0, 0.0, -1.0]])
    v = jnp.asarray([[0.0, 0.0, -1.0]])
    l = jnp.asarray([[0.0, 0.0, -1.0]])
    base = jnp.asarray([[0.8, 0.8, 0.8]])
    m = jnp.asarray([0.0])
    r = jnp.asarray([1.0])          # pure-diffuse-ish
    rad = jnp.asarray([[1.0, 1.0, 1.0]])
    out0 = shading.brdf_response(base, m, r, n, v, l, rad,
                                 transmission=jnp.asarray([0.0]))
    out1 = shading.brdf_response(base, m, r, n, v, l, rad,
                                 transmission=jnp.asarray([1.0]))
    ref = shading.brdf_response(base, m, r, n, v, l, rad)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref), rtol=1e-6)
    # fully transmissive: the diffuse term vanishes, only specular remains
    assert float(out1.mean()) < float(out0.mean()) * 0.6


def test_clearcoat_lobe_adds_specular_and_attenuates_base():
    import jax.numpy as jnp
    from incarnation_tpu.kernels import shading
    n = jnp.asarray([[0.0, 0.0, -1.0]])
    v = jnp.asarray([[0.0, 0.0, -1.0]])
    # light near the mirror direction: the narrow coat lobe peaks there
    l = jnp.asarray([[0.0, 0.2, -0.98]])
    l = l / jnp.linalg.norm(l)
    base = jnp.asarray([[0.5, 0.1, 0.1]])
    m = jnp.asarray([0.0])
    r = jnp.asarray([0.8])
    rad = jnp.asarray([[1.0, 1.0, 1.0]])
    out_cc = shading.brdf_response(
        base, m, r, n, v, l, rad,
        clearcoat=jnp.asarray([1.0]), cc_roughness=jnp.asarray([0.2]))
    out_no = shading.brdf_response(base, m, r, n, v, l, rad)
    a, b = np.asarray(out_cc)[0], np.asarray(out_no)[0]
    # the coat highlight is achromatic: it raises the dim (green/blue)
    # channels relative to the red-tinted base response
    assert a[1] > b[1] and a[2] > b[2]
    # energy is not simply added: the base is attenuated by (1 - Fc)
    assert a[0] < b[0] + (a[1] - b[1]) + 1e-4
