import numpy as np
import jax.numpy as jnp

from incarnation_tpu.core import mathutils as mu
from incarnation_tpu.core.view import View


def test_vis_encoding_roundtrip():
    prim = np.array([0, 1, 7, 4095], np.int32)
    tri = np.array([0, 5, 1 << 19, (1 << 20) - 1], np.int32)
    enc = mu.encode_primitive_visibility(prim, tri)
    p2, t2 = mu.decode_primitive_visibility(enc)
    np.testing.assert_array_equal(np.asarray(p2), prim)
    np.testing.assert_array_equal(np.asarray(t2), tri)


def test_vis_clear_value():
    # 0xFFFFF000 decodes to primitive 0xFFF, triangle 0 — the same sentinel
    # the reference checks for (gbuffer-compute.hlsl:181).
    assert np.uint32(np.int32(mu.VIS_CLEAR_INT32)).item() == 0xFFFFF000


def test_oct_encode_roundtrip(rng):
    n = rng.normal(size=(1024, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dec = np.asarray(mu.oct_decode(mu.oct_encode(jnp.asarray(n))))
    # fp32 oct roundtrip should be extremely tight
    assert np.max(np.abs(dec - n)) < 1e-5


def test_projection_reverse_z():
    m = mu.perspective_reverse_z_infinite(0.25 * np.pi, 16 / 9, 1.0)
    # Point at the near plane along +z: ndc depth == 1
    p = np.array([0.0, 0.0, 1.0])
    clip = mu.transform_points_h(p, jnp.asarray(m))
    assert abs(float(clip[2] / clip[3]) - 1.0) < 1e-6
    # Far away: depth -> 0
    p = np.array([0.0, 0.0, 1e7])
    clip = mu.transform_points_h(p, jnp.asarray(m))
    assert float(clip[2] / clip[3]) < 1e-6
    # w == view z
    assert abs(float(clip[3]) - 1e7) < 1


def test_view_matrix_inverse_property():
    v = View.from_lookat([3.0, 4.0, -5.0], [0.0, 1.0, 0.0])
    m = v.view_transform()
    # camera position maps to origin
    p = mu.transform_points(np.asarray(v.position), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=1e-5)
    # look direction maps to +z
    d = np.asarray(mu.transform_vectors(np.asarray(v.look), jnp.asarray(m)))
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)


def test_default_camera_matches_reference():
    v = View.default()
    np.testing.assert_array_equal(v.position, [0, 0, -15])
    np.testing.assert_array_equal(v.look, [0, 0, 1])


def test_trs_order():
    # Row-vector convention: scale applies before translation.
    m = mu.trs_matrix(translation=[1, 2, 3], scale=[2, 2, 2])
    p = np.asarray(mu.transform_points(np.array([1.0, 0.0, 0.0]),
                                       jnp.asarray(m)))
    np.testing.assert_allclose(p, [3, 2, 3], atol=1e-6)


def test_quaternion_identity_and_90deg():
    m = mu.quaternion_to_matrix([0, 0, 0, 1])
    np.testing.assert_allclose(m, np.eye(4), atol=1e-7)
    # 90 deg about y: +x -> ... row-vector: p @ R
    s = np.sin(np.pi / 4)
    m = mu.quaternion_to_matrix([0, s, 0, np.cos(np.pi / 4)])
    p = np.asarray(mu.transform_vectors(np.array([1.0, 0, 0]),
                                        jnp.asarray(m)))
    np.testing.assert_allclose(p, [0, 0, -1], atol=1e-6)


def test_halton_jitter_table():
    t = mu.halton_jitter_table(16)
    assert t.shape == (16, 2)
    assert np.all(t >= -0.5) and np.all(t < 0.5)
    # Halton(1, 2) = 0.5 -> jitter 0.0
    assert abs(t[0, 0]) < 1e-7


def test_latlong_roundtrip(rng):
    uv = rng.uniform(0.05, 0.95, size=(256, 2)).astype(np.float32)
    d = mu.latlong_uv_to_direction(jnp.asarray(uv))
    uv2 = np.asarray(mu.direction_to_latlong_uv(d))
    np.testing.assert_allclose(uv2, uv, atol=1e-5)
