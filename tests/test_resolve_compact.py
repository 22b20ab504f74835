"""Coverage-compacted material resolve == full-screen resolve.

The decal pass and masked depth peels cover a sparse pixel set; their
material-stack gathers are compacted to the covered pixels
(resolve.resolve_gbuffer / masked_alpha coverage_capacity). Compaction must
be EXACT for covered pixels whenever the capacity holds them all — the
band-sharded frame relies on this for single-vs-multi-chip bit equality.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.core import mathutils as mu  # noqa: F401
from incarnation_tpu.kernels import resolve
from incarnation_tpu.scene import textures as tex_mod


class _Scene:
    """Minimal duck-typed scene: one 4x4 material with 3 mips."""

    def __init__(self, rng):
        size, nl = 4, 3
        n_tex = sum((size >> l) ** 2 for l in range(nl))
        flat = rng.integers(0, 2 ** 31, (n_tex, 4)).astype(np.uint32)
        meta = np.array([[0, size, nl, tex_mod.ADDRESS_WRAP]], np.int32)
        self.mat_stack = tex_mod.make_material_stack(flat, meta)
        self.mat_params = jnp.asarray(
            rng.random((1, 16)).astype(np.float32))


@pytest.fixture
def setup():
    rng = np.random.default_rng(11)
    scene = _Scene(rng)
    h, w = 8, 16
    tri = np.full((h, w), -1, np.int32)
    tri[2:5, 3:9] = 7
    interp = (rng.random((16, h, w)).astype(np.float32)) * 0.5
    interp[9] = 0.0
    return scene, jnp.asarray(tri), jnp.asarray(interp), h, w


@pytest.mark.parametrize("stoch", [True, False])
def test_resolve_compact_matches_full(setup, stoch):
    scene, tri, interp, h, w = setup
    depth = jnp.full((h, w), 0.5)
    ivp = jnp.eye(4)
    kw = dict(mip_dither=3, uv_dither=True) if stoch else {}
    full = resolve.resolve_gbuffer(tri, depth, scene, interp, ivp, w, h,
                                   **kw)
    comp = resolve.resolve_gbuffer(tri, depth, scene, interp, ivp, w, h,
                                   coverage_capacity=32, **kw)
    for f in full._fields:
        np.testing.assert_allclose(np.asarray(getattr(full, f)),
                                   np.asarray(getattr(comp, f)),
                                   atol=1e-6, err_msg=f)


def test_masked_alpha_compact_matches_full(setup):
    scene, tri, interp, h, w = setup
    a1, t1 = resolve.masked_alpha(scene, tri, interp, mip_dither=3,
                                  uv_dither=True)
    a2, t2 = resolve.masked_alpha(scene, tri, interp, mip_dither=3,
                                  uv_dither=True, coverage_capacity=32)
    cov = np.asarray(tri) >= 0
    np.testing.assert_array_equal(np.where(cov, np.asarray(a1), 0.0),
                                  np.where(cov, np.asarray(a2), 0.0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_resolve_compact_overflow_graceful(setup):
    # capacity 4 < 18 covered pixels: overflowing pixels degrade to
    # untextured (zero channels) but never NaN/garbage.
    scene, tri, interp, h, w = setup
    depth = jnp.full((h, w), 0.5)
    out = resolve.resolve_gbuffer(tri, depth, scene, interp, jnp.eye(4),
                                  w, h, coverage_capacity=4)
    for f in out._fields:
        assert np.isfinite(np.asarray(getattr(out, f))).all(), f


def test_chunk_compaction_multichunk_exact():
    # 16x256 = 32 chunks of 128 px; coverage in 3 chunks; capacity 8 holds
    # them all -> covered pixels bit-equal to the full-screen path.
    rng = np.random.default_rng(5)
    scene = _Scene(rng)
    h, w = 16, 256
    tri = np.full((h, w), -1, np.int32)
    tri[3:6, 10:40] = 2        # chunks 6, 8 (row 3..5 across lane rows)
    tri[12, 200:210] = 9
    interp = (rng.random((16, h, w)).astype(np.float32)) * 0.5
    interp[9] = 0.0
    tri, interp = jnp.asarray(tri), jnp.asarray(interp)
    a1, t1 = resolve.masked_alpha(scene, tri, interp, mip_dither=7,
                                  uv_dither=True)
    a2, t2 = resolve.masked_alpha(scene, tri, interp, mip_dither=7,
                                  uv_dither=True, coverage_capacity=8)
    cov = np.asarray(tri) >= 0
    np.testing.assert_array_equal(np.where(cov, np.asarray(a1), 0.0),
                                  np.where(cov, np.asarray(a2), 0.0))
    # inactive chunks read the fill (1.0 = pass), never garbage
    assert np.isfinite(np.asarray(a2)).all()
    ov = resolve.chunk_overflow(jnp.asarray(cov), 8)
    assert int(ov) == 0
    assert int(resolve.chunk_overflow(jnp.asarray(cov), 1)) > 0
