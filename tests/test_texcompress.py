"""Block-compressed material stack codec (scene/textures.py).

The stack stores BC-style 4x4 blocks (2 B/texel core, 1.5 B/texel extras)
— matching the reference, whose textures are always BC-compressed (ref:
src/scene.cpp:1020-1155 Compress to BC1/BC3/BC5). These tests bound the
codec error and pin the exactness cases the frame relies on (flat blocks,
binary alpha masks, the un-quantized alpha mirror).
"""

import numpy as np
import jax.numpy as jnp

from incarnation_tpu.scene import textures as T


def _legacy_rows(size, levels, w0, w1, w2=0xFFFFFFFF, w3=0x0000FFFF):
    rows = []
    for lvl in range(levels):
        s = max(size >> lvl, 1)
        n = s * s
        rows.append(np.stack([
            np.broadcast_to(np.uint32(w0), (n,)),
            np.broadcast_to(np.uint32(w1), (n,)),
            np.broadcast_to(np.uint32(w2), (n,)),
            np.broadcast_to(np.uint32(w3), (n,))], -1))
    return np.concatenate(rows)


def test_flat_blocks_decode_to_565_u8_precision():
    """A constant-color block must decode to the color within the endpoint
    quantizer's step (5/6-bit for rgb, 8-bit elsewhere)."""
    size, levels = 8, 4
    flat = _legacy_rows(size, levels, 0x80FF40C0, 0xFF208060,
                        0x30FFFFFF, 0x0000C010)
    st = T.make_material_stack(
        flat, np.asarray([[0, size, levels, T.ADDRESS_WRAP]], np.int32))
    out = np.asarray(T.sample_material_stack(
        st, jnp.zeros((4,), jnp.int32), jnp.full((4, 2), 0.3),
        lod=jnp.full((4,), 1.2)))
    core = np.array([0xC0, 0x40, 0xFF, 0x80, 0x60, 0x80, 0x20, 0xFF]) / 255.0
    # rgb via 565 endpoints: worst step 1/31/2; the rest are exact u8
    assert np.abs(out[0, 0:3] - core[0:3]).max() <= 0.5 / 31 + 1e-6
    np.testing.assert_allclose(out[0, 3:8], core[3:8], atol=1e-6)
    extras = np.array([0xFF, 0xFF, 0xFF, 0x30, 0x10, 0xC0]) / 255.0
    assert np.abs(out[0, 8:11] - extras[0:3]).max() <= 0.5 / 31 + 1e-6
    np.testing.assert_allclose(out[0, 11:14], extras[3:6], atol=1e-6)


def test_gradient_error_bounded():
    """Worst-case per-texel error on a full-range gradient stays within
    BC1-grade bounds (2-bit ramp + 5-bit endpoints)."""
    s = 16
    g = np.linspace(0.0, 1.0, s * s).reshape(s, s)
    u8 = (g * 255).astype(np.uint32)
    w0 = u8 | (u8 << 8) | (u8 << 16) | (np.uint32(255) << 24)
    rows = [np.stack([w0.ravel(),
                      np.full(s * s, 0xFF208060, np.uint32),
                      np.full(s * s, 0xFFFFFFFF, np.uint32),
                      np.full(s * s, 0xFFFF, np.uint32)], -1)]
    for lvl in range(1, 5):
        sl = s >> lvl
        rows.append(np.tile(np.asarray(
            [[0x80808080, 0xFF208060, 0xFFFFFFFF, 0xFFFF]], np.uint32),
            (sl * sl, 1)))
    st = T.make_material_stack(
        np.concatenate(rows),
        np.asarray([[0, s, 5, T.ADDRESS_CLAMP]], np.int32))
    ys, xs = np.mgrid[0:s, 0:s]
    uv = jnp.asarray(np.stack([(xs + 0.5) / s, (ys + 0.5) / s], -1)
                     .reshape(-1, 2))
    out = np.asarray(T.sample_material_stack(
        st, jnp.zeros((s * s,), jnp.int32), uv,
        lod=jnp.zeros((s * s,))))
    err = np.abs(out[:, 0] - g.ravel())
    assert err.max() < 0.05          # block ramp + endpoint rounding
    assert err.mean() < 0.015


def test_alpha_mirror_exact_through_mips():
    """The alpha mirror is NOT block-quantized: a binary checkerboard mask
    reads back exactly, as the masked-peel cutoff tests require."""
    from incarnation_tpu.scene import testing as scn
    st = scn.checkerboard_alpha_stack(size=4)
    ys, xs = np.mgrid[0:4, 0:4]
    uv = jnp.asarray(np.stack([(xs + 0.5) / 4, (ys + 0.5) / 4], -1)
                     .reshape(-1, 2))
    a = np.asarray(T.sample_stack_alpha(
        st, jnp.zeros((16,), jnp.int32), uv, lod=jnp.zeros((16,))))
    expect = (((xs + ys) % 2)).astype(np.float32).ravel()
    np.testing.assert_allclose(a, expect, atol=1e-6)


def test_level_offset_blocks_walk():
    """_level_offset_blocks matches a direct per-level block count walk
    for every size the builder can produce."""
    for size in (4, 8, 16, 64, 256, 2048):
        levels = int(np.log2(size)) + 1
        acc = 0
        for lvl in range(levels + 1):
            got = int(T._level_offset_blocks(
                jnp.asarray(size), jnp.asarray(levels), jnp.asarray(lvl)))
            assert got == acc, (size, lvl, got, acc)
            if lvl < levels:
                s = max(size >> lvl, 1)
                acc += max(s // 4, 1) ** 2


def test_stochastic_point_matches_bilinear_expectation():
    """Mean of the jittered single-texel fetch over a jitter grid equals
    the 4-tap bilinear fetch of the SAME compressed storage (the TAA
    convergence contract is against storage, not against the source
    image)."""
    rng = np.random.default_rng(3)
    s = 8
    u8 = rng.integers(0, 256, (s * s,), dtype=np.uint32)
    w0 = u8 | (u8 << 8) | (u8 << 16) | (np.uint32(255) << 24)
    flat = np.stack([w0, np.full(s * s, 0xFF208060, np.uint32),
                     np.full(s * s, 0xFFFFFFFF, np.uint32),
                     np.full(s * s, 0xFFFF, np.uint32)], -1)
    st = T.make_material_stack(
        flat, np.asarray([[0, s, 1, T.ADDRESS_WRAP]], np.int32))
    # bilinear fracs (0.5, 0.75) align exactly with the 16-point jitter
    # grid below, so the grid mean IS the expectation (no grid residual)
    uv = jnp.asarray([[0.375, 0.65625]])
    exact = np.asarray(T.sample_material_stack(
        st, jnp.zeros((1,), jnp.int32), uv, lod=jnp.zeros((1,))))[0]
    n = 16
    acc = np.zeros_like(exact)
    for i in range(n):
        for j in range(n):
            jit = jnp.asarray([[(i + 0.5) / n, (j + 0.5) / n]])
            acc += np.asarray(T.sample_material_stack(
                st, jnp.zeros((1,), jnp.int32), uv, lod=jnp.zeros((1,)),
                jitter=jit))[0]
    np.testing.assert_allclose(acc / (n * n), exact, atol=2e-3)
