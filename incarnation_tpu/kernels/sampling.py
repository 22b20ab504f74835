"""Sampling primitives (ref: shaders/common/uniform-sampling.hlsli).

Exact jnp ports of the reference's correlated multi-jittered sampling
[Kensler 2013], concentric disk mapping, and cosine hemisphere sampling —
the path tracer's sample sequences match the reference bit-for-bit modulo
float rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu

_U = jnp.uint32


def _u32(x):
    return jnp.asarray(x).astype(_U)


def cmj_rand_float(i, p):
    """(ref: uniform-sampling.hlsli CMJ_RandFloat)."""
    i = _u32(i)
    p = _u32(p)
    i = i ^ p
    i = i ^ (i >> 17)
    i = i ^ (i >> 10)
    i = i * _U(0xb36534e5)
    i = i ^ (i >> 12)
    i = i ^ (i >> 21)
    i = i * _U(0x93fc4795)
    i = i ^ _U(0xdf6e307f)
    i = i ^ (i >> 17)
    i = i * (_U(1) | (p >> 18))
    return i.astype(jnp.float32) * np.float32(1.0 / 4294967808.0)


def _permute_round(i, p, w):
    i = i ^ p
    i = i * _U(0xe170893d)
    i = i ^ (p >> 16)
    i = i ^ ((i & w) >> 4)
    i = i ^ (p >> 8)
    i = i * _U(0x0929eb3f)
    i = i ^ (p >> 23)
    i = i ^ ((i & w) >> 1)
    i = i * (_U(1) | (p >> 27))
    i = i * _U(0x6935fa69)
    i = i ^ ((i & w) >> 11)
    i = i * _U(0x74dcb303)
    i = i ^ ((i & w) >> 2)
    i = i * _U(0x9e501cc3)
    i = i ^ ((i & w) >> 2)
    i = i * _U(0xc860a3df)
    i = i & w
    i = i ^ (i >> 5)
    return i


def cmj_permute(i, l: int, p):
    """Cycle-walking permutation (ref: CMJ_Permute); l is static."""
    w = l - 1
    for s in (1, 2, 4, 8, 16):
        w |= w >> s
    w = _U(w)
    i = _u32(i)
    p = _u32(p)
    l_u = _U(l)

    def cond(i):
        return jnp.any(i >= l_u)

    def body(i):
        return jnp.where(i >= l_u, _permute_round(i, p, w), i)

    i = _permute_round(i, p, w)
    i = jax.lax.while_loop(cond, body, i)
    return (i + p) % l_u


def cmj_sample2d(sample_idx, pattern, sqrt_n: int):
    """(ref: CorrelatedMultiJitteredSampling): sample in [0,1)^2."""
    n = sqrt_n * sqrt_n
    pattern = _u32(pattern)
    s = cmj_permute(sample_idx, n, pattern * _U(0x51633e2d))
    sx = cmj_permute(s % sqrt_n, sqrt_n, pattern * _U(0x68bc21eb))
    sy = cmj_permute(s // sqrt_n, sqrt_n, pattern * _U(0x02e5be93))
    jx = cmj_rand_float(s, pattern * _U(0x967a889b))
    jy = cmj_rand_float(s, pattern * _U(0x368cc8b7))
    x = (sx.astype(jnp.float32) + (sy.astype(jnp.float32) + jx) / sqrt_n) \
        / sqrt_n
    y = (s.astype(jnp.float32) + jy) / n
    return jnp.stack([x, y], axis=-1)


def concentric_sample_disk(u):
    """(ref: ConcentricSampleDisk). u: (..., 2) -> (..., 2)."""
    uo = 2.0 * u - 1.0
    x, y = uo[..., 0], uo[..., 1]
    zero = (jnp.abs(x) < 1e-12) & (jnp.abs(y) < 1e-12)
    x_dom = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(x_dom, x, y)
    safe_x = jnp.where(jnp.abs(x) > 1e-12, x, 1.0)
    safe_y = jnp.where(jnp.abs(y) > 1e-12, y, 1.0)
    theta = jnp.where(x_dom, (np.pi / 4) * (y / safe_x),
                      (np.pi / 2) - (np.pi / 4) * (x / safe_y))
    out = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
    return jnp.where(zero[..., None], 0.0, out)


def cosine_sample_hemisphere(u):
    """Malley's method (ref: CosineSampleHemisphere); z-up tangent space."""
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * mu.INV_PI
