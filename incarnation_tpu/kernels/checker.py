"""Checkerboard half-rate gather: the index-count lever for full-screen
table fetches.

The honest frame's two dominant fusions are 2M-index gathers from <=2MB
tables (sun-shadow sample, RGBE specular probe). Measured physics
(tools/microbench.py, tools/checkerboard_bench.py): these are index-rate
bound (~4.7 cyc/idx for <=2MB tables, ~11 for HBM-size) INDEPENDENT of
index coherence and row width, so the only way to make one cheaper is to
issue FEWER indices. Checkerboarding gathers the half of the pixels whose
lane parity matches (row + frame) & 1 and fills the other half with the
mean of its two horizontal gathered neighbors (a [1/4, 1/2, 1/4] tent in
x for the filled pixels); with TAA alternating the parity every frame the
steady state is 1/2 true + 1/2 tent — a half-texel horizontal soften of
the gathered TERM only (shadow visibility / prefiltered-probe radiance,
both already stochastically filtered), for half the gather cost.
Measured: full 29.9 ms -> checker 15.1 ms on 2M indices (ratio 0.51,
identical for coherent and random indices).

The reference has no analogue (texture units filter for free); this is
the TPU-native stand-in for sub-rate shading, in the same family as the
stochastic mip/bilinear/PCF taps (kernels/skylight.py, shadow.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_parity(h: int, parity, extra_dims: int):
    """(H, 1[, 1...]) int32 — which lane of each x-pair is gathered."""
    rp = (jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
          + jnp.asarray(parity, jnp.int32)) & 1
    return rp.reshape((h, 1) + (1,) * extra_dims)


def compact(parity, a):
    """(H, W, ...) -> (H, W/2, ...): keep the checkerboard half whose lane
    parity == (row + parity) & 1. Cheap: one 2-element lane select."""
    h, w = a.shape[:2]
    assert w % 2 == 0, "checkerboard needs an even width"
    pairs = a.reshape((h, w // 2, 2) + a.shape[2:])
    rp = _row_parity(h, parity, pairs.ndim - 3)
    return jnp.take_along_axis(pairs, rp[:, :, None], axis=2)[:, :, 0]


def expand(parity, val):
    """(H, W/2, ...) gathered values -> (H, W, ...): gathered pixels keep
    their value; the missing parity gets the mean of its two horizontal
    gathered neighbors (edge-clamped at row ends)."""
    h, hw = val.shape[:2]
    right = jnp.concatenate([val[:, 1:], val[:, -1:]], axis=1)
    left = jnp.concatenate([val[:, :1], val[:, :-1]], axis=1)
    rp = _row_parity(h, parity, val.ndim - 2)
    # gathered lane g==0: missing odd pixel 2i+1 sits between val_i, val_{i+1}
    # gathered lane g==1: missing even pixel 2i sits between val_{i-1}, val_i
    fill = jnp.where(rp == 0, 0.5 * (val + right), 0.5 * (left + val))
    a = jnp.where(rp == 0, val, fill)
    b = jnp.where(rp == 0, fill, val)
    out = jnp.stack([a, b], axis=2)
    return out.reshape((h, hw * 2) + val.shape[2:])
