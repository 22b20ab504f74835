"""Temporal anti-aliasing resolve.

Port of the reference's TAA (ref: shaders/postprocess/taa-resolve.hlsl +
render-jobs/taa-resolve.inl): depth-based reprojection through
invViewProj x prevViewProj, bilinear history fetch, 3x3 neighborhood clamp,
luminance-weighted 0.1/0.9 blend; the camera is jittered by Halton(2,3)
sub-pixel offsets (ref: src/renderer.cpp:126-132, 1625-1631).

The history fetch is the TPU-hostile part: 2M bilinear reads of the 25 MB
history buffer cost ~36 ms as XLA gathers. The default path is therefore a
Pallas kernel: each screen tile DMAs a bounded history neighborhood
(±16 rows, ±1 tile of columns) into VMEM and evaluates the EXACT bilinear
fetch as two one-hot-weighted contractions on the MXU — zero per-pixel
random access. Displacements beyond the neighborhood clamp to its edge,
which the 3x3 color clamp then treats as a disocclusion (same behavior
class as the reference's clamp under fast motion). The jnp gather path
remains for small frames and as the conformance reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resolve import world_from_depth


def _bilinear_image(img, uv, width: int, height: int, jitter=None,
                    y_off: int = 0):
    """Bilinear sample of (H, W, C) at uv in [0,1]^2 (clamp address).

    jitter: optional (..., 2) uniforms — stochastic-bilinear single-texel
    fetch: ONE row gather instead of four, unbiased in expectation; the TAA
    accumulation realizes the filtered result. (Quad-packing the history was
    tried and is SLOWER here: the packed table is ~100 MB at 1080p and the
    gather becomes locality-bound.)

    y_off: img carries y_off extra rows above AND below the [0, height)
    viewport (the band-sharded history halo); row addressing extends into
    them instead of clamping at the viewport edge."""
    fx = uv[..., 0] * width - 0.5
    fy = uv[..., 1] * height - 0.5
    # Pad rows 3 -> 4 floats (16 B): the TPU gather fast path wants
    # 16-byte-aligned narrow rows; the pad is one cheap sequential copy.
    c = img.shape[-1]
    if c == 3:
        img = jnp.concatenate(
            [img, jnp.zeros_like(img[..., :1])], axis=-1)
    flat = img.reshape(-1, img.shape[-1])
    if jitter is not None:
        x = jnp.clip(jnp.floor(fx + jitter[..., 0]).astype(jnp.int32),
                     0, width - 1)
        y = jnp.clip(jnp.floor(fy + jitter[..., 1]).astype(jnp.int32),
                     -y_off, height - 1 + y_off)
        return flat[(y + y_off) * width + x][..., :c]
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0c = jnp.clip(x0, 0, width - 1)
    x1c = jnp.clip(x0 + 1, 0, width - 1)
    y0c = jnp.clip(y0, -y_off, height - 1 + y_off) + y_off
    y1c = jnp.clip(y0 + 1, -y_off, height - 1 + y_off) + y_off
    f = lambda y, x: flat[y * width + x]
    top = f(y0c, x0c) * (1 - tx) + f(y0c, x1c) * tx
    bot = f(y1c, x0c) * (1 - tx) + f(y1c, x1c) * tx
    return (top * (1 - ty) + bot * ty)[..., :c]


def _bilinear_const_shift(img, sx, sy, y_off: int = 0):
    """Bilinear fetch at pixel + (sx, sy), a constant (traced-scalar)
    subpixel shift with edge clamp — the static-camera TAA reprojection
    (see taa_resolve). |sx|, |sy| <= 3 (caller-gated). img carries y_off
    extra halo rows above and below the viewport (band-sharded history)."""
    h, w = img.shape[0] - 2 * y_off, img.shape[1]
    ix = jnp.floor(sx).astype(jnp.int32)
    iy = jnp.floor(sy).astype(jnp.int32)
    tx = sx - ix.astype(jnp.float32)
    ty = sy - iy.astype(jnp.float32)
    pad = 4
    padded = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    out_shape = (h, w, img.shape[2])

    def g(dy, dx):
        return jax.lax.dynamic_slice(
            padded, (pad + y_off + iy + dy, pad + ix + dx, 0), out_shape)

    top = g(0, 0) * (1 - tx) + g(0, 1) * tx
    bot = g(1, 0) * (1 - tx) + g(1, 1) * tx
    return top * (1 - ty) + bot * ty


_TILE_H = 16
_TILE_W = 128
_MARGIN_Y = 16          # vertical reprojection reach (rows)
_BLOCK_R = _TILE_H + 2 * _MARGIN_Y
_BLOCK_C = 3 * _TILE_W  # horizontal reach: +-1 tile of columns


def _taa_fetch_kernel(m_ref, hist_hbm, depth_ref, out_ref, scratch, sem,
                      *, width: int, height: int, y_off: int):
    """Per-tile reprojected bilinear history fetch (see module docstring).

    hist_hbm: (3, H + 2*y_off, W) channel-first history (HBM); y_off extra
    rows above/below are the band-sharded halo. out: (3, th, tw) tile.
    m_ref: (4, 4) combined ndc->prev-clip matrix (inv_view_proj @
    prev_view_proj — the per-pixel world division cancels projectively).
    """
    th, tw = _TILE_H, _TILE_W
    n = th * tw
    ti = pl.program_id(0)
    tiles_x = width // tw
    ty = ti // tiles_x
    tx = ti - ty * tiles_x
    hist_rows = height + 2 * y_off

    # All three clip candidates are multiples of 8 / 128 (th, W, H are
    # gated multiples; y_off is 0 or _MARGIN_Y, both multiples of 8) —
    # the hint lets Mosaic prove the DMA tile alignment.
    block_y0 = pl.multiple_of(
        jnp.clip(ty * th - _MARGIN_Y + y_off, 0, hist_rows - _BLOCK_R), 8)
    block_x0 = pl.multiple_of(
        jnp.clip((tx - 1) * tw, 0, width - _BLOCK_C), tw)
    dma = pltpu.make_async_copy(
        hist_hbm.at[:, pl.ds(block_y0, _BLOCK_R), pl.ds(block_x0, _BLOCK_C)],
        scratch, sem)
    dma.start()

    # Reprojected previous-frame pixel coordinates from this tile's depth.
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    py = pix // tw
    px = pix - py * tw
    xs = (px + tx * tw).astype(jnp.float32) + 0.5
    ys = (py + ty * th).astype(jnp.float32) + 0.5
    z = depth_ref[:, :].reshape(1, n)
    nx = 2.0 * xs / width - 1.0
    ny = -2.0 * ys / height + 1.0
    cx = nx * m_ref[0, 0] + ny * m_ref[1, 0] + z * m_ref[2, 0] + m_ref[3, 0]
    cy = nx * m_ref[0, 1] + ny * m_ref[1, 1] + z * m_ref[2, 1] + m_ref[3, 1]
    cw = nx * m_ref[0, 3] + ny * m_ref[1, 3] + z * m_ref[2, 3] + m_ref[3, 3]
    inv_w = jnp.where(jnp.abs(cw) > 1e-20, 1.0 / cw, 0.0)
    u = 0.5 * cx * inv_w + 0.5
    v = -0.5 * cy * inv_w + 0.5
    fx = u * width - 0.5
    fy = v * height - 0.5

    # Clamp the footprint into the resident block (and the screen).
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx_w = fx - x0.astype(jnp.float32)          # (1, n) bilinear fractions
    ty_w = fy - y0.astype(jnp.float32)
    x0l = jnp.clip(x0 - block_x0, 0, _BLOCK_C - 1)
    x1l = jnp.clip(x0 + 1 - block_x0, 0, _BLOCK_C - 1)
    y0l = jnp.clip(y0 + y_off - block_y0, 0, _BLOCK_R - 1)
    y1l = jnp.clip(y0 + 1 + y_off - block_y0, 0, _BLOCK_R - 1)

    # One-hot weighted selection matrices: rows pick history rows, columns
    # pick history columns; their product with the block IS the bilinear.
    riota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_R, n), 0)
    rowsel = (jnp.where(riota == y0l, 1.0 - ty_w, 0.0)
              + jnp.where(riota == y1l, ty_w, 0.0))       # (R, n)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_C, n), 0)
    colsel = (jnp.where(ciota == x0l, 1.0 - tx_w, 0.0)
              + jnp.where(ciota == x1l, tx_w, 0.0))       # (C, n)

    dma.wait()
    # bf16 contraction, f32 accumulate: the history block rides in bf16
    # (more mantissa than the reference's R11G11B10F storage) and the MXU
    # runs ~4x the f32 rate; the 0/1-weighted selection matrices keep the
    # fractional weights to bf16 precision (~0.4% subpixel error, inside
    # the 3x3 clamp's tolerance).
    rowsel16 = rowsel.astype(jnp.bfloat16)
    for ch in range(3):
        b = scratch[ch]                                   # (R, C) bf16
        m1 = jax.lax.dot_general(
            b, rowsel16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (C, n)
        out = jnp.sum(m1 * colsel, axis=0, keepdims=True)  # (1, n)
        out_ref[ch, :, :] = out.reshape(th, tw)


def _history_fetch_pallas(history, depth, m, width: int, height: int,
                          interpret: bool, y_off: int = 0):
    """history (H + 2*y_off, W, 3) -> reprojected bilinear fetch (H, W, 3).

    y_off: extra halo rows above/below the viewport (band-sharded history);
    must be 0 or _MARGIN_Y (a multiple of 8 for the DMA alignment hint)."""
    hist_cf = jnp.transpose(history, (2, 0, 1)).astype(jnp.bfloat16)
    tiles = (height // _TILE_H) * (width // _TILE_W)
    tiles_x = width // _TILE_W
    out = pl.pallas_call(
        functools.partial(_taa_fetch_kernel, width=width, height=height,
                          y_off=y_off),
        name="taa_history_fetch",
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((4, 4), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_TILE_H, _TILE_W),
                         lambda i: (i // tiles_x, i % tiles_x)),
        ],
        out_specs=pl.BlockSpec(
            (3, _TILE_H, _TILE_W),
            lambda i: (0, i // tiles_x, i % tiles_x)),
        out_shape=jax.ShapeDtypeStruct((3, height, width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, _BLOCK_R, _BLOCK_C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(m, hist_cf, depth)
    return jnp.transpose(out, (1, 2, 0))


def _neighborhood_minmax(img, halo_top=None, halo_bot=None):
    """3x3 min/max via shifted rolls (edge-clamped by padding).

    halo_top/halo_bot: optional (1, W, C) neighbor rows (band-sharded
    rendering exchanges them over ICI so the clamp matches single-chip
    across band boundaries)."""
    if halo_top is not None:
        padded = jnp.concatenate([halo_top, img, halo_bot], axis=0)
        padded = jnp.pad(padded, ((0, 0), (1, 1), (0, 0)), mode="edge")
    else:
        padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    mins = img
    maxs = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            s = padded[1 + dy:padded.shape[0] - 1 + dy,
                       1 + dx:padded.shape[1] - 1 + dx]
            mins = jnp.minimum(mins, s)
            maxs = jnp.maximum(maxs, s)
    return mins, maxs


def _luminance_weight(c):
    lum = (c[..., 0] * 0.299 + c[..., 1] * 0.587 + c[..., 2] * 0.114)
    return (1.0 / (1.0 + lum))[..., None]


def taa_resolve(current_hdr, history, depth, inv_view_proj, prev_view_proj,
                history_valid, width: int, height: int, dither=None,
                band_axis=None, band_n: int = 1):
    """-> new accumulation buffer (H, W, 3).

    history_valid: () bool/int — frame 0 passes current through
    (ref: taa-resolve.hlsl:101-104).
    dither: frame index enabling the stochastic single-texel history fetch
    (noise is bounded by the 3x3 neighborhood clamp and averaged out by the
    accumulation itself).
    band_axis/band_n: when rendering band-sharded over a mesh axis, the 3x3
    neighborhood clamp exchanges one halo row with each neighbor band over
    ICI (ppermute), and the history *fetch* exchanges a _MARGIN_Y-row
    history halo (matching the fetch kernel's reprojection reach) so a
    reprojection crossing a band seam reads the true neighbor-band history
    exactly like single-chip. Only displacements beyond _MARGIN_Y rows
    clamp (the same falloff the single-chip kernel has at its block edge).
    """
    from .raster import _should_interpret
    use_kernel = (dither is None and width % _TILE_W == 0
                  and height % _TILE_H == 0 and width >= _BLOCK_C
                  and height >= _BLOCK_R)

    y_off = 0
    if band_axis is not None and band_n > 1:
        # History halo: band i receives its upper neighbor's bottom margin
        # and lower neighbor's top margin over ICI; outermost bands
        # edge-replicate, matching the single-chip clamp at the image edge.
        # Clamped to the band height for tiny bands (the hermetic dryrun's
        # 8-row bands); the Pallas fetch path only engages at band heights
        # >= _BLOCK_R, where the clamp is inactive, so its y_off stays in
        # {0, _MARGIN_Y}.
        y_off = min(_MARGIN_Y, history.shape[0])
        idx = jax.lax.axis_index(band_axis)
        from_above = jax.lax.ppermute(
            history[-y_off:], band_axis,
            [(i, i + 1) for i in range(band_n - 1)])
        from_below = jax.lax.ppermute(
            history[:y_off], band_axis,
            [(i, i - 1) for i in range(1, band_n)])
        edge_top = jnp.broadcast_to(history[:1], (y_off,) + history.shape[1:])
        edge_bot = jnp.broadcast_to(history[-1:],
                                    (y_off,) + history.shape[1:])
        halo_above = jnp.where(idx == 0, edge_top, from_above)
        halo_below = jnp.where(idx == band_n - 1, edge_bot, from_below)
        history = jnp.concatenate([halo_above, history, halo_below], axis=0)
    if use_kernel:
        # Projectively, ndc -> world -> prev-clip collapses to one matrix:
        # the intermediate division by world w cancels in prev_ndc.
        # HIGHEST precision: TPU matmuls default to bf16, which puts ~1e-2
        # relative error in the combined matrix — enough to displace the
        # reprojection by pixels (and to defeat the static-shift detection).
        m = jnp.matmul(inv_view_proj, prev_view_proj,
                       precision=jax.lax.Precision.HIGHEST)

        # Static-camera fast path: when the camera is stationary and only
        # the TAA jitter changed, m is a pure NDC translation (the depth
        # dependence cancels), so the reprojected fetch is ONE constant
        # subpixel shift — four shifted reads instead of the per-tile DMA
        # kernel (~5.5 ms -> ~0.4 ms at 1080p). Chosen at runtime by
        # lax.cond so camera motion falls back to the exact kernel.
        mn = m / m[3, 3]
        # Thresholds sized so accepted error stays < 0.05 px at the screen
        # edge while tolerating f32 matrix-inversion noise. The z-column
        # entries (mn[2, *]) carry the largest f32 inversion noise (the
        # reverse-Z infinite projection has ~1e3 dynamic range); a static
        # camera measures |mn[2, 3]| ~ 1e-6, which perturbs prev_w by
        # < 1e-6 * z — far below a subpixel — so its bound matches the
        # other z-row entries (the former 1e-7 bound silently disabled
        # this path for every static-camera frame, ~5 ms/frame at 1080p).
        is_shift = ((jnp.abs(mn[0, 0] - 1.0) < 1e-6)
                    & (jnp.abs(mn[1, 1] - 1.0) < 1e-6)
                    & (jnp.abs(mn[0, 1]) < 1e-6) & (jnp.abs(mn[1, 0]) < 1e-6)
                    & (jnp.abs(mn[2, 0]) < 1e-5) & (jnp.abs(mn[2, 1]) < 1e-5)
                    & (jnp.abs(mn[0, 3]) < 1e-7) & (jnp.abs(mn[1, 3]) < 1e-7)
                    & (jnp.abs(mn[2, 3]) < 1e-5))
        # ndc translation -> pixel shift (u = 0.5x + 0.5, v = -0.5y + 0.5)
        sx = 0.5 * mn[3, 0] * width
        sy = -0.5 * mn[3, 1] * height
        small = (jnp.abs(sx) <= 3.0) & (jnp.abs(sy) <= 3.0)

        def fetch_shift(_):
            return _bilinear_const_shift(history, sx, sy, y_off=y_off)

        def fetch_kernel(_):
            return _history_fetch_pallas(history, depth, m, width, height,
                                         interpret=_should_interpret(),
                                         y_off=y_off)

        if _should_interpret():
            # interpret mode (CPU tests): cond would trace both branches on
            # every call; keep the kernel path deterministic there.
            prev_color = fetch_kernel(None)
        else:
            prev_color = jax.lax.cond(is_shift & small, fetch_shift,
                                      fetch_kernel, None)
    else:
        wp = world_from_depth(depth, inv_view_proj, width, height)
        prev_clip = jnp.matmul(
            jnp.concatenate([wp, jnp.ones_like(wp[..., :1])], -1),
            prev_view_proj, precision=jax.lax.Precision.HIGHEST)
        prev_ndc = prev_clip[..., :3] / jnp.where(
            jnp.abs(prev_clip[..., 3:]) > 1e-20, prev_clip[..., 3:], 1.0)
        prev_uv = jnp.stack([0.5 * prev_ndc[..., 0] + 0.5,
                             -0.5 * prev_ndc[..., 1] + 0.5], axis=-1)

        jitter = None
        if dither is not None:
            from .resolve import _frame_noise
            jitter = jnp.stack(
                [_frame_noise(depth.shape, dither, 2911329625),
                 _frame_noise(depth.shape, dither, 3042594569)], axis=-1)
        prev_color = _bilinear_image(history, prev_uv, width, height,
                                     jitter=jitter, y_off=y_off)
    halo_top = halo_bot = None
    if band_axis is not None and band_n > 1:
        idx = jax.lax.axis_index(band_axis)
        # band i's bottom row -> band i+1's top halo, and vice versa;
        # outermost bands edge-clamp like the single-chip pad.
        from_above = jax.lax.ppermute(
            current_hdr[-1:], band_axis,
            [(i, i + 1) for i in range(band_n - 1)])
        from_below = jax.lax.ppermute(
            current_hdr[:1], band_axis,
            [(i, i - 1) for i in range(1, band_n)])
        halo_top = jnp.where(idx == 0, current_hdr[:1], from_above)
        halo_bot = jnp.where(idx == band_n - 1, current_hdr[-1:],
                             from_below)
    mins, maxs = _neighborhood_minmax(current_hdr, halo_top, halo_bot)
    clamped = jnp.clip(prev_color, mins, maxs)

    w_cur = 0.1 * _luminance_weight(current_hdr)
    w_prev = 0.9 * _luminance_weight(clamped)
    blended = (current_hdr * w_cur + clamped * w_prev) / (w_cur + w_prev)

    return jnp.where(jnp.asarray(history_valid), blended, current_hdr)
