"""Image-based lighting: split-sum precompute + environment probes.

TPU re-authoring of the reference's IBL chain:
- env BRDF LUT          (ref: image-based-lighting/split-sum-approx/
                         brdf-integration.hlsl, driven by renderer.cpp:169-245)
- lat-long -> cubemap   (ref: content-pipeline/cubemapgen.hlsl)
- GGX prefilter         (ref: split-sum-approx/prefilter.hlsl — pdf-based
                         source mip selection to kill fireflies)
- SH9 radiance encode   (ref: spherical-harmonics/{projection,
                         parallel-reduction,export}.hlsl — here a direct
                         integral over the lat-long, same quadrature)
- cube/probe sampling for the sky-lighting pass
  (ref: lighting/sky-lighting.hlsl)

Everything is jnp/vmapped (gather + elementwise — XLA fuses); probes are
precomputed once per environment change, matching the reference's
fence-swapped probe rebuild (ref: src/scene.cpp:1657-1784).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import mathutils as mu
from . import shading

# ---------------------------------------------------------------------------
# Sampling sequences (ref: shaders/common/uniform-sampling.hlsli)
# ---------------------------------------------------------------------------

def hammersley(n: int) -> np.ndarray:
    """(n, 2) Hammersley points (radical inverse base 2)."""
    i = np.arange(n, dtype=np.uint32)
    bits = i.copy()
    bits = ((bits << 16) | (bits >> 16)) & 0xFFFFFFFF
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    return np.stack([i / n, bits / 2 ** 32], axis=-1).astype(np.float32)


def sample_ggx(xi, roughness):
    """GGX half-vector sample in tangent space (z-up)
    (ref: common/bxdf-sampling.hlsli:29-43). xi: (..., 2)."""
    a = roughness * roughness
    phi = 2.0 * mu.PI * xi[..., 0]
    cos_t = jnp.sqrt((1.0 - xi[..., 1])
                     / (1.0 + (a * a - 1.0) * xi[..., 1]))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([sin_t * jnp.sin(phi), sin_t * jnp.cos(phi), cos_t],
                     axis=-1)


def tangent_to_world(n):
    """Tangent basis rows (T, B, N) (ref: common/math.hlsli:82-90)."""
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.999,
                   jnp.asarray([0.0, 0.0, 1.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    t = mu.normalize(jnp.cross(up, n))
    b = jnp.cross(n, t)
    return t, b


# ---------------------------------------------------------------------------
# Env BRDF LUT (split-sum second term)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("size", "num_samples"))
def env_brdf_lut(size: int = 512, num_samples: int = 1024):
    """(size, size, 2) A/B terms; y axis stores 1 - roughness
    (ref: brdf-integration.hlsl:38)."""
    xs = jnp.arange(size, dtype=jnp.float32)
    no_v = (xs / size)[None, :].repeat(size, 0)
    roughness = (1.0 - xs / size)[:, None].repeat(size, 1)
    v = jnp.stack([jnp.sqrt(jnp.maximum(1.0 - no_v * no_v, 0.0)),
                   jnp.zeros_like(no_v), no_v], axis=-1)
    xi = jnp.asarray(hammersley(num_samples))

    def body(i, acc):
        h = sample_ggx(xi[i], roughness)
        l = mu.normalize(2.0 * jnp.sum(v * h, -1, keepdims=True) * h - v)
        no_l = jnp.clip(l[..., 2], 0.0, 1.0)
        no_h = jnp.clip(h[..., 2], 0.0, 1.0)
        vo_h = jnp.clip(jnp.sum(v * h, -1), 0.0, 1.0)
        g = shading.g_smith_ibl(no_v, no_l, roughness)
        g_vis = g * vo_h / jnp.maximum(no_h * no_v, 1e-6)
        fc = (1.0 - vo_h) ** 5
        ok = (no_l > 0.0) & (no_v > 0.0)
        a = jnp.where(ok, (1.0 - fc) * g_vis, 0.0)
        b = jnp.where(ok, fc * g_vis, 0.0)
        return acc + jnp.stack([a, b], axis=-1)

    acc = jax.lax.fori_loop(0, num_samples, body,
                            jnp.zeros((size, size, 2), jnp.float32))
    return acc / num_samples


def quad_pack_image(img):
    """(H, W, C) -> (H*W, 4C): each row holds the texel and its clamped
    +x / +y / +xy neighbors, so a bilinear fetch is ONE row gather + lerp.
    Per-pixel random access is the scarce TPU resource; four narrow-row
    gathers of the same table cost ~4x one wide-row gather."""
    xp = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    yp = jnp.concatenate([img[1:], img[-1:]], axis=0)
    xyp = jnp.concatenate([yp[:, 1:], yp[:, -1:]], axis=1)
    return jnp.concatenate([img, xp, yp, xyp], axis=-1).reshape(
        -1, 4 * img.shape[-1])


def pack_env_brdf(lut):
    """(S, S, 2) env-BRDF LUT -> (S*S, 8) quad-packed rows (one-gather
    bilinear). The hot passes take this form; the raw LUT stays available
    for precompute/parity tests."""
    return quad_pack_image(lut)


def env_brdf_approx(no_v, roughness):
    """Analytic split-sum env-BRDF (A, B): 16x16 Chebyshev tensor fit of
    NoV*A / NoV*B from the reference integration (ref:
    brdf-integration.hlsl) divided back by NoV — the products are bounded
    while A/B spike ~10x at grazing. Replaces the per-pixel LUT gather
    (~3.8 ms at 1080p, one of three pixel-proportional gathers in the
    deferred frame) with VPU polynomial math. Accuracy vs a 1024-sample
    reference integration: A relative error <= 4.8% and B absolute error
    concentrated at the extreme-grazing mirror corner (NoV < 0.02 at
    roughness < 0.02); over the practically-lit domain the frame-level PSNR
    vs the LUT path gates this default (tests/test_ibl.py). Coefficients:
    ibl_fit_coeffs.py (tools/fit_env_brdf.py regenerates). The caller
    flips roughness to mimic the reference's inverted-row fetch quirk (see
    skylight.sky_lighting); the LUT path remains the bit-parity option."""
    from . import ibl_fit_coeffs as _fc
    nov = jnp.clip(no_v, 0.0, 1.0)
    r = jnp.clip(roughness, 0.0, 1.0)

    def cheb(t, n=16):
        ts = [jnp.ones_like(t), t]
        for _ in range(n - 2):
            ts.append(2.0 * t * ts[-1] - ts[-2])
        return ts

    def eval_tensor(coeffs, tu, tv):
        out = None
        for i, row in enumerate(coeffs):
            g = None
            for j, c in enumerate(row):
                if abs(c) < 1e-9:
                    continue
                term = c * tv[j]
                g = term if g is None else g + term
            if g is None:
                continue
            term = tu[i] * g
            out = term if out is None else out + term
        return out

    tu = cheb(2.0 * jnp.power(jnp.maximum(nov, 1e-8), 0.25) - 1.0)
    an = eval_tensor(_fc.CHEB_A, tu, cheb(2.0 * r - 1.0))
    bn = eval_tensor(_fc.CHEB_B, tu, cheb(2.0 * jnp.sqrt(r) - 1.0))
    inv = 1.0 / jnp.maximum(nov, 1.0 / 256.0)
    return jnp.stack([an * inv, bn * inv], axis=-1)


def sample_env_brdf(lut, no_v, roughness):
    """Bilinear LUT fetch with uv = (NoV, roughness); the texture's y axis
    stores 1-roughness, so v = roughness maps straight to the row
    (ref: sky-lighting.hlsl:122 samples float2(NoV, roughness)).

    lut: (S, S, 2) raw (4 gathers) or (S*S, 8) quad-packed (1 gather)."""
    packed = lut.ndim == 2
    size = int(round(np.sqrt(lut.shape[0]))) if packed else lut.shape[0]
    # clamp-address bilinear
    fx = jnp.clip(no_v, 0.0, 1.0) * size - 0.5
    fy = jnp.clip(roughness, 0.0, 1.0) * size - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, size - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, size - 1)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    if packed:
        rows = lut[y0 * size + x0]                    # (..., 8) ONE gather
        top = rows[..., 0:2] * (1 - tx) + rows[..., 2:4] * tx
        bot = rows[..., 4:6] * (1 - tx) + rows[..., 6:8] * tx
        return top * (1 - ty) + bot * ty
    x1 = jnp.minimum(x0 + 1, size - 1)
    y1 = jnp.minimum(y0 + 1, size - 1)
    flat = lut.reshape(-1, 2)
    g = lambda y, x: flat[y * size + x]
    top = g(y0, x0) * (1 - tx) + g(y0, x1) * tx
    bot = g(y1, x0) * (1 - tx) + g(y1, x1) * tx
    return top * (1 - ty) + bot * ty


# ---------------------------------------------------------------------------
# Cubemap: direction <-> face/uv (reference orientation, prefilter.hlsl:31-48)
# ---------------------------------------------------------------------------

def get_env_dir(face: int, uv):
    """Static face index + uv in [0,1]^2 -> unit direction (reference
    convention, ref: prefilter.hlsl:31-48 GetEnvDir)."""
    vx = 2.0 * uv[..., 0] - 1.0
    vy = -2.0 * uv[..., 1] + 1.0
    one = jnp.ones_like(vx)
    d = [
        lambda: jnp.stack([one, vy, -vx], -1),
        lambda: jnp.stack([-one, vy, vx], -1),
        lambda: jnp.stack([vx, one, -vy], -1),
        lambda: jnp.stack([vx, -one, vy], -1),
        lambda: jnp.stack([vx, vy, one], -1),
        lambda: jnp.stack([-vx, vy, -one], -1),
    ][face]()
    return mu.normalize(d)


def dir_to_face_uv(d):
    """Inverse of get_env_dir: (..., 3) -> (face (...,), uv (..., 2))."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # face selection
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(is_x, jnp.where(x >= 0, 0, 1),
                     jnp.where(is_y, jnp.where(y >= 0, 2, 3),
                               jnp.where(z >= 0, 4, 5)))
    s = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    s = jnp.maximum(s, 1e-12)
    # per-face (vx, vy)
    vx = jnp.where(face == 0, -z / s,
         jnp.where(face == 1, z / s,
         jnp.where(face == 2, x / s,
         jnp.where(face == 3, x / s,
         jnp.where(face == 4, x / s, -x / s)))))
    vy = jnp.where(face == 2, -z / s,
         jnp.where(face == 3, z / s, y / s))
    u = (vx + 1.0) * 0.5
    v = (1.0 - vy) * 0.5
    return face, jnp.stack([u, v], axis=-1)


@dataclasses.dataclass
class CubeMips:
    """Mip chain of (6, S_l, S_l, 3) float32 cube faces, flattened for
    dynamic-lod sampling (same trick as the texture atlas)."""
    flat: jnp.ndarray          # (total, 3)
    size: int
    num_levels: int
    bases: tuple
    packed: jnp.ndarray = None  # (total, 12) quad-packed rows (one-gather
    #                             bilinear in the hot passes); built lazily
    #                             by with_packed()
    flat4: jnp.ndarray = None   # (total, 4) 16-byte-padded texel rows — the
    #                             stochastic single-texel fetch path (16 B
    #                             row gathers hit the TPU gather fast path;
    #                             48 B quad rows cost ~2.2x per index)
    rgbe: jnp.ndarray = None    # (total,) u32 shared-exponent RGBE texels —
    #                             the HOT stochastic fetch path: full-screen
    #                             gathers are index-rate bound by TABLE SIZE
    #                             tier (measured tools/microbench.py: ~4.7
    #                             cyc/idx <= 2 MB, ~11 cyc/idx above); the
    #                             f32[*, 4] 128-cube mip stack is 2.1 MB
    #                             (just over the tier), the u32 table is
    #                             0.5 MB (24.2 -> ~10 ms per 2M-pixel fetch)

    @staticmethod
    def from_levels(levels):
        size = levels[0].shape[1]
        bases, chunks, off = [], [], 0
        for lv in levels:
            bases.append(off)
            c = lv.reshape(-1, 3)
            chunks.append(c)
            off += c.shape[0]
        return CubeMips(flat=jnp.concatenate(chunks, 0), size=size,
                        num_levels=len(levels), bases=tuple(bases))

    def level(self, l: int):
        s = self.size >> l
        return self.flat[self.bases[l]:self.bases[l] + 6 * s * s].reshape(
            6, s, s, 3)

    def with_packed(self) -> "CubeMips":
        """Build the quad-packed row table (texel + clamped +x/+y/+xy
        neighbors per row) so a bilinear cube fetch is ONE gather."""
        if self.packed is not None:
            return self
        packs = []
        for l in range(self.num_levels):
            lv = self.level(l)                        # (6, s, s, 3)
            xp = jnp.concatenate([lv[:, :, 1:], lv[:, :, -1:]], axis=2)
            yp = jnp.concatenate([lv[:, 1:], lv[:, -1:]], axis=1)
            xyp = jnp.concatenate([yp[:, :, 1:], yp[:, :, -1:]], axis=2)
            packs.append(jnp.concatenate([lv, xp, yp, xyp], -1)
                         .reshape(-1, 12))
        return dataclasses.replace(
            self, packed=jnp.concatenate(packs, 0),
            flat4=jnp.concatenate(
                [self.flat, jnp.zeros_like(self.flat[:, :1])], axis=-1),
            rgbe=rgbe_encode(self.flat))


def rgbe_encode(rgb):
    """(..., 3) f32 -> u32 shared-exponent RGBE (Ward): 8-bit mantissas +
    8-bit biased exponent. Relative error <= 0.4% on the max channel —
    inside the stochastic-filtering noise floor the TAA resolves."""
    m = jnp.max(rgb, axis=-1)
    e = jnp.where(m > 1e-32,
                  jnp.floor(jnp.log2(jnp.maximum(m, 1e-32))) + 1.0, -128.0)
    scale = jnp.exp2(-e)[..., None] * 256.0
    mant = jnp.clip(jnp.round(rgb * scale), 0, 255).astype(jnp.uint32)
    e8 = jnp.clip(e + 128.0, 0, 255).astype(jnp.uint32)
    return (mant[..., 0] | (mant[..., 1] << 8) | (mant[..., 2] << 16)
            | (e8 << 24))


def rgbe_decode(word):
    """u32 RGBE -> (..., 3) f32."""
    w = word.astype(jnp.uint32)
    scale = jnp.exp2(((w >> 24) & 0xFF).astype(jnp.float32) - 136.0)
    return jnp.stack([(w & 0xFF).astype(jnp.float32),
                      ((w >> 8) & 0xFF).astype(jnp.float32),
                      ((w >> 16) & 0xFF).astype(jnp.float32)],
                     axis=-1) * scale[..., None]


jax.tree_util.register_pytree_node(
    CubeMips,
    lambda c: ((c.flat, c.packed, c.flat4, c.rgbe),
               (c.size, c.num_levels, c.bases)),
    lambda aux, ch: CubeMips(ch[0], *aux, packed=ch[1], flat4=ch[2],
                             rgbe=ch[3]))


def _sample_cube_level(cube: CubeMips, base, s, d, jitter=None):
    """Bilinear sample one cube level at directions d (clamp at face edges;
    not seam-blended — the reference relies on HW seamless filtering).
    ONE gather when the quad-packed table exists, else four.

    jitter: (..., 2) uniforms — stochastic-bilinear single-texel fetch from
    the 16-byte flat4 rows (a third the gather bytes of the quad rows);
    the expectation over jitter equals the bilinear result, which the TAA
    accumulation realizes (same scheme as textures.sample_material_stack)."""
    face, uv = dir_to_face_uv(d)
    sf = s.astype(jnp.float32) if hasattr(s, "astype") else float(s)
    fx = uv[..., 0] * sf - 0.5
    fy = uv[..., 1] * sf - 0.5
    if jitter is not None and (cube.rgbe is not None
                               or cube.flat4 is not None):
        x = jnp.clip(jnp.floor(fx + jitter[..., 0]).astype(jnp.int32),
                     0, s - 1)
        y = jnp.clip(jnp.floor(fy + jitter[..., 1]).astype(jnp.int32),
                     0, s - 1)
        idx = base + (face * s + y) * s + x
        if cube.rgbe is not None:
            return rgbe_decode(cube.rgbe[idx])
        return cube.flat4[idx][..., :3]
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0c = jnp.clip(x0, 0, s - 1)
    y0c = jnp.clip(y0, 0, s - 1)

    if cube.packed is not None:
        rows = cube.packed[base + (face * s + y0c) * s + x0c]   # (..., 12)
        top = rows[..., 0:3] * (1 - tx) + rows[..., 3:6] * tx
        bot = rows[..., 6:9] * (1 - tx) + rows[..., 9:12] * tx
        return top * (1 - ty) + bot * ty

    x1c = jnp.clip(x0 + 1, 0, s - 1)
    y1c = jnp.clip(y0 + 1, 0, s - 1)

    def fetch(x, y):
        return cube.flat[base + (face * s + y) * s + x]

    top = fetch(x0c, y0c) * (1 - tx) + fetch(x1c, y0c) * tx
    bot = fetch(x0c, y1c) * (1 - tx) + fetch(x1c, y1c) * tx
    return top * (1 - ty) + bot * ty


def sample_cube(cube: CubeMips, d, lod=None, single_mip: bool = False,
                jitter=None):
    """Trilinear cube sample at float mip `lod` (None = level 0).

    single_mip: sample only floor(lod) — pair with a dithered lod + TAA
    (stochastic mip filtering) to halve the gathers.
    jitter: (..., 2) uniforms — additionally single-texel stochastic
    bilinear (see _sample_cube_level)."""
    if lod is None:
        return _sample_cube_level(cube, cube.bases[0], cube.size, d,
                                  jitter=jitter)
    bases = jnp.asarray(np.asarray(cube.bases, np.int32))
    sizes = jnp.asarray(np.asarray(
        [cube.size >> l for l in range(cube.num_levels)], np.int32))
    lod = jnp.clip(lod, 0.0, cube.num_levels - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    s0 = _sample_cube_level(cube, bases[l0], sizes[l0], d, jitter=jitter)
    if single_mip:
        return s0
    l1 = jnp.minimum(l0 + 1, cube.num_levels - 1)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    s1 = _sample_cube_level(cube, bases[l1], sizes[l1], d)
    return s0 * (1 - frac) + s1 * frac


# ---------------------------------------------------------------------------
# Lat-long -> cubemap (ref: content-pipeline/cubemapgen.hlsl)
# ---------------------------------------------------------------------------

def _latlong_mips(latlong, num_levels):
    mips = [latlong]
    cur = latlong
    for _ in range(num_levels - 1):
        h, w = cur.shape[:2]
        if h > 1 and w > 1:
            cur = 0.25 * (cur[0::2, 0::2] + cur[1::2, 0::2]
                          + cur[0::2, 1::2] + cur[1::2, 1::2])
        mips.append(cur)
    return mips


def _sample_latlong_bilinear(img, uv):
    h, w = img.shape[:2]
    fx = uv[..., 0] * w - 0.5
    fy = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0w = jnp.remainder(x0, w)        # wrap azimuth
    x1w = jnp.remainder(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    flat = img.reshape(-1, img.shape[-1])
    f = lambda y, x: flat[y * w + x]
    top = f(y0c, x0w) * (1 - tx) + f(y0c, x1w) * tx
    bot = f(y1c, x0w) * (1 - tx) + f(y1c, x1w) * tx
    return top * (1 - ty) + bot * ty


def latlong_to_cubemap(latlong, size: int) -> CubeMips:
    """Build the full cube mip chain; each cube mip samples the matching
    lat-long mip (ref: src/renderer.cpp:416-468 ConvertLatlong2Cubemap)."""
    num_levels = int(np.log2(size)) + 1
    ll_mips = _latlong_mips(latlong, num_levels)
    levels = []
    for l in range(num_levels):
        s = size >> l
        xs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        uv = jnp.stack(jnp.meshgrid(xs, xs, indexing="xy"), -1)  # (s, s, 2)
        faces = []
        for face in range(6):
            d = get_env_dir(face, uv)
            ll_uv = mu.direction_to_latlong_uv(d)
            faces.append(_sample_latlong_bilinear(ll_mips[l], ll_uv))
        levels.append(jnp.stack(faces, 0))
    return CubeMips.from_levels(levels)


# ---------------------------------------------------------------------------
# GGX prefilter (ref: split-sum-approx/prefilter.hlsl)
# ---------------------------------------------------------------------------

def prefilter_cubemap(source: CubeMips, out_size: int,
                      num_samples: int = 1024) -> CubeMips:
    """Prefiltered radiance cube: mip l has roughness l/(numMips-1)
    (ref: src/renderer.cpp:471-529 runs it at half the source resolution)."""
    num_levels = int(np.log2(out_size)) + 1
    xi = jnp.asarray(hammersley(num_samples))
    resolution = float(source.size)
    sa_texel = 4.0 * mu.PI / (6.0 * resolution * resolution)

    levels = []
    for l in range(num_levels):
        s = out_size >> l
        roughness = l / max(num_levels - 1, 1)
        xs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        uv = jnp.stack(jnp.meshgrid(xs, xs, indexing="xy"), -1)
        n = jnp.stack([get_env_dir(f, uv) for f in range(6)], 0)
        if roughness == 0.0:
            levels.append(_sample_cube_level(source, source.bases[0],
                                             source.size, n))
            continue
        t, b = tangent_to_world(n)

        def body(i, acc, n=n, t=t, b=b, roughness=roughness):
            color, weight = acc
            h_t = sample_ggx(xi[i], roughness)
            h = (h_t[..., 0:1] * t + h_t[..., 1:2] * b + h_t[..., 2:3] * n)
            v = n
            l_dir = mu.normalize(
                2.0 * jnp.sum(v * h, -1, keepdims=True) * h - v)
            no_l = jnp.clip(jnp.sum(n * l_dir, -1), 0.0, 1.0)
            no_h = jnp.maximum(jnp.sum(n * h, -1), 0.0)
            vo_h = jnp.maximum(jnp.sum(v * h, -1), 0.0)
            d = shading.ggx_distribution(no_h, roughness)
            pdf = d * no_h / (4.0 * jnp.maximum(vo_h, 1e-6)) + 1e-4
            sa_sample = 1.0 / (num_samples * pdf + 1e-4)
            mip = jnp.maximum(0.5 * jnp.log2(sa_sample / sa_texel), 0.0)
            c = sample_cube(source, l_dir, lod=mip)
            return (color + c * no_l[..., None], weight + no_l)

        color, weight = jax.lax.fori_loop(
            0, num_samples, body,
            (jnp.zeros((6, s, s, 3), jnp.float32),
             jnp.zeros((6, s, s), jnp.float32)))
        levels.append(color / jnp.maximum(weight, 1e-6)[..., None])
    return CubeMips.from_levels(levels)


# ---------------------------------------------------------------------------
# SH9 radiance projection (ref: spherical-harmonics/*.hlsl)
# ---------------------------------------------------------------------------

_SH_K = np.array([0.282095, 0.488603, 0.488603, 0.488603, 1.092548,
                  1.092548, 0.315392, 1.092548, 0.546274], np.float32)
_SH_A = np.array([np.pi, 2.094395, 0.785398], np.float32)


def sh_basis(d):
    """SH9 basis values at unit directions (..., 3) -> (..., 9)
    (ref: sh common.hlsli:83-103 ShEvaluate)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        jnp.full_like(x, _SH_K[0]),
        _SH_K[1] * y,
        _SH_K[2] * z,
        _SH_K[3] * x,
        _SH_K[4] * x * y,
        _SH_K[5] * y * z,
        _SH_K[6] * (3.0 * z * z - 1.0),
        _SH_K[7] * x * z,
        _SH_K[8] * (x * x - y * y),
    ], axis=-1)


def sh_project_latlong(latlong):
    """Integrate a lat-long radiance map onto SH9: (9, 3) coefficients
    (ref: projection.hlsl:40-51: radiance * basis * sin(theta) dtheta dphi,
    then parallel reduction)."""
    h, w = latlong.shape[:2]
    us = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    vs = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(jnp.meshgrid(us, vs, indexing="xy"), -1)
    d = mu.latlong_uv_to_direction(uv)
    basis = sh_basis(d)                       # (h, w, 9)
    sin_t = jnp.sin(uv[..., 1] * mu.PI)
    w_solid = sin_t * (mu.PI / h) * (2.0 * mu.PI / w)
    return jnp.einsum("hwc,hwk,hw->kc", latlong[..., :3], basis, w_solid)


def sh_irradiance(n, sh_coeffs):
    """Cosine-convolved irradiance at normals n (..., 3) from (9, 3) SH
    radiance (ref: sh common.hlsli:105-139 ShIrradiance)."""
    basis = sh_basis(n)                       # (..., 9)
    a = jnp.asarray(np.concatenate(
        [[_SH_A[0]], [_SH_A[1]] * 3, [_SH_A[2]] * 5]).astype(np.float32))
    return jnp.einsum("...k,kc->...c", basis * a, sh_coeffs)


# ---------------------------------------------------------------------------
# Environment probe (cube + SH + BRDF LUT), the FTextureCache::CacheHDRI
# analogue (ref: src/demo.cpp:292-434)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EnvironmentProbe:
    envmap: CubeMips        # full-res radiance cube (background + reflections)
    prefiltered: CubeMips   # GGX prefiltered, half res, mip = roughness
    sh: jnp.ndarray         # (9, 3) radiance SH


jax.tree_util.register_pytree_node(
    EnvironmentProbe,
    lambda p: ((p.envmap, p.prefiltered, p.sh), None),
    lambda aux, ch: EnvironmentProbe(*ch))


@functools.partial(jax.jit, static_argnames=("envmap_size", "num_samples"))
def build_probe(latlong, envmap_size: int = 256,
                num_samples: int = 1024) -> EnvironmentProbe:
    """lat-long radiance -> probe. Matches the reference chain: cube at
    EnvmapResolution, prefilter at half res, SH from the lat-long
    (ref: src/demo.cpp:292-434, src/scene.cpp:1657-1784)."""
    envmap = latlong_to_cubemap(latlong, envmap_size)
    pref = prefilter_cubemap(envmap, envmap_size // 2,
                             num_samples=num_samples)
    sh = sh_project_latlong(latlong)
    # Quad-packed row tables: the hot passes fetch bilinear cube samples
    # with ONE gather per level instead of four.
    return EnvironmentProbe(envmap=envmap.with_packed(),
                            prefiltered=pref.with_packed(), sh=sh)
