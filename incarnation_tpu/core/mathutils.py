"""Core math: transforms, projection, encodings.

Conventions (matching the reference renderer's behavior, reimplemented):
- Left-handed, y-up world space. glTF (right-handed) content is converted by a
  root transform diag(1, 1, -1)  (ref: src/scene.cpp:152-167).
- Row-vector convention: ``p' = [p, 1] @ M`` with 4x4 row-major matrices, and
  composition child-then-parent is ``M = M_child @ M_parent`` (the reference
  uses DirectX SimpleMath, which has the same convention).
- Reverse-Z infinite-far perspective projection (ref: src/demo.cpp:94-102):
  depth 1 at the near plane, -> 0 at infinity. Depth test is GREATER_EQUAL and
  the depth buffer clears to 0.
- Octahedral normal encoding for the normal GBuffer
  (ref: shaders/geo-raster/encoding.hlsli:31-55).
- Visibility buffer id packing: primitive path ``objectId << 20 | triangleId``,
  meshlet path ``meshletId << 7 | triangleId``; the "no geometry" clear value
  is 0xFFFFF000 (ref: shaders/geo-raster/encoding.hlsli:4-28,
  render-jobs/visibility-pass.inl:71-74).

Everything here works on both numpy arrays (host-side scene prep) and jnp
arrays (traced code); we only use operations common to both via the ``xp``
trick of accepting either array type through jnp (which accepts numpy input).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

PI = float(np.pi)
INV_PI = float(1.0 / np.pi)

# Visibility-buffer encoding (ref: shaders/geo-raster/encoding.hlsli:4-7)
PRIM_TRIANGLE_BIT_COUNT = 20
MESHLET_TRIANGLE_BIT_COUNT = 7
# Clear value meaning "no geometry" (ref: render-jobs/visibility-pass.inl:71).
# As int32 (TPU has no uint32 compute path worth using): 0xFFFFF000.
VIS_CLEAR_UINT = 0xFFFFF000
VIS_CLEAR_INT32 = np.int32(np.uint32(VIS_CLEAR_UINT).view(np.int32))


# ---------------------------------------------------------------------------
# Visibility id packing
# ---------------------------------------------------------------------------

def encode_primitive_visibility(primitive_id, triangle_id):
    """primitive_id << 20 | triangle_id (ref: encoding.hlsli:9-12)."""
    return (primitive_id << PRIM_TRIANGLE_BIT_COUNT) | triangle_id


def decode_primitive_visibility(data):
    """-> (primitive_id, triangle_id). Use logical shift semantics on int32."""
    udata = jnp.asarray(data).astype(jnp.uint32)
    prim = (udata >> PRIM_TRIANGLE_BIT_COUNT).astype(jnp.int32)
    tri = (udata & ((1 << PRIM_TRIANGLE_BIT_COUNT) - 1)).astype(jnp.int32)
    return prim, tri


def encode_meshlet_visibility(meshlet_id, triangle_id):
    return (meshlet_id << MESHLET_TRIANGLE_BIT_COUNT) | triangle_id


def decode_meshlet_visibility(data):
    udata = jnp.asarray(data).astype(jnp.uint32)
    m = (udata >> MESHLET_TRIANGLE_BIT_COUNT).astype(jnp.int32)
    tri = (udata & ((1 << MESHLET_TRIANGLE_BIT_COUNT) - 1)).astype(jnp.int32)
    return m, tri


# ---------------------------------------------------------------------------
# Octahedral normal encoding (ref: encoding.hlsli:31-55)
# ---------------------------------------------------------------------------

def oct_encode(n):
    """Unit normal (..., 3) -> (..., 2) in [0, 1]."""
    n = n / jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    nxy = n[..., :2]
    wrapped = (1.0 - jnp.abs(nxy[..., ::-1])) * jnp.where(nxy >= 0.0, 1.0, -1.0)
    nxy = jnp.where(n[..., 2:3] >= 0.0, nxy, wrapped)
    return nxy * 0.5 + 0.5


def oct_decode(f):
    """(..., 2) in [0, 1] -> unit normal (..., 3)."""
    f = f * 2.0 - 1.0
    nz = 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])
    t = jnp.clip(-nz, 0.0, 1.0)[..., None]
    nxy = f + jnp.where(f >= 0.0, -t, t)
    n = jnp.concatenate([nxy, nz[..., None]], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Projection / view matrices (row-vector convention)
# ---------------------------------------------------------------------------

def perspective_reverse_z_infinite(fov_y: float, aspect: float, near: float):
    """Reverse-Z infinite-far LH perspective (ref: src/demo.cpp:94-102).

    clip = [x / (aspect*tan(fov/2)), y / tan(fov/2), near, z_view]
    so ndc z = near / z_view: 1 at near plane, -> 0 at infinity.
    """
    t = 1.0 / np.tan(0.5 * fov_y)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = t / aspect
    m[1, 1] = t
    m[2, 3] = 1.0
    m[3, 2] = near
    return m


def view_matrix(position, right, up, look):
    """World->view for an orthonormal LH camera basis, row-vector convention
    (ref: src/demo.cpp FView::UpdateViewTransform).
    """
    position = np.asarray(position, np.float32)
    right = np.asarray(right, np.float32)
    up = np.asarray(up, np.float32)
    look = np.asarray(look, np.float32)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = [right[0], up[0], look[0]]
    m[1, :3] = [right[1], up[1], look[1]]
    m[2, :3] = [right[2], up[2], look[2]]
    m[3, 0] = -float(position @ right)
    m[3, 1] = -float(position @ up)
    m[3, 2] = -float(position @ look)
    return m


def orthonormalize_basis(look, right):
    """Re-orthonormalize an LH camera basis from look and right hints
    (ref: FView::UpdateViewTransform: up = look x right; right = up x look).
    """
    look = np.asarray(look, np.float64)
    right = np.asarray(right, np.float64)
    look = look / np.linalg.norm(look)
    up = np.cross(look, right)
    up = up / np.linalg.norm(up)
    right = np.cross(up, look)
    return (right.astype(np.float32), up.astype(np.float32),
            look.astype(np.float32))


# ---------------------------------------------------------------------------
# TRS / quaternion (SimpleMath row-vector conventions, used by scene loading)
# ---------------------------------------------------------------------------

def quaternion_to_matrix(q):
    """glTF quaternion [x, y, z, w] -> 4x4 rotation (row-vector convention,
    matches DirectX::SimpleMath::Matrix::CreateFromQuaternion)."""
    x, y, z, w = [float(v) for v in q]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = [1 - 2 * (yy + zz), 2 * (xy + wz), 2 * (xz - wy)]
    m[1, :3] = [2 * (xy - wz), 1 - 2 * (xx + zz), 2 * (yz + wx)]
    m[2, :3] = [2 * (xz + wy), 2 * (yz - wx), 1 - 2 * (xx + yy)]
    return m


def trs_matrix(translation=None, rotation=None, scale=None):
    """Compose scale * rotation * translation (row-vector order: scale is
    applied first), as the reference does for glTF nodes
    (ref: src/scene.cpp:241-246)."""
    m = np.eye(4, dtype=np.float32)
    if scale is not None:
        s = np.eye(4, dtype=np.float32)
        s[0, 0], s[1, 1], s[2, 2] = scale
        m = m @ s
    if rotation is not None:
        m = m @ quaternion_to_matrix(rotation)
    if translation is not None:
        t = np.eye(4, dtype=np.float32)
        t[3, :3] = translation
        m = m @ t
    return m


RH_TO_LH = np.diag([1.0, 1.0, -1.0, 1.0]).astype(np.float32)


# ---------------------------------------------------------------------------
# Point / vector transforms (work under jit)
# ---------------------------------------------------------------------------

def transform_points(p, m):
    """(..., 3) @ 4x4 -> (..., 3) with w divide-free affine assumption."""
    return p @ m[:3, :3] + m[3, :3]


def transform_points_h(p, m):
    """(..., 3) @ 4x4 -> homogeneous (..., 4)."""
    out = p @ m[:3, :4]
    return out + m[3]


def transform_vectors(v, m):
    """Direction transform: ignores translation row."""
    return v @ m[:3, :3]


def normalize(v, axis=-1, eps=1e-20):
    return v * jax_rsqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps)


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def onehot_lookup(table, idx):
    """Row lookup table[idx] via a one-hot MXU contraction.

    For SMALL tables (tens of rows) at full-screen index counts this beats
    the XLA gather, which is index-bound at ~3.8 ms per 2M indices
    regardless of table size; the one-hot matmul runs at MXU rate
    (n*R*C MACs). f32 HIGHEST keeps integers < 2^24 exact (stack base
    offsets fit). table (R, C); idx (...,) int -> (..., C) in table.dtype.
    """
    import jax
    r = table.shape[0]
    oh = (idx[..., None] == jnp.arange(r, dtype=idx.dtype)).astype(
        jnp.float32)
    out = jnp.matmul(oh, table.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    if jnp.issubdtype(table.dtype, jnp.integer):
        return jnp.round(out).astype(table.dtype)
    return out.astype(table.dtype)


# ---------------------------------------------------------------------------
# Halton / sampling (ref: renderer.cpp:126-132 uses Halton(2,3) jitter)
# ---------------------------------------------------------------------------

def halton(index: int, base: int) -> float:
    f, r = 1.0, 0.0
    i = index
    while i > 0:
        f = f / base
        r = r + f * (i % base)
        i = i // base
    return r


def halton_jitter_table(n: int = 16) -> np.ndarray:
    """n x 2 sub-pixel jitter offsets in [-0.5, 0.5) from Halton(2, 3),
    matching the reference's 16-entry pixel jitter (ref: renderer.cpp:126-132).
    """
    return np.array(
        [[halton(i + 1, 2) - 0.5, halton(i + 1, 3) - 0.5] for i in range(n)],
        dtype=np.float32)


# ---------------------------------------------------------------------------
# Spherical <-> cartesian (LH y-up; ref: shaders/common/math.hlsli:39-89)
# ---------------------------------------------------------------------------

def latlong_uv_to_direction(uv):
    """Equirectangular uv in [0,1]^2 -> unit direction, LH y-up.
    u wraps azimuth phi in [0, 2pi), v maps polar theta in [0, pi] from +y.
    """
    phi = (uv[..., 0] * 2.0 - 1.0) * PI
    theta = uv[..., 1] * PI
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.sin(phi), jnp.cos(theta), sin_t * jnp.cos(phi)], axis=-1)


def direction_to_latlong_uv(d):
    phi = jnp.arctan2(d[..., 0], d[..., 2])
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    return jnp.stack([(phi / PI) * 0.5 + 0.5, theta / PI], axis=-1)
