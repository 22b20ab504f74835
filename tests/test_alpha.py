"""Alpha-masked (cutout) geometry: raster depth-peel layers + alpha clip.

The reference alpha-clips masked materials in the visibility raster PS
(ref: shaders/geo-raster/visibility-pass.hlsl:101,111); here MASK prims
raster as depth-peel layers whose fragments are alpha-tested against the
base-color texture (kernels/resolve.py::masked_alpha).
"""

import numpy as np
import jax.numpy as jnp

from incarnation_tpu.config import Config, EnvSkyMode
from incarnation_tpu.core.view import View
from incarnation_tpu.kernels.raster import RasterParams
from incarnation_tpu.renderer import frame as frame_mod
from incarnation_tpu.scene.testing import make_scene, checkerboard_alpha_stack

W, H = 128, 64
PARAMS = RasterParams(width=W, height=H, tile_h=16, tile_w=128,
                      pair_capacity=256, bin_max_span=4,
                      big_tri_capacity=16, chunk=8)


def _quad(z, s=4.0):
    return np.array([[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]],
                    np.float32)


def _render(scene, cfg=None):
    cfg = cfg or Config(enable_taa=False, enable_hbao=False,
                        env_sky_mode=EnvSkyMode.DYNAMIC_SKY,
                        frustum_culling=False, use_meshlets=False)
    view = View.default(aspect=W / H)
    fc = frame_mod.FrameConstants.make(view, cfg,
                                       sun_color_intensity=[1, 1, 1, 100.0])
    return frame_mod.render_frame(scene, fc, config=cfg, params=PARAMS), cfg


def _masked_front_opaque_back():
    pts = np.concatenate([_quad(4.0), _quad(8.0, s=6.0)])
    tris = [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]]
    uvs = np.concatenate([
        np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32),
        np.zeros((4, 2), np.float32)])
    return make_scene(pts, tris, uvs=uvs, double_sided=True,
                      tri_prim=[0, 0, 1, 1], num_prims=2,
                      prim_tri_offset=[0, 2],
                      prim_alpha_mode=[1, 0],        # front MASK, back OPAQUE
                      prim_material=[0, 0],
                      mat_stack=checkerboard_alpha_stack(4))


def _prim_map(scene, out):
    tri = np.asarray(out["tri"])
    return np.where(tri >= 0,
                    np.asarray(scene.tri_prim)[np.maximum(tri, 0)], -1)


def test_masked_quad_has_holes_showing_opaque_behind():
    import dataclasses
    scene = _masked_front_opaque_back()
    # Reference footprint: the same front quad rendered opaque.
    opaque = dataclasses.replace(
        scene, prim_alpha_mode=jnp.zeros((2,), jnp.int32))
    opaque.meta = dataclasses.replace(scene.meta, has_masked=False)
    ref, _ = _render(opaque)
    footprint = _prim_map(opaque, ref) == 0
    assert footprint.sum() > 300

    out, _ = _render(scene)
    prim = _prim_map(scene, out)
    front = (prim[footprint] == 0).mean()
    back = (prim[footprint] == 1).mean()
    # Checkerboard alpha: roughly half survives, holes expose the back quad.
    assert 0.25 < front < 0.75, f"front coverage {front}"
    assert back > 0.2, f"holes must expose the opaque quad ({back})"
    assert front + back > 0.95


def test_all_opaque_front_quad_fully_covers():
    # Same geometry but front quad OPAQUE: no holes.
    scene = _masked_front_opaque_back()
    import dataclasses
    scene = dataclasses.replace(
        scene, prim_alpha_mode=jnp.zeros((2,), jnp.int32))
    import dataclasses as dc
    scene.meta = dc.replace(scene.meta, has_masked=False)
    out, _ = _render(scene)
    prim = _prim_map(scene, out)
    # A block safely inside the front quad's projection: no holes.
    assert (prim[24:40, 56:72] == 0).all()


def _halfplane_stack(size=64, real_amask=True):
    """One MASK material: alpha 0 on the left half, 255 on the right.
    real_amask=True attaches the conservative 3-state cell classification
    (textures._amask_words); False keeps the all-partial default (the
    pure-peel path)."""
    from incarnation_tpu.scene import textures as tex
    ys, xs = np.mgrid[0:size, 0:size]
    a = np.where(xs >= size // 2, 255, 0).astype(np.uint32)
    w0 = (np.uint32(0x00FFFFFF) | (a << np.uint32(24)))
    rows = np.stack([
        w0,
        np.full_like(w0, 0xFFFF8080),
        np.full_like(w0, 0xFFFFFFFF),
        np.full_like(w0, 0x00FFFFFF),
    ], axis=-1).reshape(-1, 4)
    meta = np.asarray([[0, size, 1, tex.ADDRESS_CLAMP]], np.int32)
    stack = tex.make_material_stack(rows.astype(np.uint32), meta)
    if real_amask:
        row = tex._amask_words([a.astype(np.float32) / 255.0], 1, 0.5, 1.0,
                               tex.ADDRESS_CLAMP)
        import dataclasses
        import jax.numpy as jnp2
        stack = dataclasses.replace(stack, amask=jnp2.asarray(row[None]))
    return stack


def test_amask_classification_matches_pure_peel():
    """The in-kernel certainly-transparent rejection must produce the same
    image as peeling every fragment (reject-nothing mask), and must
    actually contain reject cells."""
    import dataclasses
    from incarnation_tpu.scene import textures as tex

    def scene_with(stack):
        pts = np.concatenate([_quad(4.0), _quad(8.0, s=6.0)])
        tris = [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]]
        uvs = np.concatenate([
            np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32),
            np.zeros((4, 2), np.float32)])
        return make_scene(pts, tris, uvs=uvs, double_sided=True,
                          tri_prim=[0, 0, 1, 1], num_prims=2,
                          prim_tri_offset=[0, 2],
                          prim_alpha_mode=[1, 0],
                          prim_material=[0, 0],
                          mat_stack=stack)

    real = _halfplane_stack(real_amask=True)
    words = np.asarray(real.amask)[0, :32].view(np.uint32)
    bits = np.stack([(words >> np.uint32(k)) & 1 for k in range(32)],
                    -1).reshape(-1)
    assert (bits == 1).any() and (bits == 0).any(), \
        "classification degenerated (no reject cells)"
    # rejects must stay on the transparent (left) side only
    cells = bits.reshape(32, 32)
    assert not cells[:, 18:].any(), "reject bled into the opaque half"

    out_real, _ = _render(scene_with(real))
    out_peel, _ = _render(scene_with(_halfplane_stack(real_amask=False)))
    assert int(out_real["stats"]["peel_overflow"]) == 0
    assert int(out_peel["stats"]["peel_overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(out_real["tri"]),
                                  np.asarray(out_peel["tri"]))
    np.testing.assert_allclose(np.asarray(out_real["color"]),
                               np.asarray(out_peel["color"]), atol=1)


def test_aniso_lod_uses_minor_axis():
    """Stochastic anisotropic filtering: mip from the minor footprint axis
    (clamped by max aniso), tap axis = major axis."""
    import jax.numpy as jnp
    from incarnation_tpu.kernels import resolve
    from scene_util import make_scene
    import numpy as np
    scene = make_scene(np.array([[-1, -1, 4], [1, -1, 4], [0, 1, 4]],
                                np.float32), [[0, 1, 2]])
    size = float(scene.mat_stack.meta[0, 1])
    h, w = 8, 128
    interp = np.zeros((16, h, w), np.float32)
    # footprint: 8 texels/px along x, 1/size texels... du/dx = 8/size,
    # dv/dy = 1/size -> aniso 8, mip should follow the minor axis
    interp[10] = 8.0 / size   # dudx
    interp[13] = 1.0 / size   # dvdy
    mat = np.zeros((h, w), np.float32)
    interp[9] = mat
    lod_a, major = resolve._interp_lod_aniso(
        scene, jnp.asarray(mat, jnp.int32), jnp.asarray(interp), 16.0)
    lod_i = resolve._interp_lod(scene, jnp.asarray(mat, jnp.int32),
                                jnp.asarray(interp))
    assert np.allclose(np.asarray(lod_a), 0.0, atol=1e-4)   # minor = 1 texel
    assert np.allclose(np.asarray(lod_i), 3.0, atol=1e-4)   # major = 8 texels
    # major axis is the x-derivative pair
    assert np.allclose(np.asarray(major)[..., 0], 8.0 / size)
    assert np.allclose(np.asarray(major)[..., 1], 0.0)
    # aniso clamp: 64:1 footprint clamps the implied taps at 16
    interp[10] = 64.0 / size
    lod_c, _ = resolve._interp_lod_aniso(
        scene, jnp.asarray(mat, jnp.int32), jnp.asarray(interp), 16.0)
    assert np.allclose(np.asarray(lod_c), 2.0, atol=1e-4)   # 64/16 = 4 texels
