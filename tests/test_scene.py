import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.scene import load_scene, sample_atlas
from incarnation_tpu.scene import textures as tex_mod


@pytest.fixture(scope="module")
def helmet(content_dir):
    return load_scene(
        content_dir / "models/damaged-helmet/DamagedHelmet.gltf",
        texture_max_dim=256)  # small atlas keeps the test fast


def test_helmet_counts(helmet):
    m = helmet.scene.meta
    assert m.num_triangles == 15452          # from the glTF accessor
    assert m.num_primitives == 1
    assert m.num_meshes == 1
    assert m.padded_triangles % 4096 == 0
    assert len(helmet.cameras) == 1


def test_helmet_geometry_sane(helmet):
    s = helmet.scene
    m = s.meta
    pos = np.asarray(s.positions[:m.num_vertices])
    # Helmet is roughly unit-scale around origin
    assert np.all(np.abs(pos) < 10.0)
    tri = np.asarray(s.tri_vtx[:m.num_triangles])
    assert tri.min() >= 0 and tri.max() < m.num_vertices
    # padding rows flagged
    assert int(s.tri_prim[m.num_triangles]) == -1
    nrm = np.asarray(s.normals[:m.num_vertices])
    lens = np.linalg.norm(nrm, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-2)
    tan = np.asarray(s.tangents[:m.num_vertices])
    assert set(np.unique(np.sign(tan[:, 3]))) <= {-1.0, 1.0}


def test_helmet_materials(helmet):
    mt = helmet.scene.materials
    assert int(mt.tex_base_color[0]) >= 0
    assert int(mt.tex_normal[0]) >= 0
    # split core/extras block-compressed stack built at the capped size
    meta = np.asarray(helmet.scene.mat_stack.meta)
    assert meta.shape == (1, 6)
    assert meta[0, 4] >= 0    # helmet has emissive+AO -> extras table
    assert meta[0, 1] == 256  # size capped by texture_max_dim
    assert meta[0, 2] == 9    # mip levels
    # packed factor row carries the base color factor
    assert np.asarray(helmet.scene.mat_params).shape == (1, 16)


def test_helmet_world_transform_is_lh(helmet):
    # RH->LH root flips z: determinant of the 3x3 block is negative
    m = np.asarray(helmet.scene.mesh_transforms[0])[:3, :3]
    assert np.linalg.det(m) < 0


def test_atlas_sampling_roundtrip():
    # A 4x4 checkerboard texture sampled at texel centers returns the texels.
    img = np.zeros((4, 4, 4), np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    atlas = tex_mod.build_atlas([img], [False], max_dim=4)
    uv = (np.stack(np.meshgrid(np.arange(4), np.arange(4), indexing="xy"),
                   -1).astype(np.float32) + 0.5) / 4.0
    out = np.asarray(sample_atlas(atlas, jnp.zeros((4, 4), jnp.int32),
                                  jnp.asarray(uv)))
    np.testing.assert_allclose(out[..., 0], img[..., 0] / 255.0, atol=1e-3)


def test_atlas_trilinear_levels():
    img = np.full((8, 8, 4), 255, np.uint8)
    img[:4] = 0  # top half black -> mip chain averages to 0.5
    atlas = tex_mod.build_atlas([img], [False], max_dim=8)
    tid = jnp.zeros((1,), jnp.int32)
    uv = jnp.full((1, 2), 0.5, jnp.float32)
    # coarsest level (1x1) = overall mean 0.5
    out = np.asarray(sample_atlas(atlas, tid, uv,
                                  lod=jnp.full((1,), 3.0)))
    np.testing.assert_allclose(out[0, :3], 0.5, atol=2e-2)


def test_atlas_address_modes():
    img = np.zeros((4, 4, 4), np.uint8)
    img[:, -1] = 200  # right column bright
    atlas = tex_mod.build_atlas(
        [img], [False], [(tex_mod.ADDRESS_CLAMP, tex_mod.ADDRESS_CLAMP)],
        max_dim=4)
    # uv just beyond 1.0 clamps to the right column
    out = np.asarray(sample_atlas(atlas, jnp.zeros((1,), jnp.int32),
                                  jnp.asarray([[1.2, 0.5]], jnp.float32)))
    np.testing.assert_allclose(out[0, 0], 200 / 255.0, atol=1e-3)


def test_mikktspace_tangent_parity(content_dir):
    """Regenerating tangents on a TANGENT-stripped helmet must match the
    asset's shipped MikkTSpace tangents (VERDICT r2 item 8; ref:
    src/mesh-utils.cpp:560-638 runs genTangSpaceDefault)."""
    from incarnation_tpu.scene.gltf import Gltf
    from incarnation_tpu.scene import tangents as tg
    g = Gltf.load(
        content_dir / "models/damaged-helmet/DamagedHelmet.gltf")
    p = g.doc["meshes"][0]["primitives"][0]
    a = p["attributes"]
    pos = g.accessor(a["POSITION"]).astype(np.float32)
    nrm = g.accessor(a["NORMAL"]).astype(np.float32)
    uv = g.accessor(a["TEXCOORD_0"]).astype(np.float32)
    shipped = g.accessor(a["TANGENT"]).astype(np.float32)
    idx = g.accessor(p["indices"]).reshape(-1, 3).astype(np.int64)

    ours = tg.generate_tangents(pos, nrm, uv, idx)

    # Exclude MikkTSpace's degenerate-UV outputs: 1 zero vector + 12 verts
    # holding its hardcoded (1,0,0) default (a computed tangent is never
    # exactly axis-aligned on this organic mesh).
    ok = np.linalg.norm(shipped[:, :3], axis=-1) > 0.5
    ok &= ~np.all(shipped[:, :3] == np.array([1.0, 0.0, 0.0]), axis=-1)
    assert (~ok).sum() <= 16
    cos = np.sum(ours[:, :3] * shipped[:, :3], axis=-1)[ok]
    ang = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
    assert ang.max() < 1.0, f"direction parity broken: max {ang.max()} deg"
    assert ang.mean() < 0.05
    handed = (ours[:, 3] == shipped[:, 3])[ok]
    assert handed.all(), f"handedness parity broken: {handed.mean():.4f}"
