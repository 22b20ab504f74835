"""LBVH build + traversal correctness vs brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from incarnation_tpu.kernels import bvh as bvh_mod
from scene_util import make_scene


def random_tris(n, rng, extent=10.0, size=0.8):
    base = rng.uniform(-extent, extent, (n, 1, 3))
    return (base + rng.uniform(-size, size, (n, 3, 3))).astype(np.float32)


def brute_force_closest(tris, o, d):
    """Reference intersector (no culling)."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0
    best_t = np.full(o.shape[0], np.inf)
    best_i = np.full(o.shape[0], -1, np.int64)
    for k in range(tris.shape[0]):
        p = np.cross(d, e2[k])
        det = np.einsum("rj,j->r", p, e1[k])
        ok = np.abs(det) > 1e-12
        inv = 1.0 / np.where(ok, det, 1.0)
        tv = o - v0[k]
        u = np.einsum("rj,rj->r", tv, p) * inv
        q = np.cross(tv, e1[k][None].repeat(o.shape[0], 0))
        v = np.einsum("rj,rj->r", d, q) * inv
        t = np.einsum("j,rj->r", e2[k], q) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_i = np.where(hit, k, best_i)
    return best_t, best_i


def make_bvh(tris, double_sided=True):
    rows, links, leaf_tri = bvh_mod.build_lbvh(tris)
    ds = 1.0 if double_sided else 0.0
    for s in range(bvh_mod.LEAF_K):
        ok = leaf_tri[:, s] >= 0
        lane = 11 if s == 0 else bvh_mod._DS1_OFF + s - 1
        rows[ok, lane] = ds
    return bvh_mod.SceneBVH(rows=jnp.asarray(rows), links=jnp.asarray(links))


def test_closest_hit_matches_brute_force(rng):
    tris = random_tris(300, rng)
    b = make_bvh(tris)
    nr = 256
    o = rng.uniform(-15, 15, (nr, 3)).astype(np.float32)
    d = rng.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    out = bvh_mod.trace(b, jnp.asarray(o), jnp.asarray(d))
    bt, bi = brute_force_closest(tris, o, d)

    hit = bi >= 0
    np.testing.assert_array_equal(np.asarray(out["tri"] >= 0), hit)
    np.testing.assert_allclose(np.asarray(out["t"])[hit], bt[hit],
                               rtol=1e-4, atol=1e-4)
    # matching triangle id except exact ties
    same = np.asarray(out["tri"])[hit] == bi[hit]
    assert same.mean() > 0.99


def test_any_hit_occlusion(rng):
    # A wall of two triangles; rays from one side toward the other.
    quad = np.array([[[-5, -5, 0], [5, -5, 0], [5, 5, 0]],
                     [[-5, -5, 0], [5, 5, 0], [-5, 5, 0]]], np.float32)
    b = make_bvh(quad)
    o = np.array([[0, 0, -3], [0, 0, -3], [8, 8, -3]], np.float32)
    d = np.array([[0, 0, 1], [0, 0, -1], [0, 0, 1]], np.float32)
    occ = np.asarray(bvh_mod.occluded(b, jnp.asarray(o), jnp.asarray(d),
                                      tmin=0.1, tmax=1000.0))
    assert occ.tolist() == [True, False, False]


def test_tmin_tmax_respected():
    tri = np.array([[[-1, -1, 5], [1, -1, 5], [0, 1, 5]]], np.float32)
    b = make_bvh(tri)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    assert bool(bvh_mod.occluded(b, o, d, tmin=0.1, tmax=1000.0)[0])
    assert not bool(bvh_mod.occluded(b, o, d, tmin=0.1, tmax=4.0)[0])
    assert not bool(bvh_mod.occluded(b, o, d, tmin=6.0, tmax=1000.0)[0])


def test_backface_culling():
    # Triangle wound CCW viewed from -z (front at -z side in our LH world).
    tri = np.array([[[-1, -1, 5], [1, -1, 5], [0, 1, 5]]], np.float32)
    b = make_bvh(tri, double_sided=False)
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 10.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    out = bvh_mod.trace(b, o, d)
    hits = np.asarray(out["tri"]) >= 0
    # exactly one side hits with backface culling on
    assert hits.sum() == 1


def make_wide_bvh(tris, double_sided=True):
    geo, leaf_tri = bvh_mod.build_wide(tris)
    ds = 1.0 if double_sided else 0.0
    for s in range(bvh_mod.LEAF_K):
        ok = leaf_tri[:, s] >= 0
        lane = 11 if s == 0 else bvh_mod._DS1_OFF + s - 1
        geo[ok, lane] = ds
    return bvh_mod.SceneBVH(rows=jnp.asarray(geo),
                            links=jnp.zeros((1, 2), jnp.float32), wide=True)


def test_wide_closest_hit_matches_brute_force(rng):
    # Enough triangles that the collapse emits several wide levels.
    tris = random_tris(900, rng)
    b = make_wide_bvh(tris)
    nr = 256
    o = rng.uniform(-15, 15, (nr, 3)).astype(np.float32)
    d = rng.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    out = bvh_mod.trace(b, jnp.asarray(o), jnp.asarray(d))
    bt, bi = brute_force_closest(tris, o, d)

    hit = bi >= 0
    np.testing.assert_array_equal(np.asarray(out["tri"] >= 0), hit)
    np.testing.assert_allclose(np.asarray(out["t"])[hit], bt[hit],
                               rtol=1e-4, atol=1e-4)
    same = np.asarray(out["tri"])[hit] == bi[hit]
    assert same.mean() > 0.99


def test_wide_matches_binary_trace(rng):
    # Same geometry through both layouts: identical hit sets and depths.
    tris = random_tris(500, rng)
    bw = make_wide_bvh(tris)
    bb = make_bvh(tris)
    nr = 128
    o = rng.uniform(-15, 15, (nr, 3)).astype(np.float32)
    d = rng.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ow = bvh_mod.trace(bw, jnp.asarray(o), jnp.asarray(d))
    ob = bvh_mod.trace(bb, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(ow["tri"] >= 0),
                                  np.asarray(ob["tri"] >= 0))
    hit = np.asarray(ob["tri"]) >= 0
    np.testing.assert_allclose(np.asarray(ow["t"])[hit],
                               np.asarray(ob["t"])[hit],
                               rtol=1e-4, atol=1e-4)


def test_wide_any_hit_and_culling():
    quad = np.array([[[-5, -5, 0], [5, -5, 0], [5, 5, 0]],
                     [[-5, -5, 0], [5, 5, 0], [-5, 5, 0]]], np.float32)
    b = make_wide_bvh(quad)
    o = jnp.asarray([[0, 0, -3], [0, 0, -3], [8, 8, -3]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0, 0, -1], [0, 0, 1]], jnp.float32)
    occ = np.asarray(bvh_mod.occluded(b, o, d, tmin=0.1, tmax=1000.0))
    assert occ.tolist() == [True, False, False]

    tri = np.array([[[-1, -1, 5], [1, -1, 5], [0, 1, 5]]], np.float32)
    bc = make_wide_bvh(tri, double_sided=False)
    o2 = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 10.0]])
    d2 = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    out = bvh_mod.trace(bc, o2, d2)
    assert (np.asarray(out["tri"]) >= 0).sum() == 1


def test_scene_bvh_build(rng):
    pts = np.array([[-4, -2, 5], [4, -2, 5], [0, 4, 5]], np.float32)
    scene = make_scene(pts, [[0, 1, 2]])
    b = bvh_mod.build_scene_bvh(scene)
    out = bvh_mod.trace(b, jnp.asarray([[0.0, 0.0, -15.0]]),
                        jnp.asarray([[0.0, 0.0, 1.0]]))
    assert int(out["tri"][0]) == 0
    np.testing.assert_allclose(float(out["t"][0]), 20.0, rtol=1e-5)


def test_mesh_visibility_filters_bvh():
    """Hiding a mesh removes its PT hits and shadow occlusion (the
    reference rebuilds its TLAS over the visible list per frame,
    ref: render-jobs/update-tlas.inl:24)."""
    import dataclasses
    import numpy as np
    from scene_util import make_scene

    def quad(z):
        return np.array([[-2, -2, z], [2, -2, z], [2, 2, z], [-2, 2, z]],
                        np.float32)

    pts = np.concatenate([quad(4.0), quad(8.0)])
    tris = [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]]
    scene = make_scene(pts, tris, double_sided=True,
                       tri_prim=[0, 0, 1, 1], num_prims=2,
                       prim_tri_offset=[0, 2])
    eye4 = np.eye(4, dtype=np.float32)
    scene = dataclasses.replace(
        scene,
        prim_mesh=jnp.asarray([0, 1], jnp.int32),
        mesh_visible=jnp.asarray([1, 1], jnp.int32),
        mesh_transforms=jnp.asarray(np.stack([eye4, eye4])))
    bvh = bvh_mod.build_scene_bvh(scene, use_cache=False)

    o = jnp.asarray(np.tile([[0.0, 0.0, 0.0]], (16, 1)), jnp.float32)
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (16, 1)), jnp.float32)

    full = bvh_mod.trace(bvh, o, d)
    tp = np.asarray(scene.tri_prim)
    assert (tp[np.asarray(full["tri"])] == 0).all()   # front quad wins

    # everything visible: apply is the identity object
    assert bvh_mod.apply_mesh_visibility(bvh, scene, [1, 1]) is bvh

    hid = bvh_mod.apply_mesh_visibility(bvh, scene, [0, 1])
    part = bvh_mod.trace(hid, o, d)
    assert (tp[np.asarray(part["tri"])] == 1).all()   # back quad now wins
    # shadow rays no longer occluded by the hidden front quad
    occ = bvh_mod.occluded(hid, o, d, tmin=0.1, tmax=6.0)
    assert not bool(np.asarray(occ).any())
    occ_full = bvh_mod.occluded(bvh, o, d, tmin=0.1, tmax=6.0)
    assert bool(np.asarray(occ_full).all())

    both_hidden = bvh_mod.apply_mesh_visibility(bvh, scene, [0, 0])
    none = bvh_mod.trace(both_hidden, o, d)
    assert (np.asarray(none["tri"]) == -1).all()
