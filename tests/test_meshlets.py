"""Meshletization tests (ref: mesh-utils.cpp limits 64 verts / 126 tris)."""

import numpy as np
import pytest

from incarnation_tpu.scene import meshlets as ml


def test_meshlet_limits(content_dir):
    from incarnation_tpu.scene.gltf import Gltf
    g = Gltf.load(content_dir / "models/suzanne/Suzanne.gltf")
    prim = g.meshes[0]["primitives"][0]
    pos = g.accessor(prim["attributes"]["POSITION"]).astype(np.float32)
    idx = g.accessor(prim["indices"]).astype(np.int32).reshape(-1, 3)
    tab = ml.meshletize(pos, idx, np.zeros(idx.shape[0], np.int32),
                        np.zeros(1, np.int32))
    assert (tab.count <= ml.MAX_TRIS).all()
    assert tab.count.sum() == idx.shape[0]
    # every meshlet respects the vertex budget
    order = tab.tri_order
    for m in range(min(len(tab.count), 50)):
        s, c = tab.offset[m], tab.count[m]
        assert np.unique(idx[order[s:s + c]]).size <= ml.MAX_VERTS
    # bounding spheres contain their triangles
    for m in range(min(len(tab.count), 20)):
        s, c = tab.offset[m], tab.count[m]
        pts = pos[np.unique(idx[order[s:s + c]])]
        d = np.linalg.norm(pts - tab.bsphere[m, :3], axis=1)
        assert (d <= tab.bsphere[m, 3] + 1e-4).all()


def test_meshlet_vis_encoding(content_dir):
    from incarnation_tpu.scene.gltf import Gltf
    g = Gltf.load(content_dir / "models/suzanne/Suzanne.gltf")
    prim = g.meshes[0]["primitives"][0]
    pos = g.accessor(prim["attributes"]["POSITION"]).astype(np.float32)
    idx = g.accessor(prim["indices"]).astype(np.int32).reshape(-1, 3)
    tab = ml.meshletize(pos, idx, np.zeros(idx.shape[0], np.int32),
                        np.zeros(1, np.int32))
    enc = ml.encode_meshlet_visibility_table(tab)
    # round trip: meshlet id and 7-bit local tri
    assert ((enc >> 7) == tab.tri_meshlet).all()
    assert ((enc & 0x7F) < 127).all()


def test_welzl_no_larger_than_ritter_and_covers():
    """welzl_sphere is the EXACT minimum enclosing sphere: always covers
    and never beats-by-losing vs the reference's Ritter expanding sphere
    (ref: mesh-utils.cpp:114-180 'MinimumBoundingSphere' is Ritter)."""
    from incarnation_tpu.scene.meshlets import ritter_sphere, welzl_sphere
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 4, 5, 16, 64, 130):
        for trial in range(3):
            pts = rng.normal(size=(n, 3)).astype(np.float32)
            if trial == 1:
                pts[:, 2] = 0.0                      # coplanar
            if trial == 2 and n >= 2:
                pts = np.repeat(pts[: max(n // 2, 1)], 2, 0)[:n]  # dupes
            cw, rw = welzl_sphere(pts)
            cr, rr = ritter_sphere(pts)
            d = np.sqrt(((pts - cw) ** 2).sum(-1)).max()
            assert d <= rw * (1 + 1e-5) + 1e-6       # covers
            assert rw <= rr * (1 + 1e-5) + 1e-6      # never larger
