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
