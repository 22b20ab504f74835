"""GLB container + loader robustness tests."""

import json
import struct

import numpy as np
import pytest

from incarnation_tpu.scene.gltf import Gltf


def make_glb(tmp_path):
    """Minimal GLB: one triangle with positions + indices."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    bin_chunk = pos.tobytes() + idx.tobytes() + b"\x00\x00"  # pad to 4
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    glb = struct.pack("<III", 0x46546C67, 2, total)
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    p = tmp_path / "tri.glb"
    p.write_bytes(glb)
    return p


def test_glb_roundtrip(tmp_path):
    p = make_glb(tmp_path)
    g = Gltf.load(p)
    pos = g.accessor(0)
    np.testing.assert_allclose(pos, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    idx = g.accessor(1)
    np.testing.assert_array_equal(idx.reshape(-1), [0, 1, 2])


def test_glb_loads_as_scene(tmp_path):
    from incarnation_tpu.scene import load_scene
    host = load_scene(make_glb(tmp_path))
    assert host.scene.meta.num_triangles == 1


def test_normalized_accessor():
    # normalized uint8 attribute dequantizes to [0, 1]
    import base64
    doc = {
        "asset": {"version": "2.0"},
        "accessors": [{"bufferView": 0, "componentType": 5121, "count": 2,
                       "type": "VEC2", "normalized": True}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 4}],
        "buffers": [{"byteLength": 4, "uri": "data:application/octet-stream;base64,"
                     + base64.b64encode(bytes([0, 255, 128, 64])).decode()}],
    }
    import json as _json
    from incarnation_tpu.scene import gltf as gltf_mod
    import pathlib
    g = gltf_mod.Gltf(doc, [gltf_mod._resolve_buffer(doc["buffers"][0],
                                                     pathlib.Path("."))],
                      pathlib.Path("."))
    v = g.accessor(0)
    np.testing.assert_allclose(v, [[0.0, 1.0], [128 / 255, 64 / 255]],
                               atol=1e-6)


def test_sparse_accessor():
    # glTF 2.0 §3.6.2.3: base array (here zeros — no bufferView) with
    # sparse (index, value) substitutions, like tinygltf accepts.
    import base64
    idx = np.array([1, 3], np.uint16).tobytes()
    vals = np.array([[1, 2, 3], [4, 5, 6]], np.float32).tobytes()
    blob = idx + vals
    doc = {
        "asset": {"version": "2.0"},
        "accessors": [{
            "componentType": 5126, "count": 5, "type": "VEC3",
            "sparse": {
                "count": 2,
                "indices": {"bufferView": 0, "componentType": 5123},
                "values": {"bufferView": 1},
            }}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 4},
            {"buffer": 0, "byteOffset": 4, "byteLength": 24},
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                     + base64.b64encode(blob).decode()}],
    }
    from incarnation_tpu.scene import gltf as gltf_mod
    import pathlib
    g = gltf_mod.Gltf(doc, [gltf_mod._resolve_buffer(doc["buffers"][0],
                                                     pathlib.Path("."))],
                      pathlib.Path("."))
    v = g.accessor(0)
    expect = np.zeros((5, 3), np.float32)
    expect[1] = [1, 2, 3]
    expect[3] = [4, 5, 6]
    np.testing.assert_allclose(v, expect)
