"""Minimal glTF 2.0 parser (JSON + .bin/.glb buffers -> numpy arrays).

Dependency-light replacement for the reference's tinygltf (ref:
src/scene.cpp:13-89 uses tinygltf::LoadASCIIFromFile). Only the features the
reference consumes are implemented: buffers/bufferViews/accessors (including
interleaved strides and normalized integer attributes), meshes/primitives,
nodes (matrix or TRS), materials with pbrMetallicRoughness +
KHR_materials_transmission + KHR_materials_clearcoat, KHR_lights_punctual,
cameras, samplers, and images (decoded lazily via PIL).

Sparse accessors are implemented (see _read_accessor below). No skins,
morph targets, or animations — the reference ignores those too.
"""

from __future__ import annotations

import base64
import json
import pathlib
import struct
from typing import Optional

import numpy as np

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}

_TYPE_COMPONENT_COUNT = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}

# glTF primitive.mode values (we only render triangles, like the reference's
# triangle-list path; other modes are loaded but flagged).
MODE_TRIANGLES = 4


class Gltf:
    """Parsed glTF document: raw JSON dict + resolved binary buffers."""

    def __init__(self, doc: dict, buffers: list, base_dir: pathlib.Path):
        self.doc = doc
        self.buffers = buffers
        self.base_dir = base_dir

    # -- loading -------------------------------------------------------------

    @staticmethod
    def load(path) -> "Gltf":
        path = pathlib.Path(path)
        data = path.read_bytes()
        if data[:4] == b"glTF":
            return Gltf._load_glb(data, path.parent)
        doc = json.loads(data.decode("utf-8"))
        buffers = [
            _resolve_buffer(b, path.parent) for b in doc.get("buffers", [])
        ]
        return Gltf(doc, buffers, path.parent)

    @staticmethod
    def _load_glb(data: bytes, base_dir: pathlib.Path) -> "Gltf":
        magic, version, _length = struct.unpack_from("<III", data, 0)
        assert magic == 0x46546C67 and version == 2, "bad GLB header"
        offset = 12
        doc = None
        bin_chunk = None
        while offset < len(data):
            chunk_len, chunk_type = struct.unpack_from("<II", data, offset)
            chunk = data[offset + 8:offset + 8 + chunk_len]
            if chunk_type == 0x4E4F534A:  # JSON
                doc = json.loads(chunk.decode("utf-8"))
            elif chunk_type == 0x004E4942:  # BIN
                bin_chunk = chunk
            offset += 8 + chunk_len
        buffers = []
        for i, b in enumerate(doc.get("buffers", [])):
            if "uri" not in b and i == 0:
                buffers.append(bin_chunk)
            else:
                buffers.append(_resolve_buffer(b, base_dir))
        return Gltf(doc, buffers, base_dir)

    # -- accessors -----------------------------------------------------------

    def _read_view(self, view_index: int, byte_offset: int, count: int,
                   comps: int, dtype) -> np.ndarray:
        """Read `count` (comps,)-elements of `dtype` from a bufferView,
        honoring byteStride interleaving."""
        elem_bytes = np.dtype(dtype).itemsize * comps
        view = self.doc["bufferViews"][view_index]
        buf = self.buffers[view["buffer"]]
        stride = view.get("byteStride") or elem_bytes
        start = view.get("byteOffset", 0) + byte_offset
        if stride == elem_bytes:
            return np.frombuffer(
                buf, dtype=dtype, count=count * comps, offset=start
            ).reshape(count, comps)
        raw = np.frombuffer(
            buf, dtype=np.uint8,
            count=(count - 1) * stride + elem_bytes, offset=start)
        strided = np.lib.stride_tricks.as_strided(
            raw, shape=(count, elem_bytes), strides=(stride, 1))
        return strided.copy().view(dtype).reshape(count, comps)

    def accessor(self, index: int, dequantize: bool = True) -> np.ndarray:
        """Read accessor `index` into a contiguous (count, comps) array.

        `dequantize` converts normalized integer attributes to float32 per the
        glTF spec, and leaves index-style integer accessors as integers.
        """
        acc = self.doc["accessors"][index]
        count = acc["count"]
        comps = _TYPE_COMPONENT_COUNT[acc["type"]]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]

        if "bufferView" not in acc:
            out = np.zeros((count, comps), dtype=dtype)
        else:
            out = self._read_view(acc["bufferView"], acc.get("byteOffset", 0),
                                  count, comps, dtype)

        if "sparse" in acc:
            # Sparse accessor (glTF 2.0 §3.6.2.3, tinygltf parity): base
            # array (zeros when bufferView is absent) overlaid with `count`
            # (index, value) substitutions.
            sp = acc["sparse"]
            sc = sp["count"]
            idx = self._read_view(
                sp["indices"]["bufferView"],
                sp["indices"].get("byteOffset", 0), sc, 1,
                _COMPONENT_DTYPES[sp["indices"]["componentType"]],
            ).reshape(-1).astype(np.int64)
            vals = self._read_view(sp["values"]["bufferView"],
                                   sp["values"].get("byteOffset", 0),
                                   sc, comps, dtype)
            out = out.copy()    # frombuffer views are read-only
            out[idx] = vals

        if dequantize and acc.get("normalized", False):
            info = np.iinfo(dtype)
            out = out.astype(np.float32) / float(info.max)
            if info.min < 0:
                out = np.maximum(out, -1.0)
        return out

    # -- convenience views ---------------------------------------------------

    @property
    def meshes(self):
        return self.doc.get("meshes", [])

    @property
    def nodes(self):
        return self.doc.get("nodes", [])

    @property
    def scenes(self):
        return self.doc.get("scenes", [])

    @property
    def materials(self):
        return self.doc.get("materials", [])

    @property
    def images(self):
        return self.doc.get("images", [])

    @property
    def textures(self):
        return self.doc.get("textures", [])

    @property
    def samplers(self):
        return self.doc.get("samplers", [])

    @property
    def cameras(self):
        return self.doc.get("cameras", [])

    @property
    def lights(self):
        return (self.doc.get("extensions", {})
                .get("KHR_lights_punctual", {})
                .get("lights", []))

    def image_path(self, image_index: int) -> Optional[pathlib.Path]:
        """Filesystem path for an image, or None for embedded data."""
        img = self.images[image_index]
        uri = img.get("uri")
        if uri is None or uri.startswith("data:"):
            return None
        from urllib.parse import unquote
        return self.base_dir / unquote(uri)

    def image_bytes(self, image_index: int) -> bytes:
        """Raw encoded image bytes (file, data URI, or bufferView)."""
        img = self.images[image_index]
        uri = img.get("uri")
        if uri is not None:
            if uri.startswith("data:"):
                return base64.b64decode(uri.split(",", 1)[1])
            return self.image_path(image_index).read_bytes()
        view = self.doc["bufferViews"][img["bufferView"]]
        buf = self.buffers[view["buffer"]]
        start = view.get("byteOffset", 0)
        return bytes(buf[start:start + view["byteLength"]])


def _resolve_buffer(buf: dict, base_dir: pathlib.Path) -> bytes:
    uri = buf.get("uri")
    if uri is None:
        raise ValueError("buffer without uri outside GLB")
    if uri.startswith("data:"):
        return base64.b64decode(uri.split(",", 1)[1])
    from urllib.parse import unquote
    return (base_dir / unquote(uri)).read_bytes()
