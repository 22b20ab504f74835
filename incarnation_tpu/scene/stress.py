"""Procedural Sponza-class stress asset ("atrium").

The reference's headline content is Sponza (ref: config defaults in
inc/common.h + content/models/sponza), whose .bin ships only as an
unfetched LFS stub in this checkout. This generator builds a comparable
stress scene as a standard .gltf + .bin + PNGs so the normal loader path is
exercised end to end:

- multi-room interior, tessellated walls/floors/columns (~300k triangles)
- >= 40 distinct materials with procedural basecolor/normal/metal-rough
  textures (mostly 256-512 px, marble at 1024 and one 2048 banner — the
  resolution mix of real Sponza sources)
- >= 64 punctual lights (points + spots, KHR_lights_punctual)
- alpha-MASK foliage cards (depth-peel + any-hit alpha coverage)
- "decal_"-prefixed decal quads (gbuffer decal pass)
- an open atrium ceiling so the sun shadow map matters
- a glTF camera placed for an interior view

Deterministic (fixed seed); written once into a cache directory and
reloaded from disk afterwards.
"""

from __future__ import annotations

import base64
import io
import json
import pathlib

import numpy as np

ROOMS_X, ROOMS_Z = 3, 2
ROOM = 12.0           # room size (m)
WALL_H = 6.0
TESS = 90             # grid tessellation per surface edge (~300k tris total,
#                       Sponza-scale: 262k)
SEED = 1234


# ---------------------------------------------------------------------------
# Procedural textures
# ---------------------------------------------------------------------------

def _value_noise(rng, size, cells, octaves=3):
    out = np.zeros((size, size), np.float32)
    amp, tot = 1.0, 0.0
    for o in range(octaves):
        c = min(size, cells * (2 ** o))
        g = rng.random((c, c)).astype(np.float32)
        # bilinear upsample with wrap
        ii = np.linspace(0, c, size, endpoint=False)
        i0 = np.floor(ii).astype(int) % c
        i1 = (i0 + 1) % c
        f = (ii - np.floor(ii)).astype(np.float32)
        rows = g[i0][:, i1] * f[None, :] + g[i0][:, i0] * (1 - f[None, :])
        rows2 = g[i1][:, i1] * f[None, :] + g[i1][:, i0] * (1 - f[None, :])
        up = rows * (1 - f[:, None]) + rows2 * f[:, None]
        out += amp * up
        tot += amp
        amp *= 0.5
    return out / tot


def _checker(size, n, c1, c2):
    y, x = np.mgrid[0:size, 0:size]
    m = (((x * n // size) + (y * n // size)) % 2).astype(np.float32)
    return (np.asarray(c1, np.float32)[None, None] * (1 - m[..., None])
            + np.asarray(c2, np.float32)[None, None] * m[..., None])


def _brick(size, nx, ny, mortar, c_brick, c_mortar, rng):
    y, x = np.mgrid[0:size, 0:size]
    row = y * ny // size
    xs = (x + (row % 2) * (size // (2 * nx))) % size
    bx = xs * nx % size < int(size * mortar)
    by = y * ny % size < int(size * mortar)
    m = (bx | by).astype(np.float32)[..., None]
    tint = 0.75 + 0.5 * _value_noise(rng, size, nx)[..., None]
    return (np.asarray(c_brick, np.float32) * tint * (1 - m)
            + np.asarray(c_mortar, np.float32) * m)


def _normal_from_height(h, strength=2.0):
    gx = np.roll(h, -1, 1) - np.roll(h, 1, 1)
    gy = np.roll(h, -1, 0) - np.roll(h, 1, 0)
    n = np.stack([-gx * strength, -gy * strength,
                  np.ones_like(h)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return (n * 0.5 + 0.5)


def _leaf_mask(size, rng, n_leaves=14):
    """RGBA foliage card: green leaves on transparent background."""
    img = np.zeros((size, size, 4), np.float32)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for _ in range(n_leaves):
        cx, cy = rng.random(2) * 0.8 + 0.1
        a, b = 0.05 + 0.1 * rng.random(), 0.02 + 0.05 * rng.random()
        th = rng.random() * np.pi
        dx, dy = x - cx, y - cy
        u = dx * np.cos(th) + dy * np.sin(th)
        v = -dx * np.sin(th) + dy * np.cos(th)
        inside = (u / a) ** 2 + (v / b) ** 2 < 1.0
        g = 0.25 + 0.5 * rng.random()
        img[inside] = [0.08 * g, g * 0.5, 0.05 * g, 1.0]
    return img


def _png_bytes(rgba_f32):
    from PIL import Image
    u8 = np.clip(rgba_f32 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if u8.shape[-1] == 3:
        u8 = np.concatenate([u8, np.full(u8.shape[:2] + (1,), 255,
                                         np.uint8)], -1)
    buf = io.BytesIO()
    Image.fromarray(u8, "RGBA").save(buf, format="PNG")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

class _Builder:
    def __init__(self):
        self.pos, self.nrm, self.uv, self.idx = [], [], [], []
        # (index_start, index_count, material, name, vstart, vcount)
        self.prims = []
        self._mark = 0
        self._vmark = 0

    def grid(self, origin, du, dv, nu, nv, uv_scale=1.0, flip=False):
        """Tessellated parallelogram: origin + s*du + t*dv, s,t in [0,1]."""
        base = sum(p.shape[0] for p in self.pos)
        o = np.asarray(origin, np.float32)
        du = np.asarray(du, np.float32)
        dv = np.asarray(dv, np.float32)
        s = np.linspace(0, 1, nu + 1, dtype=np.float32)
        t = np.linspace(0, 1, nv + 1, dtype=np.float32)
        ss, tt = np.meshgrid(s, t, indexing="ij")
        p = (o[None, None] + ss[..., None] * du[None, None]
             + tt[..., None] * dv[None, None]).reshape(-1, 3)
        n = np.cross(du, dv)
        if flip:
            n = -n
        n = n / max(np.linalg.norm(n), 1e-8)
        self.pos.append(p)
        self.nrm.append(np.tile(n, (p.shape[0], 1)).astype(np.float32))
        lu = np.linalg.norm(du) * uv_scale
        lv = np.linalg.norm(dv) * uv_scale
        self.uv.append(np.stack([ss * lu, tt * lv], -1).reshape(-1, 2)
                       .astype(np.float32))
        i, j = np.meshgrid(np.arange(nu), np.arange(nv), indexing="ij")
        q = (i * (nv + 1) + j).reshape(-1)
        a, b, c, d = q, q + nv + 1, q + nv + 2, q + 1
        tris = (np.stack([a, b, c, a, c, d], -1).reshape(-1, 3)
                if not flip else
                np.stack([a, c, b, a, d, c], -1).reshape(-1, 3))
        self.idx.append((tris + base).astype(np.uint32))

    def cylinder(self, center, radius, height, seg=24, vseg=8, uv_scale=0.5):
        base = sum(p.shape[0] for p in self.pos)
        c = np.asarray(center, np.float32)
        th = np.linspace(0, 2 * np.pi, seg + 1, dtype=np.float32)
        y = np.linspace(0, height, vseg + 1, dtype=np.float32)
        tt, yy = np.meshgrid(th, y, indexing="ij")
        p = np.stack([c[0] + radius * np.cos(tt), c[1] + yy,
                      c[2] + radius * np.sin(tt)], -1).reshape(-1, 3)
        n = np.stack([np.cos(tt), np.zeros_like(tt), np.sin(tt)],
                     -1).reshape(-1, 3)
        self.pos.append(p.astype(np.float32))
        self.nrm.append(n.astype(np.float32))
        self.uv.append(np.stack([tt * radius * uv_scale, yy * uv_scale],
                                -1).reshape(-1, 2).astype(np.float32))
        i, j = np.meshgrid(np.arange(seg), np.arange(vseg), indexing="ij")
        q = (i * (vseg + 1) + j).reshape(-1)
        a, b, cc, d = q, q + vseg + 1, q + vseg + 2, q + 1
        tris = np.stack([a, cc, b, a, d, cc], -1).reshape(-1, 3)
        self.idx.append((tris + base).astype(np.uint32))

    def end_prim(self, material, name="prim"):
        count = sum(ix.shape[0] for ix in self.idx[self._mark:]) * 3
        start = sum(ix.shape[0] for ix in self.idx[:self._mark]) * 3
        # contiguous vertex range of this prim (vertices are appended in
        # prim order) — emitted as per-prim accessors so a loader never
        # duplicates the shared vertex buffer per primitive
        vstart = sum(p.shape[0] for p in self.pos[:self._vmark])
        vcount = sum(p.shape[0] for p in self.pos[self._vmark:])
        self.prims.append((start, count, material, name, vstart, vcount))
        self._mark = len(self.idx)
        self._vmark = len(self.pos)


# ---------------------------------------------------------------------------
# Scene assembly
# ---------------------------------------------------------------------------

def build_atrium(out_dir) -> pathlib.Path:
    """Write atrium.gltf (+ .bin + textures) into out_dir; returns the
    .gltf path. No-op if already generated."""
    out_dir = pathlib.Path(out_dir)
    gltf_path = out_dir / "atrium.gltf"
    if gltf_path.exists():
        return gltf_path
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)

    # -- textures + materials ------------------------------------------------
    images = []      # (filename, bytes)
    materials = []
    textures = []

    def add_tex(name, rgba):
        images.append((f"{name}.png", _png_bytes(rgba)))
        textures.append(len(images) - 1)
        return len(textures) - 1

    def add_material(name, base_tex=None, normal_tex=None, mr_tex=None,
                     base_factor=None, metallic=0.0, roughness=0.9,
                     alpha_mode=None, cutoff=0.5, double_sided=False,
                     emissive=None):
        m = {"name": name, "pbrMetallicRoughness": {
            "metallicFactor": metallic, "roughnessFactor": roughness}}
        if base_tex is not None:
            m["pbrMetallicRoughness"]["baseColorTexture"] = {
                "index": base_tex}
        if base_factor is not None:
            m["pbrMetallicRoughness"]["baseColorFactor"] = list(base_factor)
        if mr_tex is not None:
            m["pbrMetallicRoughness"]["metallicRoughnessTexture"] = {
                "index": mr_tex}
        if normal_tex is not None:
            m["normalTexture"] = {"index": normal_tex}
        if alpha_mode:
            m["alphaMode"] = alpha_mode
            if alpha_mode == "MASK":
                m["alphaCutoff"] = cutoff
        if double_sided:
            m["doubleSided"] = True
        if emissive is not None:
            m["emissiveFactor"] = list(emissive)
        materials.append(m)
        return len(materials) - 1

    n_rooms = ROOMS_X * ROOMS_Z
    floor_mats, wall_mats, col_mats, ceil_mats, trim_mats = [], [], [], [], []
    arch_mats = []
    for r in range(n_rooms):
        hue = rng.random(3) * 0.4 + 0.4
        f = _checker(256, 8, hue * 0.9, hue * 0.55)
        fn = _normal_from_height(_value_noise(rng, 256, 8), 1.0)
        floor_mats.append(add_material(
            f"floor{r}", add_tex(f"floor{r}", f),
            add_tex(f"floor{r}_n", fn), roughness=0.55, metallic=0.05))
        b = _brick(256, 6, 12, 0.06, rng.random(3) * 0.3 + [0.45, 0.3, 0.2],
                   [0.75, 0.73, 0.70], rng)
        bn = _normal_from_height(_value_noise(rng, 256, 12), 2.0)
        wall_mats.append(add_material(
            f"wall{r}", add_tex(f"wall{r}", b),
            add_tex(f"wall{r}_n", bn), roughness=0.85))
        cmarble = 0.6 + 0.35 * _value_noise(rng, 512, 5)[..., None] \
            * np.ones(3)[None, None]
        col_mats.append(add_material(
            f"column{r}", add_tex(f"column{r}", cmarble), roughness=0.35,
            metallic=0.0))
        cl = 0.8 * np.ones((128, 128, 3), np.float32) \
            * (0.8 + 0.2 * _value_noise(rng, 128, 4))[..., None]
        ceil_mats.append(add_material(
            f"ceiling{r}", add_tex(f"ceiling{r}", cl), roughness=0.95))
        tr = _checker(128, 16, [0.6, 0.5, 0.3], [0.5, 0.4, 0.25])
        trim_mats.append(add_material(
            f"trim{r}", add_tex(f"trim{r}", tr), roughness=0.4,
            metallic=0.6))
        ar = _brick(256, 10, 5, 0.05, rng.random(3) * 0.2 + [0.5, 0.45, 0.4],
                    [0.3, 0.28, 0.26], rng)
        arch_mats.append(add_material(
            f"arch{r}", add_tex(f"arch{r}", ar), roughness=0.75))

    # marquee materials at real-Sponza-like source resolutions
    marble_hi = 0.55 + 0.4 * _value_noise(rng, 1024, 7)[..., None] \
        * np.asarray([1.0, 0.97, 0.92])[None, None]
    mat_marble = add_material("marble_hi", add_tex("marble_hi", marble_hi),
                              roughness=0.25)
    banner = _checker(2048, 24, [0.7, 0.12, 0.1], [0.8, 0.7, 0.2])
    banner[..., :3] *= 0.7 + 0.3 * _value_noise(rng, 2048, 6)[..., None]
    mat_banner = add_material("banner_2k", add_tex("banner_2k", banner),
                              roughness=0.8, double_sided=True)
    leaf = _leaf_mask(256, rng)
    mat_leaf = add_material("foliage", add_tex("foliage", leaf),
                            alpha_mode="MASK", cutoff=0.5,
                            double_sided=True, roughness=0.7)
    dec = np.zeros((256, 256, 4), np.float32)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32) / 256
    ring = (np.abs(np.hypot(xx - 0.5, yy - 0.5) - 0.33) < 0.08)
    dec[ring] = [0.1, 0.1, 0.12, 0.9]
    mat_decal = add_material("decal_stain", add_tex("decal_stain", dec),
                             alpha_mode="BLEND", roughness=1.0)
    glow = np.ones((64, 64, 3), np.float32)
    mat_glow = add_material("lampglow", add_tex("lampglow", glow),
                            emissive=[1.0, 0.9, 0.7], roughness=1.0)

    # -- geometry ------------------------------------------------------------
    b = _Builder()
    lights = []       # (type, pos, dir, color, intensity, range, spot)

    for rz in range(ROOMS_Z):
        for rx in range(ROOMS_X):
            r = rz * ROOMS_X + rx
            x0, z0 = rx * ROOM, rz * ROOM
            # floor + ceiling (atrium: center room of row 0 is open to sky)
            b.grid([x0, 0, z0], [ROOM, 0, 0], [0, 0, ROOM], TESS, TESS,
                   uv_scale=0.5)
            b.end_prim(floor_mats[r], f"floor{r}")
            open_sky = (rx == 1 and rz == 0)
            if not open_sky:
                b.grid([x0, WALL_H, z0], [0, 0, ROOM], [ROOM, 0, 0],
                       TESS // 2, TESS // 2, uv_scale=0.5)
                b.end_prim(ceil_mats[r], f"ceiling{r}")
            # outer walls only on the boundary; inner walls have door gaps
            spans_x = [(0.0, 0.42), (0.58, 1.0)]     # door gap in [0.42,0.58]

            lintels = []

            def wall(orig, d_along, outer, flip):
                if outer:
                    b.grid(orig, d_along, [0, WALL_H, 0], TESS, TESS // 2,
                           uv_scale=0.5, flip=flip)
                else:
                    d = np.asarray(d_along, np.float32)
                    for (s0, s1) in spans_x:
                        b.grid(np.asarray(orig, np.float32) + d * s0,
                               d * (s1 - s0), [0, WALL_H, 0],
                               TESS // 2, TESS // 2, uv_scale=0.5, flip=flip)
                    # lintel above the door (separate arch material)
                    lintels.append((np.asarray(orig, np.float32) + d * 0.42
                                    + np.asarray([0, WALL_H * 0.7, 0]),
                                    d * 0.16, flip))

            if rz == 0:
                wall([x0, 0, z0], [ROOM, 0, 0], True, False)
            if rz == ROOMS_Z - 1:
                wall([x0, 0, z0 + ROOM], [ROOM, 0, 0], True, True)
            else:
                wall([x0, 0, z0 + ROOM], [ROOM, 0, 0], False, True)
            if rx == 0:
                wall([x0, 0, z0], [0, 0, ROOM], True, True)
            if rx == ROOMS_X - 1:
                wall([x0 + ROOM, 0, z0], [0, 0, ROOM], True, False)
            else:
                wall([x0 + ROOM, 0, z0], [0, 0, ROOM], False, False)
            b.end_prim(wall_mats[r], f"walls{r}")
            if lintels:
                for (lo, ld, lf) in lintels:
                    b.grid(lo, ld, [0, WALL_H * 0.3, 0], TESS // 4,
                           TESS // 8, uv_scale=0.5, flip=lf)
                b.end_prim(arch_mats[r], f"arches{r}")

            # columns
            for (cx, cz) in [(0.25, 0.25), (0.75, 0.25), (0.25, 0.75),
                             (0.75, 0.75)]:
                b.cylinder([x0 + cx * ROOM, 0, z0 + cz * ROOM], 0.35,
                           WALL_H, seg=32, vseg=16)
            b.end_prim(col_mats[r], f"columns{r}")

            # trim skirting
            b.grid([x0, 0.02, z0 + 0.01], [ROOM, 0, 0], [0, 0.4, 0], 8, 2)
            b.end_prim(trim_mats[r], f"trim{r}")

            # punctual lights: 8 points + 3 spots per room = 66 total
            base_y = WALL_H * 0.55
            for li in range(8):
                lx = x0 + (0.2 + 0.6 * rng.random()) * ROOM
                lz = z0 + (0.2 + 0.6 * rng.random()) * ROOM
                col = (0.6 + 0.4 * rng.random(3)).tolist()
                lights.append(("point", [lx, base_y, lz], None, col,
                               8.0 + 10.0 * rng.random(), 9.0, None))
            for li in range(3):
                lx = x0 + (0.3 + 0.4 * rng.random()) * ROOM
                lz = z0 + (0.3 + 0.4 * rng.random()) * ROOM
                lights.append(("spot", [lx, WALL_H - 0.4, lz],
                               [0.0, -1.0, 0.0],
                               [1.0, 0.95, 0.8], 40.0, 14.0,
                               [0.4, 0.8]))

            # foliage: crossed MASK cards
            n_plants = 10
            for p in range(n_plants):
                px = x0 + (0.15 + 0.7 * rng.random()) * ROOM
                pz = z0 + (0.15 + 0.7 * rng.random()) * ROOM
                s = 0.8 + 0.8 * rng.random()
                for axis in ((s, 0, 0), (0, 0, s)):
                    b.grid([px - axis[0] / 2, 0, pz - axis[2] / 2],
                           list(axis), [0, s * 1.4, 0], 2, 2,
                           uv_scale=1.0 / max(s, 1e-3))
            b.end_prim(mat_leaf, f"plants{r}")

    # marble dais + 2K banners in the atrium room
    ax0 = 1 * ROOM + ROOM * 0.3
    az0 = 0 * ROOM + ROOM * 0.3
    b.grid([ax0, 0.3, az0], [ROOM * 0.4, 0, 0], [0, 0, ROOM * 0.4],
           TESS // 2, TESS // 2, uv_scale=0.8)
    b.end_prim(mat_marble, "dais")
    for bx in (0.2, 0.8):
        b.grid([ROOM + bx * ROOM - 1.0, WALL_H * 0.85, az0],
               [2.0, 0, 0], [0, -WALL_H * 0.55, 0.3], 8, 16, uv_scale=0.5)
    b.end_prim(mat_banner, "banners")
    # emissive lamp fixtures (one per room)
    for rz in range(ROOMS_Z):
        for rx in range(ROOMS_X):
            b.cylinder([rx * ROOM + ROOM / 2, WALL_H - 0.8,
                        rz * ROOM + ROOM / 2], 0.15, 0.5, seg=8, vseg=2)
    b.end_prim(mat_glow, "lamps")

    # main geometry node done; decal quads as separate "decal_" meshes
    decal_prims = []
    for d in range(6):
        rx = rng.integers(0, ROOMS_X)
        rz = rng.integers(0, ROOMS_Z)
        dx = rx * ROOM + (0.2 + 0.6 * rng.random()) * ROOM
        dz = rz * ROOM + (0.2 + 0.6 * rng.random()) * ROOM
        s = 1.0 + rng.random()
        b.grid([dx - s / 2, 0.011, dz - s / 2], [s, 0, 0], [0, 0, s], 2, 2,
               uv_scale=1.0 / s)
        b.end_prim(mat_decal, f"decal{d}")
        decal_prims.append(len(b.prims) - 1)

    # -- glTF document -------------------------------------------------------
    positions = np.concatenate(b.pos)
    normals = np.concatenate(b.nrm)
    uvs = np.concatenate(b.uv)
    indices = np.concatenate([ix.reshape(-1) for ix in b.idx])
    for fname, data in images:
        (out_dir / fname).write_bytes(data)

    nv = positions.shape[0]
    off_n = nv * 12
    off_uv = off_n + nv * 12
    off_idx = off_uv + nv * 8
    accessors = []
    buffer_views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": nv * 12},
        {"buffer": 0, "byteOffset": off_n, "byteLength": nv * 12},
        {"buffer": 0, "byteOffset": off_uv, "byteLength": nv * 8},
        {"buffer": 0, "byteOffset": off_idx,
         "byteLength": indices.shape[0] * 4},
    ]

    def prim_entry(start, count, mat, vstart, vcount):
        # per-prim accessor windows into the shared buffers; indices are
        # stored rebased to the prim's vertex range
        pmin = positions[vstart:vstart + vcount].min(0).tolist()
        pmax = positions[vstart:vstart + vcount].max(0).tolist()
        indices[start:start + count] -= vstart
        base = len(accessors)
        accessors.extend([
            {"bufferView": 0, "componentType": 5126, "count": vcount,
             "byteOffset": vstart * 12, "type": "VEC3",
             "min": pmin, "max": pmax},
            {"bufferView": 1, "componentType": 5126, "count": vcount,
             "byteOffset": vstart * 12, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": vcount,
             "byteOffset": vstart * 8, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5125, "count": count,
             "byteOffset": start * 4, "type": "SCALAR"},
        ])
        return {"attributes": {"POSITION": base, "NORMAL": base + 1,
                               "TEXCOORD_0": base + 2},
                "indices": base + 3, "material": mat}

    main_prims = [prim_entry(s, c, m, vs, vc) for i, (s, c, m, _, vs, vc) in
                  enumerate(b.prims) if i not in decal_prims]
    decal_mesh_prims = [prim_entry(s, c, m, vs, vc)
                        for i, (s, c, m, _, vs, vc) in
                        enumerate(b.prims) if i in decal_prims]

    # write the buffer AFTER prim_entry rebased the per-prim indices
    bin_blob = (positions.astype("<f4").tobytes()
                + normals.astype("<f4").tobytes()
                + uvs.astype("<f4").tobytes()
                + indices.astype("<u4").tobytes())
    (out_dir / "atrium.bin").write_bytes(bin_blob)

    meshes = [{"name": "atrium", "primitives": main_prims},
              {"name": "decal_stains", "primitives": decal_mesh_prims}]
    nodes = [{"mesh": 0, "name": "atrium"},
             {"mesh": 1, "name": "decal_stains"}]

    # lights (KHR_lights_punctual) — one node each
    klights = []
    for (lt, pos, ldir, col, inten, rng_, spot) in lights:
        li = {"type": lt, "color": col, "intensity": inten, "range": rng_}
        if spot is not None:
            li["spot"] = {"innerConeAngle": spot[0],
                          "outerConeAngle": spot[1]}
        klights.append(li)
        node = {"name": f"light{len(klights)}",
                "translation": [float(v) for v in pos],
                "extensions": {"KHR_lights_punctual": {
                    "light": len(klights) - 1}}}
        if ldir is not None:
            # glTF lights point down local -z; rotate -z onto ldir
            # (straight down = rotate -90 deg about x)
            node["rotation"] = [-0.7071068, 0.0, 0.0, 0.7071068]
        nodes.append(node)

    # interior camera: in the atrium room looking across the rooms
    # (glTF camera looks down local -z; authored via matrix)
    cam_pos = np.asarray([ROOM * 0.55, 2.2, ROOM * 1.8])
    target = np.asarray([ROOM * 1.7, 1.8, ROOM * 0.45])
    fwd = target - cam_pos
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(np.asarray([0.0, 1.0, 0.0]), fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    mat = np.eye(4)
    mat[:3, 0] = right
    mat[:3, 1] = up
    mat[:3, 2] = -fwd          # glTF camera: -z forward
    mat[:3, 3] = cam_pos
    nodes.append({"name": "camera0", "camera": 0,
                  "matrix": [float(v) for v in mat.T.reshape(-1)]})
    cameras = [{"type": "perspective", "name": "camera0",
                "perspective": {"yfov": 0.9, "znear": 0.1}}]

    doc = {
        "asset": {"version": "2.0", "generator": "incarnation_tpu stress"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": meshes,
        "cameras": cameras,
        "materials": materials,
        "textures": [{"source": i, "sampler": 0} for i in textures],
        "images": [{"uri": fname} for fname, _ in images],
        "samplers": [{"wrapS": 10497, "wrapT": 10497}],
        "accessors": accessors,
        "bufferViews": buffer_views,
        "buffers": [{"uri": "atrium.bin", "byteLength": len(bin_blob)}],
        "extensionsUsed": ["KHR_lights_punctual"],
        "extensions": {"KHR_lights_punctual": {"lights": klights}},
    }
    gltf_path.write_text(json.dumps(doc))
    return gltf_path


if __name__ == "__main__":
    import sys
    d = sys.argv[1] if len(sys.argv) > 1 else ".content_cache/atrium"
    p = build_atrium(d)
    print(p)
