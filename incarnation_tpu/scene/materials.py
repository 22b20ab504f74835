"""Material table (SoA) built from glTF materials.

Mirrors the reference's FMaterial struct (ref: inc/gpu-shared-types.h:104-137)
and LoadMaterial (ref: src/scene.cpp:887-1018): glTF PBR metallic-roughness
plus KHR_materials_transmission and KHR_materials_clearcoat, alpha modes, and
9 texture slots. Differences from the reference by design:

- Texture indices address the scene TextureAtlas (one flat mip stack) rather
  than bindless descriptor slots; samplers collapse into per-texture address
  modes stored in the atlas.
- The reference swizzles metallic into R when BC5-compressing the
  metal-roughness map (ref: material/common.hlsli:61-63); we sample the glTF
  texture directly, so metallic stays in B and roughness in G per glTF spec.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

ALPHA_OPAQUE = 0
ALPHA_MASK = 1
ALPHA_BLEND = 2

_ALPHA_MODES = {"OPAQUE": ALPHA_OPAQUE, "MASK": ALPHA_MASK,
                "BLEND": ALPHA_BLEND}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MaterialTable:
    emissive_factor: jnp.ndarray        # (NM, 3) f32
    base_color_factor: jnp.ndarray      # (NM, 4) f32
    metallic_factor: jnp.ndarray        # (NM,) f32
    roughness_factor: jnp.ndarray       # (NM,) f32
    ao_strength: jnp.ndarray            # (NM,) f32
    transmission_factor: jnp.ndarray    # (NM,) f32
    clearcoat_factor: jnp.ndarray       # (NM,) f32
    clearcoat_roughness_factor: jnp.ndarray  # (NM,) f32
    alpha_cutoff: jnp.ndarray           # (NM,) f32
    alpha_mode: jnp.ndarray             # (NM,) i32
    double_sided: jnp.ndarray           # (NM,) i32
    # Texture indices into the scene atlas; -1 = absent.
    tex_emissive: jnp.ndarray           # (NM,) i32
    tex_base_color: jnp.ndarray
    tex_metallic_roughness: jnp.ndarray
    tex_normal: jnp.ndarray
    tex_ao: jnp.ndarray
    tex_transmission: jnp.ndarray
    tex_clearcoat: jnp.ndarray
    tex_clearcoat_roughness: jnp.ndarray
    tex_clearcoat_normal: jnp.ndarray
    normal_scale: jnp.ndarray           # (NM,) f32 (glTF normalTexture.scale)


def _tex_index(tex_info) -> int:
    return tex_info["index"] if tex_info is not None else -1


def build_material_table(gltf) -> MaterialTable:
    """Parse gltf.materials into a MaterialTable (numpy -> device arrays)."""
    mats = list(gltf.materials)
    if not mats:
        mats = [{}]  # default material per glTF spec
    n = len(mats)

    def zeros(shape, dtype=np.float32):
        return np.zeros((n,) + shape, dtype)

    emissive = zeros((3,))
    base_color = np.ones((n, 4), np.float32)
    metallic = np.ones((n,), np.float32)
    roughness = np.ones((n,), np.float32)
    ao_strength = np.ones((n,), np.float32)
    transmission = zeros(())
    clearcoat = zeros(())
    clearcoat_rough = zeros(())
    alpha_cutoff = np.full((n,), 0.5, np.float32)
    alpha_mode = zeros((), np.int32)
    double_sided = zeros((), np.int32)
    normal_scale = np.ones((n,), np.float32)
    tex = {k: np.full((n,), -1, np.int32) for k in
           ["emissive", "base_color", "metal_rough", "normal", "ao",
            "transmission", "clearcoat", "clearcoat_rough",
            "clearcoat_normal"]}

    for i, m in enumerate(mats):
        pbr = m.get("pbrMetallicRoughness", {})
        base_color[i] = np.asarray(
            pbr.get("baseColorFactor", [1, 1, 1, 1]), np.float32)
        metallic[i] = pbr.get("metallicFactor", 1.0)
        roughness[i] = pbr.get("roughnessFactor", 1.0)
        emissive[i] = np.asarray(
            m.get("emissiveFactor", [0, 0, 0]), np.float32)
        alpha_mode[i] = _ALPHA_MODES.get(m.get("alphaMode", "OPAQUE"), 0)
        alpha_cutoff[i] = m.get("alphaCutoff", 0.5)
        double_sided[i] = int(m.get("doubleSided", False))

        tex["base_color"][i] = _tex_index(pbr.get("baseColorTexture"))
        tex["metal_rough"][i] = _tex_index(
            pbr.get("metallicRoughnessTexture"))
        tex["emissive"][i] = _tex_index(m.get("emissiveTexture"))
        nt = m.get("normalTexture")
        tex["normal"][i] = _tex_index(nt)
        if nt is not None:
            normal_scale[i] = nt.get("scale", 1.0)
        ot = m.get("occlusionTexture")
        tex["ao"][i] = _tex_index(ot)
        if ot is not None:
            ao_strength[i] = ot.get("strength", 1.0)

        ext = m.get("extensions", {})
        tr = ext.get("KHR_materials_transmission")
        if tr is not None:
            transmission[i] = tr.get("transmissionFactor", 0.0)
            tex["transmission"][i] = _tex_index(tr.get("transmissionTexture"))
        cc = ext.get("KHR_materials_clearcoat")
        if cc is not None:
            clearcoat[i] = cc.get("clearcoatFactor", 0.0)
            clearcoat_rough[i] = cc.get("clearcoatRoughnessFactor", 0.0)
            tex["clearcoat"][i] = _tex_index(cc.get("clearcoatTexture"))
            tex["clearcoat_rough"][i] = _tex_index(
                cc.get("clearcoatRoughnessTexture"))
            tex["clearcoat_normal"][i] = _tex_index(
                cc.get("clearcoatNormalTexture"))

    return MaterialTable(
        emissive_factor=jnp.asarray(emissive),
        base_color_factor=jnp.asarray(base_color),
        metallic_factor=jnp.asarray(metallic),
        roughness_factor=jnp.asarray(roughness),
        ao_strength=jnp.asarray(ao_strength),
        transmission_factor=jnp.asarray(transmission),
        clearcoat_factor=jnp.asarray(clearcoat),
        clearcoat_roughness_factor=jnp.asarray(clearcoat_rough),
        alpha_cutoff=jnp.asarray(alpha_cutoff),
        alpha_mode=jnp.asarray(alpha_mode),
        double_sided=jnp.asarray(double_sided),
        tex_emissive=jnp.asarray(tex["emissive"]),
        tex_base_color=jnp.asarray(tex["base_color"]),
        tex_metallic_roughness=jnp.asarray(tex["metal_rough"]),
        tex_normal=jnp.asarray(tex["normal"]),
        tex_ao=jnp.asarray(tex["ao"]),
        tex_transmission=jnp.asarray(tex["transmission"]),
        tex_clearcoat=jnp.asarray(tex["clearcoat"]),
        tex_clearcoat_roughness=jnp.asarray(tex["clearcoat_rough"]),
        tex_clearcoat_normal=jnp.asarray(tex["clearcoat_normal"]),
        normal_scale=jnp.asarray(normal_scale),
    )


def pack_material_params(t: MaterialTable) -> jnp.ndarray:
    """Pack per-material scalar factors into one (NM, 16) f32 row so the
    resolve fetches everything with a single gather (per-pixel random access
    is the scarce TPU resource). Layout:
      0-2 emissive_factor, 3-6 base_color_factor, 7 metallic, 8 roughness,
      9 ao_strength, 10 normal_scale, 11 alpha_cutoff, 12 alpha_mode,
      13 transmission, 14 clearcoat, 15 clearcoat_roughness."""
    return jnp.stack([
        t.emissive_factor[:, 0], t.emissive_factor[:, 1],
        t.emissive_factor[:, 2],
        t.base_color_factor[:, 0], t.base_color_factor[:, 1],
        t.base_color_factor[:, 2], t.base_color_factor[:, 3],
        t.metallic_factor, t.roughness_factor, t.ao_strength,
        t.normal_scale, t.alpha_cutoff, t.alpha_mode.astype(jnp.float32),
        t.transmission_factor, t.clearcoat_factor,
        t.clearcoat_roughness_factor,
    ], axis=-1)


def texture_srgb_flags(gltf) -> list:
    """Which glTF textures hold sRGB data: basecolor + emissive slots
    (ref: src/scene.cpp:1020-1102 picks BC3-sRGB for albedo/emissive)."""
    srgb = [False] * len(gltf.textures)
    for m in gltf.materials:
        pbr = m.get("pbrMetallicRoughness", {})
        for info in [pbr.get("baseColorTexture"), m.get("emissiveTexture")]:
            if info is not None and 0 <= info["index"] < len(srgb):
                srgb[info["index"]] = True
    return srgb
