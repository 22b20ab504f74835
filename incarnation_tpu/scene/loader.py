"""Scene loading: glTF -> packed SoA device arrays.

The reference (ref: src/scene.cpp FScene::ReloadModel, lines 91-219) keeps the
raw glTF buffers on the GPU and lets shaders chase bufferview/accessor tables
bindlessly (ref: src/scene.cpp:371-478). That design is GPU-pointer-chasing;
on TPU we instead flatten everything at load into globally indexed SoA arrays
so every per-pixel lookup is one flat gather:

- vertices of all primitives concatenated (positions/normals/tangents/uvs),
- one global triangle list (vertex ids + owning primitive id),
- per-primitive tables (mesh/transform id, material id, bounding sphere,
  triangle range) mirroring FGpuPrimitive (ref: inc/gpu-shared-types.h:74-99),
- per-mesh-instance world transforms (node walk with the RH->LH root
  transform, ref: src/scene.cpp:152-167, 228-276),
- material/light tables and the texture atlas.

Arrays are padded to bucket sizes so different scenes of similar size reuse
jit caches (SURVEY.md §7 "dynamic shapes" hard part).
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import mathutils as mu
from . import gltf as gltf_mod
from . import materials as materials_mod
from . import lights as lights_mod
from . import tangents as tangents_mod
from . import textures as textures_mod


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class SceneMeta:
    num_vertices: int        # real counts (arrays are padded beyond these)
    num_triangles: int
    num_primitives: int
    num_meshes: int
    padded_vertices: int
    padded_triangles: int
    padded_primitives: int
    has_decals: bool = False  # any "decal"-prefixed meshes (ref: scene.cpp:281)
    num_lights: int = 0       # real punctual-light count (the device table is
    #                           padded to >= 1; passes gate on this instead)
    has_masked: bool = False  # any MASK/BLEND alpha-mode primitives — gates
    #                           the masked raster layers (visibility-pass.hlsl
    #                           alpha clip equivalent)
    has_extras: bool = False  # any KHR transmission/clearcoat factors —
    #                           gates the extra shading lobes
    has_blend: bool = False   # any BLEND alpha-mode primitives — gates the
    #                           forward path's alpha-composited layers
    #                           (ref: forward-pass.inl blend-state draws)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scene:
    """Device-side packed scene (the analogue of the reference's GPU scene
    buffers, ref: src/scene.cpp:480-670)."""
    # Geometry (object space)
    positions: jnp.ndarray       # (V, 3) f32
    normals: jnp.ndarray         # (V, 3) f32
    tangents: jnp.ndarray        # (V, 4) f32 xyz + handedness
    uvs: jnp.ndarray             # (V, 2) f32
    tri_vtx: jnp.ndarray         # (T, 3) i32 global vertex ids
    tri_prim: jnp.ndarray        # (T,) i32 owning primitive (-1 = padding)
    vtx_mesh: jnp.ndarray        # (V,) i32 mesh-instance (transform) index
    # Static per-triangle corner table: [pos3 n3 tan4 uv2] x 3 corners.
    # Built once at load so the per-frame raster prep streams triangle
    # attributes SEQUENTIALLY instead of gathering per-vertex tables three
    # times per triangle — per-frame random access is the scarce TPU
    # resource, HBM bandwidth is not (profiled: the three corner gathers
    # were ~8 ms of the 1080p frame; this table reads at ~full bandwidth).
    tri_corner: jnp.ndarray      # (36, T) f32 channel-major (see
    #                                triangle_corner_table)
    tri_mesh: jnp.ndarray        # (T,) i32 mesh-instance index
    # Primitives
    prim_mesh: jnp.ndarray       # (P,) i32 mesh-instance (transform) index
    prim_material: jnp.ndarray   # (P,) i32
    prim_tri_offset: jnp.ndarray  # (P,) i32 first global triangle
    prim_tri_count: jnp.ndarray  # (P,) i32
    prim_bsphere: jnp.ndarray    # (P, 4) f32 object-space center + radius
    prim_double_sided: jnp.ndarray  # (P,) i32
    prim_is_decal: jnp.ndarray   # (P,) i32 ("decal"-prefixed meshes,
    #                                ref: src/scene.cpp:281)
    prim_alpha_mode: jnp.ndarray  # (P,) i32
    # Meshlets (culling granularity, ref: src/mesh-utils.cpp Meshletize)
    tri_meshlet: jnp.ndarray     # (T,) i32 meshlet id (-1 = padding)
    meshlet_bsphere: jnp.ndarray  # (ML, 4) f32 object-space center + radius
    meshlet_mesh: jnp.ndarray    # (ML,) i32 mesh-instance index
    # Owning primitive per meshlet (meshlets never span primitives). Lets the
    # raster prep fold meshlet + primitive visibility/material into ONE
    # per-triangle row gather keyed by tri_meshlet (a separate per-triangle
    # expansion of the meshlet mask profiled at ~1.9 ms per 262k triangles).
    meshlet_prim: jnp.ndarray    # (ML,) i32
    # Mesh instances
    mesh_transforms: jnp.ndarray  # (M, 4, 4) f32 world (includes RH->LH)
    mesh_visible: jnp.ndarray    # (M,) i32
    # Tables
    materials: materials_mod.MaterialTable
    mat_params: jnp.ndarray      # (NM, 16) f32 packed factors (one gather)
    mat_stack: textures_mod.MaterialTextureStack
    lights: lights_mod.LightTable
    sun_dir: jnp.ndarray         # (3,) f32 toward the sun
    meta: SceneMeta = dataclasses.field(metadata=dict(static=True),
                                        default=None)


@dataclasses.dataclass
class SceneHost:
    """Host-side load results that don't belong on device."""
    scene: Scene
    cameras: list                # list of dicts with view basis + projection
    bounds_center: np.ndarray
    bounds_extent: np.ndarray
    directional_light_index: int
    name: str = ""
    source_path: str = ""        # file the scene was loaded from


def _bucket(n: int, quantum: int) -> int:
    return max(quantum, int(np.ceil(n / quantum)) * quantum)


def triangle_corner_table(positions, normals, tangents, uvs,
                          tri_vtx) -> np.ndarray:
    """(36, T) static corner-attribute table (see Scene.tri_corner).

    Stored CHANNEL-MAJOR: each of the 36 rows is a dense (T,) lane vector,
    so the per-frame setup math runs on fully-packed (8, 128) tiles instead
    of 3-lane-wide (T, 3) arrays (which use 3 of 128 lanes — the narrow
    layout profiled ~5.7 ms of the 1080p frame's geometry prep)."""
    at = np.concatenate([
        np.asarray(positions, np.float32), np.asarray(normals, np.float32),
        np.asarray(tangents, np.float32), np.asarray(uvs, np.float32),
    ], axis=-1)                                       # (V, 12)
    return at[np.asarray(tri_vtx, np.int32)].reshape(-1, 36).T.copy()


def load_scene(path, texture_max_dim: int = 2048,
               tod_sun: Optional[tuple] = None,
               progress=None) -> SceneHost:
    """Load a glTF file into a packed Scene.

    tod_sun: optional (decimal_hours, julian_date, latitude) for the
    time-of-day sun (ref: FConfig ToD_* fields); otherwise the scene's
    directional light or the default direction is used.
    progress: optional callable(stage: str, fraction: float) — load-
    progress reporting during the slow stages (geometry packing, texture
    decode/mips), mirroring the reference's async-load progress counters
    (ref: inc/scene.h:131-142 CurrentProgress/Size accumulators).
    """
    path = pathlib.Path(path)
    g = gltf_mod.Gltf.load(path)
    progress = progress or (lambda stage, frac: None)

    # ---- node walk (ref: src/scene.cpp:228-276) ----------------------------
    mesh_instances = []   # (mesh_index, world_transform, name)
    light_defs = []
    light_transforms = []
    cameras = []

    def walk(node_index, parent):
        node = g.nodes[node_index]
        local = np.eye(4, dtype=np.float32)
        if "matrix" in node:
            # glTF stores column-major; SimpleMath reads the same 16 floats
            # row-major, which transposes — i.e. yields the row-vector form.
            local = np.asarray(node["matrix"], np.float32).reshape(4, 4)
        elif ("translation" in node or "rotation" in node or "scale" in node):
            local = mu.trs_matrix(node.get("translation"),
                                  node.get("rotation"), node.get("scale"))
        world = local @ parent
        if "camera" in node:
            cameras.append(_camera_from_node(g, node["camera"], world))
        if "mesh" in node:
            mesh_instances.append(
                (node["mesh"], world, node.get("name", "")))
        ext = node.get("extensions", {}).get("KHR_lights_punctual")
        if ext is not None:
            light_defs.append(g.lights[ext["light"]])
            light_transforms.append(world)
        for c in node.get("children", []):
            walk(c, world)

    scene_def = g.scenes[g.doc.get("scene", 0)] if g.scenes else {"nodes": []}
    for root in scene_def.get("nodes", []):
        walk(root, mu.RH_TO_LH)

    # ---- geometry packing ---------------------------------------------------
    positions, normals, tangents, uvs = [], [], [], []
    tri_vtx, tri_prim, vtx_mesh = [], [], []
    prim_mesh, prim_material, prim_tri_offset, prim_tri_count = [], [], [], []
    prim_bsphere, prim_double_sided, prim_is_decal, prim_alpha = [], [], [], []
    mesh_transforms = []

    mat_table_np = g.materials
    vert_base = 0
    tri_base = 0
    bounds_min = np.full(3, np.inf)
    bounds_max = np.full(3, -np.inf)

    for inst_i, (mesh_idx, world, name) in enumerate(mesh_instances):
        progress("geometry", inst_i / max(len(mesh_instances), 1))
        mesh = g.meshes[mesh_idx]
        mesh_id = len(mesh_transforms)
        mesh_transforms.append(world)
        is_decal = 1 if (mesh.get("name", name) or name).startswith(
            "decal") else 0
        for prim in mesh["primitives"]:
            if prim.get("mode", gltf_mod.MODE_TRIANGLES) \
                    != gltf_mod.MODE_TRIANGLES:
                continue  # the reference only draws triangle lists
            attrs = prim["attributes"]
            pos = g.accessor(attrs["POSITION"]).astype(np.float32)
            count = pos.shape[0]
            nrm = (g.accessor(attrs["NORMAL"]).astype(np.float32)
                   if "NORMAL" in attrs else np.zeros((count, 3), np.float32))
            uv = (g.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                  if "TEXCOORD_0" in attrs
                  else np.zeros((count, 2), np.float32))
            if "indices" in prim:
                idx = g.accessor(prim["indices"]).astype(np.int64).reshape(-1)
            else:
                idx = np.arange(count, dtype=np.int64)
            tris = idx.reshape(-1, 3)

            mat_id = prim.get("material", 0)
            mat = mat_table_np[mat_id] if mat_id < len(mat_table_np) else {}
            if "TANGENT" in attrs:
                tan = g.accessor(attrs["TANGENT"]).astype(np.float32)
            elif mat.get("normalTexture") is not None:
                # ref: MeshUtils::FixupMeshes generates MikkTSpace tangents
                tan = tangents_mod.generate_tangents(
                    pos, nrm, uv, tris.astype(np.int32))
            else:
                tan = np.zeros((count, 4), np.float32)
                tan[:, 0] = 1.0
                tan[:, 3] = 1.0

            prim_id = len(prim_mesh)
            ntris = tris.shape[0]
            positions.append(pos)
            normals.append(nrm)
            tangents.append(tan)
            uvs.append(uv)
            tri_vtx.append(tris + vert_base)
            tri_prim.append(np.full(ntris, prim_id, np.int64))
            vtx_mesh.append(np.full(count, mesh_id, np.int64))
            prim_mesh.append(mesh_id)
            prim_material.append(mat_id)
            prim_tri_offset.append(tri_base)
            prim_tri_count.append(ntris)
            center = 0.5 * (pos.min(0) + pos.max(0))
            radius = float(np.linalg.norm(pos - center, axis=1).max())
            prim_bsphere.append(np.concatenate([center, [radius]]))
            prim_double_sided.append(int(mat.get("doubleSided", False)))
            prim_is_decal.append(is_decal)
            prim_alpha.append(materials_mod._ALPHA_MODES.get(
                mat.get("alphaMode", "OPAQUE"), 0))

            wpos = pos @ world[:3, :3] + world[3, :3]
            bounds_min = np.minimum(bounds_min, wpos.min(0))
            bounds_max = np.maximum(bounds_max, wpos.max(0))

            vert_base += count
            tri_base += ntris

    if not positions:
        raise ValueError(f"no triangle geometry in {path}")

    positions = np.concatenate(positions)
    normals = np.concatenate(normals)
    tangents = np.concatenate(tangents)
    uvs = np.concatenate(uvs)
    tri_vtx = np.concatenate(tri_vtx).astype(np.int32)
    tri_prim = np.concatenate(tri_prim).astype(np.int32)
    vtx_mesh = np.concatenate(vtx_mesh).astype(np.int32)

    nv, nt, npr = positions.shape[0], tri_vtx.shape[0], len(prim_mesh)
    pv, pt, pp = _bucket(nv, 4096), _bucket(nt, 4096), _bucket(npr, 64)

    def pad(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[:a.shape[0]] = a
        return out

    # ---- textures (interleaved per-material stacks) ------------------------
    progress("geometry", 1.0)
    mat_stack = textures_mod.build_material_stacks(
        g, max_dim=texture_max_dim,
        progress=lambda frac: progress("textures", frac))
    progress("textures", 1.0)

    # ---- lights / sun -------------------------------------------------------
    lights = lights_mod.build_light_table(light_defs, light_transforms)
    dir_idx = next((i for i, d in enumerate(light_defs)
                    if d.get("type") == "directional"), -1)
    if tod_sun is not None:
        sun = lights_mod.sun_direction_tod(*tod_sun)
    elif dir_idx >= 0:
        sun = np.asarray(lights_mod.light_direction_toward(
            jnp.asarray(light_transforms[dir_idx])))
    else:
        sun = lights_mod.DEFAULT_SUN_DIR

    mat_table = materials_mod.build_material_table(g)
    has_extras = bool(
        float(np.max(np.asarray(mat_table.transmission_factor))) > 0.0
        or float(np.max(np.asarray(mat_table.clearcoat_factor))) > 0.0)
    meta = SceneMeta(num_vertices=nv, num_triangles=nt, num_primitives=npr,
                     num_meshes=len(mesh_transforms), padded_vertices=pv,
                     padded_triangles=pt, padded_primitives=pp,
                     has_decals=bool(np.any(np.asarray(prim_is_decal))),
                     num_lights=len(light_defs),
                     has_masked=bool(np.any(np.asarray(prim_alpha) > 0)),
                     has_extras=has_extras,
                     has_blend=bool(np.any(np.asarray(prim_alpha) >= 2)))

    # Meshlets (ref: src/scene.cpp:1488-1558 GenerateMeshlets)
    from . import meshlets as meshlets_mod
    mtab = meshlets_mod.meshletize(positions, tri_vtx, tri_prim,
                                   np.asarray(prim_mesh, np.int32))
    tri_meshlet = np.empty(nt, np.int32)
    tri_meshlet[mtab.tri_order] = mtab.tri_meshlet
    n_meshlets = mtab.bsphere.shape[0]
    meshlet_prim = np.zeros(n_meshlets, np.int32)
    meshlet_prim[tri_meshlet] = np.asarray(tri_prim, np.int32)

    scene = Scene(
        positions=jnp.asarray(pad(positions, pv)),
        normals=jnp.asarray(pad(normals, pv)),
        tangents=jnp.asarray(pad(tangents, pv)),
        uvs=jnp.asarray(pad(uvs, pv)),
        tri_vtx=jnp.asarray(pad(tri_vtx, pt)),
        tri_prim=jnp.asarray(pad(tri_prim, pt, fill=-1)),
        vtx_mesh=jnp.asarray(pad(vtx_mesh, pv)),
        tri_corner=jnp.asarray(np.pad(triangle_corner_table(
            positions, normals, tangents, uvs, tri_vtx),
            ((0, 0), (0, pt - nt)))),
        tri_mesh=jnp.asarray(pad(
            np.asarray(vtx_mesh, np.int32)[tri_vtx[:, 0]], pt)),
        prim_mesh=jnp.asarray(pad(np.asarray(prim_mesh, np.int32), pp)),
        prim_material=jnp.asarray(
            pad(np.asarray(prim_material, np.int32), pp)),
        prim_tri_offset=jnp.asarray(
            pad(np.asarray(prim_tri_offset, np.int32), pp)),
        prim_tri_count=jnp.asarray(
            pad(np.asarray(prim_tri_count, np.int32), pp)),
        prim_bsphere=jnp.asarray(
            pad(np.asarray(prim_bsphere, np.float32), pp)),
        prim_double_sided=jnp.asarray(
            pad(np.asarray(prim_double_sided, np.int32), pp)),
        prim_is_decal=jnp.asarray(
            pad(np.asarray(prim_is_decal, np.int32), pp)),
        prim_alpha_mode=jnp.asarray(
            pad(np.asarray(prim_alpha, np.int32), pp)),
        tri_meshlet=jnp.asarray(pad(tri_meshlet, pt, fill=-1)),
        meshlet_bsphere=jnp.asarray(mtab.bsphere),
        meshlet_mesh=jnp.asarray(mtab.mesh),
        meshlet_prim=jnp.asarray(meshlet_prim),
        mesh_transforms=jnp.asarray(
            np.stack(mesh_transforms).astype(np.float32)),
        mesh_visible=jnp.ones((len(mesh_transforms),), jnp.int32),
        materials=mat_table,
        mat_params=materials_mod.pack_material_params(mat_table),
        mat_stack=mat_stack,
        lights=lights,
        sun_dir=jnp.asarray(sun),
        meta=meta,
    )

    center = 0.5 * (bounds_min + bounds_max)
    extent = 0.5 * (bounds_max - bounds_min)
    return SceneHost(scene=scene, cameras=cameras,
                     bounds_center=center.astype(np.float32),
                     bounds_extent=extent.astype(np.float32),
                     directional_light_index=dir_idx, name=path.stem)


def _camera_from_node(g, camera_index: int, world_lh: np.ndarray) -> dict:
    """Extract an LH camera basis from a glTF camera node (the node transform
    already includes the RH->LH root; glTF cameras look down local -z).
    ref: src/scene.cpp:1441-1460 + FView::Reset (src/demo.cpp:172-187)."""
    cam = g.cameras[camera_index]
    right = world_lh[0, :3].copy()
    up = world_lh[1, :3].copy()
    look = -world_lh[2, :3]
    pos = world_lh[3, :3].copy()
    persp = cam.get("perspective", {})
    return dict(
        name=cam.get("name", f"camera{camera_index}"),
        position=pos, right=right, up=up, look=look,
        yfov=float(persp.get("yfov", 0.25 * np.pi)),
        znear=float(persp.get("znear", 1.0)),
        aspect=persp.get("aspectRatio"),
    )
