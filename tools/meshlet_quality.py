"""Meshlet-quality measurement: scored-growth vs plain Morton packing.

VERDICT r2 item 9 asks for a before/after culling measurement on the bench
scene. This compares, for the procedural atrium (the bench scene) under
the bench camera:
  - meshlet count / avg tris per meshlet / avg bounding-sphere radius
  - % of triangles culled by meshlet-sphere frustum tests

Usage: python tools/meshlet_quality.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from incarnation_tpu.scene.gltf import Gltf  # noqa: E402
from incarnation_tpu.scene import meshlets as M  # noqa: E402
from incarnation_tpu.kernels.bvh import morton3  # noqa: E402


def morton_meshletize(positions, tri_vtx, tri_prim, prim_mesh):
    """The round-2 packer: Morton-run packing without scoring (for the
    before/after comparison)."""
    t = tri_vtx.shape[0]
    centroids = positions[tri_vtx].mean(axis=1)
    lo, hi = centroids.min(0), centroids.max(0)
    codes = morton3((centroids - lo) / np.maximum(hi - lo, 1e-12))
    order = np.lexsort((codes, tri_prim))
    tv_s = tri_vtx[order]
    prim_s = tri_prim[order]
    counts, spheres = [], []
    start = 0
    while start < t:
        prim = prim_s[start]
        end_prim = start + np.searchsorted(
            prim_s[start:start + M.MAX_TRIS + 1], prim, side="right")
        hi_cut = min(start + M.MAX_TRIS, end_prim)
        block = tv_s[start:hi_cut]
        cut = hi_cut - start
        while cut > 1:
            if np.unique(block[:cut]).size <= M.MAX_VERTS:
                break
            cut = max(1, int(cut * 0.7))
        end = start + cut
        counts.append(cut)
        pts = positions[np.unique(tv_s[start:end])]
        c = 0.5 * (pts.min(0) + pts.max(0))
        r = float(np.linalg.norm(pts - c, axis=1).max())
        spheres.append(np.concatenate([c, [r]]))
        start = end
    return np.asarray(counts), np.asarray(spheres, np.float32)


def load_geometry():
    from incarnation_tpu.scene import stress
    path = stress.build_atrium(
        pathlib.Path(__file__).resolve().parents[1] / ".content_cache"
        / "atrium")
    g = Gltf.load(path)
    pos_all, tv_all, prim_all = [], [], []
    vbase = 0
    pid = 0
    for mesh in g.doc["meshes"]:
        for p in mesh["primitives"]:
            a = p["attributes"]
            pos = g.accessor(a["POSITION"]).astype(np.float32)
            idx = g.accessor(p["indices"]).reshape(-1, 3).astype(np.int64)
            pos_all.append(pos)
            tv_all.append(idx + vbase)
            prim_all.append(np.full(len(idx), pid, np.int64))
            vbase += len(pos)
            pid += 1
    return (np.concatenate(pos_all), np.concatenate(tv_all),
            np.concatenate(prim_all), pid)


def culled_fraction(counts, spheres, view_proj):
    """% of triangles whose meshlet sphere is fully outside the frustum."""
    import jax.numpy as jnp
    from incarnation_tpu.kernels.cull import frustum_planes
    planes = np.asarray(frustum_planes(jnp.asarray(view_proj)))
    n = np.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
    planes = planes / np.maximum(n, 1e-12)
    d = spheres[:, :3] @ planes[:, :3].T + planes[None, :, 3]
    culled = (d < -spheres[:, 3:4]).any(axis=1)
    return float(counts[culled].sum() / counts.sum())


def main():
    pos, tv, prim, nprim = load_geometry()
    print(f"atrium: {len(tv)} tris, {nprim} prims")

    t0 = time.time()
    old_counts, old_spheres = morton_meshletize(
        pos, tv, prim, np.arange(nprim))
    t_old = time.time() - t0
    t0 = time.time()
    new = M.meshletize(pos, tv, prim, np.arange(nprim))
    t_new = time.time() - t0

    # The bench camera (scene/stress.py:505-522), evaluated directly in the
    # raw glTF space — culled fractions are reflection-invariant, so the
    # loader's RH->LH flip is irrelevant here.
    from incarnation_tpu.core.view import View
    from incarnation_tpu.scene import stress
    r = stress.ROOM
    v = View.from_lookat([r * 0.55, 2.2, r * 1.8],
                         [r * 1.7, 1.8, r * 0.45], aspect=16 / 9)
    vp = np.asarray(v.view_proj())

    for name, counts, spheres, dt in (
            ("morton(r2)", old_counts, old_spheres, t_old),
            ("scored(r3)", new.count, new.bsphere, t_new)):
        cf = culled_fraction(counts, spheres, vp)
        print(f"{name}: {len(counts)} meshlets, "
              f"avg tris {counts.mean():.1f}, "
              f"avg radius {spheres[:, 3].mean():.3f}, "
              f"culled tris {cf * 100:.1f}%  ({dt:.1f}s build)")


if __name__ == "__main__":
    main()
