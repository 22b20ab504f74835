"""Measure per-tile texture-footprint statistics on the bench frame.

Decides the Pallas texture-unit design constants (tile shape, table rows,
keys per tile, panels per key) from DATA instead of guesswork: renders the
bench scene's visibility pass, computes the exact per-pixel stochastic tap
(material, mip, texel row/col) that resolve_gbuffer would fetch, and reports
what fraction of screen tiles conform to candidate (K, R, P) budgets.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    from incarnation_tpu.config import Config
    from incarnation_tpu.core.view import View
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.kernels import raster, resolve
    import bench

    width, height = 1920, 1088
    host, name = bench.load_bench_scene()
    scene = host.scene
    cfg = Config()
    params = RasterParams(width=width, height=height, pair_capacity=1 << 18,
                          bin_max_span=8)
    view = bench._bench_view(host, width, height)
    vp = jnp.asarray(view.view_proj())
    rot = jnp.eye(4)

    @jax.jit
    def vis():
        prim_visible = jnp.ones((scene.meta.padded_primitives,), bool)
        prep = raster.prepare_geometry(scene, rot, vp, prim_visible, params)
        tri, depth, interp, stats = raster.raster_layer(prep, params)
        return tri, interp

    tri, interp = vis()
    tri = np.asarray(tri)
    interp = np.asarray(interp)
    print("coverage:", (tri >= 0).mean())

    # replicate resolve_gbuffer's stochastic tap (frame_index=1)
    mat_id = interp[9].astype(np.int32)
    meta = np.asarray(scene.mat_stack.meta)   # (NM,4) base,size,levels,address
    size_f = meta[np.maximum(mat_id, 0), 1].astype(np.float32)
    levels = meta[np.maximum(mat_id, 0), 2]
    dudx, dudy, dvdx, dvdy = interp[10], interp[11], interp[12], interp[13]
    rx = np.sqrt(dudx ** 2 + dvdx ** 2)
    ry = np.sqrt(dudy ** 2 + dvdy ** 2)
    rmax_ = np.maximum(rx, ry)
    rmin_ = np.minimum(rx, ry)
    rho = np.maximum(rmin_, rmax_ / 16.0) * size_f
    lod = np.log2(np.maximum(rho, 1e-8))

    def frame_noise(shape, frame_index, mult):
        xs = np.arange(shape[1], dtype=np.uint32)[None, :]
        ys = np.arange(shape[0], dtype=np.uint32)[:, None]
        seed = np.uint32(frame_index) * np.uint32(mult)
        h32 = ((xs * np.uint32(374761393) + ys * np.uint32(668265263))
               ^ seed).astype(np.uint32)
        h32 = ((h32 ^ (h32 >> np.uint32(13)))
               * np.uint32(1274126177)).astype(np.uint32)
        return ((h32 >> np.uint32(16)) & np.uint32(0xFFFF)).astype(
            np.float32) / 65536.0

    fi = 1
    xi = frame_noise(tri.shape, fi, 2428444049)
    x_major = rx >= ry
    major = np.stack([np.where(x_major, dudx, dudy),
                      np.where(x_major, dvdx, dvdy)], -1)
    uv = np.stack([interp[0], interp[1]], -1) + major * (xi - 0.5)[..., None]
    lod = np.floor(lod + frame_noise(tri.shape, fi, 2654435761))
    lod = np.clip(lod, 0, (levels - 1).astype(np.float32)).astype(np.int32)
    jx = frame_noise(tri.shape, fi, 1181783497)
    jy = frame_noise(tri.shape, fi, 3267000013)

    s_l = np.maximum(meta[np.maximum(mat_id, 0), 1] >> lod, 1)
    fx = uv[..., 0] * s_l - 0.5 + jx
    fy = uv[..., 1] * s_l - 0.5 + jy
    # assume WRAP (helmet uses wrap) for the address fold
    tx = np.floor(fx).astype(np.int64) % s_l
    ty = np.floor(fy).astype(np.int64) % s_l

    valid = tri >= 0
    key = np.where(valid, mat_id.astype(np.int64) * 32 + lod, -1)

    for th, tw in ((16, 128), (32, 128), (16, 256), (8, 128)):
        H, W = tri.shape
        nty, ntx = H // th, W // tw
        k = key[:nty * th, :ntx * tw].reshape(nty, th, ntx, tw)
        k = k.transpose(0, 2, 1, 3).reshape(nty * ntx, th * tw)
        tyv = ty[:nty * th, :ntx * tw].reshape(nty, th, ntx, tw) \
            .transpose(0, 2, 1, 3).reshape(nty * ntx, th * tw)
        txv = tx[:nty * th, :ntx * tw].reshape(nty, th, ntx, tw) \
            .transpose(0, 2, 1, 3).reshape(nty * ntx, th * tw)
        sv = s_l[:nty * th, :ntx * tw].reshape(nty, th, ntx, tw) \
            .transpose(0, 2, 1, 3).reshape(nty * ntx, th * tw)

        nkeys = np.zeros(k.shape[0], np.int32)
        worst_rows = np.zeros(k.shape[0], np.int32)
        worst_panels = np.zeros(k.shape[0], np.int32)
        key_rows_hist = []
        for t in range(k.shape[0]):
            kk = k[t]
            m = kk >= 0
            if not m.any():
                continue
            uniq = np.unique(kk[m])
            nkeys[t] = len(uniq)
            rmax = 0
            pmax = 0
            for u in uniq:
                sel = kk == u
                s_here = sv[t][sel][0]
                tyk = tyv[t][sel]
                txk = txv[t][sel]
                if s_here <= 128:
                    # whole mip resident: rows = s, 1 panel
                    rows = int(s_here)
                    panels = 1
                else:
                    # y-span with wrap: minimal circular cover
                    rows = _circ_span(tyk, s_here)
                    panels = len(np.unique(txk // 128))
                rmax = max(rmax, rows)
                pmax = max(pmax, panels)
                key_rows_hist.append(rows)
            worst_rows[t] = rmax
            worst_panels[t] = pmax

        occ = nkeys > 0
        print(f"\ntile {th}x{tw}: {occ.sum()} occupied tiles")
        for kq in (1, 2, 3, 4, 6):
            print(f"  keys<={kq}: {np.mean(nkeys[occ] <= kq):.3f}")
        kr = np.asarray(key_rows_hist)
        print(f"  key rows: p50={np.percentile(kr, 50):.0f} "
              f"p90={np.percentile(kr, 90):.0f} "
              f"p99={np.percentile(kr, 99):.0f} max={kr.max()}")
        print(f"  tile worst rows: p90="
              f"{np.percentile(worst_rows[occ], 90):.0f} "
              f"p99={np.percentile(worst_rows[occ], 99):.0f} "
              f"max={worst_rows[occ].max()}")
        print(f"  tile worst panels: max={worst_panels[occ].max()}, "
              f"p99={np.percentile(worst_panels[occ], 99):.0f}")
        # conformance under candidate budgets (keys*rows(ea padded to R)*
        # panels <= table)
        for (kq, rq, table) in ((2, 32, 128), (2, 64, 256), (4, 32, 128),
                                (4, 64, 256), (2, 128, 256), (6, 42, 256)):
            ok = (nkeys <= kq) & (worst_rows <= rq) & (worst_panels <= 2)
            print(f"  conform K={kq} R={rq} P<=2: "
                  f"{np.mean(ok[occ]):.4f}")


def _circ_span(vals, s):
    """Minimal length of a circular interval of [0, s) covering vals."""
    u = np.unique(vals)
    if len(u) == 1:
        return 1
    gaps = np.diff(np.concatenate([u, [u[0] + s]]))
    return int(s - gaps.max() + 1)


if __name__ == "__main__":
    main()
