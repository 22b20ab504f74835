"""TPU-vs-interpreter conformance check for Pallas kernels.

Tests run on the virtual CPU mesh in interpreter mode (tests/conftest.py), so
Mosaic compilation bugs (e.g. bitcast-of-lane-slice miscompiles, DMA
alignment) only surface on hardware. Run this on a TPU host after kernel
changes:

    python tools/tpu_conformance.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from incarnation_tpu.core import View
    from incarnation_tpu.kernels import raster
    from incarnation_tpu.scene.testing import make_scene

    assert jax.default_backend() == "tpu", "run on a TPU host"

    w, h = 256, 64
    params = raster.RasterParams(width=w, height=h, tile_h=16, tile_w=128,
                                 pair_capacity=1 << 12, bin_max_span=8,
                                 big_tri_capacity=64, chunk=32)
    rng = np.random.default_rng(0)
    n_tri = 200
    base = rng.uniform(-8, 8, (n_tri, 1, 3))
    base[..., 2] = rng.uniform(3, 30, (n_tri, 1))
    pts = (base + rng.uniform(-1.5, 1.5, (n_tri, 3, 3))).astype(np.float32)
    scene = make_scene(pts.reshape(-1, 3),
                       np.arange(3 * n_tri).reshape(-1, 3),
                       double_sided=True)
    vp = jnp.asarray(View.default(aspect=w / h).view_proj())

    def run():
        clip, _ = raster.vertex_transform(
            scene.positions, scene.vtx_mesh, scene.mesh_transforms,
            jnp.eye(4), vp)
        st, ids, valid, bbox = raster.triangle_setup(
            clip, scene, jnp.ones((1,), bool), params)
        bins = raster.bin_triangles(st, ids, valid, bbox, params)
        return raster.rasterize_tiles(bins, params)[:2]

    tri_tpu, z_tpu = jax.jit(run)()
    tri_tpu, z_tpu = np.asarray(tri_tpu), np.asarray(z_tpu)

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    tri_cpu, z_cpu = jax.jit(run)()
    tri_cpu, z_cpu = np.asarray(tri_cpu), np.asarray(z_cpu)

    # Edge pixels legitimately differ between backends (f32 FMA contraction
    # changes edge-function rounding); interior coverage must agree.
    id_match = (tri_tpu == tri_cpu).mean()
    same = tri_tpu == tri_cpu
    z_err = np.abs(z_tpu[same] - z_cpu[same]).max()
    print(f"raster conformance: id match {id_match:.6f}, "
          f"max |dz| where ids agree {z_err:.2e}")
    assert id_match > 0.99, "TPU raster ids diverge from interpreter"
    # plane-eval cancellation at ~1e5-magnitude coefficients bounds the
    # achievable f32 agreement; 1e-3 still catches logic bugs
    assert z_err < 1e-3, "TPU raster depth diverges from interpreter"
    print("OK")


if __name__ == "__main__":
    main()
