"""Incarnation-TPU: a TPU-native physically-based rendering framework.

A from-scratch JAX/Pallas rebuild of the capabilities of the D3D12
Incarnation-Renderer (reference: SakibSaikia/Incarnation-Renderer). The
reference's command-list frame graph becomes jitted frame functions; its HLSL
passes become Pallas kernels and fused jnp pixel pipelines; multi-chip scaling
uses `jax.sharding.Mesh` + `shard_map` over ICI instead of multiple queues.

Subpackages
-----------
core      math/camera/config/types      (ref: inc/common.h, src/demo.cpp FView)
scene     glTF loading + packed arrays  (ref: src/scene.cpp, mesh-utils.cpp)
kernels   Pallas + jnp render kernels   (ref: shaders/**)
renderer  frame functions (pass graphs) (ref: src/renderer.cpp, render-jobs/)
dist      multi-chip sharding           (new design; no reference equivalent)
app       CLI, PSNR harness             (ref: demo-exe/main.cpp, src/ui.cpp)
"""

__version__ = "0.1.0"
