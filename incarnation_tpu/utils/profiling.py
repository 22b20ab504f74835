"""Profiling / tracing hooks.

The reference instruments every pass with PIX + Tracy scoped zones and GPU
timelines per queue (ref: inc/profiling.h:10-12, src/profiling.cpp,
backend-d3d12.cpp:1727-1737). The TPU equivalents:

- `scoped(name)`: jax.named_scope + perfetto-visible annotation, so XLA/TPU
  traces group ops per render pass.
- `trace(dir)`: context manager around jax.profiler.trace — produces a
  TensorBoard/perfetto trace of the frame (the Tracy-capture analogue).
- `time_fn(fn, *args)`: wall-time a jitted callable with proper
  block_until_ready (the render-stats timing analogue).
"""

from __future__ import annotations

import contextlib
import time

import jax


def scoped(name: str):
    """Use as `with profiling.scoped("visibility_pass"): ...` inside traced
    code — the SCOPED_COMMAND_LIST_EVENT analogue."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/incarnation_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 5, warmup: int = 1):
    """-> (seconds per call, last output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out
