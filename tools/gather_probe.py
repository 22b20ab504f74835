"""Microbench: HBM gather cost vs index ORDER and table size (real chip).

The texture-stack fetch is the frame's top cost and is index-bound with a
strong table-size term (NEXT.md: 2M idx = ~9 ms @22 MB, ~22 ms @178 MB).
Hypothesis: the size term is a locality effect, so sorting the pixel's
texel addresses first (gather from a quasi-sequential stream, then
scatter back) trades ~1 sort for a much cheaper gather on big tables.

Variants per table size, 2M indices, rows = (2,) int32 (the core stack row):
  raw        – gather with screen-order (random-ish) indices
  sorted     – gather with pre-sorted indices (upper bound for the win)
  sort+inv   – full pipeline: argsort, gather sorted, scatter back
Timings from jax.profiler device ops (wall clocks lie over the tunnel).
"""

import glob
import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def _device_ms(trace_dir, reps):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    per_op = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        if not args.get("long_name"):
            continue
        per_op.setdefault(ev["name"], 0.0)
        per_op[ev["name"]] += ev.get("dur", 0) / 1e3
    return {k: v / reps for k, v in sorted(per_op.items(),
                                           key=lambda kv: -kv[1])}


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp

    n_idx = 1 << 21                      # ~2M (one 1080p frame of pixels)
    reps = 8
    rng = np.random.default_rng(7)

    for table_mb in (22, 96, 192):
        n_rows = table_mb * (1 << 20) // 8
        table = jnp.asarray(
            rng.integers(0, 2**31, size=(n_rows, 2), dtype=np.int64)
            .astype(np.int32))
        idx_np = rng.integers(0, n_rows, size=n_idx).astype(np.int32)
        idx = jnp.asarray(idx_np)
        idx_sorted = jnp.asarray(np.sort(idx_np))

        @jax.jit
        def raw(t, i):
            return t[i]

        @jax.jit
        def sort_inv(t, i):
            order = jnp.argsort(i)
            rows = t[i[order]]
            return jnp.zeros_like(rows).at[order].set(rows)

        for name, fn, a in (("raw", raw, idx),
                            ("sorted", raw, idx_sorted),
                            ("sort+inv", sort_inv, idx)):
            fn(table, a).block_until_ready()
            trace_dir = f"/tmp/gp_{table_mb}_{name.replace('+','_')}"
            jax.profiler.start_trace(trace_dir)
            out = None
            for _ in range(reps):
                out = fn(table, a)
            out.block_until_ready()
            jax.profiler.stop_trace()
            ops = _device_ms(trace_dir, reps)
            total = sum(ops.values())
            top = "; ".join(f"{k}={v:.2f}" for k, v in
                            list(ops.items())[:3])
            print(f"table {table_mb:4d} MB  {name:9s} "
                  f"{total:7.2f} ms   [{top}]", flush=True)


if __name__ == "__main__":
    main()
