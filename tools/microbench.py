"""Device-time microbenchmarks via jax.profiler traces.

block_until_ready over the axon tunnel returns before the device finishes
(NEXT.md environment caution), so wall timing lies; the ONLY trustworthy
number is the device-op duration in a profiler trace. This harness runs a
callable N times under the profiler and reports total device time / N.

Usage: python tools/microbench.py   (edit CASES below, or import bench_fn)
"""

import glob
import gzip
import json
import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def device_time_ms(fn, *args, n: int = 10, warmup: int = 2):
    """Total per-call device time (ms) of jitted fn(*args), from a trace."""
    import jax
    out = fn(*args)
    for _ in range(warmup - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="microbench_")
    try:
        with jax.profiler.trace(d):
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
        total = 0.0
        for f in glob.glob(f"{d}/**/*.trace.json.gz", recursive=True):
            ev = json.load(gzip.open(f))["traceEvents"]
            pids = {e["pid"]: e["args"].get("name", "")
                    for e in ev if e.get("ph") == "M"
                    and e.get("name") == "process_name" and "args" in e}
            dev_pids = {p for p, name in pids.items()
                        if "TPU" in name or "/device" in name.lower()}
            for e in ev:
                if (e.get("ph") == "X" and e.get("pid") in dev_pids
                        and "dur" in e
                        and not e.get("name", "").startswith("$")):
                    total += e["dur"]
        return total / n / 1e3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_px = 2_088_960
    rng = np.random.default_rng(0)

    def case_gather(rows, cols, dtype=np.float32):
        tbl = jnp.asarray(rng.random((rows, cols)).astype(dtype))
        idx = jnp.asarray(rng.integers(0, rows, n_px, dtype=np.int32))
        f = jax.jit(lambda t, i: t[i])
        return f, (tbl, idx)

    def case_scatter(m, cols):
        base = jnp.zeros((n_px, cols), jnp.float32)
        vals = jnp.asarray(rng.random((m, cols)).astype(np.float32))
        sidx = jnp.asarray(rng.integers(0, n_px, m, dtype=np.int32))
        f = jax.jit(lambda b, v, i: b.at[i].set(v))
        return f, (base, vals, sidx)

    def case_gather_coherent(rows, cols, spread, dtype=np.float32):
        """Screen-coherent indices: neighboring pixels hit neighboring rows
        (base ramp + small random offset of `spread` rows)."""
        tbl = jnp.asarray(rng.random((rows, cols)).astype(dtype))
        ramp = (np.arange(n_px, dtype=np.int64) * rows // n_px)
        idx_np = (ramp + rng.integers(0, spread, n_px)) % rows
        idx = jnp.asarray(idx_np.astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        return f, (tbl, idx)

    cases = {
        "gather 131070x4 (probe)": case_gather(131070, 4),
        "gather 131070x4 coherent": case_gather_coherent(131070, 4, 64),
        "gather 11102877x2 (texcore)": case_gather(11102877, 2),
        "gather 11102877x2 coherent": case_gather_coherent(11102877, 2, 64),
        "gather 2088960x6 (peel-compact)": case_gather(2088960, 6),
        "gather 693930x4 (alpha)": case_gather(693930, 4),
        "gather 693930x4 coherent": case_gather_coherent(693930, 4, 64),
        "gather 290816x48 (pair rows)": case_gather(290816, 48),
        "gather 16384x4 tiny tbl": case_gather(16384, 4),
        "scatter 522240x16 -> 2Mx16": case_scatter(522240, 16),
        "scatter 1044480x1 -> 2Mx1": case_scatter(1044480, 1),
    }
    for name, (f, args) in cases.items():
        ms = device_time_ms(f, *args)
        print(f"{name:36s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
