"""Profile the bench frame on the real chip and print the top XLA fusions.

Usage: python tools/profile_bench.py [--trace-dir DIR]
Parses the .trace.json.gz produced by jax.profiler and aggregates device-op
durations by op name, printing the top entries — the round-to-round way to
see where the 1080p frame goes.
"""

import glob
import gzip
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    trace_dir = "/tmp/incarnation_profile"
    import bench
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    from incarnation_tpu.config import Config
    from incarnation_tpu.core.view import View
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.kernels import ibl, sky
    from incarnation_tpu.scene.cache import load_probe_cached
    import jax.numpy as jnp

    width, height = 1920, 1088
    host, scene, name = bench.load_bench_scene()
    cfg = Config()
    sun = np.asarray(host.scene.sun_dir)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), cfg.turbidity, 256, 128),
            envmap_size=cfg.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{cfg.turbidity}:"
            f"{cfg.envmap_resolution}")
    env_brdf = ibl.env_brdf_lut(512)
    params = RasterParams(width=width, height=height, pair_capacity=1 << 19)
    view = View.from_lookat([0.0, 4.0, -14.0], [0.0, 0.0, 0.0],
                            aspect=width / height)
    fc = frame_mod.FrameConstants.make(
        view, cfg, sun_dir=sun, sun_color_intensity=[1.0, 1.0, 1.0, 100.0])

    out = frame_mod.render_frame_jit(scene, fc, cfg, params)
    out["color"].block_until_ready()

    t0 = time.time()
    for _ in range(5):
        out = frame_mod.render_frame_jit(scene, fc, cfg, params)
    out["color"].block_until_ready()
    dt = (time.time() - t0) / 5
    print(f"frame = {dt * 1e3:.1f} ms  ({1.0 / dt:.2f} FPS)")

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = frame_mod.render_frame_jit(scene, fc, cfg, params)
    out["color"].block_until_ready()
    jax.profiler.stop_trace()

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print("no trace file found")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # Device-lane complete events: aggregate by name.
    durs = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name_ = ev.get("name", "")
        args = ev.get("args") or {}
        # Keep XLA op events (they carry 'long_name' or look like fusions)
        if not ("fusion" in name_ or "custom" in name_ or "copy" in name_
                or "sort" in name_ or "gather" in name_ or "scatter" in name_
                or "convert" in name_ or "while" in name_ or "reduce" in name_
                or "dot" in name_ or "transpose" in name_
                or "dynamic" in name_ or "iota" in name_ or "slice" in name_
                or "concatenate" in name_ or "broadcast" in name_
                or "tpu_custom_call" in name_ or "pad" in name_):
            continue
        durs.setdefault(name_, [0.0, 0])
        durs[name_][0] += ev.get("dur", 0) / 1e3   # us -> ms
        durs[name_][1] += 1
    total = sum(v[0] for v in durs.values()) / 3.0
    print(f"sum of matched device ops per frame ~= {total:.1f} ms")
    for name_, (d, c) in sorted(durs.items(), key=lambda kv: -kv[1][0])[:28]:
        print(f"{d / 3.0:8.2f} ms  x{c // 3:<4d} {name_[:90]}")


if __name__ == "__main__":
    main()
