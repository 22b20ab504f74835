"""Profile the bench frame on the real chip and print the top XLA fusions.

Usage: python tools/profile_bench.py
Parses the .trace.json.gz produced by jax.profiler and aggregates device-op
durations by op name (with operand shapes) — the round-to-round way to see
where the 1080p frame goes.
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
    import jax.numpy as jnp
    from incarnation_tpu.config import Config
    from incarnation_tpu.core.view import View
    from incarnation_tpu.core import mathutils as mu
    from incarnation_tpu.kernels.raster import RasterParams
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.kernels import ibl, sky
    from incarnation_tpu.scene.cache import load_probe_cached

    width, height = 1920, 1088
    host, name = bench.load_bench_scene()
    scene = host.scene
    import os
    cfg = Config(sun_shadow_mode="map", masked_depth_peels=int(os.environ.get("PROFILE_PEELS", "3")))
    sun = np.asarray(host.scene.sun_dir)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), cfg.turbidity, 256, 128),
            envmap_size=cfg.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{cfg.turbidity}:"
            f"{cfg.envmap_resolution}")
    env_brdf = ibl.pack_env_brdf(ibl.env_brdf_lut(128))
    params = RasterParams(width=width, height=height, pair_capacity=1 << 18,
                          bin_max_span=8)
    view = bench._bench_view(host, width, height)
    jitters = np.asarray(mu.halton_jitter_table(16))
    shadow_bounds = (host.bounds_center,
                     float(np.linalg.norm(host.bounds_extent)) + 1e-3)

    def make_fc(i, prev_vp):
        j = jitters[i % 16] * 2.0 / np.array([width, height])
        return frame_mod.FrameConstants.make(
            view, cfg, sun_dir=sun, sun_color_intensity=[1., 1., 1., 100.],
            jitter=j, prev_view_proj=prev_vp, history_valid=(i > 0),
            frame_index=i, shadow_bounds=shadow_bounds)

    history = jnp.zeros((height, width, 3))
    fc = make_fc(0, None)
    out = frame_mod.render_frame_jit(scene, fc, cfg, params, probe, env_brdf,
                                     history)
    out["color"].block_until_ready()
    history = out["accumulation"]
    fc1 = make_fc(1, np.asarray(fc.view_proj))
    out = frame_mod.render_frame_jit(scene, fc1, cfg, params, probe,
                                     env_brdf, history)
    out["color"].block_until_ready()

    t0 = time.time()
    for _ in range(5):
        out = frame_mod.render_frame_jit(scene, fc1, cfg, params, probe,
                                         env_brdf, history)
    out["color"].block_until_ready()
    dt = (time.time() - t0) / 5
    print(f"frame = {dt * 1e3:.1f} ms  ({1.0 / dt:.2f} FPS)")

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = frame_mod.render_frame_jit(scene, fc1, cfg, params, probe,
                                         env_brdf, history)
    out["color"].block_until_ready()
    jax.profiler.stop_trace()

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print("no trace file found")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    durs = {}
    shapes = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        n_ = ev.get("name", "")
        args = ev.get("args") or {}
        # device ops carry a long_name (HLO); host/python events don't
        if not args.get("long_name"):
            continue
        ln = str(args.get("long_name") or "")
        durs.setdefault(n_, [0.0, 0])
        durs[n_][0] += ev.get("dur", 0) / 1e3
        durs[n_][1] += 1
        if ln:
            shapes[n_] = ln.split(" = ")[1][:95] if " = " in ln else ln[:95]
    total = sum(v[0] for v in durs.values()) / 3.0
    print(f"matched device ops per frame ~= {total:.1f} ms")
    shown = 0.0
    for n_, (d, c) in sorted(durs.items(), key=lambda kv: -kv[1][0])[:70]:
        if d / 3.0 < 0.08:
            break
        shown += d / 3.0
        print(f"{d / 3.0:8.2f} ms x{c // 3:<3d} {n_:26s} "
              f"{shapes.get(n_, '')[:85]}")
    print(f"shown {shown:.1f} ms; tail {total - shown:.1f} ms")


if __name__ == "__main__":
    main()
