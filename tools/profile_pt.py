"""Profile one progressive path-trace sample on the bench scene (real chip).

Trace-based device timing (wall clocks lie over the tunnel): prints the
top device ops for one render_pathtrace sample at 360p, the same shape the
bench's Mray/s metric measures.
"""

import glob
import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import bench
    from incarnation_tpu.utils import jaxinit
    jaxinit.setup()
    import jax
    import jax.numpy as jnp
    from incarnation_tpu.config import Config
    from incarnation_tpu.kernels import bvh as bvh_mod, ibl, sky
    from incarnation_tpu.renderer import frame as frame_mod
    from incarnation_tpu.scene.cache import load_probe_cached

    host, name = bench.load_bench_scene()
    cfg = Config(sun_shadow_mode="map", masked_depth_peels=3)
    sun = np.asarray(host.scene.sun_dir)
    probe = load_probe_cached(
        lambda: ibl.build_probe(
            sky.sky_latlong(jnp.asarray(sun), cfg.turbidity, 256, 128),
            envmap_size=cfg.envmap_resolution),
        key=f"sky:{sun.round(4).tolist()}:{cfg.turbidity}:"
            f"{cfg.envmap_resolution}")
    w, h = 640, 360
    bvh = bvh_mod.build_scene_bvh(host.scene)
    fc = bench._pt_fc(host, cfg, w, h, frame_mod)
    history = jnp.zeros((h, w, 3))
    out = frame_mod.render_pathtrace_jit(
        host.scene, bvh, fc, history, jnp.asarray(0, jnp.uint32),
        cfg, w, h, probe)
    out["color"].block_until_ready()
    history = out["history"]

    trace_dir = "/tmp/incarnation_pt_profile"
    jax.profiler.start_trace(trace_dir)
    out = frame_mod.render_pathtrace_jit(
        host.scene, bvh, fc, history, jnp.asarray(1, jnp.uint32),
        cfg, w, h, probe)
    out["color"].block_until_ready()
    jax.profiler.stop_trace()

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    durs = {}
    shapes = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        if not args.get("long_name"):
            continue
        n_ = ev["name"]
        durs.setdefault(n_, [0.0, 0])
        durs[n_][0] += ev.get("dur", 0) / 1e3
        durs[n_][1] += 1
        ln = str(args.get("long_name") or "")
        shapes[n_] = ln.split(" = ")[1][:95] if " = " in ln else ln[:95]
    total = sum(v[0] for v in durs.values())
    print(f"device total per sample ~= {total:.1f} ms")
    nl = host.scene.meta.num_lights
    nee = 4 * min(nl, 4) if nl <= 4 else 4
    mrays = w * h * (8 + nee) / (total / 1e3) / 1e6
    print(f"=> {mrays:.2f} Mray/s (bench ray accounting)")
    for n_, (d, c) in sorted(durs.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{d:8.2f} ms x{c:<4d} {n_:30s} {shapes.get(n_, '')[:80]}")


if __name__ == "__main__":
    main()
