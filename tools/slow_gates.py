"""Run the RUN_SLOW-gated correctness gates and record the result as JSON.

The two strongest end-to-end gates — the raster-vs-pathtraced cross-parity
PSNR (tests/test_crosspath.py) and the SPP-sharded path-tracer conformance
(tests/test_dist.py) — are too slow for the default suite on a 1-core
host, so they are RUN_SLOW_TESTS-gated. This tool runs them in one pytest
invocation and writes `SLOW_GATES.json` at the repo root (a checked-in
per-round artifact, r3 VERDICT item 8) so their status is a recorded fact
rather than commit-message folklore.

Usage: python tools/slow_gates.py  (expect ~10-30 min on a 1-core host)
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]

GATES = [
    "tests/test_crosspath.py::test_raster_matches_pathtraced_direct",
    "tests/test_dist.py::test_spp_sharded_pathtrace_matches_sequential",
]

# TPU-scale crosspath gate (VERDICT r4 item 5): >= 480p with converged
# SPP must clear 30 dB (the CPU pytest gate stays at 256x144/16spp/26 dB
# for suite runtime). Runs on the real chip via tools/crosscheck.py.
CROSSPATH_480P = dict(width=896, height=480, spp=48, threshold_db=30.0)


def main():
    env = dict(os.environ)
    env["RUN_SLOW_TESTS"] = "1"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *GATES],
        cwd=ROOT, env=env, capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-12:])

    # 480p converged crosspath on the chip (skippable for CPU-only hosts
    # with SLOW_GATES_CPU_ONLY=1; the JSON records it as skipped).
    cp = {"config": CROSSPATH_480P, "skipped": True}
    if os.environ.get("SLOW_GATES_CPU_ONLY") != "1":
        sys.path.insert(0, str(ROOT / "tools"))
        import crosscheck
        _, _, psnr = crosscheck.render_both(
            width=CROSSPATH_480P["width"], height=CROSSPATH_480P["height"],
            spp=CROSSPATH_480P["spp"], texture_max_dim=512)
        cp = {"config": CROSSPATH_480P, "skipped": False,
              "psnr_db": round(float(psnr), 2),
              "passed": float(psnr) >= CROSSPATH_480P["threshold_db"]}
    result = {
        "gates": GATES,
        "crosspath_480p": cp,
        "rc": r.returncode,
        "passed": r.returncode == 0 and cp.get("passed", True),
        "runtime_s": round(time.time() - t0, 1),
        "date": time.strftime("%Y-%m-%d"),
        "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              cwd=ROOT, capture_output=True,
                              text=True).stdout.strip(),
        "tail": tail,
    }
    out = ROOT / "SLOW_GATES.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps({k: v for k, v in result.items() if k != "tail"}))
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
