"""Cross-path parity gate: the raster pipeline and the path tracer must
agree on direct lighting (they share no raster/traversal code — see
tools/crosscheck.py). Slow: full helmet load + path-tracer compile on CPU."""

import os
import sys
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools"))

HELMET = pathlib.Path(
    "/root/reference/content/models/damaged-helmet/DamagedHelmet.gltf")


@pytest.mark.skipif(os.environ.get("RUN_SLOW_TESTS") != "1",
                    reason="minutes of compile+trace on 1 CPU core; "
                           "set RUN_SLOW_TESTS=1 (tools/crosscheck.py is "
                           "the TPU-speed equivalent)")
@pytest.mark.skipif(not HELMET.exists(), reason="reference content absent")
def test_raster_matches_pathtraced_direct():
    import crosscheck
    _, _, psnr = crosscheck.render_both(width=256, height=144, spp=16,
                                        texture_max_dim=256)
    assert psnr > 26.0, f"raster vs PT PSNR {psnr:.2f} dB"
