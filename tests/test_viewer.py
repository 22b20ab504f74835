"""Interactive viewer: HTTP surface + render loop, driven headlessly.

Covers the L7 interactive-app capability (ref: demo-exe/main.cpp WndProc +
src/ui.cpp panels): frames stream over /frame.jpg, inputs (orbit, exposure,
viewmode, per-light edits) mutate the running render loop, /state reports
the panel.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from incarnation_tpu.app import viewer as viewer_mod
from incarnation_tpu.config import Config
from incarnation_tpu.scene.loader import SceneHost
from incarnation_tpu.scene.testing import make_rich_scene


def _host():
    scene = make_rich_scene()
    return SceneHost(scene=scene, cameras=[],
                     bounds_center=np.zeros(3, np.float32),
                     bounds_extent=np.asarray([8, 6, 8], np.float32),
                     directional_light_index=-1, name="rich")


@pytest.fixture(scope="module")
def running_viewer():
    host = _host()
    cfg = Config(enable_taa=True, sun_shadow_mode="map",
                 masked_depth_peels=1)
    server, state = viewer_mod.serve(host, cfg, width=128, height=64,
                                     port=0, block=False)
    t = threading.Thread(target=viewer_mod.render_loop,
                         args=(host, cfg, state, 128, 64), daemon=True)
    t.start()
    port = server.server_address[1]
    yield port, state
    state.quit = True
    t.join(timeout=60)
    server.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=60) as r:
        return r.read(), dict(r.headers)


def _post(port, path, obj):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


def test_page_and_first_frame(running_viewer):
    port, state = running_viewer
    page, _ = _get(port, "/")
    assert b"incarnation_tpu" in page
    # the first frame includes the jit compile — poll /state until it lands
    deadline = time.time() + 900
    while time.time() < deadline:
        st = json.loads(_get(port, "/state")[0])
        assert not st["error"], st["error"]
        if st["seq"] >= 1:
            break
        time.sleep(1.0)
    assert st["seq"] >= 1, "no frame rendered within deadline"
    jpeg, hdrs = _get(port, "/frame.jpg?seq=0")
    assert jpeg[:2] == b"\xff\xd8"            # JPEG SOI
    assert int(hdrs["X-Seq"]) >= 1


def test_inputs_advance_frames(running_viewer):
    port, state = running_viewer
    body, _ = _get(port, "/state")
    seq0 = json.loads(body)["seq"]
    _post(port, "/input", {"cmd": "orbit", "dx": 40, "dy": 10})
    _post(port, "/input", {"cmd": "set", "key": "exposure", "value": 11.0})
    deadline = time.time() + 120
    while time.time() < deadline:
        body, _ = _get(port, "/state")
        st = json.loads(body)
        if st["seq"] > seq0 and st["panel"].get("exposure") == 11.0:
            break
        time.sleep(0.3)
    assert st["seq"] > seq0
    assert st["panel"]["exposure"] == 11.0
    assert st["panel"]["fps"] > 0
    assert len(st["panel"]["lights"]) == 2    # rich scene's two punctuals


def test_light_edit_applies(running_viewer):
    port, state = running_viewer
    _post(port, "/input", {"cmd": "light", "index": 0, "intensity": 77.0})
    deadline = time.time() + 120
    ok = False
    while time.time() < deadline and not ok:
        st = json.loads(_get(port, "/state")[0])
        ok = (st["panel"]["lights"]
              and st["panel"]["lights"][0]["intensity"] == 77.0)
        time.sleep(0.3)
    assert ok


def test_previews_served(running_viewer):
    """Envmap + SH irradiance preview tiles stream from /preview/*
    (ref: ui.cpp:40-185 panel preview renders)."""
    port, state = running_viewer
    deadline = time.time() + 120
    ok = False
    while time.time() < deadline and not ok:
        st = json.loads(_get(port, "/state")[0])
        ok = st.get("previews_seq", 0) >= 1
        time.sleep(0.3)
    assert ok, "previews never published"
    for name in ("env", "irr"):
        jpeg, _ = _get(port, f"/preview/{name}.jpg")
        assert jpeg[:2] == b"\xff\xd8", name


def test_runtime_model_switch(running_viewer, tmp_path):
    """Switching models from the browser without a restart
    (ref: ui.cpp:366-430 model combo + async reload with progress)."""
    from test_gltf_glb import make_glb
    port, state = running_viewer
    glb = make_glb(tmp_path)
    # the rescan republish needs a rendered frame — wait out the first
    # jit compile before starting the switch deadline clock
    deadline = time.time() + 900
    while time.time() < deadline:
        st = json.loads(_get(port, "/state")[0])
        if st["seq"] >= 1:
            break
        time.sleep(1.0)
    viewer_mod.EXTRA_CONTENT_DIRS.append(str(tmp_path))
    try:
        # the loop validates load_model paths against its discovered list;
        # rescan re-lists content (now including tmp_path) and republishes
        _post(port, "/input", {"cmd": "rescan"})
        deadline = time.time() + 300
        listed = False
        while time.time() < deadline and not listed:
            st = json.loads(_get(port, "/state")[0])
            listed = str(glb) in st["panel"].get("models", [])
            time.sleep(0.3)
        assert listed, "rescan did not pick up the new model"
        _post(port, "/input", {"cmd": "load_model", "path": str(glb)})
        deadline = time.time() + 300
        switched = False
        while time.time() < deadline and not switched:
            st = json.loads(_get(port, "/state")[0])
            assert not st["error"], st["error"]
            switched = st["panel"].get("model") == str(glb)
            time.sleep(0.5)
        assert switched, "model switch never completed"
    finally:
        viewer_mod.EXTRA_CONTENT_DIRS.remove(str(tmp_path))
