"""Interactive viewer (igview analog, ignis_tpu/view.py): the reference
loop semantics — progressive accumulation, reset on camera move, tonemap/
AOV switching without recompiles (view/main.cpp:143-185)."""
import json
import io
import threading
import time
import urllib.request

import numpy as np
import pytest

import ignis_tpu
from ignis_tpu import view as V


SCENE = {
    "technique": {"type": "path", "max_depth": 2},
    "camera": {"type": "perspective", "fov": 60,
               "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, -2]},
    "film": {"size": [32, 32]},
    "bsdfs": [{"type": "diffuse", "name": "g", "reflectance": [0.8, 0.6, 0.4]}],
    "shapes": [{"type": "rectangle", "name": "B", "width": 4, "height": 4,
                "flip_normals": True}],
    "entities": [{"name": "B", "shape": "B", "bsdf": "g"}],
    "lights": [{"type": "point", "name": "P", "position": [0, 1, -1.5],
                "intensity": [8, 8, 8]}],
}


def test_viewer_loop_semantics():
    rt = ignis_tpu.loadFromString(json.dumps(SCENE), spi=2)
    state = V.ViewerState(rt)
    th = threading.Thread(target=state.render_loop, daemon=True)
    th.start()
    try:
        # progressive accumulation
        png, seq, stats = state.wait_frame(0, timeout=60)
        assert png.startswith(b"\x89PNG")
        assert stats["iteration"] >= 1
        png, seq2, stats2 = state.wait_frame(seq, timeout=60)
        assert stats2["iteration"] > stats["iteration"]
        assert stats2["spp"] == stats2["iteration"] * rt.SPI

        # camera move resets the film (main.cpp: reset on move)
        with state.lock:
            state.events.append({"type": "orbit", "dx": 120, "dy": 0})
        deadline = time.time() + 60
        while time.time() < deadline:
            png, seq, stats3 = state.wait_frame(seq, timeout=60)
            if stats3["iteration"] < stats2["iteration"]:
                break
        assert stats3["iteration"] < stats2["iteration"]
        assert stats3["frame"] > stats2["frame"]  # frames keep counting

        # tonemap + AOV switching without reloading
        with state.lock:
            state.events.append({"type": "tonemap", "method": 1,
                                 "exposure": 2.0})
            state.events.append({"type": "key", "key": "v"})
        deadline = time.time() + 60
        while time.time() < deadline:
            png, seq, st4 = state.wait_frame(seq, timeout=60)
            if st4["tonemap"] == "reinhard" and st4["aov"] == "Normals":
                break
        assert st4["tonemap"] == "reinhard"
        assert st4["exposure"] == 2.0
        assert st4["aov"] == "Normals"
    finally:
        state.running = False
        th.join(timeout=120)
        assert not th.is_alive()


def test_camera_rig_math():
    rig = V.CameraRig([0, 0, -3], [0, 0, 1], [0, 1, 0], scene_radius=2.0)
    rig.orbit(100, 0)
    d = np.asarray(rig.dir)
    assert abs(np.linalg.norm(d) - 1) < 1e-6
    assert abs(d[2] - 1.0) > 0.05  # actually rotated
    e0 = np.asarray(rig.eye).copy()
    rig.fly("w")
    assert np.linalg.norm(np.asarray(rig.eye) - e0) > 0.01
    rig.dolly(-2)
    assert np.isfinite(rig.eye).all()
