"""Analytic radiometry gates.

Mirrors the reference integrator tests
(/root/reference/src/tests/integrator/test_lights.py): closed-form scene
averages on the canonical flat-plane scene. These are the primary
correctness oracles for the whole light-transport stack.
"""
import json

import numpy as np
import pytest

import ignis_tpu


def flat_scene(size=256):
    return {
        "technique": {"type": "path", "max_depth": 2},
        "camera": {
            "type": "perspective", "fov": 90,
            "near_clip": 0.01, "far_clip": 100,
            "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, -1],
        },
        "film": {"size": [size, size]},
        "bsdfs": [{"type": "diffuse", "name": "ground", "reflectance": [1, 1, 1]}],
        "shapes": [{"type": "rectangle", "name": "Bottom", "width": 2,
                    "height": 2, "flip_normals": True}],
        "entities": [{"name": "Bottom", "shape": "Bottom", "bsdf": "ground"}],
        "lights": [],
    }


def scene_average(scene, spp=8):
    rt = ignis_tpu.loadFromString(json.dumps(scene))
    for _ in range(spp):
        rt.step()
    img = rt.framebuffer(normalized=True)
    return float(np.average(img))


def test_no_light():
    assert scene_average(flat_scene()) == pytest.approx(0, abs=1e-8)


def test_point_light():
    # Derivation in reference test_lights.py:13-25: average = 0.005100456
    scene = flat_scene()
    scene["lights"].append({"type": "point", "name": "_l",
                            "position": [0, 0, -2], "power": 1})
    assert scene_average(scene) == pytest.approx(0.005100456, abs=1e-4)


def test_spot_light():
    scene = flat_scene()
    scene["lights"].append({"type": "spot", "name": "_l", "cutoff": 45,
                            "falloff": 45, "position": [0, 0, -2],
                            "direction": [0, 0, 1], "power": 1})
    assert scene_average(scene) == pytest.approx(0.0348280902, abs=2.5e-3)


def test_env_light():
    scene = flat_scene()
    scene["lights"].append({"type": "env", "name": "_l", "radiance": [1, 1, 1]})
    assert scene_average(scene, spp=16) == pytest.approx(1, rel=2e-3)


def test_reproducibility():
    scene = flat_scene(size=128)
    scene["lights"].append({"type": "point", "name": "_l",
                            "position": [0, 0, -2], "intensity": [1, 1, 1]})
    a = ignis_tpu.loadFromString(json.dumps(scene), seed=42).step() \
        .framebuffer(normalized=True)
    b = ignis_tpu.loadFromString(json.dumps(scene), seed=42).step() \
        .framebuffer(normalized=True)
    np.testing.assert_array_equal(a, b)
    c = ignis_tpu.loadFromString(json.dumps(scene), seed=7).step() \
        .framebuffer(normalized=True)
    assert not np.allclose(a, c)
