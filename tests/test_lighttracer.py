"""Light tracer vs path tracer consistency.

For a diffuse scene both techniques estimate the same measurement equation
(reference: src/artic/technique/lighttracer.art vs pathtracer.art), so the
per-iteration normalized images must agree up to Monte-Carlo noise.
"""
import json

import numpy as np

import ignis_tpu

SCENE = {
    "technique": {"type": "path", "max_depth": 4},
    "camera": {"type": "perspective", "fov": 60, "near_clip": 0.01,
               "far_clip": 100,
               "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, -2]},
    "film": {"size": [48, 48]},
    "bsdfs": [{"type": "diffuse", "name": "g", "reflectance": [0.8, 0.8, 0.8]},
              {"type": "diffuse", "name": "black", "reflectance": [0, 0, 0]}],
    "shapes": [{"type": "rectangle", "name": "B", "width": 4, "height": 4,
                "flip_normals": True},
               {"type": "rectangle", "name": "L", "width": 0.5,
                "height": 0.5}],
    "entities": [{"name": "B", "shape": "B", "bsdf": "g"},
                 {"name": "L", "shape": "L", "bsdf": "black",
                  "transform": [{"translate": [1.5, 0, -1.0]}]}],
    "lights": [{"type": "area", "name": "L", "entity": "L",
                "radiance": [10, 10, 10]}],
}


def _render(tech: str, spi: int, steps: int) -> np.ndarray:
    scene = json.loads(json.dumps(SCENE))
    scene["technique"]["type"] = tech
    rt = ignis_tpu.loadFromString(json.dumps(scene), spi=spi)
    for _ in range(steps):
        rt.step()
    return np.asarray(rt.framebuffer(normalized=True))


def test_lt_matches_pt():
    pt = _render("path", spi=128, steps=1)
    lt = _render("lt", spi=128, steps=4)
    assert pt.mean() > 0.01  # scene actually lit
    # Global mean: tight agreement.
    assert abs(lt.mean() - pt.mean()) / pt.mean() < 0.05
    # Block averages: looser (LT splats are sparse/noisy per pixel).
    for sl in (np.s_[20:28, 20:28], np.s_[8:16, 32:40]):
        p, l = pt[sl].mean(), lt[sl].mean()
        assert abs(l - p) / max(p, 1e-6) < 0.2, (sl, p, l)
