"""Progressive photon mapping vs path tracing consistency.

For a diffuse scene the PPM estimate (direct LS*E + density-estimation
gather over LD/LS*D photons at every camera vertex) converges to the same
image as the path tracer (reference: photonmapper.art vs pathtracer.art),
up to kernel bias at finite radius.
"""
import json

import numpy as np

import ignis_tpu

from test_lighttracer import SCENE


def _render(tech: str, spi: int, steps: int, extra=None) -> np.ndarray:
    scene = json.loads(json.dumps(SCENE))
    scene["technique"] = {"type": tech, "max_depth": 4, **(extra or {})}
    rt = ignis_tpu.loadFromString(json.dumps(scene), spi=spi)
    for _ in range(steps):
        rt.step()
    return np.asarray(rt.framebuffer(normalized=True))


def test_ppm_matches_pt():
    pt = _render("path", spi=128, steps=1)
    pm = _render("ppm", spi=16, steps=2, extra={"photons": 20000})
    assert pt.mean() > 0.01
    assert abs(pm.mean() - pt.mean()) / pt.mean() < 0.08
    for sl in (np.s_[20:28, 20:28], np.s_[8:16, 32:40]):
        p, m = pt[sl].mean(), pm[sl].mean()
        assert abs(m - p) / max(p, 1e-6) < 0.25, (sl, p, m)
