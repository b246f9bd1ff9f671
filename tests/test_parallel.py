"""Multi-device sharding + differentiability tests (8-CPU virtual mesh).

The mesh-shape analog of the reference's CPU/GPU duality testing: the same
scene must produce consistent images on 1 device and on an 8-way ray-sharded
mesh, and the differentiable train step must run sharded with finite grads.
"""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ignis_tpu
from ignis_tpu.parallel.mesh import (make_mesh, render_iteration_sharded,
                                     train_step_sharded)


def small_scene(size=64, max_depth=3):
    return {
        "technique": {"type": "path", "max_depth": max_depth},
        "camera": {"type": "perspective", "fov": 60, "near_clip": 0.1,
                   "far_clip": 100,
                   "transform": [-1, 0, 0, 0, 0, 1, 0, 0, 0, 0, -1, 3,
                                 0, 0, 0, 1]},
        "film": {"size": [size, size]},
        "bsdfs": [
            {"type": "diffuse", "name": "white", "reflectance": [0.7, 0.5, 0.3]},
        ],
        "shapes": [
            {"type": "rectangle", "name": "floor", "width": 4, "height": 4},
            {"type": "sphere", "name": "ball", "radius": 0.5},
        ],
        "entities": [
            {"name": "floor", "shape": "floor", "bsdf": "white",
             "transform": [{"rotate": [-90, 0, 0]}, {"translate": [0, -1, 0]}]},
            {"name": "ball", "shape": "ball", "bsdf": "white"},
        ],
        "lights": [
            {"type": "point", "name": "l", "position": [1, 2, 2], "power": 30},
            {"type": "env", "name": "e", "radiance": [0.2, 0.2, 0.3]},
        ],
    }


@pytest.fixture(scope="module")
def rt():
    return ignis_tpu.loadFromString(json.dumps(small_scene()))


def test_sharded_matches_single(rt):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh()
    img_sharded = render_iteration_sharded(rt.scene, rt.settings,
                                           jnp.uint32(0), jnp.uint32(0), mesh)
    from ignis_tpu.render.session import render_iteration
    img_single = render_iteration(rt.scene, rt.settings,
                                  jnp.uint32(0), jnp.uint32(0))
    np.testing.assert_allclose(np.asarray(img_sharded),
                               np.asarray(img_single), atol=1e-5)


def test_train_step_sharded(rt):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh()
    settings = rt.settings.__class__(**{**rt.settings.__dict__, "remat": True})
    target = jnp.zeros((settings.height, settings.width, 3), jnp.float32)
    loss, new_scene = train_step_sharded(rt.scene, settings, target,
                                         jnp.uint32(0), jnp.uint32(0),
                                         jnp.float32(1e-2), mesh)
    assert np.isfinite(float(loss))
    # The albedo parameter must have moved (gradient nonzero)
    before = np.asarray(rt.scene.materials.base.r)
    after = np.asarray(new_scene.materials.base.r)
    assert not np.allclose(before, after)


def test_gradient_finite_difference(rt):
    """Pixel-gradient check vs finite differences on the albedo
    (BASELINE.md gradient gate, small version)."""
    from ignis_tpu.render.session import render_iteration
    settings = rt.settings.__class__(**{**rt.settings.__dict__, "remat": True})
    scene = rt.scene

    def loss_of(base_r):
        mat = scene.materials._replace(
            base=scene.materials.base._replace(r=base_r))
        img = render_iteration(scene._replace(materials=mat), settings,
                               jnp.uint32(0), jnp.uint32(0))
        return jnp.mean(img)

    base = scene.materials.base.r
    g = jax.grad(loss_of)(base)
    eps = 1e-3
    for i in range(base.shape[0]):
        fd = (loss_of(base.at[i].add(eps)) - loss_of(base.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i], float(fd),
                                   rtol=0.05, atol=1e-5)


def test_tonemap_ops():
    from ignis_tpu.render.tonemap import image_info, tonemap
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(32, 32, 3).astype(np.float32)) * 4.0
    for m in range(7):
        out = tonemap(img, method=m)
        assert out.shape == img.shape
        assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1
    info = image_info(img)
    assert float(info.min) >= 0
    assert float(info.max) <= 4.0 + 1e-5
    assert int(info.nan_count) == 0
    assert info.histogram.shape == (4, 64)


def test_sharded_compact_matches_single():
    """shard_map compacting cascade (per-chip local compaction) must match
    the single-device cascade and the plain sharded render."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    import ignis_tpu
    from ignis_tpu.parallel.mesh import render_iteration_sharded_compact
    from ignis_tpu.render.session import _render_iteration_compacting

    sc = small_scene()
    sc["film"] = {"size": [64, 64]}   # 4096 lanes = 512/device on 8
    rt = ignis_tpu.loadFromString(json.dumps(sc))
    mesh = make_mesh()
    img_sh = np.asarray(render_iteration_sharded_compact(
        rt.scene, rt.settings, jnp.uint32(0), jnp.uint32(0), mesh))
    img_1 = np.asarray(_render_iteration_compacting(
        rt.scene, rt.settings, jnp.uint32(0), jnp.uint32(0)))
    np.testing.assert_allclose(img_sh, img_1, rtol=2e-4, atol=2e-5)


BASELINE_SCENES = [
    "/root/reference/scenes/single_triangle.json",
    "/root/reference/scenes/primitives.json",
    "/root/reference/scenes/diamond_scene.json",
    "/root/reference/scenes/environment_map.json",
    "/root/reference/scenes/participating_media.json",
]


@pytest.mark.parametrize("path", BASELINE_SCENES,
                         ids=[p.rsplit("/", 1)[1][:-5] for p in BASELINE_SCENES])
def test_gradient_gate_baseline_scenes(path):
    """BASELINE.md gradient gate: reverse-mode gradients on each of the
    five config scenes must match central finite differences (the RNG is
    deterministic per (iteration, frame), so FD is exact on the same
    sample set up to float noise). Differentiates the material albedo
    table; environment_map has no BSDFs at all, so there the parameter is
    the env light radiance scale."""
    rt = ignis_tpu.loadFromFile(path, width=24, height=24, spi=1)
    settings = rt.settings.__class__(**{**rt.settings.__dict__,
                                        "remat": True})
    scene = rt.scene
    use_light = "environment_map" in path

    def loss_of(p):
        from ignis_tpu.render.session import render_iteration
        if use_light:
            sc = scene._replace(lights=scene.lights._replace(
                intensity=scene.lights.intensity._replace(r=p)))
        else:
            sc = scene._replace(materials=scene.materials._replace(
                base=scene.materials.base._replace(r=p)))
        img = render_iteration(sc, settings, jnp.uint32(0), jnp.uint32(0))
        return jnp.mean(img)

    p0 = (scene.lights.intensity.r if use_light
          else scene.materials.base.r)
    g = np.asarray(jax.grad(loss_of)(p0))
    assert np.isfinite(g).all()
    # FD-check the largest-|g| rows (guaranteed signal)
    order = np.argsort(-np.abs(g))[:2]
    assert abs(g[order[0]]) > 0, "no differentiable signal in scene"
    eps = 1e-3
    for i in order:
        fd = (float(loss_of(p0.at[i].add(eps)))
              - float(loss_of(p0.at[i].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.08, atol=1e-6)
