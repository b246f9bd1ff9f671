"""Blend/mask BSDF wrapper tests (reference bsdf/mix.art, MaskBSDF)."""
import json

import numpy as np
import pytest

import ignis_tpu


def flat_env_scene(bsdfs, mat, size=64):
    return {
        "technique": {"type": "path", "max_depth": 2},
        "camera": {"type": "perspective", "fov": 90, "near_clip": 0.01,
                   "far_clip": 100,
                   "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, -1]},
        "film": {"size": [size, size]},
        "bsdfs": bsdfs,
        "shapes": [{"type": "rectangle", "name": "B", "width": 2, "height": 2,
                    "flip_normals": True}],
        "entities": [{"name": "B", "shape": "B", "bsdf": mat}],
        "lights": [{"type": "env", "name": "e", "radiance": [1, 1, 1]}],
    }


def center_color(scene, spp=16):
    rt = ignis_tpu.loadFromString(json.dumps(scene))
    for _ in range(spp):
        rt.step()
    img = rt.framebuffer(normalized=True)
    return img[24:40, 24:40].mean((0, 1))


def test_blend_weight():
    scene = flat_env_scene([
        {"type": "diffuse", "name": "red", "reflectance": [1, 0, 0]},
        {"type": "diffuse", "name": "blue", "reflectance": [0, 0, 1]},
        {"type": "blend", "name": "m", "first": "red", "second": "blue",
         "weight": 0.25},
    ], "m")
    c = center_color(scene)
    # Under uniform env with max_depth 2 the flat plane converges to its
    # reflectance; the blend mixes reflectances by `weight` towards second.
    np.testing.assert_allclose(c, [0.75, 0.0, 0.25], atol=0.03)


def test_mask_opacity():
    scene = flat_env_scene([
        {"type": "diffuse", "name": "red", "reflectance": [1, 0, 0]},
        {"type": "mask", "name": "m", "bsdf": "red", "opacity": 0.5},
    ], "m")
    c = center_color(scene, spp=24)
    # 50% passthrough (sees the env behind) + 50% red diffuse
    np.testing.assert_allclose(c, [1.0, 0.5, 0.5], atol=0.05)


def test_twosided_alias():
    scene = flat_env_scene([
        {"type": "diffuse", "name": "g", "reflectance": [0.2, 0.8, 0.2]},
        {"type": "twosided", "name": "m", "bsdf": "g"},
    ], "m")
    c = center_color(scene)
    np.testing.assert_allclose(c, [0.2, 0.8, 0.2], atol=0.03)


def test_nested_blend_matches_flattened_oracle():
    """Nested mixes (blend of a blend) resolve recursively up to
    BLEND_MAX_DEPTH (reference composes nested make_mix_bsdf closures,
    mix.art): blend(blend(r, g, 0.5), b, 0.5) of diffuses must equal the
    flattened diffuse with lerped reflectance."""
    scene = flat_env_scene([
        {"type": "diffuse", "name": "r", "reflectance": [0.8, 0.0, 0.0]},
        {"type": "diffuse", "name": "g", "reflectance": [0.0, 0.8, 0.0]},
        {"type": "blend", "name": "inner", "first": "r", "second": "g",
         "weight": 0.5},
        {"type": "diffuse", "name": "b", "reflectance": [0.0, 0.0, 0.8]},
        {"type": "blend", "name": "outer", "first": "inner", "second": "b",
         "weight": 0.5},
    ], "outer")
    c = center_color(scene, spp=32)
    np.testing.assert_allclose(c, [0.2, 0.2, 0.4], atol=0.03)


def test_dielectric_mix_matches_flattened_oracle():
    """One-sample mix of two smooth dielectrics with the SAME ior and
    different tints is exactly a dielectric with lerped tints (the delta
    directions coincide, so the mixture estimator must reproduce the
    lerp — this is the transmissive-children case that regressed in
    round 4's eval)."""
    def glass_scene(bsdfs, mat):
        s = flat_env_scene(bsdfs, mat)
        s["technique"]["max_depth"] = 6
        return s

    mixed = glass_scene([
        {"type": "dielectric", "name": "ga", "int_ior": 1.5,
         "specular_transmittance": [1.0, 0.2, 0.2]},
        {"type": "dielectric", "name": "gb", "int_ior": 1.5,
         "specular_transmittance": [0.2, 0.2, 1.0]},
        {"type": "blend", "name": "m", "first": "ga", "second": "gb",
         "weight": 0.5},
    ], "m")
    flat = glass_scene([
        {"type": "dielectric", "name": "m", "int_ior": 1.5,
         "specular_transmittance": [0.6, 0.2, 0.6]},
    ], "m")
    cm = center_color(mixed, spp=48)
    cf = center_color(flat, spp=48)
    np.testing.assert_allclose(cm, cf, atol=0.04)
