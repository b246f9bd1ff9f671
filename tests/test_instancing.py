"""Two-level acceleration / instancing (reference EntityLeaf TLAS,
src/artic/traversal/bvh.art:40-61, LoaderEntity.cpp:18-32): many entities
sharing one mesh keep a single local-space copy + per-instance transforms.

Gates (VERDICT r1 #5): an instanced scene renders with O(1 mesh) memory
and matches the flattened render."""
import json
import math

import numpy as np

import ignis_tpu


def _grid_scene(n_side, spacing=1.5):
    """n_side^2 icospheres on a grid under a point light."""
    entities = []
    for i in range(n_side):
        for j in range(n_side):
            ang = (i * n_side + j) * 0.37
            entities.append({
                "name": f"ball_{i}_{j}", "shape": "ball", "bsdf": "white",
                "transform": [
                    {"translate": [(i - n_side / 2) * spacing, 0.0,
                                   (j - n_side / 2) * spacing]},
                    {"rotate": [0, math.degrees(ang), 0]},
                    {"scale": 0.5},
                ],
            })
    return {
        "technique": {"type": "path", "max_depth": 3},
        "camera": {"type": "perspective", "fov": 60,
                   "transform": [1, 0, 0, 0,
                                 0, 0.7071, -0.7071, 8,
                                 0, 0.7071, 0.7071, -8]},
        "film": {"size": [64, 64]},
        "bsdfs": [{"type": "diffuse", "name": "white",
                   "reflectance": [0.7, 0.6, 0.5]}],
        "shapes": [{"type": "icosphere", "name": "ball", "radius": 1.0,
                    "subdivisions": 2}],
        "entities": entities,
        "lights": [{"type": "point", "name": "P", "position": [0, 6, 0],
                    "intensity": [80, 80, 80]}],
    }


def test_instanced_matches_flattened_with_o1_memory():
    doc = json.dumps(_grid_scene(8))  # 64 instances
    flat = ignis_tpu.loadFromString(doc, spi=4)
    inst = ignis_tpu.loadFromString(doc, spi=4, instancing=True)

    # O(1 mesh) memory: the instanced scene's global soup holds no copy of
    # the 64 spheres; the shared local soup holds exactly one.
    n_flat = int(np.sum(np.asarray(flat.scene.tri_attr.ent) >= 0))
    assert inst.scene.instances is not None
    assert len(inst.scene.instances) == 1
    geo = inst.scene.instances[0]
    assert geo.n_instances == 64
    one_mesh = geo.tris_per_instance
    # padded to the dense-sweep chunk multiple (256, ops/intersect.py)
    assert one_mesh <= math.ceil(n_flat / 64 / 256) * 256
    n_inst_global = int(np.sum(np.asarray(inst.scene.tri_attr.ent) >= 0))
    assert n_inst_global == 0  # every entity was instanced

    flat.step()
    inst.step()
    a = flat.framebuffer(normalized=True)
    b = inst.framebuffer(normalized=True)
    # same sampler seeds; geometry identical up to fp transform noise
    denom = np.maximum(np.abs(a), 1e-3)
    rel = np.abs(a - b) / denom
    assert np.quantile(rel, 0.99) < 0.05, (a.mean(), b.mean())
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.01


def test_instanced_1k_instances_builds_small():
    """1000 instances: build memory stays O(1 mesh) (the VERDICT gate)."""
    doc = json.dumps(_grid_scene(32, spacing=1.2))  # 1024 instances
    rt = ignis_tpu.loadFromString(doc, spi=1, instancing=True)
    geo = rt.scene.instances[0]
    assert geo.n_instances == 1024
    # global soup: only padding rows; local soup: one mesh
    assert int(np.sum(np.asarray(rt.scene.tri_attr.ent) >= 0)) == 0
    assert geo.tris_per_instance < 1500
    # total resident geometry floats ~ O(mesh + instances), not mesh*inst
    resident = geo.tris_per_instance * 21 + geo.n_instances * (12 + 9 + 6)
    flattened_would_be = geo.n_instances * geo.tris_per_instance * 21
    assert resident < flattened_would_be / 50


def _multi_group_scene():
    """Three different meshes, each reused by several entities, plus one
    unique mesh that must stay flattened."""
    entities = []
    shapes = [
        {"type": "icosphere", "name": "ball", "radius": 1.0,
         "subdivisions": 2},
        {"type": "cube", "name": "box", "width": 1.2, "height": 1.2,
         "depth": 1.2},
        {"type": "cylinder", "name": "cyl", "radius": 0.4, "p0": [0, 0, 0],
         "p1": [0, 1.2, 0]},
        {"type": "cone", "name": "lone", "radius": 0.7, "p0": [0, 0, 0],
         "p1": [0, 1.4, 0]},
    ]
    layout = [("ball", 4), ("box", 3), ("cyl", 3), ("lone", 1)]
    k = 0
    for sname, count in layout:
        for c in range(count):
            entities.append({
                "name": f"{sname}_{c}", "shape": sname, "bsdf": "white",
                "transform": [
                    {"translate": [(k % 4 - 1.5) * 2.2, 0.0,
                                   (k // 4 - 1.0) * 2.2]},
                    {"scale": 0.6},
                ],
            })
            k += 1
    return {
        "technique": {"type": "path", "max_depth": 3},
        "camera": {"type": "perspective", "fov": 60,
                   "transform": [1, 0, 0, 0,
                                 0, 0.7071, -0.7071, 7,
                                 0, 0.7071, 0.7071, -7]},
        "film": {"size": [64, 64]},
        "bsdfs": [{"type": "diffuse", "name": "white",
                   "reflectance": [0.7, 0.6, 0.5]}],
        "shapes": shapes,
        "entities": entities,
        "lights": [{"type": "point", "name": "P", "position": [0, 6, 0],
                    "intensity": [80, 80, 80]}],
    }


def test_multi_group_instancing_matches_flattened():
    """VERDICT r3 #7: N instance groups — a scene with 3 reused meshes
    renders identically to its flattened version, each mesh stored once."""
    doc = json.dumps(_multi_group_scene())
    flat = ignis_tpu.loadFromString(doc, spi=4)
    inst = ignis_tpu.loadFromString(doc, spi=4, instancing=True)

    assert inst.scene.instances is not None
    assert len(inst.scene.instances) == 3  # ball, box, cyl groups
    counts = sorted(g.n_instances for g in inst.scene.instances)
    assert counts == [3, 3, 4]
    # the lone cone stays in the global soup; every reused mesh is stored
    # exactly once (soup rows = 1 mesh + chunk padding, not N copies)
    n_global = int(np.sum(np.asarray(inst.scene.tri_attr.ent) >= 0))
    n_flat = int(np.sum(np.asarray(flat.scene.tri_attr.ent) >= 0))
    assert 0 < n_global < n_flat / 3

    flat.step()
    inst.step()
    a = flat.framebuffer(normalized=True)
    b = inst.framebuffer(normalized=True)
    denom = np.maximum(np.abs(a), 1e-3)
    rel = np.abs(a - b) / denom
    assert np.quantile(rel, 0.99) < 0.05, (a.mean(), b.mean())
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.01
