"""Robustness tier, mirroring the reference's non-rendering test suites:

- scene-JSON fuzzer (reference src/tests/fuzzer/main.cpp:15-50): arbitrary
  byte strings / structurally-mutated documents into the parser; the gate
  is "no crash" — clean Python exceptions are fine, aborts are not.
- generated all-builtins PExpr shader (reference
  src/tests/shading_system/main.cpp:9-38, Transpiler.h:47
  generateTestShader): every builtin function and variable compiles and
  evaluates through the real compiler.
- ErrorBSDF-style graceful degradation (reference
  src/runtime/loader/LoaderBSDF.cpp:36-49): unknown plugin types render
  with a substitute and a warning instead of failing the load.
"""
import json
import random

import jax.numpy as jnp
import numpy as np
import pytest

import ignis_tpu
from ignis_tpu.scene import pexpr
from ignis_tpu.scene.parser import load_from_string

BASE_SCENE = {
    "technique": {"type": "path", "max_depth": 2},
    "camera": {"type": "perspective", "fov": 60,
               "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, -2]},
    "film": {"size": [8, 8]},
    "bsdfs": [{"type": "diffuse", "name": "g", "reflectance": [0.5, 0.5, 0.5]}],
    "shapes": [{"type": "rectangle", "name": "B", "width": 4, "height": 4}],
    "entities": [{"name": "B", "shape": "B", "bsdf": "g"}],
    "lights": [{"type": "point", "name": "P", "position": [0, 1, -1.5],
                "intensity": [4, 4, 4]}],
}


# ---------------------------------------------------------------------------
# 1. parser fuzzer
# ---------------------------------------------------------------------------

def test_fuzz_random_bytes_no_crash():
    rng = random.Random(0xC0FFEE)
    for i in range(200):
        n = rng.randrange(0, 256)
        blob = bytes(rng.randrange(0, 256) for _ in range(n))
        try:
            load_from_string(blob.decode("latin-1"), ".")
        except Exception:
            pass  # clean failure is the pass condition


def test_fuzz_json_fragments_no_crash():
    rng = random.Random(1234)
    fragments = ["{", "}", "[", "]", '"', ":", ",", "null", "true",
                 "-1e999", '"shapes"', '"type"', "{}", "[]", "1.5",
                 '"\\u0000"', "//x\n", "/*", "*/"]
    for i in range(300):
        doc = "".join(rng.choice(fragments)
                      for _ in range(rng.randrange(1, 30)))
        try:
            load_from_string(doc, ".")
        except Exception:
            pass


def _mutate(doc, rng):
    """Structural mutation: delete/replace/retype a random node."""
    if isinstance(doc, dict):
        doc = dict(doc)
        if doc and rng.random() < 0.5:
            k = rng.choice(sorted(doc))
            op = rng.randrange(3)
            if op == 0:
                del doc[k]
            elif op == 1:
                doc[k] = rng.choice([None, -1, 1e30, "garbage", [], {},
                                     [1, "a", None]])
            else:
                doc[k] = _mutate(doc[k], rng)
        return doc
    if isinstance(doc, list):
        doc = list(doc)
        if doc and rng.random() < 0.5:
            i = rng.randrange(len(doc))
            doc[i] = _mutate(doc[i], rng)
        return doc
    return rng.choice([None, 0, "x", [doc], {"v": doc}])


def test_fuzz_mutated_scenes_no_crash():
    """Valid scene with random structural damage must either load (possibly
    with warnings) or raise cleanly — load + build, the full pipeline."""
    rng = random.Random(77)
    for i in range(60):
        doc = _mutate(BASE_SCENE, rng)
        try:
            rt = ignis_tpu.loadFromString(json.dumps(doc), spi=1)
            assert rt is not None
        except Exception:
            pass


# ---------------------------------------------------------------------------
# 2. generated all-builtins PExpr shader
# ---------------------------------------------------------------------------

def _dummy_ctx(n=8):
    z = jnp.linspace(0.05, 0.95, n)
    o = jnp.ones(n)
    v3 = (z, z * 0.5, 1.0 - z)
    return pexpr.ShadeCtx(
        uv=(z, 1.0 - z), point=v3, np_=v3, normal=(0 * z, 0 * z, o),
        face_normal=(0 * z, 0 * z, o), tangent=(o, 0 * z, 0 * z),
        bitangent=(0 * z, o, 0 * z), ray_dir=v3, ray_org=v3,
        prim_coords=(z, z), entity_id=jnp.zeros(n, jnp.int32),
        pixel=(jnp.arange(n, dtype=jnp.int32),
               jnp.arange(n, dtype=jnp.int32)),
        frontside=jnp.ones(n, bool),
        textures=lambda tid, uv: (uv[0], uv[1], uv[0] * 0 + 0.5))


CANDIDATE_ARGS = [
    ["0.5"],
    ["0.5", "0.25"],
    ["0.5", "0.25", "0.75"],
    ["vec2(0.3, 0.6)"],
    ["vec2(0.3, 0.6)", "2"],
    ["vec3(0.1, 0.2, 0.3)"],
    ["vec3(0.1, 0.2, 0.3)", "vec3(0.4, 0.5, 0.6)"],
    ["vec3(0.1, 0.2, 0.3)", "vec3(0.4, 0.5, 0.6)", "0.5"],
    ["vec4(0.1, 0.2, 0.3, 1.0)"],
    ["0.5", "1.0", "1.5"],
    ["true", "0.25", "0.75"],
    ["0.5", "0.25", "0.75", "1.0"],
    # ensure_valid_reflection(Ng, V, N) — three vec3s
    ["vec3(0, 0, 1)", "vec3(0.5, 0, 0.866)", "vec3(0.3, 0, 0.954)"],
    # bump(N, Nx, Ny, distance, dHdu, dHdv)
    ["vec3(0, 0, 1)", "vec3(1, 0, 0)", "vec3(0, 1, 0)", "1.0", "0.2",
     "0.1"],
]


def test_pexpr_all_builtin_functions_compile_and_eval():
    """Analog of Transpiler::generateTestShader — every builtin in the
    function table must compile and evaluate under at least one signature."""
    comp = pexpr.Compiler({})
    ctx = _dummy_ctx()
    failed = []
    for name in sorted(pexpr._FUNCS1):
        ok = False
        for args in CANDIDATE_ARGS:
            src = f"{name}({', '.join(args)})"
            try:
                t, v = comp.compile(src)(ctx)
                vals = v if isinstance(v, tuple) else (v,)
                assert all(np.all(np.isfinite(np.asarray(x))) for x in vals
                           if hasattr(x, "shape")), src
                ok = True
                break
            except pexpr.PExprError:
                continue
            except AssertionError:
                continue
        if not ok:
            failed.append(name)
    assert not failed, f"builtins with no working signature: {failed}"


def test_pexpr_all_builtin_variables_compile_and_eval():
    comp = pexpr.Compiler({"tex": 0})
    ctx = _dummy_ctx()
    var_exprs = [
        "uv.x + uv.y", "uvw.z", "prim_coords.x", "P.x + P.y + P.z",
        "Np.x", "N.z", "Ng.z", "Nx.x", "Ny.y", "V.x", "Rd.y", "Ro.z",
        "entity_id", "Ix + Iy", "frontside ? 1 : 0",
        "Pi + E + Eps", "NumMax > 0 ? 1 : 0", "NumMin < 0 ? 1 : 0",
        "true ? 1 : 0", "false ? 0 : 1", "tex.r + tex.g",
    ]
    for src in var_exprs:
        t, v = comp.compile(src)(ctx)
        vals = v if isinstance(v, tuple) else (v,)
        for x in vals:
            assert np.all(np.isfinite(np.asarray(x))), src


def test_pexpr_generated_megashader():
    """One generated expression chaining many builtins — the closest analog
    of compiling the reference's single generated test shader."""
    parts = ["abs(sin(uv.x))", "clamp(P.x, 0, 1)",
             "luminance(vec3(uv.x, uv.y, 0.5))",
             "mix(0.2, 0.8, fract(P.y))", "noise(uv * 8)",
             "fbm(uv * 4)", "voronoi(uv * 4)", "checkerboard(uv * 2)",
             "smoothstep(uv.x)", "select(frontside, 1.0, 0.0)"]
    src = " + ".join(parts)
    comp = pexpr.Compiler({})
    t, v = comp.compile(src)(_dummy_ctx())
    arr = np.asarray(v if not isinstance(v, tuple) else v[0])
    assert np.all(np.isfinite(arr))


# ---------------------------------------------------------------------------
# 3. graceful degradation (ErrorBSDF analog)
# ---------------------------------------------------------------------------

def test_unknown_bsdf_renders_with_warning():
    doc = json.loads(json.dumps(BASE_SCENE))
    doc["bsdfs"][0]["type"] = "nonexistent_plugin_xyz"
    rt = ignis_tpu.loadFromString(json.dumps(doc), spi=1)
    assert any("nonexistent_plugin_xyz" in w or "Unsupported BSDF" in w
               for w in rt.warnings), rt.warnings
    rt.step()
    img = rt.framebuffer(normalized=True)
    assert np.all(np.isfinite(img))


def test_unknown_shape_and_light_warn_not_crash():
    doc = json.loads(json.dumps(BASE_SCENE))
    doc["shapes"].append({"type": "hyperboloid9", "name": "weird"})
    doc["lights"].append({"type": "quantum_light", "name": "q"})
    rt = ignis_tpu.loadFromString(json.dumps(doc), spi=1)
    assert rt.warnings
    rt.step()
    assert np.all(np.isfinite(rt.framebuffer(normalized=True)))


def test_missing_texture_reference_degrades():
    doc = json.loads(json.dumps(BASE_SCENE))
    doc["bsdfs"][0]["reflectance"] = "no_such_texture"
    try:
        rt = ignis_tpu.loadFromString(json.dumps(doc), spi=1)
        rt.step()
        assert np.all(np.isfinite(rt.framebuffer(normalized=True)))
    except Exception as e:
        pytest.fail(f"missing texture must degrade, not raise: {e}")
