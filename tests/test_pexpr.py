"""PExpr compiler tests (Transpiler analog; docs/src/scene/pexpr.rst)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ignis_tpu.core.vec import Vec2
from ignis_tpu.models.texture import make_shade_ctx
from ignis_tpu.scene.pexpr import Compiler, PExprError


def ctx_with_uv(u=0.25, v=0.5, n=4):
    uu = jnp.full(n, u, jnp.float32)
    vv = jnp.full(n, v, jnp.float32)
    return make_shade_ctx(Vec2(uu, vv))


def run_num(src, **kw):
    c = Compiler({}, kw.get("params"))
    f = c.compile_number(src)
    return float(np.asarray(f(ctx_with_uv(*kw.get("uv", (0.25, 0.5)))))[0])


def run_color(src):
    c = Compiler({})
    f = c.compile_color(src)
    out = f(ctx_with_uv())
    return [float(np.asarray(x)[0]) for x in out]


def test_arithmetic():
    assert run_num("1 + 2 * 3") == 7
    assert run_num("(1 + 2) * 3") == 9
    assert run_num("2^3") == 8
    assert run_num("-4 + 1") == -3
    assert run_num("7 % 3") == pytest.approx(1)


def test_trig():
    assert run_num("sin(Pi/2)") == pytest.approx(1, abs=1e-6)
    assert run_num("cos(0)") == 1
    assert run_num("sqrt(16)") == 4
    assert run_num("abs(-3)") == 3


def test_vectors_swizzle():
    assert run_color("vec3(1,2,3).zyx") == [3, 2, 1]
    assert run_color("color(0.2, 0.4, 0.1, 0)")[:3] == \
        pytest.approx([0.2, 0.4, 0.1])
    assert run_num("vec3(1,2,3).y") == 2
    assert run_color("vec2(5, 7).xyxy")[:3] == [5, 7, 5]


def test_vector_math():
    assert run_num("dot(vec3(1,0,0), vec3(0,1,0))") == 0
    assert run_num("length(vec3(3,4,0))") == 5
    assert run_color("norm(vec3(0,0,2))") == [0, 0, 1]
    assert run_num("avg(vec3(1,2,3))") == 2
    assert run_color("cross(vec3(1,0,0), vec3(0,1,0))") == [0, 0, 1]


def test_variables():
    assert run_num("uv.x", uv=(0.3, 0.6)) == pytest.approx(0.3)
    assert run_num("uv.y * 2", uv=(0.3, 0.6)) == pytest.approx(1.2)
    assert run_num("fract(2.75)") == pytest.approx(0.75)


def test_comparison_select():
    assert run_num("select(1 < 2, 10, 20)") == 10
    assert run_num("select(uv.x > 0.5, 1, 0)", uv=(0.25, 0.5)) == 0
    assert run_num("1 < 2 && 3 > 2 ? 5 : 6") == 5


def test_mix_clamp():
    assert run_num("mix(0, 10, 0.25)") == pytest.approx(2.5)
    assert run_num("clamp(5, 0, 3)") == 3
    assert run_num("min(4, 7)") == 4
    assert run_num("max(4, 7)") == 7


def test_parameters():
    params = {"myval": ("num", 42.0)}
    c = Compiler({}, params)
    f = c.compile_number("myval / 2")
    assert float(np.asarray(f(ctx_with_uv()))[0]) == 21


def test_scene_expr_from_gate_scene():
    # participating_media.json medium expression
    c = Compiler({})
    f = c.compile_color("4*norm(Np.xyzz)")
    out = f(ctx_with_uv())
    assert np.isfinite(np.asarray(out[0])).all()
    f2 = c.compile_color("0.2*(color(1)-norm(Np.xyzz))")
    out2 = f2(ctx_with_uv())
    assert np.isfinite(np.asarray(out2[0])).all()


def test_noise_bounded():
    v = run_num("perlin(uv * 10)")
    assert 0 <= v <= 1
    v = run_num("fbm(uv.yx * 4)")
    assert 0 <= v <= 1


def test_errors():
    with pytest.raises(PExprError):
        Compiler({}).compile("unknown_fn(1)")(ctx_with_uv())
    with pytest.raises(PExprError):
        Compiler({}).compile("1 +")


def test_checkerboard_parity_matches_reference():
    # node_checkerboard2/3 (reference texture/checkerboard.art:1-2): the
    # vec3 variant XORs in the z parity, so checkerboard(uvw) with w=0 is
    # the inverse of the vec2 parity
    assert run_num("checkerboard(vec2(0.5, 0.5))") == 1
    assert run_num("checkerboard(vec2(1.5, 0.5))") == 0
    assert run_num("checkerboard(vec3(0.5, 0.5, 0.0))") == 0
    assert run_num("checkerboard(vec3(1.5, 0.5, 0.0))") == 1
    assert run_num("checkerboard(vec3(0.5, 0.5, 1.5))") == 1
    # negative coords wrap like math::wrap (always into [0,2))
    assert run_num("checkerboard(vec3(-0.5, 0.5, 0.0))") == 1


def test_bump_builtin_tilts_against_gradient():
    # bump(N, Nx, Ny, dist, dHdu, dHdv): height rising along +u tilts the
    # normal toward -u (texture/bump.art:3-11)
    c = Compiler({})
    f = c.compile("bump(vec3(0,0,1), vec3(1,0,0), vec3(0,1,0), 1.0, 0.5, 0.0)")
    t, v = f(ctx_with_uv())
    assert t == "vec3"
    x = float(np.asarray(v[0])[0]); z = float(np.asarray(v[2])[0])
    assert x < 0 and z > 0
    assert abs(x / z + 0.5) < 1e-5  # tan of tilt = dHdu


def test_ensure_valid_reflection_passthrough_and_clamp():
    c = Compiler({})
    # valid normal: unchanged
    f = c.compile("ensure_valid_reflection(vec3(0,0,1), vec3(0,0,1), "
                  "vec3(0.1, 0, 0.995))")
    _, v = f(ctx_with_uv())
    assert abs(float(np.asarray(v[0])[0]) - 0.1) < 1e-3
    # normal nearly perpendicular with grazing view: reflection would go
    # below the surface -> nudged back above the geometric horizon
    f2 = c.compile("ensure_valid_reflection(vec3(0,0,1), "
                   "vec3(-0.995, 0, 0.0995), vec3(1, 0, 0.01))")
    _, v2 = f2(ctx_with_uv())
    n = np.array([float(np.asarray(x)[0]) for x in v2])
    i = np.array([-0.995, 0, 0.0995])
    r = 2 * np.dot(n, i) * n - i
    assert r[2] >= -1e-4  # view reflection not below the geometric surface


def test_constant_fold_rejects_spatial_expressions():
    """eval_constant_color must NOT fold uv/position-dependent
    expressions: a 5x5 checker probed at two points can agree by parity
    coincidence and would fold to its dark color (this flattened
    cycles-sun's ground to albedo 0.2 in round 5)."""
    from ignis_tpu.scene.build import TextureRegistry

    reg = TextureRegistry([], {})
    checker = ("select(checkerboard(uvw * 5.0) == 1, "
               "color(0.8, 0.8, 0.8, 1), color(0.2, 0.2, 0.2, 1))")
    assert reg.eval_constant_color(checker) is None
    assert reg.eval_constant_color("select(checkerboard(uvw * 10.0) == 1, "
                                   "color(1,1,1,1), color(0,0,0,1))") is None
    # true constants still fold
    c = reg.eval_constant_color("color(0.25, 0.5, 0.75, 1.0)")
    assert c is not None and abs(c[0] - 0.25) < 1e-6
