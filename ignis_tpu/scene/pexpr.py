"""PExpr -> JAX shading-closure compiler.

The reference transpiles PExpr (a SeExpr-like, single-expression, strongly
typed shading language) to Artic source
(/root/reference/src/runtime/loader/Transpiler.cpp, docs/src/scene/pexpr.rst).
Here expressions compile directly to Python closures over jnp arrays: the
XLA-traced analog of the reference's string codegen.

Supported: full operator set (+ - * / % unary- comparisons && || ! select),
swizzles (.xyzw/.rgba combinations), implicit int->num promotion, the
documented variable set (uv, uvw, P, Np, N, Ng, Nx, Ny, V/Rd, Ro,
prim_coords, entity_id, Ix, Iy, frontside, Pi, E, Eps, Inf, ...), scene
parameters, texture variables/calls, and the common function library.

Values are (type, data): num/int/bool -> jnp array; vecN -> tuple of N
arrays; str -> python str.
"""
from __future__ import annotations

import math
import re
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax.numpy as jnp


class PExprError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<comment>/\*.*?\*/)
  | (?P<num>(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<str>"[^"]*"|'[^']*')
  | (?P<op>\*\*|&&|\|\||==|!=|<=|>=|[-+*/%^<>!?:(),.])
""", re.VERBOSE | re.DOTALL)


class Tok(NamedTuple):
    kind: str
    text: str


def tokenize(src: str) -> List[Tok]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise PExprError(f"PExpr: bad token at '{src[pos:pos+12]}'")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append(Tok(kind, m.group()))
    out.append(Tok("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

class Node:
    pass


class Num(Node):
    def __init__(self, v, is_int):
        self.v = v
        self.is_int = is_int


class Str(Node):
    def __init__(self, v):
        self.v = v


class Var(Node):
    def __init__(self, name):
        self.name = name


class Call(Node):
    def __init__(self, name, args):
        self.name = name
        self.args = args


class Unary(Node):
    def __init__(self, op, a):
        self.op = op
        self.a = a


class Binary(Node):
    def __init__(self, op, a, b):
        self.op = op
        self.a = a
        self.b = b


class Ternary(Node):
    def __init__(self, c, a, b):
        self.c = c
        self.a = a
        self.b = b


class Swizzle(Node):
    def __init__(self, a, comps):
        self.a = a
        self.comps = comps


_PREC = {
    "||": 2, "&&": 3,
    "==": 4, "!=": 4, "<": 5, "<=": 5, ">": 5, ">=": 5,
    "+": 6, "-": 6, "*": 7, "/": 7, "%": 7,
    "^": 8, "**": 8,
}


class Parser:
    def __init__(self, toks: List[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text):
        t = self.next()
        if t.text != text:
            raise PExprError(f"PExpr: expected '{text}', got '{t.text}'")

    def parse(self) -> Node:
        e = self.expr(0)
        if self.peek().kind != "eof":
            raise PExprError(f"PExpr: trailing tokens at '{self.peek().text}'")
        return e

    def expr(self, min_prec) -> Node:
        lhs = self.unary()
        while True:
            t = self.peek()
            if t.text == "?" and min_prec <= 1:
                self.next()
                a = self.expr(0)
                self.expect(":")
                b = self.expr(1)
                lhs = Ternary(lhs, a, b)
                continue
            prec = _PREC.get(t.text)
            if prec is None or prec < min_prec:
                return lhs
            self.next()
            rhs = self.expr(prec + 1)
            lhs = Binary(t.text, lhs, rhs)

    def unary(self) -> Node:
        t = self.peek()
        if t.text in ("-", "+", "!"):
            self.next()
            return Unary(t.text, self.unary())
        return self.postfix()

    def postfix(self) -> Node:
        e = self.primary()
        while self.peek().text == ".":
            self.next()
            t = self.next()
            if t.kind != "name":
                raise PExprError("PExpr: expected swizzle after '.'")
            e = Swizzle(e, t.text)
        return e

    def primary(self) -> Node:
        t = self.next()
        if t.kind == "num":
            txt = t.text
            is_int = re.fullmatch(r"\d+", txt) is not None
            return Num(float(txt), is_int)
        if t.kind == "str":
            return Str(t.text[1:-1])
        if t.kind == "name":
            if self.peek().text == "(":
                self.next()
                args = []
                if self.peek().text != ")":
                    while True:
                        args.append(self.expr(0))
                        if self.peek().text == ",":
                            self.next()
                            continue
                        break
                self.expect(")")
                return Call(t.text, args)
            return Var(t.text)
        if t.text == "(":
            e = self.expr(0)
            self.expect(")")
            return e
        raise PExprError(f"PExpr: unexpected token '{t.text}'")


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

VEC_SIZE = {"num": 1, "int": 1, "bool": 1, "vec2": 2, "vec3": 3, "vec4": 4}
_SWIZ_IDX = {"x": 0, "y": 1, "z": 2, "w": 3, "r": 0, "g": 1, "b": 2, "a": 3}


class ShadeCtx(NamedTuple):
    """Per-lane shading context handed to compiled expressions."""
    uv: tuple            # (u, v)
    point: tuple         # world position (x, y, z)
    np_: tuple           # normalized position
    normal: tuple
    face_normal: tuple
    tangent: tuple
    bitangent: tuple
    ray_dir: tuple       # V (outward)
    ray_org: tuple
    prim_coords: tuple
    entity_id: jnp.ndarray
    pixel: tuple         # (Ix, Iy)
    frontside: jnp.ndarray
    textures: Optional[Callable] = None   # (tex_id:int, (u,v)) -> (r,g,b)
    # dynamic parameter registry (SceneData.registry): name -> traced
    # array (shape () num / (3,) vec / (4,) color); when present, named
    # parameters are read live instead of the baked load-time constant
    registry: Optional[dict] = None
    # raw (unnormalized) surface derivatives dP/du, dP/dv — the bump()
    # builtin needs true magnitudes (height delta per surface distance,
    # like Cycles' bump node), not the unit tangents Nx/Ny
    dpdu: Optional[tuple] = None
    dpdv: Optional[tuple] = None


def _broadcast(v, like):
    return jnp.broadcast_to(jnp.asarray(v, jnp.float32), jnp.shape(like))


class Compiler:
    def __init__(self, texture_ids: Dict[str, int],
                 parameters: Optional[Dict[str, tuple]] = None):
        self.texture_ids = texture_ids
        self.parameters = parameters or {}

    def compile(self, src: str):
        """Returns (fn(ctx) -> (type, data))."""
        ast = Parser(tokenize(src)).parse()

        def run(ctx: ShadeCtx):
            return self.eval(ast, ctx)
        return run

    def compile_color(self, src: str):
        """Compile expecting a color output; casts scalars/vectors to rgb."""
        f = self.compile(src)

        def run(ctx: ShadeCtx):
            t, v = f(ctx)
            return _to_rgb(t, v, ctx)
        return run

    def compile_number(self, src: str):
        f = self.compile(src)

        def run(ctx: ShadeCtx):
            t, v = f(ctx)
            if t in ("num", "int", "bool"):
                return v.astype(jnp.float32) if hasattr(v, "astype") else v
            return v[0]
        return run

    # -- core ----------------------------------------------------------------
    def eval(self, n: Node, ctx: ShadeCtx):
        if isinstance(n, Num):
            shp = jnp.shape(ctx.uv[0])
            arr = jnp.broadcast_to(jnp.float32(n.v), shp)
            return ("int" if n.is_int else "num", arr)
        if isinstance(n, Str):
            return ("str", n.v)
        if isinstance(n, Var):
            return self.var(n.name, ctx)
        if isinstance(n, Swizzle):
            return self.swizzle(n, ctx)
        if isinstance(n, Unary):
            return self.unary(n, ctx)
        if isinstance(n, Binary):
            return self.binary(n, ctx)
        if isinstance(n, Ternary):
            ct, cv = self.eval(n.c, ctx)
            at, av = self.eval(n.a, ctx)
            bt, bv = self.eval(n.b, ctx)
            at, av, bt, bv = _unify(at, av, bt, bv)
            if at in ("num", "int", "bool"):
                return (at, jnp.where(cv, av, bv))
            return (at, tuple(jnp.where(cv, x, y) for x, y in zip(av, bv)))
        if isinstance(n, Call):
            return self.call(n, ctx)
        raise PExprError(f"PExpr: unknown node {n}")

    def var(self, name, ctx: ShadeCtx):
        shp = jnp.shape(ctx.uv[0])
        consts = {
            "Pi": math.pi, "E": math.e, "Eps": 1.19e-7,
            "NumMax": 3.4e38, "NumMin": -3.4e38, "Inf": float("inf"),
        }
        if name in consts:
            return ("num", jnp.broadcast_to(jnp.float32(consts[name]), shp))
        if name == "true":
            return ("bool", jnp.broadcast_to(True, shp))
        if name == "false":
            return ("bool", jnp.broadcast_to(False, shp))
        if name == "uv":
            return ("vec2", ctx.uv)
        if name == "prim_coords":
            return ("vec2", ctx.prim_coords)
        if name == "uvw":
            return ("vec3", (ctx.uv[0], ctx.uv[1],
                             jnp.zeros_like(ctx.uv[0])))
        if name in ("V", "Rd"):
            return ("vec3", ctx.ray_dir)
        if name == "Ro":
            return ("vec3", ctx.ray_org)
        if name == "P":
            return ("vec3", ctx.point)
        if name == "Np":
            return ("vec3", ctx.np_)
        if name == "N":
            return ("vec3", ctx.normal)
        if name == "Ng":
            return ("vec3", ctx.face_normal)
        if name == "Nx":
            return ("vec3", ctx.tangent)
        if name == "Ny":
            return ("vec3", ctx.bitangent)
        if name == "entity_id":
            return ("int", ctx.entity_id.astype(jnp.float32))
        if name == "Ix":
            return ("int", ctx.pixel[0].astype(jnp.float32))
        if name == "Iy":
            return ("int", ctx.pixel[1].astype(jnp.float32))
        if name == "frontside":
            return ("bool", ctx.frontside)
        if name in self.parameters:
            t, v = self.parameters[name]
            # live registry value wins over the baked load-time constant
            # (reference registry.art: kernels read parameters at runtime)
            reg = ctx.registry.get(name) if ctx.registry else None
            if reg is not None:
                arr = jnp.asarray(reg, jnp.float32)
                if arr.ndim == 0:
                    return ("num", jnp.broadcast_to(arr, shp))
                vals = tuple(jnp.broadcast_to(arr[i], shp)
                             for i in range(arr.shape[0]))
                return (f"vec{arr.shape[0]}", vals)
            if t == "num":
                return ("num", jnp.broadcast_to(jnp.float32(v), shp))
            vals = tuple(jnp.broadcast_to(jnp.float32(x), shp) for x in v)
            return (t, vals)
        if name in self.texture_ids:
            return self._tex_lookup(name, ctx.uv, ctx)
        raise PExprError(f"PExpr: unknown variable '{name}'")

    def _tex_lookup(self, name, uv, ctx: ShadeCtx):
        if ctx.textures is None:
            raise PExprError(f"PExpr: texture '{name}' needs texture context")
        rgb = ctx.textures(self.texture_ids[name], uv)
        return ("vec4", (rgb[0], rgb[1], rgb[2], jnp.ones_like(rgb[0])))

    def swizzle(self, n: Swizzle, ctx):
        t, v = self.eval(n.a, ctx)
        if t in ("num", "int", "bool"):
            comps = (v,)
        else:
            comps = v
        out = []
        for ch in n.comps:
            if ch not in _SWIZ_IDX:
                raise PExprError(f"PExpr: bad swizzle '{n.comps}'")
            idx = _SWIZ_IDX[ch]
            if idx >= len(comps):
                raise PExprError(f"PExpr: swizzle '{n.comps}' out of range")
            out.append(comps[idx])
        if len(out) == 1:
            return ("num", out[0])
        return (f"vec{len(out)}", tuple(out))

    def unary(self, n: Unary, ctx):
        t, v = self.eval(n.a, ctx)
        if n.op == "!":
            return ("bool", jnp.logical_not(v))
        sign = -1.0 if n.op == "-" else 1.0
        if t in ("num", "int"):
            return (t, v * sign)
        return (t, tuple(x * sign for x in v))

    def binary(self, n: Binary, ctx):
        op = n.op
        at, av = self.eval(n.a, ctx)
        bt, bv = self.eval(n.b, ctx)
        if op in ("&&", "||"):
            f = jnp.logical_and if op == "&&" else jnp.logical_or
            return ("bool", f(av, bv))
        if op in ("==", "!=", "<", "<=", ">", ">="):
            fa = av if at in ("num", "int", "bool") else av[0]
            fb = bv if bt in ("num", "int", "bool") else bv[0]
            fn = {"==": jnp.equal, "!=": jnp.not_equal, "<": jnp.less,
                  "<=": jnp.less_equal, ">": jnp.greater,
                  ">=": jnp.greater_equal}[op]
            return ("bool", fn(fa, fb))
        at, av, bt, bv = _unify(at, av, bt, bv)
        if op in ("^", "**"):
            f = lambda x, y: jnp.power(x, y)
        else:
            f = {"+": jnp.add, "-": jnp.subtract, "*": jnp.multiply,
                 "/": lambda x, y: x / jnp.where(y == 0, 1e-20, y),
                 "%": jnp.mod}[op]
        if at in ("num", "int"):
            return (at if op != "/" else "num", f(av, bv))
        return (at, tuple(f(x, y) for x, y in zip(av, bv)))

    # -- functions ------------------------------------------------------------
    def call(self, n: Call, ctx):
        name = n.name
        if name in self.texture_ids and name not in _FUNCS1:
            (t, uv) = self.eval(n.args[0], ctx)
            if t == "vec2":
                return self._tex_lookup(name, uv, ctx)
            raise PExprError(f"PExpr: texture call '{name}' expects vec2")
        args = [self.eval(a, ctx) for a in n.args]
        return _call_builtin(name, args, ctx)


def _unify(at, av, bt, bv):
    """Implicit promotion: int->num, scalar->vector broadcast."""
    sa = VEC_SIZE.get(at, 1)
    sb = VEC_SIZE.get(bt, 1)
    if sa == sb:
        t = at if sa > 1 else ("num" if "num" in (at, bt) or at != bt else at)
        return t, av, t, bv
    if sa == 1:
        return bt, tuple(av for _ in range(sb)), bt, bv
    if sb == 1:
        return at, av, at, tuple(bv for _ in range(sa))
    raise PExprError(f"PExpr: cannot combine {at} and {bt}")


def _to_rgb(t, v, ctx=None):
    if t in ("num", "int", "bool"):
        f = v.astype(jnp.float32) if v.dtype != jnp.float32 else v
        return (f, f, f)
    if t == "vec2":
        return (v[0], v[1], jnp.zeros_like(v[0]))
    return (v[0], v[1], v[2])


# -- builtin function library ------------------------------------------------

def _ew(f):
    """Elementwise on scalar or vector."""
    def run(args, ctx):
        t, v = args[0]
        if t in ("num", "int", "bool"):
            return ("num", f(v))
        return (t, tuple(f(x) for x in v))
    return run


def _ew2(f):
    def run(args, ctx):
        at, av, bt, bv = _unify(*args[0], *args[1])
        if at in ("num", "int", "bool"):
            return ("num", f(av, bv))
        return (at, tuple(f(x, y) for x, y in zip(av, bv)))
    return run


def _ew3(f):
    def run(args, ctx):
        at, av, bt, bv = _unify(*args[0], *args[1])
        at, av, ct, cv = _unify(at, av, *args[2])
        at, av, bt, bv = _unify(at, av, bt, bv)
        if at in ("num", "int", "bool"):
            return ("num", f(av, bv, cv))
        return (at, tuple(f(x, y, z) for x, y, z in zip(av, bv, cv)))
    return run


def _vec_reduce(f):
    def run(args, ctx):
        t, v = args[0]
        if t in ("num", "int"):
            return ("num", v)
        return ("num", f(v))
    return run


def _noise_core(args, which):
    from ..models.texture import _value_noise, _hash2
    t, v = args[0]
    if t in ("num", "int"):
        x, y = v, jnp.zeros_like(v)
    else:
        x, y = v[0], v[1]
    if len(args) > 1:
        seed = args[1][1]
        x = x + seed * 17.17
    if which == "cell":
        return _hash2(jnp.floor(x).astype(jnp.int32),
                      jnp.floor(y).astype(jnp.int32))
    if which == "fbm":
        amp, val, tot = 1.0, 0.0, 0.0
        for o in range(4):
            val = val + amp * _value_noise(x * (2 ** o), y * (2 ** o))
            tot += amp
            amp *= 0.5
        return val / tot
    if which == "voronoi":
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        best = jnp.full(jnp.shape(x), 1e9, jnp.float32)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx, cy = x0 + dx, y0 + dy
                px = cx.astype(jnp.float32) + _hash2(cx, cy)
                py = cy.astype(jnp.float32) + _hash2(cy, cx)
                best = jnp.minimum(best, (px - x) ** 2 + (py - y) ** 2)
        return jnp.sqrt(best)
    return _value_noise(x, y)


def _mk_noise(which, color_out):
    def run(args, ctx):
        nv = _noise_core(args, which)
        if not color_out:
            return ("num", nv)
        return ("vec4", (nv, nv, nv, jnp.ones_like(nv)))
    return run


def _call_builtin(name, args, ctx):
    fns = _FUNCS1
    if name in fns:
        try:
            return fns[name](args, ctx)
        except PExprError:
            raise
        except (IndexError, TypeError, ValueError) as e:
            # arity/shape misuse inside a builtin is a user expression
            # error, not an internal failure
            raise PExprError(f"PExpr: bad arguments to '{name}': {e}")
    raise PExprError(f"PExpr: unknown function '{name}'")


def _safe_norm(args, ctx):
    t, v = args[0]
    if t in ("num", "int"):
        return ("num", jnp.sign(v))
    l2 = sum(x * x for x in v)
    inv = jnp.where(l2 > 0, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-30)), 0.0)
    return (t, tuple(x * inv for x in v))


def _build_funcs():
    f = {}
    for nm, fn in [
        ("abs", jnp.abs), ("acos", lambda x: jnp.arccos(jnp.clip(x, -1, 1))),
        ("asin", lambda x: jnp.arcsin(jnp.clip(x, -1, 1))),
        ("atan", jnp.arctan), ("cbrt", jnp.cbrt), ("ceil", jnp.ceil),
        ("cos", jnp.cos), ("cosh", jnp.cosh),
        ("deg", jnp.degrees), ("exp", jnp.exp), ("exp2", jnp.exp2),
        ("floor", jnp.floor), ("fract", lambda x: x - jnp.floor(x)),
        ("log", lambda x: jnp.log(jnp.maximum(x, 1e-30))),
        ("log10", lambda x: jnp.log10(jnp.maximum(x, 1e-30))),
        ("log2", lambda x: jnp.log2(jnp.maximum(x, 1e-30))),
        ("rad", jnp.radians), ("round", jnp.round), ("sign", jnp.sign),
        ("sin", jnp.sin), ("sinh", jnp.sinh),
        ("sqrt", lambda x: jnp.sqrt(jnp.maximum(x, 0.0))),
        ("tan", jnp.tan), ("tanh", jnp.tanh), ("trunc", jnp.trunc),
        ("smoothstep", lambda x: x * x * (3 - 2 * x)),
        ("smootherstep", lambda x: x * x * x * (x * (x * 6 - 15) + 10)),
        ("signbit", lambda x: (x < 0).astype(jnp.float32)),
    ]:
        f[nm] = _ew(fn)
    for nm, fn in [
        ("atan2", jnp.arctan2), ("fmod", jnp.mod),
        ("max", jnp.maximum), ("min", jnp.minimum),
        ("pow", lambda x, y: jnp.power(jnp.maximum(x, 0.0) + 1e-30 * (x == 0), y)),
        ("snap", lambda x, y: jnp.floor(x / jnp.where(y == 0, 1, y)) * y),
    ]:
        f[nm] = _ew2(fn)
    f["clamp"] = _ew3(lambda x, lo, hi: jnp.clip(x, lo, hi))
    f["wrap"] = _ew3(lambda x, lo, hi: lo + jnp.mod(x - lo, jnp.where(hi == lo, 1, hi - lo)))
    f["mix"] = _ew3(lambda a, b, t: a + (b - a) * t)
    f["mix_linear"] = f["mix"]
    f["pingpong"] = _ew2(lambda x, s: jnp.where(
        s == 0, 0.0, jnp.abs(jnp.mod(x, 2 * jnp.where(s == 0, 1, s)) - s)))

    def _select(args, ctx):
        ct, cv = args[0]
        at, av, bt, bv = _unify(*args[1], *args[2])
        if at in ("num", "int", "bool"):
            return (at, jnp.where(cv, av, bv))
        return (at, tuple(jnp.where(cv, x, y) for x, y in zip(av, bv)))
    f["select"] = _select

    def _vecn(n):
        def run(args, ctx):
            if len(args) == 1:
                t, v = args[0]
                s = v if t in ("num", "int") else v[0]
                return (f"vec{n}", tuple(s for _ in range(n)))
            vals = []
            for t, v in args:
                vals.append(v if t in ("num", "int") else v[0])
            return (f"vec{n}", tuple(vals[:n]))
        return run
    f["vec2"] = _vecn(2)
    f["vec3"] = _vecn(3)
    f["vec4"] = _vecn(4)

    def _color(args, ctx):
        vals = [v if t in ("num", "int") else v[0] for t, v in args]
        if len(vals) == 1:
            vals = vals * 3
        while len(vals) < 4:
            vals.append(jnp.ones_like(vals[0]) if len(vals) == 3
                        else vals[-1])
        return ("vec4", tuple(vals[:4]))
    f["color"] = _color

    def _dot(args, ctx):
        _, a = args[0]
        _, b = args[1]
        return ("num", sum(x * y for x, y in zip(a, b)))
    f["dot"] = _dot

    def _cross(args, ctx):
        _, a = args[0]
        _, b = args[1]
        return ("vec3", (a[1] * b[2] - a[2] * b[1],
                         a[2] * b[0] - a[0] * b[2],
                         a[0] * b[1] - a[1] * b[0]))
    f["cross"] = _cross

    def _length(args, ctx):
        t, v = args[0]
        if t in ("num", "int"):
            return ("num", jnp.abs(v))
        return ("num", jnp.sqrt(jnp.maximum(sum(x * x for x in v), 0.0)))
    f["length"] = _length

    def _dist(args, ctx):
        _, a = args[0]
        _, b = args[1]
        return ("num", jnp.sqrt(jnp.maximum(
            sum((x - y) ** 2 for x, y in zip(a, b)), 0.0)))
    f["dist"] = _dist
    f["norm"] = _safe_norm
    f["avg"] = _vec_reduce(lambda v: sum(v) / len(v))
    f["sum"] = _vec_reduce(lambda v: sum(v))

    def _lum(args, ctx):
        _, v = args[0]
        return ("num", 0.2126 * v[0] + 0.7152 * v[1] + 0.0722 * v[2])
    f["luminance"] = _lum

    def _angle(args, ctx):
        _, a = args[0]
        _, b = args[1]
        la = jnp.sqrt(jnp.maximum(sum(x * x for x in a), 1e-30))
        lb = jnp.sqrt(jnp.maximum(sum(x * x for x in b), 1e-30))
        d = sum(x * y for x, y in zip(a, b)) / (la * lb)
        return ("num", jnp.arccos(jnp.clip(d, -1, 1)))
    f["angle"] = _angle

    def _reflect(args, ctx):
        _, i = args[0]
        _, nn = args[1]
        d = sum(x * y for x, y in zip(i, nn))
        return ("vec3", tuple(x - 2 * d * y for x, y in zip(i, nn)))
    f["reflect"] = _reflect

    def _bump(args, ctx):
        # bump(N, Nx, Ny, distance, dHdu, dHdv) — perturb the shading
        # normal by a height-field gradient (reference
        # texture/bump.art:3-11 node_bump, Transpiler.cpp:921). When the
        # shading context carries raw surface derivatives we use those
        # instead of the unit tangents the caller passes: the height
        # delta is per-uv, so the tilt must be measured against |dP/du|
        # (Cycles' bump node semantics — the golden references' renderer)
        _, n = args[0]
        _, nx = args[1]
        _, ny = args[2]
        dist = args[3][1]
        dhx = args[4][1]
        dhy = args[5][1]
        if ctx.dpdu is not None:
            l2u = sum(x * x for x in ctx.dpdu)
            l2v = sum(x * x for x in ctx.dpdv)
            ok = (l2u > 1e-16) & (l2v > 1e-16)
            nx = tuple(jnp.where(ok, d, t) for d, t in zip(ctx.dpdu, nx))
            ny = tuple(jnp.where(ok, d, t) for d, t in zip(ctx.dpdv, ny))

        def cr(a, b):
            return (a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0])
        rx = cr(ny, n)
        ry = cr(n, nx)
        det = sum(x * y for x, y in zip(nx, rx))
        grad = tuple(x * dhx + y * dhy for x, y in zip(rx, ry))
        out = tuple(x * jnp.abs(det) - g * jnp.sign(det) * dist
                    for x, g in zip(n, grad))
        ln = jnp.sqrt(jnp.maximum(sum(x * x for x in out), 1e-24))
        return ("vec3", tuple(x / ln for x in out))
    f["bump"] = _bump

    def _ensure_valid_reflection(args, ctx):
        # ensure_valid_reflection(Ng, V, N) (Transpiler.cpp:922 ->
        # core/sampling.art:120); shared jnp implementation in core.frame
        from ..core.frame import ensure_valid_reflection as _evr
        from ..core.vec import Vec3 as _V3
        _, ng = args[0]
        _, i = args[1]
        _, n = args[2]
        out = _evr(_V3(*ng), _V3(*i), _V3(*n))
        return ("vec3", (out.x, out.y, out.z))
    f["ensure_valid_reflection"] = _ensure_valid_reflection

    def _checkerboard(args, ctx):
        # node_checkerboard2/3 (texture/checkerboard.art:1-2): parity of
        # wrap(v, 0, 2); the vec3 variant XORs in the z parity, so
        # checkerboard(uvw) with w = 0 is the INVERSE of the vec2 parity
        t, v = args[0]
        px = jnp.mod(v[0], 2.0).astype(jnp.int32)
        py = jnp.mod(v[1], 2.0).astype(jnp.int32)
        eq_xy = px == py
        if t == "vec2":
            out = eq_xy
        else:
            pz = jnp.mod(v[2], 2.0).astype(jnp.int32)
            out = eq_xy == (pz == 1)
        return ("int", out.astype(jnp.float32))
    f["checkerboard"] = _checkerboard

    def _fresnel_dielectric(args, ctx):
        from ..core.fresnel import fresnel_dielectric
        _, cos_i = args[0]
        _, n1 = args[1]
        _, n2 = args[2] if len(args) > 2 else args[1]
        return ("num", fresnel_dielectric(n1 / jnp.maximum(n2, 1e-6),
                                          jnp.abs(cos_i)).factor)
    f["fresnel_dielectric"] = _fresnel_dielectric

    def _num(args, ctx):
        t, v = args[0]
        return ("num", v if t in ("num", "int", "bool") else v[0])
    f["num"] = _num
    f["int"] = _ew(jnp.trunc)

    def _hash(args, ctx):
        from ..models.texture import _hash2
        t, v = args[0]
        if t in ("num", "int"):
            x, y = v, jnp.zeros_like(v)
        else:
            x, y = v[0], v[1]
        return ("num", _hash2((x * 1024).astype(jnp.int32),
                              (y * 1024).astype(jnp.int32)))
    f["hash"] = _hash

    for nm in ("noise", "snoise", "pnoise", "perlin", "sperlin"):
        f[nm] = _mk_noise("value", False)
    for nm in ("cnoise", "cpnoise", "cperlin"):
        f[nm] = _mk_noise("value", True)
    f["fbm"] = _mk_noise("fbm", False)
    f["cfbm"] = _mk_noise("fbm", True)
    f["cellnoise"] = _mk_noise("cell", False)
    f["ccellnoise"] = _mk_noise("cell", True)
    f["voronoi"] = _mk_noise("voronoi", False)
    f["cvoronoi"] = _mk_noise("voronoi", True)

    def _smin(args, ctx):
        at, av, bt, bv = _unify(*args[0], *args[1])
        _, kv = args[2]
        def sm(a, b):
            h = jnp.clip(0.5 + 0.5 * (b - a) / jnp.where(kv == 0, 1, kv), 0, 1)
            return b + (a - b) * h - kv * h * (1 - h)
        if at in ("num", "int"):
            return ("num", sm(av, bv))
        return (at, tuple(sm(x, y) for x, y in zip(av, bv)))
    f["smin"] = _smin

    def _smax(args, ctx):
        (at, av), (bt, bv), (kt, kv) = args
        neg = lambda t_v: (t_v[0], -t_v[1] if t_v[0] in ("num", "int")
                           else tuple(-x for x in t_v[1]))
        t, v = _smin([neg((at, av)), neg((bt, bv)), (kt, kv)], ctx)
        return neg((t, v))
    f["smax"] = _smax

    return f


_FUNCS1 = _build_funcs()


def looks_like_pexpr(s: str) -> bool:
    """Heuristic: a bare identifier is a texture reference, anything with
    operators/calls/digits is an expression."""
    return re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", s.strip()) is None
