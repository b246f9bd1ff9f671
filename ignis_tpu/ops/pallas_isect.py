"""Pallas TPU kernels for dense ray-triangle intersection (MXU path).

The XLA scan version (intersect.py) materializes [n_lanes, TRI_CHUNK]
intermediates in HBM every chunk — for 262k lanes x 1k tris that is
gigabytes of traffic per trace (~80 ms measured on v5e). These kernels
keep the triangle soup resident in VMEM and sweep it fully on-chip.

**MXU formulation.** Moller-Trumbore's four scalars are bilinear forms
between per-ray and per-triangle features (scalar triple-product
expansions; compare /root/reference/src/artic/traversal/intersection.art:74):

    det   = -d.ng                      ng  = e1 x e2
    u*det =  m.e2 - d.(e2 x v0)        m   = o x d
    v*det = -m.e1 - d.(v0 x e1)
    t*det =  o.ng - (v0.ng)

so with ray features F = [d, m, o, 1] (R x 10) and a per-triangle
feature matrix G (10 x 4C), one `F @ G` matmul per 128-triangle chunk
computes every ray/tri pair's [det | u*det | v*det | t*det] on the MXU.
The VPU tail normalizes, tests validity, and folds winners into
per-lane-column carries.

**Packed-key closest hit.** Each lane-column carries the elementwise
minimum of `(t_bits & ~IDX_MASK) | global_prim_id` — for positive
floats the i32 bitcast is order-preserving — plus the winner's t/u/v.
One cross-lane min after the loop resolves the closest hit; there are
no reductions, gathers, or scatters inside the chunk loop.

Tie-break caveat (documented, by design): packing strips the low
idx_bits of t's mantissa, so hits whose t differ by less than ~2^-(23 -
idx_bits) relative (~2e-4 at 4096 tris) quantize to the same key and
the LOWEST prim id wins — not necessarily the true nearest. Exact-t
A/B comparisons against the XLA scan path can disagree on
near-coplanar/overlapping geometry; radiometry is unaffected (either
surface is a valid hit at that t).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = 3.0e38  # python float: jnp module constants become captured tracers
import os as _os
LANE_BLOCK = int(_os.environ.get('IGNIS_TPU_LANE_BLOCK', '1024'))
_PREC = _os.environ.get('IGNIS_TPU_MXU_PREC', 'high')
# Default is the fp32 VPU sweep: exact f32 Moller-Trumbore. The MXU
# bilinear-form path ('mxu') trades accuracy (bf16x3 ~1e-3 rel on t) for
# MXU throughput and is opt-in for throughput experiments.
_ISECT_DEFAULT = _os.environ.get("IGNIS_TPU_ISECT", "vpu")
TRI_CHUNK = 128
EPS = 1e-9
MISS_KEY = 0x7F800000  # +inf bits: any finite packed key compares below
NF = 16                # ray/tri feature rows (10 used, padded for layout)


def build_tri_features(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z):
    """[n_chunks, NF, 4*TRI_CHUNK] per-triangle feature blocks G.

    Column groups per chunk: [det | u*det | v*det | t*det], each
    TRI_CHUNK wide. Rows: 0-2 = d, 3-5 = m = o x d, 6-8 = o, 9 = 1.
    """
    T = v0x.shape[0]
    n_chunks = T // TRI_CHUNK
    ngx = e1y * e2z - e1z * e2y
    ngy = e1z * e2x - e1x * e2z
    ngz = e1x * e2y - e1y * e2x
    # e2 x v0
    ax = e2y * v0z - e2z * v0y
    ay = e2z * v0x - e2x * v0z
    az = e2x * v0y - e2y * v0x
    # v0 x e1
    bx = v0y * e1z - v0z * e1y
    by = v0z * e1x - v0x * e1z
    bz = v0x * e1y - v0y * e1x
    zero = jnp.zeros_like(v0x)
    one = jnp.ones_like(v0x)
    g_det = jnp.stack([-ngx, -ngy, -ngz, zero, zero, zero,
                       zero, zero, zero, zero], 0)           # [10, T]
    g_u = jnp.stack([-ax, -ay, -az, e2x, e2y, e2z,
                     zero, zero, zero, zero], 0)
    g_v = jnp.stack([-bx, -by, -bz, -e1x, -e1y, -e1z,
                     zero, zero, zero, zero], 0)
    g_t = jnp.stack([zero, zero, zero, zero, zero, zero,
                     ngx, ngy, ngz, -(v0x * ngx + v0y * ngy + v0z * ngz)], 0)
    g = jnp.stack([g_det, g_u, g_v, g_t], 0)                 # [4, 10, T]
    g = jnp.pad(g, ((0, 0), (0, NF - 10), (0, 0)))           # [4, NF, T]
    g = g.reshape(4, NF, n_chunks, TRI_CHUNK)
    g = jnp.transpose(g, (2, 1, 0, 3)).reshape(n_chunks, NF, 4 * TRI_CHUNK)
    return g


def _chunk_bounds(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, n_chunks):
    """[8, n_chunks] chunk AABBs (rows nx,ny,nz,xx,xy,xz,0,0); degenerate
    padding triangles are excluded (their slab test can never pass)."""
    def rs(a):
        return a.reshape(n_chunks, TRI_CHUNK)
    deg = (rs(e1x) == 0) & (rs(e1y) == 0) & (rs(e1z) == 0) \
        & (rs(e2x) == 0) & (rs(e2y) == 0) & (rs(e2z) == 0)
    big = jnp.float32(FLT_MAX)

    def axis_minmax(v0, e1, e2):
        a = rs(v0)
        b = a + rs(e1)
        c = a + rs(e2)
        lo = jnp.minimum(jnp.minimum(a, b), c)
        hi = jnp.maximum(jnp.maximum(a, b), c)
        lo = jnp.where(deg, big, lo)
        hi = jnp.where(deg, -big, hi)
        return jnp.min(lo, axis=1), jnp.max(hi, axis=1)

    nx, xx = axis_minmax(v0x, e1x, e2x)
    ny, xy = axis_minmax(v0y, e1y, e2y)
    nz, xz = axis_minmax(v0z, e1z, e2z)
    zero = jnp.zeros_like(nx)
    return jnp.stack([nx, ny, nz, xx, xy, xz, zero, zero], 0)


def build_tri_soa(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z):
    """[n_chunks, NF, TRI_CHUNK] raw SoA blocks for the VPU kernel.

    Rows 0-8: v0 | e1 | e2 components; rest zero padding (sublane align)."""
    T = v0x.shape[0]
    n_chunks = T // TRI_CHUNK
    tv = jnp.stack([v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z], 0)
    tv = jnp.pad(tv, ((0, NF - 9), (0, 0)))                  # [NF, T]
    return jnp.transpose(tv.reshape(NF, n_chunks, TRI_CHUNK), (1, 0, 2))


def _mt_terms(ox, oy, oz, dx, dy, dz,
              v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z):
    """Differentiable Möller-Trumbore (intersection.art:74 semantics).

    Broadcast-agnostic: ray components and triangle components may carry
    any mutually broadcastable shapes. Returns (t, u, v, det)."""
    pvx = dy * e2z - dz * e2y                                 # d x e2
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    qvx = tvy * e1z - tvz * e1y                               # tvec x e1
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    inv_det = 1.0 / jnp.where(jnp.abs(det) < EPS, 1.0, det)
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    return t, u, v, det


def _isect_kernel(n_chunks: int, idx_mask: int, any_hit: bool, vpu: bool,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tmin_ref, tmax_ref, g_ref, vis_ref, bounds_ref,
                  t_ref, prim_ref, u_ref, v_ref):
    ox = ox_ref[:].reshape(-1, 1)
    oy = oy_ref[:].reshape(-1, 1)
    oz = oz_ref[:].reshape(-1, 1)
    dx = dx_ref[:].reshape(-1, 1)
    dy = dy_ref[:].reshape(-1, 1)
    dz = dz_ref[:].reshape(-1, 1)
    tmin = tmin_ref[:].reshape(-1, 1)
    tmax = tmax_ref[:].reshape(-1, 1)
    nb = ox.shape[0]
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)
    feats = [dx, dy, dz, mx, my, mz, ox, oy, oz, one]
    feats += [zero] * (NF - len(feats))
    F = jnp.concatenate(feats, axis=1)                        # [nb, NF]
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, TRI_CHUNK), 1)

    # ---- block-coherent chunk culling (mapping_cpu.art:63 binning analog):
    # slab-test every ray in the block against every chunk AABB, OR over
    # the block into a bitmask scalar; inactive chunks skip their sweep.
    inv = lambda d: jnp.where(jnp.abs(d) > 1e-12, 1.0 / d,
                              jnp.where(d >= 0, 1e12, -1e12))
    idxv, idyv, idzv = inv(dx), inv(dy), inv(dz)
    r = lambda k: bounds_ref[k].reshape(1, -1)                # (1, n_chunks)
    t0x = (r(0) - ox) * idxv
    t1x = (r(3) - ox) * idxv
    t0y = (r(1) - oy) * idyv
    t1y = (r(4) - oy) * idyv
    t0z = (r(2) - oz) * idzv
    t1z = (r(5) - oz) * idzv
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), tmin))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.minimum(jnp.maximum(t0z, t1z), tmax))
    act = (tnear <= tfar).astype(jnp.int32)                   # (nb, n_chunks)
    # uint32 bitmask; chunk 31's bit is the sign bit (the round-1 int32
    # mask silently dropped chunk 31 — the last 128 triangles of a
    # 4096-tri scene — whenever any ray in the block missed its AABB).
    # Mosaic lacks unsigned reductions, so bits 0..30 are summed in int32
    # and bit 31 is OR'd in as a scalar.
    if _os.environ.get("IGNIS_TPU_CULL", "1") == "1" and n_chunks <= 32:
        any_c = jnp.max(act, axis=0, keepdims=True)           # (1, n_chunks)
        cidx = jax.lax.broadcasted_iota(jnp.int32, any_c.shape, 1)
        low_bits = jnp.where(cidx < 31,
                             jnp.left_shift(any_c, jnp.minimum(cidx, 30)), 0)
        mask = jnp.sum(low_bits).astype(jnp.uint32)
        if n_chunks == 32:
            mask = mask | jnp.left_shift(any_c[0, 31].astype(jnp.uint32),
                                         jnp.uint32(31))
    else:
        mask = ~jnp.uint32(0)

    def chunk_sweep(cid, carry):
        if vpu:
            # Direct Moller-Trumbore on the VPU: ~55 elementwise flops per
            # ray/tri pair beats the bilinear-form matmul (whose contraction
            # is only 16 of the MXU's 128 rows) for fp32 closest-hit.
            tv = g_ref[cid]                                   # [NF, C]
            t, u, v, det = _mt_terms(
                ox, oy, oz, dx, dy, dz,
                tv[0:1], tv[1:2], tv[2:3],                    # v0   [1, C]
                tv[3:4], tv[4:5], tv[5:6],                    # e1
                tv[6:7], tv[7:8], tv[8:9])                    # e2
        else:
            g = g_ref[cid]                                    # [NF, 4C]
            dn = (((1,), (0,)), ((), ()))
            if _PREC == "highest":
                out = jax.lax.dot_general(
                    F, g, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)      # [nb, 4C]
            elif _PREC == "high":
                # Manual bf16x3 (Mosaic lacks Precision.HIGH): hi/lo splits,
                # f32 accumulation — ~f32 accuracy at 3 bf16 passes.
                F_hi = F.astype(jnp.bfloat16)
                F_lo = (F - F_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                g_hi = g.astype(jnp.bfloat16)
                g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                mm = lambda a, b: jax.lax.dot_general(
                    a, b, dn, preferred_element_type=jnp.float32)
                out = mm(F_hi, g_hi) + mm(F_hi, g_lo) + mm(F_lo, g_hi)
            else:
                out = jax.lax.dot_general(
                    F, g, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
            det = out[:, 0 * TRI_CHUNK:1 * TRI_CHUNK]
            ud = out[:, 1 * TRI_CHUNK:2 * TRI_CHUNK]
            vd = out[:, 2 * TRI_CHUNK:3 * TRI_CHUNK]
            td = out[:, 3 * TRI_CHUNK:4 * TRI_CHUNK]
            inv_det = 1.0 / jnp.where(jnp.abs(det) < EPS, 1.0, det)
            u = ud * inv_det
            v = vd * inv_det
            t = td * inv_det
        ok = ((jnp.abs(det) >= EPS) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > tmin) & (t < tmax))
        if any_hit:
            occ2d = carry
            ok = ok & (vis_ref[cid].reshape(1, -1) > 0.0)
            return jnp.maximum(occ2d, jnp.where(ok, 1.0, 0.0))
        key2d, t2d, u2d, v2d = carry
        tbits = jax.lax.bitcast_convert_type(t, jnp.int32)
        key = (tbits & ~idx_mask) | (cid * TRI_CHUNK + col)
        key = jnp.where(ok & (tbits > 0), key, MISS_KEY)
        better = key < key2d
        return (jnp.where(better, key, key2d),
                jnp.where(better, t, t2d),
                jnp.where(better, u, u2d),
                jnp.where(better, v, v2d))

    def chunk_body(cid, carry):
        active = ((mask >> cid.astype(jnp.uint32)) & jnp.uint32(1)) \
            == jnp.uint32(1)
        return jax.lax.cond(active,
                            lambda cr: chunk_sweep(cid, cr),
                            lambda cr: cr, carry)

    if any_hit:
        occ2d = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                  jnp.zeros((nb, TRI_CHUNK)))
        t_ref[:] = jnp.max(occ2d, axis=1)
        prim_ref[:] = jnp.where(t_ref[:] > 0.0, 0, -1)
        u_ref[:] = jnp.zeros((nb,))
        v_ref[:] = jnp.zeros((nb,))
    else:
        init = (jnp.full((nb, TRI_CHUNK), MISS_KEY, jnp.int32),
                jnp.full((nb, TRI_CHUNK), FLT_MAX),
                jnp.zeros((nb, TRI_CHUNK)), jnp.zeros((nb, TRI_CHUNK)))
        key2d, t2d, u2d, v2d = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                                 init)
        key = jnp.min(key2d, axis=1)
        hit = key != MISS_KEY
        onehot = key2d == key[:, None]                        # unique (idx bits)
        t_ref[:] = jnp.where(hit, jnp.sum(jnp.where(onehot, t2d, 0.0), axis=1),
                             FLT_MAX)
        u_ref[:] = jnp.sum(jnp.where(onehot, u2d, 0.0), axis=1)
        v_ref[:] = jnp.sum(jnp.where(onehot, v2d, 0.0), axis=1)
        prim_ref[:] = jnp.where(hit, key & idx_mask, -1)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _intersect_impl(ox, oy, oz, dx, dy, dz, tmin, tmax,
                    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                    vis, any_hit: bool = False,
                    interpret: bool = False):
    """Returns (t, prim, u, v) per lane; prim = -1 on miss. For
    any_hit=True, t is the 0/1 occlusion flag (u/v are dummies).

    Triangle arrays must be padded to a multiple of TRI_CHUNK with
    degenerate (zero-extent) triangles; rays are padded internally."""
    n = ox.shape[0]
    n_pad = ((n + LANE_BLOCK - 1) // LANE_BLOCK) * LANE_BLOCK
    if n_pad != n:
        padf = lambda a: jnp.pad(a, (0, n_pad - n))
        ox, oy, oz = padf(ox), padf(oy), padf(oz)
        dx, dy, dz = padf(dx), padf(dy), padf(dz)
        tmin = padf(tmin)
        # padded lanes get tmax < tmin so they cull every chunk
        tmax = jnp.pad(tmax, (0, n_pad - n), constant_values=-1.0)
    T = v0x.shape[0]
    n_chunks = T // TRI_CHUNK
    idx_bits = max(1, (T - 1)).bit_length()
    idx_mask = (1 << idx_bits) - 1

    vpu = _os.environ.get("IGNIS_TPU_ISECT", _ISECT_DEFAULT) == "vpu"
    if vpu:
        g = build_tri_soa(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z)
    else:
        g = build_tri_features(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z)
    bounds = _chunk_bounds(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                           n_chunks)
    lane_spec = pl.BlockSpec((LANE_BLOCK,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_isect_kernel, n_chunks, idx_mask, any_hit,
                               vpu)
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=(n_pad // LANE_BLOCK,),
        in_specs=[lane_spec] * 8 + [full_spec, full_spec, full_spec],
        out_specs=[lane_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.float32)],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmin, tmax, g,
      vis.reshape(n_chunks, TRI_CHUNK), bounds)
    return t[:n], prim[:n], u[:n], v[:n]


# ---------------------------------------------------------------------------
# Differentiable wrapper: path-replay-style VJP. The kernel picks the
# winning primitive; the backward pass re-evaluates Moller-Trumbore at that
# fixed winner differentiably (gathers/scatters only in the rare backward
# pass), matching the piecewise gradient of the XLA scan path.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(17,))
def _closest_diff(ox, oy, oz, dx, dy, dz, tmin, tmax,
                  v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                  interpret):
    vis = jnp.ones((v0x.shape[0],), jnp.float32)
    return _intersect_impl(ox, oy, oz, dx, dy, dz, tmin, tmax,
                           v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                           vis, any_hit=False, interpret=interpret)


def _closest_fwd(ox, oy, oz, dx, dy, dz, tmin, tmax,
                 v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, interpret):
    out = _closest_diff(ox, oy, oz, dx, dy, dz, tmin, tmax,
                        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                        interpret)
    t, prim, u, v = out
    res = (ox, oy, oz, dx, dy, dz,
           v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, prim)
    return out, res


def _closest_bwd(interpret, res, cts):
    (ox, oy, oz, dx, dy, dz,
     v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, prim) = res
    gt, _gp, gu, gv = cts
    hit = prim >= 0
    p = jnp.clip(prim, 0, v0x.shape[0] - 1)

    def recompute(ox_, oy_, oz_, dx_, dy_, dz_,
                  v0x_, v0y_, v0z_, e1x_, e1y_, e1z_, e2x_, e2y_, e2z_):
        g = lambda a: a[p]
        t, u, v, _ = _mt_terms(
            ox_[:, None], oy_[:, None], oz_[:, None],
            dx_[:, None], dy_[:, None], dz_[:, None],
            g(v0x_)[:, None], g(v0y_)[:, None], g(v0z_)[:, None],
            g(e1x_)[:, None], g(e1y_)[:, None], g(e1z_)[:, None],
            g(e2x_)[:, None], g(e2y_)[:, None], g(e2z_)[:, None])
        m = hit.astype(t.dtype)[:, None]
        return t * m, u * m, v * m

    _, vjp = jax.vjp(recompute, ox, oy, oz, dx, dy, dz,
                     v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z)
    z = jnp.zeros_like(gt)
    gt = jnp.where(hit, gt, 0.0)[:, None]
    gu = jnp.where(hit, gu, 0.0)[:, None]
    gv = jnp.where(hit, gv, 0.0)[:, None]
    grads = vjp((gt, gu, gv))
    # ox..dz (6), tmin, tmax (zero), v0..e2 (9)
    return grads[:6] + (z, z) + grads[6:]


_closest_diff.defvjp(_closest_fwd, _closest_bwd)


def intersect_tris_pallas(ox, oy, oz, dx, dy, dz, tmin, tmax,
                          v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                          vis, any_hit: bool = False,
                          interpret: bool = False):
    """Public entry; differentiable for closest-hit (fixed-winner VJP).
    Any-hit is a boolean visibility query — inputs are detached."""
    if any_hit:
        sg = jax.lax.stop_gradient
        return _intersect_impl(
            sg(ox), sg(oy), sg(oz), sg(dx), sg(dy), sg(dz),
            sg(tmin), sg(tmax), sg(v0x), sg(v0y), sg(v0z),
            sg(e1x), sg(e1y), sg(e1z), sg(e2x), sg(e2y), sg(e2z),
            sg(vis), any_hit=True, interpret=interpret)
    return _closest_diff(ox, oy, oz, dx, dy, dz, tmin, tmax,
                         v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                         interpret)
