"""Pallas TPU kernel for dense ray-triangle intersection.

The XLA scan version (intersect.py) materializes [n_lanes, TRI_CHUNK]
intermediates in HBM every chunk — for 262k lanes x 1k tris that is
gigabytes of traffic per trace. This kernel blocks lanes into VMEM tiles
and sweeps all triangles (also resident in VMEM) with the Moller-Trumbore
test fully on-chip: HBM traffic drops to the ray/hit arrays themselves.

Grid: one program per LANE_BLOCK rays; the triangle soup (padded to a
multiple of 128) is broadcast to every program. Best-hit state is carried
through a fori_loop over triangle chunks; the winning u/v are extracted
with a one-hot select (no in-kernel gather).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = 3.0e38  # python float: jnp module constants become captured tracers
LANE_BLOCK = 1024
TRI_CHUNK = 128
EPS = 1e-9


def _isect_kernel(n_chunks: int, any_hit: bool,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tmin_ref, tmax_ref,
                  v0x_ref, v0y_ref, v0z_ref,
                  e1x_ref, e1y_ref, e1z_ref,
                  e2x_ref, e2y_ref, e2z_ref, vis_ref,
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

    def chunk_body(c, carry):
        # static chunk start (the loop is a python unroll: Mosaic cannot
        # prove alignment of dynamic 1-D vector loads)
        bt, bp, bu, bv = carry
        s = c * TRI_CHUNK
        v0x = v0x_ref[s:s + TRI_CHUNK].reshape(1, -1)
        v0y = v0y_ref[s:s + TRI_CHUNK].reshape(1, -1)
        v0z = v0z_ref[s:s + TRI_CHUNK].reshape(1, -1)
        e1x = e1x_ref[s:s + TRI_CHUNK].reshape(1, -1)
        e1y = e1y_ref[s:s + TRI_CHUNK].reshape(1, -1)
        e1z = e1z_ref[s:s + TRI_CHUNK].reshape(1, -1)
        e2x = e2x_ref[s:s + TRI_CHUNK].reshape(1, -1)
        e2y = e2y_ref[s:s + TRI_CHUNK].reshape(1, -1)
        e2z = e2z_ref[s:s + TRI_CHUNK].reshape(1, -1)
        vis = vis_ref[s:s + TRI_CHUNK].reshape(1, -1)

        # Moller-Trumbore (intersection.art:74)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < EPS, 1.0, det)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ((jnp.abs(det) >= EPS) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > tmin) & (t < tmax) & (vis > 0.0))
        tm = jnp.where(ok, t, FLT_MAX)
        c_t = jnp.min(tm, axis=1)
        j = jnp.argmin(tm, axis=1).astype(jnp.int32)
        better = c_t < bt
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (nb, TRI_CHUNK), 1)
                  == j[:, None])
        c_u = jnp.sum(jnp.where(onehot, u, 0.0), axis=1)
        c_v = jnp.sum(jnp.where(onehot, v, 0.0), axis=1)
        return (jnp.where(better, c_t, bt),
                jnp.where(better, s + j, bp),
                jnp.where(better, c_u, bu),
                jnp.where(better, c_v, bv))

    carry = (jnp.full((nb,), FLT_MAX), jnp.full((nb,), -1, jnp.int32),
             jnp.zeros((nb,)), jnp.zeros((nb,)))
    for c in range(n_chunks):
        carry = chunk_body(c, carry)
    bt, bp, bu, bv = carry
    t_ref[:] = bt
    prim_ref[:] = bp
    u_ref[:] = bu
    v_ref[:] = bv


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def intersect_tris_pallas(ox, oy, oz, dx, dy, dz, tmin, tmax,
                          v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                          vis, any_hit: bool = False,
                          interpret: bool = False):
    """Returns (t, prim, u, v) per lane; prim = -1 on miss.

    Triangle arrays must be padded to a multiple of TRI_CHUNK with
    degenerate (zero-extent) triangles; rays are padded internally."""
    n = ox.shape[0]
    n_pad = ((n + LANE_BLOCK - 1) // LANE_BLOCK) * LANE_BLOCK
    if n_pad != n:
        padf = lambda a: jnp.pad(a, (0, n_pad - n))
        ox, oy, oz = padf(ox), padf(oy), padf(oz)
        dx, dy, dz = padf(dx), padf(dy), padf(dz)
        tmin = padf(tmin)
        tmax = padf(tmax)
    T = v0x.shape[0]
    n_chunks = T // TRI_CHUNK
    grid = (n_pad // LANE_BLOCK,)
    lane_spec = pl.BlockSpec((LANE_BLOCK,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # full, replicated
    kernel = functools.partial(_isect_kernel, n_chunks, any_hit)
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lane_spec] * 8 + [tri_spec] * 10,
        out_specs=[lane_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.float32)],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmin, tmax,
      v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis)
    return t[:n], prim[:n], u[:n], v[:n]
