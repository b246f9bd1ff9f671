"""Pallas TPU kernel: block-coherent BVH traversal with chunked leaves.

TPU-native redesign of the reference's per-ray stack traversal
(/root/reference/src/artic/traversal/mapping_gpu.art:727 while-while walk,
traversal/stack.art). A TPU has no per-lane control flow or hardware
gather, so per-ray stacks are hostile; instead each 1024-lane ray block
(one 32x32 screen tile / coherent wavefront slice) traverses the tree
ONCE, in two phases:

1. **Walk** (scalar control, vector tests): pop an inner-node id from a
   shared SMEM stack, slab-test its 8 children against all lanes in one
   [8, LB] VPU block (children on sublanes, rays on lanes — full lane
   width), reduce to an 8-bit "any live lane hits child j" scalar
   bitmask, push surviving inner children, and append surviving leaf
   children's chunk ids to an SMEM work list. No per-node geometry work,
   no lax.cond — the loop body is uniform.
2. **Sweep**: fori over the recorded chunk list; each step intersects
   [LB rays x 128 tris] Moller-Trumbore on the VPU with the chunk
   resident in VMEM ([n_chunks, 16, 128] leading-dim indexing — the
   layout the dense kernel (pallas_isect.py) already proved fast).

The block visits the union of nodes its rays need; screen-tiled lane
layout (render/session.py) keeps that union small for primary/shadow
rays. Per-lane closest-hit state never leaves registers/VMEM.

Walk-phase culling uses each lane's *initial* tmax (dead lanes are fully
culled); the monotone best-t pruning happens inside the sweep via the
carried per-lane tmax. Closest-hit winner per chunk uses the packed-key
trick with the 7-bit in-chunk index (t quantized to ~2^-16 relative for
tie-breaks only); exact t/u/v of the winner are carried. Differentiable
via the same fixed-winner VJP as the dense kernel (_mt_terms recompute).
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_isect import EPS, _mt_terms

FLT_MAX = 3.0e38
CHUNK = 128
NF = 16
LANE_BLOCK = int(_os.environ.get("IGNIS_TPU_BVH_LANE_BLOCK", "1024"))
STACK_CAP = 128          # inner nodes only: 8-ary depth ~12, <=8/level
MISS_KEY = 0x7F800000    # +inf bits
LOCAL_MASK = 0x7F        # 7-bit in-chunk index inside the packed key
# VMEM budget gates: scenes up to MAX_TRIS keep the whole soup resident in
# VMEM; bigger scenes switch to the HBM-streaming sweep (double-buffered
# chunk DMA), gated only by the node-table VMEM budget.
MAX_TRIS = int(_os.environ.get("IGNIS_TPU_BVH_MAX_TRIS", str(192 * 1024)))
MAX_NODES = 4096
# streaming variant: boxes stay VMEM-resident, triangles stream from HBM.
# The hard limit is SMEM (1 MB/core): the child table costs ~512 B/node
# and the chunk work list ~32 B/chunk there (measured from the Mosaic
# allocator error at 1.44M tris, round 5: 'u8[2109440] would exceed
# memory (size=1048576)' for s32[4115,8]), so the practical stream cap
# is ~1.5k nodes / ~0.9M tris — estimate the footprint instead of a
# node count so over-budget scenes FALL BACK to the XLA walk instead of
# failing to compile.
SMEM_BUDGET = int(_os.environ.get("IGNIS_TPU_BVH_SMEM_BUDGET",
                                  str(900 * 1024)))


def stream_smem_bytes(n_nodes: int, n_tris: int) -> int:
    n_chunks = n_tris // CHUNK
    return n_nodes * 512 + (n_chunks + 1) * 32 + (STACK_CAP + 2) * 32


def _bvh_kernel(n_chunks: int, any_hit: bool, stream: bool,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tmin_ref, tmax_ref,
                boxes_ref,    # [n_nodes, 8 comps(6 used), 8] f32 (VMEM)
                child_ref,    # [n_nodes, 8] i32 (SMEM)
                tri_ref,      # [n_chunks, 16, 128] f32: v0|e1|e2|vis
                #               (VMEM resident, or HBM when stream=True)
                t_ref, prim_ref, u_ref, v_ref,
                stack_ref,    # SMEM [STACK_CAP] i32 (inner node ids)
                list_ref,     # SMEM [n_chunks] i32 (leaf chunk ids)
                tri_buf=None,  # VMEM [2, 16, 128] stream double buffer
                dma_sem=None,  # DMA semaphores [2]
                ):
    nb = ox_ref.shape[0]
    # --- per-lane ray state, [nb, 1] sublane orientation ---------------
    # ((nb,) -> (nb, 1) is the cheap Mosaic relayout the dense kernel
    # already uses; the transposed (1, nb) orientation is a sublane->lane
    # shuffle that costs ~100us per array and is avoided entirely.)
    ox = ox_ref[:].reshape(-1, 1)
    oy = oy_ref[:].reshape(-1, 1)
    oz = oz_ref[:].reshape(-1, 1)
    dx = dx_ref[:].reshape(-1, 1)
    dy = dy_ref[:].reshape(-1, 1)
    dz = dz_ref[:].reshape(-1, 1)
    tmin = tmin_ref[:].reshape(-1, 1)
    tmax0 = tmax_ref[:].reshape(-1, 1)
    inv = lambda d: jnp.where(jnp.abs(d) > 1e-12, 1.0 / d,
                              jnp.where(d >= 0, 1e12, -1e12))
    idx = inv(dx)
    idy = inv(dy)
    idz = inv(dz)
    live = tmax0 >= tmin                      # dead lanes: tmax < tmin

    # ---------------- phase 1: node walk -> chunk work list ------------
    stack_ref[0] = 0  # root

    def walk_body(state):
        sp, nlist = state
        nd = stack_ref[sp - 1]
        sp = sp - 1
        bx = boxes_ref[nd]                    # [8 comps, 8 children]
        r = lambda k: bx[k:k + 1]             # (1, 8) lane row
        t0x = (r(0) - ox) * idx               # [nb, 8]
        t1x = (r(3) - ox) * idx
        t0y = (r(1) - oy) * idy
        t1y = (r(4) - oy) * idy
        t0z = (r(2) - oz) * idz
        t1z = (r(5) - oz) * idz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), tmax0))
        hit8 = (tn <= tf) & live              # [nb, 8]
        # per-child any-lane hit bit, packed into one scalar bitmask
        pw = jnp.left_shift(
            jnp.int32(1),
            jax.lax.broadcasted_iota(jnp.int32, hit8.shape, 1))
        mask8 = jnp.sum(jnp.max(jnp.where(hit8, pw, 0), axis=0))
        # chunkify_bvh8 guarantees single-chunk leaves, so each child is
        # either one inner push or one chunk-list append - a short scalar
        # chain with one conditional SMEM write each (trash slots absorb
        # the not-taken writes)
        for j in range(8):
            c = child_ref[nd, j]
            want = ((mask8 >> j) & 1) == 1
            inner = want & (c > 0)
            leaf = want & (c < 0)
            stack_ref[jnp.where(inner, jnp.minimum(sp, STACK_CAP - 2),
                                STACK_CAP - 1)] = c
            sp = sp + inner.astype(jnp.int32)
            list_ref[jnp.where(leaf, nlist, n_chunks)] = (-c - 1) >> 4
            nlist = nlist + leaf.astype(jnp.int32)
        return sp, nlist

    _dbg = _os.environ.get("IGNIS_TPU_BVH_DEBUG", "")
    if _dbg.startswith("sweep"):
        # debug: skip the walk, sweep the first K chunks
        k = int(_dbg[5:] or n_chunks)

        def fill(i, _):
            list_ref[i] = i
            return 0
        jax.lax.fori_loop(0, min(k, n_chunks), fill, 0)
        n_list = jnp.int32(min(k, n_chunks))
    else:
        _, n_list = jax.lax.while_loop(lambda s: s[0] > 0, walk_body,
                                       (jnp.int32(1), jnp.int32(0)))
    if _dbg == "walk":
        n_list = jnp.int32(0)

    # ---------------- phase 2: sweep recorded chunks -------------------
    # NOTE on culling experiments (measured on diamond_scene in-situ, TPU
    # v5e): re-testing each recorded chunk's AABB against the carried
    # per-lane tmax with a cond/pl.when-predicated sweep made closest-hit
    # 1.60 -> 1.19 Msamples/s, and an any-hit all-occluded early-exit
    # while_loop made shadow traversal 1.60 -> 1.44 — the per-chunk scalar
    # slab + reduce + branch costs more than the sweeps it skips once the
    # walk has culled to the union of needed chunks. Both sweeps therefore
    # run the recorded list straight.
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, CHUNK), 1)

    if stream:
        # HBM-streaming: the recorded chunks DMA into a 2-slot VMEM buffer
        # one step ahead of the sweep (double buffering — the MT sweep of
        # one 128-tri chunk hides the 8KB copy comfortably)
        def _chunk_dma(i, slot):
            return pltpu.make_async_copy(tri_ref.at[list_ref[i]],
                                         tri_buf.at[slot],
                                         dma_sem.at[slot])

        @pl.when(n_list > 0)
        def _():
            _chunk_dma(0, 0).start()

    def sweep(i, carry):
        c = list_ref[i]
        if stream:
            nxt = i + 1

            @pl.when(nxt < n_list)
            def _():
                _chunk_dma(nxt, jax.lax.rem(nxt, 2)).start()
            _chunk_dma(i, jax.lax.rem(i, 2)).wait()
            tv = tri_buf[jax.lax.rem(i, 2)]   # [16, 128]
        else:
            tv = tri_ref[c]                   # [16, 128]
        t, u, v, det = _mt_terms(ox, oy, oz, dx, dy, dz,
                                 tv[0:1], tv[1:2], tv[2:3],
                                 tv[3:4], tv[4:5], tv[5:6],
                                 tv[6:7], tv[7:8], tv[8:9])
        if any_hit:
            occ2d = carry
            ok = ((jnp.abs(det) >= EPS) & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t > tmin) & (t < tmax0)
                  & (tv[9:10] > 0.0))
            hit1 = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True)
            return jnp.maximum(occ2d, hit1)
        best_key, best_t, best_u, best_v, best_prim, tmax_cur = carry
        ok = ((jnp.abs(det) >= EPS) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > tmin) & (t < tmax_cur))
        tbits = jax.lax.bitcast_convert_type(t, jnp.int32)
        key = (tbits & ~LOCAL_MASK) | (col & LOCAL_MASK)
        key2d = jnp.where(ok & (tbits > 0), key, MISS_KEY)
        ck = jnp.min(key2d, axis=1, keepdims=True)    # [nb, 1]
        hit = ck != MISS_KEY
        onehot = key2d == ck
        ct = jnp.sum(jnp.where(onehot, t, 0.0), axis=1, keepdims=True)
        cu = jnp.sum(jnp.where(onehot, u, 0.0), axis=1, keepdims=True)
        cv = jnp.sum(jnp.where(onehot, v, 0.0), axis=1, keepdims=True)
        better = hit & (ck < best_key)
        prim = c * CHUNK + (ck & LOCAL_MASK)
        return (jnp.where(better, ck, best_key),
                jnp.where(better, ct, best_t),
                jnp.where(better, cu, best_u),
                jnp.where(better, cv, best_v),
                jnp.where(better, prim, best_prim),
                jnp.where(better, ct, tmax_cur))

    if any_hit:
        occ2d = jax.lax.fori_loop(0, n_list, sweep, jnp.zeros((nb, 1)))
        t_ref[:] = occ2d.reshape(-1)
        prim_ref[:] = jnp.where(t_ref[:] > 0.0, 0, -1)
        u_ref[:] = jnp.zeros((nb,))
        v_ref[:] = jnp.zeros((nb,))
    else:
        init = (jnp.full((nb, 1), MISS_KEY, jnp.int32),
                jnp.full((nb, 1), FLT_MAX),
                jnp.zeros((nb, 1)), jnp.zeros((nb, 1)),
                jnp.full((nb, 1), -1, jnp.int32),
                tmax0)
        out = jax.lax.fori_loop(0, n_list, sweep, init)
        _, best_t, best_u, best_v, best_prim, _ = out
        hit = best_prim.reshape(-1) >= 0
        t_ref[:] = jnp.where(hit, best_t.reshape(-1), FLT_MAX)
        u_ref[:] = best_u.reshape(-1)
        v_ref[:] = best_v.reshape(-1)
        prim_ref[:] = best_prim.reshape(-1)


def _build_tri_blocks(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis):
    """[n_chunks, 16, 128] f32: rows 0-8 = v0|e1|e2 components, row 9 =
    shadow visibility, rest sublane padding."""
    T = v0x.shape[0]
    rows = jnp.stack([v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis], 0)
    rows = jnp.pad(rows, ((0, NF - rows.shape[0]), (0, 0)))    # [16, T]
    return jnp.transpose(rows.reshape(NF, T // CHUNK, CHUNK), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _traverse_impl(ox, oy, oz, dx, dy, dz, tmin, tmax,
                   v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis,
                   cmin_x, cmin_y, cmin_z, cmax_x, cmax_y, cmax_z, child,
                   any_hit: bool = False, interpret: bool = False):
    """Returns (t, prim, u, v); prim = -1 on miss. For any_hit, t is the
    0/1 occlusion flag. Triangle count must be a multiple of 128 (the
    chunk-padded soup from bvh/builder.py chunkify_bvh8)."""
    n = ox.shape[0]
    lb = LANE_BLOCK
    n_pad = ((n + lb - 1) // lb) * lb
    if n_pad != n:
        padf = lambda a: jnp.pad(a, (0, n_pad - n))
        ox, oy, oz = padf(ox), padf(oy), padf(oz)
        dx, dy, dz = padf(dx), padf(dy), padf(dz)
        tmin = padf(tmin)
        tmax = jnp.pad(tmax, (0, n_pad - n), constant_values=-1.0)
    n_nodes = child.shape[0]
    n_chunks = v0x.shape[0] // CHUNK
    # boxes: [n_nodes, 8 comps (6 used, sublane-padded), 8 children]
    boxes = jnp.stack([cmin_x, cmin_y, cmin_z, cmax_x, cmax_y, cmax_z], 1)
    boxes = jnp.pad(boxes, ((0, 0), (0, 2), (0, 0)))
    tri = _build_tri_blocks(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                            vis)

    # VMEM-resident soup for in-cap scenes; HBM-streaming sweep beyond
    stream = v0x.shape[0] > MAX_TRIS
    lane_spec = pl.BlockSpec((lb,), lambda i: (i,), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tri_spec = (pl.BlockSpec(memory_space=pltpu.ANY) if stream else full)
    scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32),
               pltpu.SMEM((n_chunks + 1,), jnp.int32)]
    if stream:
        scratch += [pltpu.VMEM((2, NF, CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    kernel = functools.partial(_bvh_kernel, n_chunks, any_hit, stream)
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=(n_pad // lb,),
        in_specs=[lane_spec] * 8 + [full, smem, tri_spec],
        out_specs=[lane_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_os.environ.get(
                "IGNIS_TPU_BVH_VMEM", str(96 * 1024 * 1024)))),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tmin, tmax, boxes, child, tri)
    return t[:n], prim[:n], u[:n], v[:n]


# --- differentiable wrapper: fixed-winner VJP (pallas_isect analog) -------

@functools.partial(jax.custom_vjp, nondiff_argnums=(25,))
def _bvh_closest(ox, oy, oz, dx, dy, dz, tmin, tmax,
                 v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis,
                 cmin_x, cmin_y, cmin_z, cmax_x, cmax_y, cmax_z, child,
                 interpret):
    return _traverse_impl(ox, oy, oz, dx, dy, dz, tmin, tmax,
                          v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis,
                          cmin_x, cmin_y, cmin_z, cmax_x, cmax_y, cmax_z,
                          child, any_hit=False, interpret=interpret)


def _bvh_closest_fwd(ox, oy, oz, dx, dy, dz, tmin, tmax,
                     v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis,
                     cmin_x, cmin_y, cmin_z, cmax_x, cmax_y, cmax_z, child,
                     interpret):
    out = _bvh_closest(ox, oy, oz, dx, dy, dz, tmin, tmax,
                       v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, vis,
                       cmin_x, cmin_y, cmin_z, cmax_x, cmax_y, cmax_z,
                       child, interpret)
    aux = (vis, cmin_x, cmin_y, cmin_z, cmax_x, cmax_y, cmax_z, child)
    res = (ox, oy, oz, dx, dy, dz,
           v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, out[1], aux)
    return out, res


def _bvh_closest_bwd(interpret, res, cts):
    (ox, oy, oz, dx, dy, dz,
     v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, prim, aux) = res
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
    import numpy as _np
    zt = tuple(_np.zeros(a.shape, jax.dtypes.float0)
               if jnp.issubdtype(a.dtype, jnp.integer)
               else jnp.zeros_like(a) for a in aux)
    # ox..dz (6), tmin/tmax (2), v0..e2 (9), then zero cotangents for
    # vis + 6 box arrays + child (non-differentiable layout data)
    return grads[:6] + (z, z) + grads[6:] + zt


_bvh_closest.defvjp(_bvh_closest_fwd, _bvh_closest_bwd)


def intersect_bvh_pallas(rays, soup, bvh, vis=None, any_hit=False,
                         interpret=False):
    """Public entry over Rays/TriSoup/BVHArrays pytrees; differentiable
    closest-hit (fixed-winner VJP), detached any-hit."""
    n_tri = soup.v0.x.shape[0]
    if vis is None:
        vis = jnp.ones((n_tri,), jnp.float32)
    else:
        vis = vis.astype(jnp.float32)
    args = (rays.org.x, rays.org.y, rays.org.z,
            rays.dir.x, rays.dir.y, rays.dir.z, rays.tmin, rays.tmax,
            soup.v0.x, soup.v0.y, soup.v0.z,
            soup.e1.x, soup.e1.y, soup.e1.z,
            soup.e2.x, soup.e2.y, soup.e2.z, vis,
            bvh.cmin_x, bvh.cmin_y, bvh.cmin_z,
            bvh.cmax_x, bvh.cmax_y, bvh.cmax_z, bvh.child)
    if any_hit:
        sg = jax.lax.stop_gradient
        t, prim, u, v = _traverse_impl(
            *[sg(a) for a in args], any_hit=True, interpret=interpret)
        return t > 0.0
    from .intersect import Hit
    t, prim, u, v = _bvh_closest(*args, interpret)
    return Hit(t, prim, u, v)
