"""BVH build + traversal correctness vs dense brute force."""
import numpy as np
import jax.numpy as jnp
import pytest

from ignis_tpu.bvh.builder import build_bvh8
from ignis_tpu.core.vec import Vec3
from ignis_tpu.ops.bvh import BVHArrays, intersect_bvh
from ignis_tpu.ops.intersect import (Rays, TriSoup, intersect_tris_dense,
                                     occluded_tris_dense, TRI_CHUNK)


def random_soup(t=1000, seed=0):
    rs = np.random.RandomState(seed)
    v0 = rs.randn(t, 3).astype(np.float32) * 2
    e1 = rs.randn(t, 3).astype(np.float32) * 0.3
    e2 = rs.randn(t, 3).astype(np.float32) * 0.3
    return v0, e1, e2


def as_padded_soup(v0, e1, e2):
    t = len(v0)
    pad = (-t) % TRI_CHUNK
    z = np.zeros((pad, 3), np.float32)
    mk = lambda a: Vec3(jnp.asarray(np.vstack([a, z])[:, 0]),
                        jnp.asarray(np.vstack([a, z])[:, 1]),
                        jnp.asarray(np.vstack([a, z])[:, 2]))
    return TriSoup(mk(v0), mk(e1), mk(e2))


def random_rays(n=512, seed=1):
    rs = np.random.RandomState(seed)
    org = rs.randn(n, 3).astype(np.float32) * 4
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(Vec3(*[jnp.asarray(org[:, i]) for i in range(3)]),
                Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]),
                jnp.zeros(n), jnp.full(n, 3e38))


def test_bvh_matches_dense():
    v0, e1, e2 = random_soup(777)
    bvh_np = build_bvh8(v0, e1, e2)
    perm = bvh_np.prim_order
    assert sorted(perm.tolist()) == list(range(777))
    soup = as_padded_soup(v0[perm], e1[perm], e2[perm])
    bvh = BVHArrays(*[jnp.asarray(a) for a in (
        bvh_np.cmin_x, bvh_np.cmin_y, bvh_np.cmin_z,
        bvh_np.cmax_x, bvh_np.cmax_y, bvh_np.cmax_z, bvh_np.child)])
    rays = random_rays(1024)
    h_dense = intersect_tris_dense(rays, soup)
    h_bvh = intersect_bvh(rays, soup, bvh)
    np.testing.assert_array_equal(np.asarray(h_bvh.prim >= 0),
                                  np.asarray(h_dense.prim >= 0))
    hit = np.asarray(h_dense.prim >= 0)
    np.testing.assert_allclose(np.asarray(h_bvh.t)[hit],
                               np.asarray(h_dense.t)[hit], rtol=1e-5)
    # prim ids must match where the hit is unambiguous (t strictly closest)
    np.testing.assert_array_equal(np.asarray(h_bvh.prim)[hit],
                                  np.asarray(h_dense.prim)[hit])


def test_bvh_any_hit():
    v0, e1, e2 = random_soup(512, seed=3)
    bvh_np = build_bvh8(v0, e1, e2)
    perm = bvh_np.prim_order
    soup = as_padded_soup(v0[perm], e1[perm], e2[perm])
    bvh = BVHArrays(*[jnp.asarray(a) for a in (
        bvh_np.cmin_x, bvh_np.cmin_y, bvh_np.cmin_z,
        bvh_np.cmax_x, bvh_np.cmax_y, bvh_np.cmax_z, bvh_np.child)])
    rays = random_rays(512, seed=5)
    vis = jnp.ones(soup.v0.x.shape[0], bool)
    occ_dense = occluded_tris_dense(rays, soup, vis)
    occ_bvh = intersect_bvh(rays, soup, bvh, any_hit=True, shadow_visible=vis)
    np.testing.assert_array_equal(np.asarray(occ_bvh), np.asarray(occ_dense))


def test_scene_level_bvh():
    """A >4096-tri scene builds with BVH and matches a small-scene render."""
    import json
    import ignis_tpu
    scene = {
        "technique": {"type": "path", "max_depth": 3},
        "camera": {"type": "perspective", "fov": 60, "near_clip": 0.1,
                   "far_clip": 100,
                   "transform": [-1, 0, 0, 0, 0, 1, 0, 0, 0, 0, -1, 4,
                                 0, 0, 0, 1]},
        "film": {"size": [48, 48]},
        "bsdfs": [{"type": "diffuse", "name": "m", "reflectance": [0.7, 0.7, 0.7]}],
        "shapes": [{"type": "uvsphere", "name": "S", "stacks": 96,
                    "slices": 48}],
        "entities": [{"name": "S", "shape": "S", "bsdf": "m"}],
        "lights": [{"type": "env", "name": "e", "radiance": [1, 1, 1]}],
    }
    rt = ignis_tpu.loadFromString(json.dumps(scene))
    assert rt.scene.bvh is not None  # 9216 tris -> BVH path
    rt.step()
    img = rt.framebuffer(normalized=True)
    assert np.isfinite(img).all()
    # sphere center should be lit (diffuse under white env)
    assert 0.3 < img[24, 24].mean() < 1.1


def test_native_builder_matches_layout():
    """C++ builder produces a valid BVH8: full one-time leaf coverage and
    in-range child references (skipped when the toolchain is missing)."""
    import numpy as np
    import pytest
    from ignis_tpu.bvh.builder import decode_leaf
    from ignis_tpu.native import build_bvh8_native
    rng = np.random.default_rng(7)
    n = 5000
    v0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    b = build_bvh8_native(v0, e1, e2)
    if b is None:
        pytest.skip("native toolchain unavailable")
    assert sorted(b.prim_order.tolist()) == list(range(n))
    cover = np.zeros(n, bool)
    n_nodes = b.child.shape[0]
    for node in range(n_nodes):
        for j in range(8):
            c = int(b.child[node, j])
            if c < 0:
                s, cnt = decode_leaf(c)
                assert 1 <= cnt <= 4 and not cover[s:s + cnt].any()
                cover[s:s + cnt] = True
            elif c > 0:
                assert c < n_nodes
    assert cover.all()


def test_pallas_kernel_matches_scan_interpret():
    """Pallas intersection kernel (interpret mode) == XLA scan path."""
    import numpy as np
    import jax.numpy as jnp
    from ignis_tpu.core.vec import Vec3
    from ignis_tpu.ops import intersect as I
    from ignis_tpu.ops.pallas_isect import intersect_tris_pallas
    rng = np.random.default_rng(3)
    T, N = 256, 512
    v0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    soup = I.TriSoup(Vec3(*[jnp.asarray(v0[:, i]) for i in range(3)]),
                     Vec3(*[jnp.asarray(e1[:, i]) for i in range(3)]),
                     Vec3(*[jnp.asarray(e2[:, i]) for i in range(3)]))
    rays = I.Rays(Vec3(*[jnp.asarray(o[:, i]) for i in range(3)]),
                  Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]),
                  jnp.zeros(N), jnp.full(N, 1e30))
    h = I.intersect_tris_dense(rays, soup)
    t, prim, u, v = intersect_tris_pallas(
        rays.org.x, rays.org.y, rays.org.z,
        rays.dir.x, rays.dir.y, rays.dir.z, rays.tmin, rays.tmax,
        soup.v0.x, soup.v0.y, soup.v0.z,
        soup.e1.x, soup.e1.y, soup.e1.z,
        soup.e2.x, soup.e2.y, soup.e2.z,
        jnp.ones(T), interpret=True)
    assert (np.asarray(prim) == np.asarray(h.prim)).mean() > 0.999
    hitm = np.asarray(h.prim) >= 0
    assert np.allclose(np.asarray(t)[hitm], np.asarray(h.t)[hitm], rtol=1e-4)


def test_pallas_closest_hit_grad_interpret():
    """Backward through the Pallas closest-hit VJP (fixed-winner replay,
    _mt_terms recompute) matches the XLA scan path's gradient."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ignis_tpu.core.vec import Vec3
    from ignis_tpu.ops import intersect as I
    from ignis_tpu.ops.pallas_isect import intersect_tris_pallas
    rng = np.random.default_rng(11)
    T, N = 256, 256  # T must be a multiple of the scan path's TRI_CHUNK
    v0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oxyz = [jnp.asarray(o[:, i]) for i in range(3)]
    dxyz = [jnp.asarray(d[:, i]) for i in range(3)]
    tri = [jnp.asarray(a[:, i]) for a in (v0, e1, e2) for i in range(3)]

    def loss_pallas(v0x):
        t, prim, u, v = intersect_tris_pallas(
            *oxyz, *dxyz, jnp.zeros(N), jnp.full(N, 1e30),
            v0x, tri[1], tri[2], *tri[3:], jnp.ones(T), interpret=True)
        m = prim >= 0
        return jnp.sum(jnp.where(m, t, 0.0) + jnp.where(m, u * v, 0.0))

    def loss_scan(v0x):
        soup = I.TriSoup(Vec3(v0x, tri[1], tri[2]),
                         Vec3(*tri[3:6]), Vec3(*tri[6:9]))
        rays = I.Rays(Vec3(*oxyz), Vec3(*dxyz), jnp.zeros(N),
                      jnp.full(N, 1e30))
        h = I.intersect_tris_dense(rays, soup)
        m = h.prim >= 0
        return jnp.sum(jnp.where(m, h.t, 0.0) + jnp.where(m, h.u * h.v, 0.0))

    g_pallas = jax.grad(loss_pallas)(tri[0])
    g_scan = jax.grad(loss_scan)(tri[0])
    # winners may differ on quantized-key ties; compare where both paths
    # produce a gradient
    gp, gs = np.asarray(g_pallas), np.asarray(g_scan)
    both = (gp != 0) & (gs != 0)
    assert both.sum() > 10
    assert np.allclose(gp[both], gs[both], rtol=1e-3, atol=1e-4)


def test_pallas_chunk32_cull_exact():
    """32-chunk scenes (4096 padded tris) must not drop chunk 31: the cull
    bitmask uses the uint32 sign bit (round-1 int32 overflow bug)."""
    import numpy as np
    import jax.numpy as jnp
    from ignis_tpu.core.vec import Vec3
    from ignis_tpu.ops import intersect as I
    from ignis_tpu.ops.pallas_isect import intersect_tris_pallas
    rng = np.random.default_rng(5)
    T, N = 4096, 256
    # spread triangles along x so chunk AABBs are tight and most rays
    # miss most chunks (cull mask has zeros -> old bug would zero bit 31)
    v0 = rng.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)
    v0[:, 0] += np.arange(T, dtype=np.float32) / 16.0
    e1 = rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
    # aim rays at the LAST chunk (tris 3968..4095)
    o = np.zeros((N, 3), np.float32)
    o[:, 0] = 250.0
    o[:, 2] = 5.0
    targets = v0[3968 + (np.arange(N) % 128)] + e1[3968 + (np.arange(N) % 128)] / 3 \
        + e2[3968 + (np.arange(N) % 128)] / 3
    d = (targets - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    soup = I.TriSoup(Vec3(*[jnp.asarray(v0[:, i]) for i in range(3)]),
                     Vec3(*[jnp.asarray(e1[:, i]) for i in range(3)]),
                     Vec3(*[jnp.asarray(e2[:, i]) for i in range(3)]))
    rays = I.Rays(Vec3(*[jnp.asarray(o[:, i]) for i in range(3)]),
                  Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]),
                  jnp.zeros(N), jnp.full(N, 1e30))
    h = I.intersect_tris_dense(rays, soup)
    t, prim, u, v = intersect_tris_pallas(
        rays.org.x, rays.org.y, rays.org.z,
        rays.dir.x, rays.dir.y, rays.dir.z, rays.tmin, rays.tmax,
        soup.v0.x, soup.v0.y, soup.v0.z,
        soup.e1.x, soup.e1.y, soup.e1.z,
        soup.e2.x, soup.e2.y, soup.e2.z,
        jnp.ones(T), interpret=True)
    ref_hits = np.asarray(h.prim)
    got_hits = np.asarray(prim)
    assert (ref_hits >= 3968).sum() > 100  # the scenario exercises chunk 31
    assert (got_hits == ref_hits).mean() > 0.999


def test_scene_accel_chunk_vs_tri_paths():
    """Built-scene integration: the Pallas chunked-leaf traversal
    (interpret) and the XLA tri-leaf walk agree on the same SceneAccel."""
    import json
    import numpy as np
    import jax.numpy as jnp
    import ignis_tpu
    from ignis_tpu.core.vec import Vec3
    from ignis_tpu.ops.bvh import intersect_bvh
    from ignis_tpu.ops.pallas_bvh import intersect_bvh_pallas
    from ignis_tpu.ops.intersect import Rays

    scene = {
        "technique": {"type": "path"},
        "camera": {"type": "perspective", "fov": 60,
                   "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, -4,
                                 0, 0, 0, 1]},
        "film": {"size": [32, 32]},
        "bsdfs": [{"type": "diffuse", "name": "w"}],
        "shapes": [{"type": "icosphere", "name": "s", "radius": 1.2,
                    "subdivisions": 5}],
        "entities": [{"name": "s", "shape": "s", "bsdf": "w"}],
        "lights": [{"type": "env", "name": "e", "radiance": 1.0}],
    }
    rt = ignis_tpu.loadFromString(json.dumps(scene))
    sc = rt.scene
    assert sc.bvh is not None and sc.tris.v0.x.shape[0] > 2048
    rng = np.random.default_rng(2)
    N = 500
    o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(Vec3(*[jnp.asarray(o[:, i]) for i in range(3)]),
                Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]),
                jnp.zeros(N), jnp.full(N, 1e30))
    h_tri = intersect_bvh(rays, sc.tris, sc.bvh.tri)
    h_chunk = intersect_bvh_pallas(rays, sc.tris, sc.bvh.chunk,
                                   interpret=True)
    pt, pc = np.asarray(h_tri.prim), np.asarray(h_chunk.prim)
    assert ((pt >= 0) == (pc >= 0)).mean() > 0.995
    m = (pt >= 0) & (pc >= 0)
    assert np.allclose(np.asarray(h_chunk.t)[m], np.asarray(h_tri.t)[m],
                       rtol=1e-4)
    occ_tri = intersect_bvh(rays, sc.tris, sc.bvh.tri, any_hit=True)
    occ_chunk = intersect_bvh_pallas(rays, sc.tris, sc.bvh.chunk,
                                     any_hit=True, interpret=True)
    assert (np.asarray(occ_tri) == np.asarray(occ_chunk)).mean() > 0.995


def test_pallas_streaming_sweep_matches_resident():
    """HBM-streaming sweep (stream=True, double-buffered chunk DMA) must
    be bit-equal to the VMEM-resident sweep on the same scene (cap
    lowered so a small scene exercises the streaming path)."""
    import json
    import numpy as np
    import jax.numpy as jnp
    import ignis_tpu
    from ignis_tpu.core.vec import Vec3
    from ignis_tpu.ops import pallas_bvh as PB
    from ignis_tpu.ops.intersect import Rays

    scene = {
        "technique": {"type": "path"},
        "camera": {"type": "perspective", "fov": 60,
                   "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, -4,
                                 0, 0, 0, 1]},
        "film": {"size": [16, 16]},
        "bsdfs": [{"type": "diffuse", "name": "w"}],
        "shapes": [{"type": "icosphere", "name": "s", "radius": 1.2,
                    "subdivisions": 4}],
        "entities": [{"name": "s", "shape": "s", "bsdf": "w"}],
        "lights": [{"type": "env", "name": "e", "radiance": 1.0}],
    }
    rt = ignis_tpu.loadFromString(json.dumps(scene))
    sc = rt.scene
    rng = np.random.default_rng(5)
    N = 300
    o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(Vec3(*[jnp.asarray(o[:, i]) for i in range(3)]),
                Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]),
                jnp.zeros(N), jnp.full(N, 1e30))

    h_res = PB.intersect_bvh_pallas(rays, sc.tris, sc.bvh.chunk,
                                    interpret=True)
    occ_res = PB.intersect_bvh_pallas(rays, sc.tris, sc.bvh.chunk,
                                      any_hit=True, interpret=True)
    old = PB.MAX_TRIS
    PB.MAX_TRIS = 128  # force stream=True for this small soup
    try:
        h_st = PB.intersect_bvh_pallas(rays, sc.tris, sc.bvh.chunk,
                                       interpret=True)
        occ_st = PB.intersect_bvh_pallas(rays, sc.tris, sc.bvh.chunk,
                                         any_hit=True, interpret=True)
    finally:
        PB.MAX_TRIS = old
    assert (np.asarray(h_res.prim) == np.asarray(h_st.prim)).all()
    np.testing.assert_array_equal(np.asarray(h_res.t), np.asarray(h_st.t))
    np.testing.assert_array_equal(np.asarray(occ_res), np.asarray(occ_st))
