"""Profile the hot path components on the real TPU (diamond_scene)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import ignis_tpu
from ignis_tpu.ops import intersect as isect
from ignis_tpu.ops.intersect import Rays
from ignis_tpu.core.vec import Vec3

SCENE = "/root/reference/scenes/diamond_scene.json"
rt = ignis_tpu.loadFromFile(SCENE, width=512, height=512, spi=8)
scene = rt.scene
settings = rt.settings
N = 512 * 512

key = jax.random.PRNGKey(0)
ox, oy, oz = [jax.random.normal(jax.random.fold_in(key, i), (N,)) for i in range(3)]
dx, dy, dz = [jax.random.normal(jax.random.fold_in(key, i + 3), (N,)) for i in range(3)]
nrm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
rays = Rays(Vec3(ox, oy, oz), Vec3(dx / nrm, dy / nrm, dz / nrm),
            jnp.zeros(N), jnp.full(N, 1e30))


def timeit(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms")
    return out


# 1. dense closest hit (XLA scan path)
f_dense = jax.jit(lambda r: isect.intersect_tris_dense(r, scene.tris))
timeit("dense closest-hit 262k rays x 1024 tris (XLA)", f_dense, rays)

# 2. dense any-hit
f_occ = jax.jit(lambda r: isect.occluded_tris_dense(r, scene.tris))
timeit("dense any-hit (XLA)", f_occ, rays)

# 3. pallas kernel standalone
import os
os.environ["IGNIS_TPU_PALLAS"] = "1"
try:
    from ignis_tpu.ops.pallas_isect import intersect_tris_pallas
    vis = jnp.ones((scene.tris.v0.x.shape[0],), jnp.float32)
    f_pal = jax.jit(lambda r: intersect_tris_pallas(
        r.org.x, r.org.y, r.org.z, r.dir.x, r.dir.y, r.dir.z, r.tmin, r.tmax,
        scene.tris.v0.x, scene.tris.v0.y, scene.tris.v0.z,
        scene.tris.e1.x, scene.tris.e1.y, scene.tris.e1.z,
        scene.tris.e2.x, scene.tris.e2.y, scene.tris.e2.z, vis))
    h1 = timeit("dense closest-hit (PALLAS)", f_pal, rays)
    h0 = f_dense(rays)
    print("  match t:", np.allclose(np.asarray(h0.t), np.asarray(h1[0]), rtol=1e-4, atol=1e-5),
          " match prim:", float(np.mean(np.asarray(h0.prim) == np.asarray(h1[1]))))
except Exception as e:
    print("pallas failed:", repr(e))
os.environ["IGNIS_TPU_PALLAS"] = "0"

# 4. one full bounce step cost: instrument while loop count
from ignis_tpu.techniques import path as pathlib_
from ignis_tpu.models.texture import make_texture_evaluator

x = jnp.broadcast_to(jnp.arange(512, dtype=jnp.int32)[None, :], (512, 512)).reshape(-1)
y = jnp.broadcast_to(jnp.arange(512, dtype=jnp.int32)[:, None], (512, 512)).reshape(-1)


def count_iters(scene, iteration, frame):
    from ignis_tpu.core import rng as rnglib
    from ignis_tpu.core.sampler import sample_pixel_offsets
    from ignis_tpu.models import camera as cameralib
    ev = make_texture_evaluator(settings.texture_descs, scene.textures)
    n = x.shape
    st0 = rnglib.seed(jnp.uint32(0), iteration, frame, x.astype(jnp.uint32),
                      y.astype(jnp.uint32), jnp.uint32(settings.seed))
    sample_idx = iteration * jnp.uint32(settings.spi)
    st0, (rx, ry) = sample_pixel_offsets(settings.pixel_sampler, st0, sample_idx, x, y)
    rays = cameralib.generate_rays(scene.camera, settings, x, y, rx, ry, rng_state=st0)
    init = pathlib_.initial_state(rays, st0)
    bounce = pathlib_.make_bounce(scene, settings, n, ev, regen=(x, y, iteration, frame))
    max_iters = settings.spi * settings.max_depth

    def cond(c):
        it, st = c
        return (it < max_iters) & jnp.any(st.alive)

    def body(c):
        it, st = c
        st, _ = bounce(st, it)
        return (it + 1, st)

    itf, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    return itf, jnp.sum(final.result.r)


f_cnt = jax.jit(count_iters)
t0 = time.perf_counter()
it, s = jax.block_until_ready(f_cnt(scene, jnp.uint32(0), jnp.uint32(0)))
print(f"full iteration: {time.perf_counter()-t0:.2f}s (compile+run), wavefront iters = {int(it)}")
t0 = time.perf_counter()
it, s = jax.block_until_ready(f_cnt(scene, jnp.uint32(1), jnp.uint32(0)))
dt = time.perf_counter() - t0
print(f"full iteration (warm): {dt:.2f}s, iters={int(it)}, per-bounce = {dt/int(it)*1e3:.1f} ms")

# 5. single bounce cost (scan of 1, compiled standalone)
def one_bounce(scene, iteration, frame):
    from ignis_tpu.core import rng as rnglib
    from ignis_tpu.core.sampler import sample_pixel_offsets
    from ignis_tpu.models import camera as cameralib
    ev = make_texture_evaluator(settings.texture_descs, scene.textures)
    n = x.shape
    st0 = rnglib.seed(jnp.uint32(0), iteration, frame, x.astype(jnp.uint32),
                      y.astype(jnp.uint32), jnp.uint32(settings.seed))
    sample_idx = iteration * jnp.uint32(settings.spi)
    st0, (rx, ry) = sample_pixel_offsets(settings.pixel_sampler, st0, sample_idx, x, y)
    rays = cameralib.generate_rays(scene.camera, settings, x, y, rx, ry, rng_state=st0)
    init = pathlib_.initial_state(rays, st0)
    bounce = pathlib_.make_bounce(scene, settings, n, ev, regen=(x, y, iteration, frame))
    st, _ = bounce(init, 0)
    return st.result.r.sum(), st.rng


f_one = jax.jit(one_bounce)
timeit("one bounce step (standalone jit)", f_one, scene, jnp.uint32(0), jnp.uint32(0), reps=3)
