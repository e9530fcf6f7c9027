"""Localize the TPU device fault in the onehot flagship path: run each
phase separately on the real bunny workload at increasing sizes."""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

SIZE = int(os.environ.get("DBG_SIZE", 256))
assert SIZE % 32 == 0, "DBG_SIZE must be a multiple of 32 (RAY_TILE=1024)"
PHASE = os.environ.get("DBG_PHASE", "walk")
REPS = int(os.environ.get("DBG_REPS", 3))


def steady(fn, *args):
    """Post-compile best-of-REPS wall time for fn(*args)."""
    times = []
    for _ in range(REPS):
        t = time.time()
        jax.block_until_ready(fn(*args))
        times.append(time.time() - t)
    return min(times)

print(f"devices: {jax.devices()}", flush=True)
b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
print("scene frozen", flush=True)
bvh = build_sah(scene.mesh)
print("sah built", flush=True)
clusters, table = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                               scene.mesh.face_valid, leaf=64)
print(f"table rows={table.shape}, clusters={clusters.num_clusters}",
      flush=True)

key = jax.random.key(0)
from raypt.core.math3d import normalize
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)

cfg0 = RenderConfig(width=SIZE, height=SIZE)
ids_grid, _ = _block_order(pixel_id_grid(cfg0))
ro, rd = camera_rays_for_ids(scene, cfg0, ids_grid,
                             jnp.full((SIZE, SIZE, 2), 0.5))
rd = normalize(rd)
ro = ro.reshape(-1, 3)
rd = rd.reshape(-1, 3)
W = H = SIZE
t0 = jnp.full((W * H,), 1e30)
act = jnp.ones((W * H,), bool)

if PHASE == "walk":
    from raypt.kernels.onehot_walk import pallas_topwalk
    num_words = -(-clusters.num_clusters // 32)
    t = time.time()
    mask = pallas_topwalk(table, ro, rd, t0, act, num_words)
    jax.block_until_ready(mask)
    print(f"walk ok: {time.time()-t:.1f}s, popcount mean "
          f"{float(jnp.mean(jnp.sum(jnp.unpackbits(mask.view(jnp.uint8), axis=-1), axis=-1))):.1f}",
          flush=True)
    dt = steady(lambda: pallas_topwalk(table, ro, rd, t0, act, num_words))
    print(f"walk steady {dt*1e3:.1f} ms ({W*H/dt/1e6:.1f} Mray/s)",
          flush=True)
elif PHASE == "finder":
    from raypt.accel.traverse import find_closest_onehot
    t = time.time()
    f = jax.jit(lambda o, d: find_closest_onehot(
        scene, (clusters, table), o, d))
    hits = f(ro, rd)
    jax.block_until_ready(hits.t)
    print(f"finder ok: {time.time()-t:.1f}s, hit frac "
          f"{float(jnp.mean(hits.tri >= 0)):.3f}", flush=True)
    dt = steady(lambda: f(ro, rd).t)
    print(f"finder steady {dt*1e3:.1f} ms ({W*H/dt/1e6:.1f} Mray/s)",
          flush=True)
elif PHASE == "fwd":
    cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                       num_bounces=4, backend="onehot",
                       russian_roulette=True)

    @jax.jit
    def fwd(k):
        finder = make_finder(scene, cfg, (clusters, table))
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    t = time.time()
    img = fwd(key)
    jax.block_until_ready(img)
    print(f"fwd ok: {time.time()-t:.1f}s mean={float(img.mean()):.4f}",
          flush=True)
    dt = steady(fwd, key)
    segs = W * H * cfg.num_bounces
    print(f"fwd steady {dt*1e3:.1f} ms ({segs/dt/1e6:.1f} Mray-seg/s)",
          flush=True)
elif PHASE == "fwdbwd":
    cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                       num_bounces=4, backend="onehot",
                       russian_roulette=True)

    @jax.jit
    def fwd_bwd(verts, albedo, k):
        def loss(v, a):
            s = scene.replace(
                mesh=scene.mesh.replace(positions=v),
                materials=scene.materials.replace(albedo=a))
            finder = make_finder(s, cfg, (clusters, table))
            im = render_sample(s, cfg, sample_key(frame_key(k, 0), 0),
                               finder)
            return jnp.mean(im)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(verts, albedo)
        return l, g

    t = time.time()
    out = fwd_bwd(scene.mesh.positions, scene.materials.albedo, key)
    jax.block_until_ready(out)
    print(f"fwdbwd ok: {time.time()-t:.1f}s loss={float(out[0]):.5f}",
          flush=True)
    dt = steady(fwd_bwd, scene.mesh.positions, scene.materials.albedo, key)
    segs = W * H * cfg.num_bounces * 2
    print(f"fwdbwd steady {dt*1e3:.1f} ms ({segs/dt/1e6:.1f} Mray-seg/s)",
          flush=True)
print("done", flush=True)
