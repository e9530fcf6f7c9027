"""A/B: walk ray_tile for the e2e bench render — smaller walk programs
bound the per-program max trip count on incoherent secondary bounces
(the rt sweep that picked 1024 only measured the coherent primary
wavefront)."""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.accel.traverse import find_closest_onehot
from raypt.render.integrator import render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=128)
key = jax.random.key(0)
cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                   num_bounces=4, backend="onehot")

imgs = {}
for wt in (1024, 512, 256):
    def finder(scene_a, ro, rd, active=None, wt=wt):
        return find_closest_onehot(scene_a, accel, ro, rd, active=active,
                                   walk_tile=wt)

    @jax.jit
    def fwd(k, finder=finder):
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    t0 = time.time()
    out = fwd(key)
    jax.block_until_ready(out)
    comp = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fwd(key)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    imgs[wt] = out
    print(f"walk_tile={wt}: fwd {min(ts)*1e3:.1f}ms "
          f"(all {[round(t*1e3) for t in ts]}, compile {comp:.1f}s)",
          flush=True)

d = float(jnp.abs(imgs[1024] - imgs[256]).max())
print(f"max|img_1024 - img_256| = {d:.2e}", flush=True)
