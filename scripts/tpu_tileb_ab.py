"""A/B: phase-B tile width 128 vs 256 on the full bench fwd render.
tile_b=512 was measured a loss in round 3; 128 halves the vregs per
dense test AND tightens each tile's union (fewer rays per union), at
the cost of 2x the per-tile fixed work. MT mask kernel, leaf=128."""
import os
import time
from functools import partial

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

LEAF = int(os.environ.get("AB_LEAF", 128))

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=LEAF)
key = jax.random.key(0)
cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                   num_bounces=4, backend="onehot")

imgs = {}
for tb in (256, 128, 64):
    def finder(scene_a, ro, rd, active=None, tb=tb):
        return find_closest_onehot(scene_a, accel, ro, rd, active=active,
                                   tile_b=tb)

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
    imgs[tb] = out
    print(f"tile_b={tb}: fwd {min(ts)*1e3:.1f}ms "
          f"(all {[round(t*1e3) for t in ts]}, compile {comp:.1f}s)",
          flush=True)

d = float(jnp.abs(imgs[256] - imgs[128]).max())
print(f"max|img_256 - img_128| = {d:.2e}", flush=True)
