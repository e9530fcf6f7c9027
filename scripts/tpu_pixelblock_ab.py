"""A/B: pixel-block size for the ray-stream layout (r4): a 256-ray
phase-B tile is an 8x32 strip at block=32 but one square 16x16 patch
at block=16 — squarer patches should tighten bounce-1 unions."""
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
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=128)
key = jax.random.key(0)

imgs = {}
for blk in (32, 16, 8):
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                       num_bounces=4, backend="onehot", pixel_block=blk)

    @jax.jit
    def fwd(k, cfg=cfg):
        finder = make_finder(scene, cfg, accel)
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
    imgs[blk] = out
    print(f"pixel_block={blk}: fwd {min(ts)*1e3:.1f}ms "
          f"(all {[round(t*1e3) for t in ts]}, compile {comp:.1f}s)",
          flush=True)

d = float(jnp.abs(imgs[32] - imgs[16]).max())
print(f"max|img_32 - img_16| = {d:.2e}", flush=True)
