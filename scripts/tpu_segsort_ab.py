"""A/B: segmented (locality-preserving) alive-compaction before the
flagship walk, on the full bench fwd render (r4; global compactions
all measured losses — this keeps pixel-block order within groups).

Result: segment_sort=2048 measured 772 ms vs 655 ms baseline — a LOSS.
NOTE: the 8192/32768 rows of the original run printed ~0.0 ms; those
were UNMEASURED, not fast — block_until_ready through the TPU relay
does not wait for some program shapes (see tpu_permute_probe2.py /
STATUS r4); only the 0 and 2048 rows are valid."""
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
for seg in (0, 2048, 8192, 32768):
    def finder(scene_a, ro, rd, active=None, seg=seg):
        return find_closest_onehot(scene_a, accel, ro, rd, active=active,
                                   segment_sort=seg)

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
    imgs[seg] = out
    print(f"segment_sort={seg}: fwd {min(ts)*1e3:.1f}ms "
          f"(all {[round(t*1e3) for t in ts]}, compile {comp:.1f}s)",
          flush=True)

d = float(jnp.abs(imgs[0] - imgs[2048]).max())
print(f"max|img_0 - img_2048| = {d:.2e}", flush=True)
