"""Effect of wavefront sorting + tile/unroll on the bench workload."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
key = jax.random.key(0)

for sort, tile, unroll in ((False, 1024, 1), (True, 1024, 1),
                           (True, 2048, 1), (True, 4096, 1),
                           (True, 1024, 2), (True, 2048, 2),
                           (True, 8192, 1), (True, 4096, 2)):
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                       num_bounces=4, backend="bvh", ray_sort=sort,
                       traversal_tile=tile, traversal_unroll=unroll)

    @jax.jit
    def fwd(k):
        finder = make_finder(scene, cfg, bvh)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    t0 = time.time()
    img = fwd(key)
    jax.block_until_ready(img)
    comp = time.time() - t0
    ts = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(fwd(jax.random.fold_in(key, i)))
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"sort={sort} tile={tile} unroll={unroll}: {dt*1000:.0f}ms "
          f"(compile {comp:.0f}s) mean={float(img.mean()):.5f}", flush=True)
