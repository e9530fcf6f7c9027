"""Measure the unrolled compacting walk vs tiled/fori-compact on the
bench workload (bunny 1024^2 primary wavefront + full fwd render)."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.packed import pack
from raypt.accel.traverse import find_closest_packed
from raypt.core.math3d import normalize
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     make_finder, pixel_id_grid,
                                     render_sample)
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
cfg0 = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                    num_bounces=4, backend="bvh")
ids_grid, _ = _block_order(pixel_id_grid(cfg0))
ro, rd = camera_rays_for_ids(scene, cfg0, ids_grid,
                             jnp.full((1024, 1024, 2), 0.5))
rd = normalize(rd)
pb = pack(bvh, scene.mesh.positions, scene.mesh.faces,
          scene.mesh.face_valid)


def timeit(name, f, *args, reps=3):
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f}ms (compile {comp:.1f}s)", flush=True)
    return out


for mode, tile in (("tiled", 8192), ("unrolled", 0)):
    f = jax.jit(lambda o, d, mode=mode, tile=tile:
                find_closest_packed(scene, pb, o, d, tile=tile,
                                    unroll=2, mode=mode))
    timeit(f"find {mode}", f, ro, rd)

key = jax.random.key(0)
for mode in ("tiled", "unrolled"):
    cfg = cfg0.replace(traversal_mode=mode)

    @jax.jit
    def fwd(k, cfg=cfg):
        finder = make_finder(scene, cfg, bvh)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    timeit(f"fwd render {mode}", fwd, key)
