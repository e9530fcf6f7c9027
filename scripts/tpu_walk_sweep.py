"""Sweep ray_tile x unroll for the one-hot top-walk on the real bunny
workload."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.accel.traverse import _closest_sphere
from raypt.core.math3d import normalize
from raypt.kernels.onehot_walk import pallas_topwalk
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
cfg = RenderConfig(width=1024, height=1024)
ids_grid, _ = _block_order(pixel_id_grid(cfg))
ro, rd = camera_rays_for_ids(scene, cfg, ids_grid,
                             jnp.full((1024, 1024, 2), 0.5))
rd = normalize(rd)
flat_o = ro.reshape(-1, 3)
flat_d = rd.reshape(-1, 3)
R = flat_o.shape[0]
clusters, table = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                               scene.mesh.face_valid, leaf=64)
nw = -(-clusters.num_clusters // 32)
act = jnp.ones((R,), bool)
ts_seed, _ = jax.jit(lambda o, d: _closest_sphere(scene, o, d))(ro, rd)
seed = ts_seed.reshape(-1)

ref = None
for rt in (256, 512, 1024):
    for un in (1, 2, 4):
        f = jax.jit(lambda o, d, t, rt=rt, un=un: pallas_topwalk(
            table, o, d, t, act, nw, ray_tile=rt, unroll=un))
        out = f(flat_o, flat_d, seed)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = f(flat_o, flat_d, seed)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        ok = True
        if ref is None:
            ref = np.asarray(out)
        else:
            ok = np.array_equal(np.asarray(out), ref)
        print(f"ray_tile={rt} unroll={un}: {min(ts)*1000:.1f}ms match={ok}",
              flush=True)
