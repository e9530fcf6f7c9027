"""One-hot finder vs tiled packed walk on the bunny primary wavefront,
plus phase-level breakdown (walk / worklists / intersect)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.clusters import worklists_from_masks
from raypt.accel.ctree import build_onehot
from raypt.accel.packed import pack
from raypt.accel.traverse import (_closest_sphere, find_closest_onehot,
                                  find_closest_packed)
from raypt.core.math3d import BIG, normalize
from raypt.kernels.cluster_pallas import TILE, pallas_cluster_intersect
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

accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=64)
clusters, table = accel
c_total = clusters.num_clusters
nw = -(-c_total // 32)
print(f"clusters={int(np.asarray(clusters.valid).sum())}/{c_total} "
      f"tree_rows={table.shape[0]} words={nw}", flush=True)

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


# baseline
f_tiled = jax.jit(lambda o, d: find_closest_packed(scene, pb, o, d,
                                                   tile=8192, unroll=2,
                                                   mode="tiled"))
timeit("find tiled (baseline)", f_tiled, ro, rd)

# phase A alone
act = jnp.ones((R,), bool)
ts_seed, _ = jax.jit(lambda o, d: _closest_sphere(scene, o, d))(ro, rd)
seed = ts_seed.reshape(-1)
f_walk = jax.jit(lambda o, d, t: pallas_topwalk(table, o, d, t, act, nw))
mask = timeit("phase A pallas_topwalk", f_walk, flat_o, flat_d, seed)

# per-ray wanted stats
pc = np.asarray(jax.jit(
    lambda m: jnp.sum(jax.lax.population_count(m.view(jnp.uint32) if
                                               hasattr(m, 'view') else m),
                      axis=1))(mask.astype(jnp.uint32)))
print(f"wanted clusters/ray: mean={pc.mean():.2f} "
      f"p99={np.percentile(pc, 99):.0f} max={pc.max()}", flush=True)

# phase B: worklists
f_wl = jax.jit(lambda m: worklists_from_masks(m, TILE, 192, c_total))
wl, cnt, ovf = timeit("phase B worklists", f_wl, mask)
cn = np.asarray(cnt)
print(f"tile worklist: mean={cn.mean():.1f} p99={np.percentile(cn,99):.0f} "
      f"max={cn.max()} overflow={int(np.asarray(ovf).sum())}", flush=True)

# phase B: intersect
rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
seed2 = jnp.where(act, seed, -BIG)
f_int = jax.jit(lambda wl, cnt, o, d, t: pallas_cluster_intersect(
    wl, cnt, rows_cm, o, d, t))
timeit("phase B intersect", f_int, wl, cnt, flat_o, flat_d, seed2)

# end to end
f_oh = jax.jit(lambda o, d: find_closest_onehot(scene, accel, o, d))
ids_oh = timeit("find onehot (end-to-end)", f_oh, ro, rd)

# parity vs tiled on TPU
ids_t = f_tiled(ro, rd)
t_a = np.asarray(ids_t.t)
t_b = np.asarray(ids_oh.t)
print("parity t allclose:", np.allclose(t_a, t_b, rtol=1e-4, atol=1e-4),
      "maxdiff", float(np.abs(np.minimum(t_a, 1e30)
                              - np.minimum(t_b, 1e30)).max()), flush=True)
