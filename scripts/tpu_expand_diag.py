"""Diagnose the expand-kernel hardware mismatch: run expand vs mask on
the real 256^2 wavefront and characterize the wrong rays."""
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.ctree import build_onehot, walk_topwalk_jnp
from raypt.accel.host_bvh import build_sah
from raypt.core.math3d import normalize
from raypt.kernels.cluster_expand import pallas_cluster_expand
from raypt.kernels.cluster_pallas import (TILE,
                                          pallas_cluster_intersect_mask)
from raypt.accel.clusters import tile_union_counts
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

N_RAYS = int(os.environ.get("DIAG_N", 2048))
b = stanford_bunny()
scene = b.freeze()
bvh = build_sah(scene.mesh)
clusters, table = build_onehot(bvh, scene.mesh.positions,
                               scene.mesh.faces, scene.mesh.face_valid,
                               leaf=64)
num_words = -(-clusters.num_clusters // 32)
size = 256
b.camera.viewport_width = b.camera.viewport_height = size
sc = b.freeze()
cfg0 = RenderConfig(width=size, height=size)
ids_grid, _ = _block_order(pixel_id_grid(cfg0))
ro, rd = camera_rays_for_ids(sc, cfg0, ids_grid,
                             jnp.full((size, size, 2), 0.5))
ro = ro.reshape(-1, 3)
rd = normalize(rd).reshape(-1, 3)
r = ro.shape[0]
t0 = jnp.full((r,), 1e30)
act = jnp.ones((r,), bool)
mask_ref = jax.jit(walk_topwalk_jnp, static_argnames=("num_words",))(
    table, ro, rd, t0, act, num_words=num_words)
rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
union, _ = tile_union_counts(mask_ref, TILE, clusters.num_clusters)
t_mw, f_mw = pallas_cluster_intersect_mask(union, rows_cm, ro, rd, t0)
cwp = -(-num_words // 8) * 8
mask_cm = jnp.concatenate(
    [mask_ref.T, jnp.zeros((cwp - num_words, r), jnp.int32)], axis=0)
t_xw, f_xw = pallas_cluster_expand(mask_cm, rows_cm, ro, rd, t0,
                                   n_rays=N_RAYS)
t_mw, f_mw, t_xw, f_xw = map(np.asarray, (t_mw, f_mw, t_xw, f_xw))
mask_np = np.asarray(mask_ref)
bad = np.nonzero((t_mw != t_xw) | (f_mw != f_xw))[0]
print(f"rays {r}, programs of {N_RAYS}: {r // N_RAYS}")
print(f"mismatch rays: {len(bad)} ({len(bad)/r*100:.2f}%)")
if len(bad):
    prog = bad // N_RAYS
    lane = bad % N_RAYS
    print("by program:", np.bincount(prog, minlength=r // N_RAYS))
    print("lane range of bad:", lane.min(), lane.max())
    print("first 8 bad:", bad[:8])
    for i in bad[:8]:
        pops = sum(bin(int(w) & 0xFFFFFFFF).count("1")
                   for w in mask_np[i])
        print(f"  ray {i}: mask_pop={pops} t_mw={t_mw[i]:.6g} "
              f"t_xw={t_xw[i]:.6g} f_mw={f_mw[i]} f_xw={f_xw[i]}")
    # are the bad rays exactly those in multi-round clusters?
    # per-program per-cluster interest counts
    c_total = clusters.num_clusters
    nb = 0
    for p in range(r // N_RAYS):
        sl = mask_np[p * N_RAYS:(p + 1) * N_RAYS]
        for w in range(num_words):
            col = sl[:, w].astype(np.uint32)
            for k in range(32):
                cid = w * 32 + k
                if cid >= c_total:
                    break
                cnt = int(((col >> k) & 1).sum())
                if cnt > 128:
                    nb += 1
                    if nb <= 10:
                        print(f"  prog {p} cluster {cid}: interest "
                              f"{cnt} (multi-round)")
    print(f"multi-round (prog, cluster) pairs: {nb}")
