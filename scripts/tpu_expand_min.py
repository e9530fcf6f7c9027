"""Minimal failing instance hunt: run expand vs mask on ONE program's
rays from the real wavefront, then shrink the mask word-range until the
mismatch disappears — isolates which cluster/word interaction breaks.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.clusters import tile_union_counts
from raypt.accel.ctree import build_onehot, walk_topwalk_jnp
from raypt.accel.host_bvh import build_sah
from raypt.core.math3d import normalize
from raypt.kernels.cluster_expand import pallas_cluster_expand
from raypt.kernels.cluster_pallas import (TILE,
                                          pallas_cluster_intersect_mask)
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

PROG = int(os.environ.get("MIN_PROG", 5))
N = 2048

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
ro = ro.reshape(-1, 3)[PROG * N:(PROG + 1) * N]
rd = normalize(rd).reshape(-1, 3)[PROG * N:(PROG + 1) * N]
r = N
t0 = jnp.full((r,), 1e30)
act = jnp.ones((r,), bool)
mask = jax.jit(walk_topwalk_jnp, static_argnames=("num_words",))(
    table, ro, rd, t0, act, num_words=num_words)
rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
cwp = -(-num_words // 8) * 8


def compare(mask_mod, tag):
    union, _ = tile_union_counts(mask_mod, TILE, clusters.num_clusters)
    t_mw, f_mw = pallas_cluster_intersect_mask(union, rows_cm, ro, rd, t0)
    mask_cm = jnp.concatenate(
        [mask_mod.T, jnp.zeros((cwp - num_words, r), jnp.int32)], axis=0)
    t_xw, f_xw = pallas_cluster_expand(mask_cm, rows_cm, ro, rd, t0,
                                       n_rays=N)
    t_mw, f_mw, t_xw, f_xw = map(np.asarray, (t_mw, f_mw, t_xw, f_xw))
    bad = np.nonzero((t_mw != t_xw) | (f_mw != f_xw))[0]
    print(f"{tag}: {len(bad)} mismatched rays", flush=True)
    return bad, (t_mw, f_mw, t_xw, f_xw)


bad, _ = compare(mask, "full mask")
if len(bad) == 0:
    print("program clean; try another MIN_PROG")
    raise SystemExit

mask_np = np.asarray(mask)
# shrink: single word at a time
live_words = [w for w in range(num_words) if mask_np[:, w].any()]
print("live words:", live_words)
for w in live_words:
    m1 = np.zeros_like(mask_np)
    m1[:, w] = mask_np[:, w]
    bad_w, _ = compare(jnp.asarray(m1), f"word {w} only")

# shrink word 42 to single bits
w = 42
col = mask_np[:, w].astype(np.uint32)
for k in range(32):
    if not ((col >> k) & 1).any():
        continue
    m1 = np.zeros_like(mask_np)
    m1[:, w] = (((col >> k) & 1) << k).astype(np.int32)
    cnt = int(((col >> k) & 1).sum())
    bad_k, res = compare(jnp.asarray(m1), f"word {w} bit {k} (n={cnt})")
    if len(bad_k):
        t_mw, f_mw, t_xw, f_xw = res
        for i in bad_k[:4]:
            print(f"    ray {i}: t_mw={t_mw[i]:.6g} t_xw={t_xw[i]:.6g} "
                  f"f_mw={f_mw[i]} f_xw={f_xw[i]} wanted="
                  f"{(int(col[i]) >> k) & 1}")
