"""Isolated phase-B (cluster intersect) profile — round-3 VERDICT item 2.

The per-bounce decomposition said 264k bounce-1 cluster entries are
~35 ms of VPU flops yet phase B observably costs ~350 ms (~1 us/entry),
and the tile_b=512 A/B was confounded by union growth. This harness
removes the walk entirely: FIXED synthetic worklists with exactly k
entries per tile (cap held constant so nothing recompiles across k),
real bunny cluster blocks, random rays. Timing t(k) then gives

    per-entry cost  = slope of t(k) / n_tiles
    per-tile fixed  = intercept / n_tiles

for each kernel variant: worklist fori_loop, mask de-Bruijn scan, and
the grouped worklist form (G entries per loop iteration).

Usage: python scripts/tpu_intersect_profile.py           # full sweep
       PROFILE_LEAF=64 PROFILE_RAYS=1048576 ... overrides
Writes artifacts/intersect_profile.json.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt.accel.host_bvh import build_sah
from raypt.accel.lbvh import build as lbvh_build
from raypt.accel.ctree import build_onehot
from raypt.accel.clusters import build_woop_cm
from raypt.kernels.cluster_pallas import (
    TILE, pallas_cluster_intersect, pallas_cluster_intersect_grouped,
    pallas_cluster_intersect_mask, pallas_cluster_intersect_mask_woop)
from raypt.scenes import stanford_bunny

LEAF = int(os.environ.get("PROFILE_LEAF", 128))
R = int(os.environ.get("PROFILE_RAYS", 1 << 20))
CAP = int(os.environ.get("PROFILE_CAP", 64))
KS = [int(k) for k in os.environ.get(
    "PROFILE_KS", "1,2,4,8,16,32,64").split(",")]
GROUPS = [int(g) for g in os.environ.get("PROFILE_GROUPS", "2,4").split(",")]
REPS = int(os.environ.get("PROFILE_REPS", 3))

plat = jax.devices()[0].platform
interp = plat not in ("tpu", "axon")
print(f"platform={plat} interpret={interp} leaf={LEAF} rays={R}",
      flush=True)

scene = stanford_bunny().freeze()
bvh = build_sah(scene.mesh) or lbvh_build(
    scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
clusters, _ = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                           scene.mesh.face_valid, leaf=LEAF)
C = clusters.num_clusters
n_tiles = R // TILE
cw = -(-C // 32)
print(f"clusters={C} n_tiles={n_tiles} cw={cw}", flush=True)

rng = np.random.default_rng(42)
# rays: random origins in the scene box, random unit dirs (work is
# fixed by the worklist; the hit pattern only changes the final min)
lo = np.asarray(jnp.min(clusters.bmin, axis=0))
hi = np.asarray(jnp.max(jnp.where(jnp.isfinite(clusters.bmax),
                                  clusters.bmax, -1e30), axis=0))
ro = jnp.asarray(rng.uniform(lo, hi, (R, 3)).astype(np.float32))
d = rng.normal(size=(R, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
rd = jnp.asarray(d)
t0 = jnp.full((R,), 1e30, jnp.float32)

rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
woop_cm, fid_flat = build_woop_cm(clusters)
jax.block_until_ready((rows_cm, woop_cm))

# per-tile distinct random cluster ids (same id set across k prefixes)
perm = np.argsort(rng.random((n_tiles, C)), axis=1).astype(np.int32)


def bench(fn, *args, **kw):
    f = lambda: jax.block_until_ready(fn(*args, **kw))
    t_c0 = time.time()
    f()
    compile_s = time.time() - t_c0
    ts = []
    for _ in range(REPS):
        t_1 = time.time()
        f()
        ts.append(time.time() - t_1)
    return min(ts), compile_s


results = {"leaf": LEAF, "rays": R, "tiles": n_tiles, "clusters": C,
           "tile": TILE, "cap": CAP, "variants": {}}


# baseline glue cost: the wrapper-side XLA ops (ray transposes etc.)
# are per-CALL, not per-tile — time them separately so the k-sweep
# intercept can be attributed correctly
@jax.jit
def _glue(ro, rd, t0):
    return (ro.T.reshape(3, -1) * 2.0).sum() + (rd.T.reshape(3, -1)
                                                * 2.0).sum() + t0.sum()


dt_g, _ = bench(_glue, ro, rd, t0)
print(f"glue (2 ray transposes + reduce): {dt_g*1e3:.1f}ms", flush=True)
results["glue_transpose_ms"] = dt_g * 1e3

for k in KS:
    wl_np = np.full((n_tiles, CAP), -1, np.int32)
    wl_np[:, :k] = np.sort(perm[:, :k], axis=1)
    wl = jnp.asarray(wl_np)
    cnt = jnp.full((n_tiles,), k, jnp.int32)
    union_np = np.zeros((n_tiles, cw), np.int32)
    if k:
        rows_i = np.repeat(np.arange(n_tiles), k)
        ids = perm[:, :k].reshape(-1)
        np.bitwise_or.at(union_np, (rows_i, ids >> 5),
                         (np.int32(1) << (ids & 31)).astype(np.int32))
    union = jnp.asarray(union_np)
    jax.block_until_ready((wl, cnt, union))

    dt_w, c_w = bench(pallas_cluster_intersect, wl, cnt, rows_cm, ro, rd,
                      t0, interpret=interp)
    dt_m, c_m = bench(pallas_cluster_intersect_mask, union, rows_cm, ro,
                      rd, t0, interpret=interp)
    dt_woop, _ = bench(pallas_cluster_intersect_mask_woop, union, woop_cm,
                       ro, rd, t0, interpret=interp)
    line = {"worklist": dt_w, "mask": dt_m, "woop": dt_woop}
    for g in GROUPS:
        dt_g, _ = bench(pallas_cluster_intersect_grouped, wl, cnt,
                        rows_cm, ro, rd, t0, interpret=interp, group=g)
        line[f"grouped{g}"] = dt_g
    results["variants"][k] = line
    entries = max(k * n_tiles, 1)
    print(f"k={k:3d} ({entries/1e3:7.0f}k entries): " + "  ".join(
        f"{name} {dt*1e3:7.1f}ms ({dt/entries*1e9:6.0f} ns/entry)"
        for name, dt in line.items()), flush=True)

# slope/intercept per variant from the k sweep (least squares)
for name in list(results["variants"][KS[0]].keys()):
    xs = np.array(KS, np.float64)
    ys = np.array([results["variants"][k][name] for k in KS])
    A = np.stack([xs, np.ones_like(xs)], axis=1)
    (slope, intercept), *_ = np.linalg.lstsq(A, ys, rcond=None)
    results[f"fit_{name}"] = {
        "per_entry_ns": slope / n_tiles * 1e9,
        "per_tile_fixed_us": intercept / n_tiles * 1e6,
    }
    print(f"{name}: per-entry {slope/n_tiles*1e9:.0f} ns, "
          f"per-tile fixed {intercept/n_tiles*1e6:.2f} us", flush=True)

os.makedirs("artifacts", exist_ok=True)
with open("artifacts/intersect_profile.json", "w") as fh:
    json.dump(results, fh, indent=1)
print("wrote artifacts/intersect_profile.json", flush=True)
