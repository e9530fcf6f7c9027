"""Per-bounce worklist-count statistics for the onehot path on the
framed bunny at 1024^2 — sizes the overflow problem before fixing it
(the round-2 fault: the full-scan overflow cond on secondary
wavefronts is effectively a hang -> device watchdog).

Reimplements the trace_paths bounce loop (integrator.py) with a scan
that EMITS per-bounce stats as ys (axon has no debug callbacks):
alive rays, per-ray popcount mean, per-tile union count mean/p95/max,
frac of tiles over cap=192.
"""
import os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.accel.traverse import find_closest_onehot
from raypt.core.math3d import BIG, lerp, normalize, reflect
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.render.shading import build_shade_tables, recompute_hit_packed
from raypt.rng import (bounce_uniforms, frame_key, random_point_on_sphere,
                       sample_jitter, sample_key)
from raypt.scenes import stanford_bunny

SIZE = int(os.environ.get("OVF_SIZE", 1024))
LEAF = int(os.environ.get("OVF_LEAF", 64))
BOUNCES = 4

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=LEAF)
clusters, table = accel
cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                   num_bounces=BOUNCES, backend="onehot",
                   russian_roulette=True)
C_TOTAL = clusters.num_clusters
NW = -(-C_TOTAL // 32)


SORT = int(os.environ.get("OVF_SORT", 0))  # 1=morton|octant 2=first-wanted


def walk_stats(ro, rd, alive):
    """(popmean, tile-cnt mean, p95, max, frac>192) for one wavefront."""
    from raypt.accel.clusters import first_wanted, worklists_from_masks
    from raypt.kernels.cluster_pallas import TILE
    from raypt.kernels.onehot_walk import pallas_topwalk
    if SORT == 1:
        from raypt.accel.traverse import onehot_sort_key
        cb_min = jnp.min(jnp.where(clusters.valid[:, None],
                                   clusters.bmin, BIG), axis=0)
        cb_max = jnp.max(jnp.where(clusters.valid[:, None],
                                   clusters.bmax, -BIG), axis=0)
        order = jnp.argsort(onehot_sort_key(ro, rd, alive, cb_min, cb_max),
                            stable=True)
        ro, rd, alive = ro[order], rd[order], alive[order]
    n = ro.shape[0]
    mask = pallas_topwalk(table, ro, rd, jnp.full((n,), BIG), alive, NW)
    if SORT == 2:
        skey = jnp.where(alive, first_wanted(mask), jnp.int32(1) << 29)
        order = jnp.argsort(skey, stable=True)
        mask, alive = mask[order], alive[order]
    _, cnt, _ = worklists_from_masks(mask, TILE, C_TOTAL, C_TOTAL)
    pop = jnp.sum(jnp.unpackbits(mask.view(jnp.uint8), axis=-1), axis=-1)
    na = jnp.sum(alive)
    cs = jnp.sort(cnt)
    nt = cnt.shape[0]
    return jnp.stack([
        na.astype(jnp.float32),
        jnp.sum(jnp.where(alive, pop, 0)) / jnp.maximum(na, 1),
        jnp.mean(cnt.astype(jnp.float32)),
        cs[int(nt * 0.95)].astype(jnp.float32),
        cs[-1].astype(jnp.float32),
        jnp.mean((cnt > 192).astype(jnp.float32))])


ids_grid, _ = _block_order(pixel_id_grid(cfg))
key = jax.random.key(0)
skey = sample_key(frame_key(key, 0), 0)


@jax.jit
def run(skey):
    jitter = sample_jitter(skey, ids_grid)
    ro, rd = camera_rays_for_ids(scene, cfg, ids_grid, jitter)
    rd = normalize(rd)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    pix = ids_grid.reshape(-1)
    tables = build_shade_tables(scene)
    alive0 = jnp.ones(ro.shape[0], bool)

    def bounce(carry, bi):
        ro, rd, alive = carry
        st = walk_stats(ro, rd, alive)
        ids = find_closest_onehot(scene, accel, ro, rd, active=alive,
                                  overflow_fallback=False)
        hit, mp = recompute_hit_packed(tables, ro, rd, ids)
        hit_now = alive & hit.valid
        alive = hit_now
        u = bounce_uniforms(skey, bi, pix)
        roughness = mp[..., 9]
        spec_pct = mp[..., 10]
        do_spec = (u[..., 0] < spec_pct).astype(jnp.float32)[..., None]
        sph = random_point_on_sphere(u[..., 1], u[..., 2])
        diffuse_dir = normalize(hit.normal + sph)
        specular_dir = normalize(reflect(rd, hit.normal))
        specular_dir = normalize(lerp(specular_dir, diffuse_dir,
                                      (roughness * roughness)[..., None]))
        new_dir = normalize(lerp(diffuse_dir, specular_dir, do_spec))
        new_ro = hit.position + hit.normal * cfg.normal_offset
        ro = jnp.where(hit_now[..., None], new_ro, ro)
        rd = jnp.where(hit_now[..., None], new_dir, rd)
        # roulette with the reference's p = max(throughput) ~ albedo-ish;
        # approximate with 0.8 to keep the probe simple: kill u3 > 0.8
        alive = alive & (u[..., 3] <= 0.8)
        return (ro, rd, alive), st

    _, stats = jax.lax.scan(bounce, (ro, rd, alive0),
                            jnp.arange(BOUNCES, dtype=jnp.int32))
    return stats


stats = jax.block_until_ready(run(skey))
import numpy as np
s = np.asarray(stats)
print(f"size={SIZE} leaf={LEAF} clusters={C_TOTAL} "
      f"top_rows={table.shape[0]}", flush=True)
for i in range(BOUNCES):
    print(f"bounce {i}: alive={int(s[i,0])} popmean={s[i,1]:.2f} "
          f"tilecnt mean={s[i,2]:.1f} p95={s[i,3]:.0f} max={int(s[i,4])} "
          f"frac>192={s[i,5]:.4f}", flush=True)
