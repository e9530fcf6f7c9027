"""Exact per-phase decomposition of the flagship fwd render: capture
the REAL per-bounce wavefronts (ro, rd, alive) from the integrator,
then time each phase standalone on those arrays — sphere seed, one-hot
walk, union reduce, mask-kernel intersect, shade recompute + BRDF
glue. Replaces marginal-difference guessing (round-3 B3>B4 inversion
showed ±30% noise on marginals)."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.accel.clusters import tile_union_counts
from raypt.accel.traverse import _closest_sphere, find_closest_onehot
from raypt.core.math3d import BIG, normalize
from raypt.kernels.cluster_pallas import (TILE,
                                          pallas_cluster_intersect_mask)
from raypt.kernels.onehot_walk import pallas_topwalk
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid, trace_paths)
from raypt.render.shading import build_shade_tables, recompute_hit_packed
from raypt.rng import (bounce_uniforms, frame_key, random_point_on_sphere,
                       sample_jitter, sample_key)
from raypt.scenes import stanford_bunny

LEAF = int(os.environ.get("PD_LEAF", 128))

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=LEAF)
clusters, table = accel
c_total = clusters.num_clusters
nw = -(-c_total // 32)
rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
key = jax.random.key(0)
cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                   num_bounces=4, backend="onehot")

# ---- capture per-bounce wavefronts by instrumenting a replica of the
# integrator loop (same RNG stream as the bench render)
skey = sample_key(frame_key(key, 0), 0)
ids_grid, _ = _block_order(pixel_id_grid(cfg))
jitter = sample_jitter(skey, ids_grid)
ro0, rd0 = camera_rays_for_ids(scene, cfg, ids_grid, jitter)
rd0 = normalize(rd0)


@jax.jit
def capture():
    from raypt.render.integrator import make_finder, trace_paths
    finder = make_finder(scene, cfg, accel)
    waves = []
    ro, rd = ro0.reshape(-1, 3), rd0.reshape(-1, 3)
    alive = jnp.ones(ro.shape[0], bool)
    tables = build_shade_tables(scene)
    pix = ids_grid.reshape(-1)
    for bidx in range(4):
        waves.append((ro, rd, alive))
        ids = finder(scene, ro, rd, active=alive)
        hit, mp = recompute_hit_packed(tables, ro, rd, ids)
        hit_now = alive & hit.valid
        alive = hit_now
        u = bounce_uniforms(skey, bidx, pix)
        sph = random_point_on_sphere(u[..., 1], u[..., 2])
        nd = normalize(hit.normal + sph)
        ro = jnp.where(hit_now[:, None],
                       hit.position + hit.normal * cfg.normal_offset, ro)
        rd = jnp.where(hit_now[:, None], nd, rd)
        p = jnp.maximum(jnp.max(jnp.ones_like(rd) * 0 + 0.7, axis=-1),
                        1e-6)  # placeholder; RR approximated below
        die = hit_now & (u[..., 3] > 0.7)
        alive = alive & ~die
    return waves


waves = capture()
waves = [tuple(np.asarray(x) for x in w) for w in waves]
for i, (ro, rd, al) in enumerate(waves):
    print(f"bounce {i}: alive {al.mean()*100:.1f}%", flush=True)


def timeit(name, f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"  {name}: {min(ts)*1e3:7.1f}ms", flush=True)
    return out


tables = jax.jit(build_shade_tables)(scene)
total = {"sphere": 0, "walk": 0, "union": 0, "intersect": 0, "shade": 0}
for i, (ro_n, rd_n, al_n) in enumerate(waves):
    ro = jnp.asarray(ro_n)
    rd = jnp.asarray(rd_n)
    al = jnp.asarray(al_n)
    print(f"bounce {i} ({al_n.mean()*100:.1f}% alive):", flush=True)

    sph_f = jax.jit(lambda o, d: _closest_sphere(scene, o, d))
    ts_seed, _ = timeit("sphere seed", sph_f, ro, rd)
    seed = jnp.where(al, ts_seed, -BIG)

    walk_f = jax.jit(lambda o, d, t, a: pallas_topwalk(
        table, o, d, t, a, nw))
    mask = timeit("walk      ", walk_f, ro, rd, seed, al)

    union_f = jax.jit(lambda m: tile_union_counts(m, TILE, c_total))
    union, counts = timeit("union     ", union_f, mask)
    print(f"    (mean union {float(jnp.mean(counts)):.1f}, "
          f"max {int(jnp.max(counts))})", flush=True)

    is_f = jax.jit(lambda u, o, d, t: pallas_cluster_intersect_mask(
        u, rows_cm, o, d, t))
    t_b, face = timeit("intersect ", is_f, union, ro, rd, seed)

    # round-5 per-ray-exact path: column-major walk + expansion kernel
    # (set PD_EXPAND=0 to skip)
    exp_n = int(os.environ.get("PD_EXPAND", 8192))
    if exp_n:
        from raypt.kernels.cluster_expand import pallas_cluster_expand
        from raypt.kernels.onehot_walk import pallas_topwalk_cm
        cwp = -(-nw // 8) * 8
        wcm_f = jax.jit(lambda o, d, t, a: pallas_topwalk_cm(
            table, o, d, t, a, cwp))
        mask_cm = timeit("walk (cm) ", wcm_f, ro, rd, seed, al)
        ex_f = jax.jit(lambda m, o, d, t: pallas_cluster_expand(
            m, rows_cm, o, d, t, n_rays=exp_n))
        timeit("expand    ", ex_f, mask_cm, ro, rd, seed)

    def shade(o, d, f, t):
        from raypt.accel.traverse import HitIds
        ids = HitIds(t=t, tri=f, sphere=jnp.full_like(f, -1))
        hit, mp = recompute_hit_packed(tables, o, d, ids)
        u = bounce_uniforms(skey, i, jnp.arange(o.shape[0]))
        sph = random_point_on_sphere(u[..., 1], u[..., 2])
        nd = normalize(hit.normal + sph)
        return hit.position + nd

    timeit("shade+brdf", jax.jit(shade), ro, rd, face, t_b)


# ---- per-ray popcount vs per-tile union: quantifies the divergence
# waste factor phase B pays (every ray in a tile tests the tile UNION)
print("\nper-ray popcount vs tile union (waste factor):", flush=True)
for i, (ro_n, rd_n, al_n) in enumerate(waves):
    ro = jnp.asarray(ro_n)
    rd = jnp.asarray(rd_n)
    al = jnp.asarray(al_n)
    ts_seed, _ = jax.jit(lambda o, d: _closest_sphere(scene, o, d))(ro, rd)
    seed = jnp.where(al, ts_seed, -BIG)
    mask = pallas_topwalk(table, ro, rd, seed, al, nw)
    pop = jnp.sum(jnp.unpackbits(mask.view(jnp.uint8), axis=-1)
                  .astype(jnp.int32), axis=-1)          # (R,)
    union, counts = tile_union_counts(mask, TILE, c_total)
    alive_pop = jnp.where(al, pop, 0)
    n_alive = jnp.maximum(jnp.sum(al), 1)
    per_ray = float(jnp.sum(alive_pop) / n_alive)
    per_tile = float(jnp.mean(counts))
    # total work actually paid vs per-ray-exact lower bound
    paid = float(jnp.sum(counts)) * TILE
    exact = float(jnp.sum(alive_pop))
    print(f"  bounce {i}: per-ray mean {per_ray:.1f}, tile union mean "
          f"{per_tile:.1f}, waste = paid/exact = {paid/max(exact,1):.1f}x",
          flush=True)
