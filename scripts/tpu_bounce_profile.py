"""Per-bounce cost + alive-fraction probe on the bench workload.

Measures (a) fwd render time at num_bounces = 1..4 (marginal bounce
cost), (b) alive fraction entering each bounce, (c) traversal trip
counts per tile (max node-visits) for primary vs secondary wavefronts.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.packed import pack
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     make_finder, pixel_id_grid,
                                     render_sample)
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
key = jax.random.key(0)

for nb in (1, 2, 3, 4):
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                       num_bounces=nb, backend="bvh")

    @jax.jit
    def fwd(k):
        finder = make_finder(scene, cfg, bvh)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    img = fwd(key)
    jax.block_until_ready(img)
    ts = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(fwd(jax.random.fold_in(key, i)))
        ts.append(time.time() - t0)
    print(f"bounces={nb}: {min(ts)*1000:.0f}ms", flush=True)

# alive fraction per bounce: replicate the integrator loop with probes
from raypt.core.math3d import normalize
from raypt.render.integrator import trace_paths
from raypt.render.shading import build_shade_tables, recompute_hit_packed
from raypt.rng import bounce_uniforms, sample_jitter

cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                   num_bounces=4, backend="bvh")
finder = make_finder(scene, cfg, bvh)
ids_grid, _ = _block_order(pixel_id_grid(cfg))
skey = sample_key(frame_key(key, 0), 0)


@jax.jit
def probe(skey):
    jitter = sample_jitter(skey, ids_grid)
    ro, rd = camera_rays_for_ids(scene, cfg, ids_grid, jitter)
    rd = normalize(rd)
    tables = build_shade_tables(scene)
    alive = jnp.ones(ro.shape[:-1], bool)
    fractions = []
    import jax as _j
    for bnc in range(4):
        u = bounce_uniforms(skey, jnp.int32(bnc), ids_grid)
        hids = finder(scene, ro, rd, active=alive)
        hit, mp = recompute_hit_packed(tables, ro, rd, hids)
        hit_now = alive & hit.valid
        fractions.append(alive.mean())
        # follow a crude diffuse bounce for next iteration
        from raypt.rng import random_point_on_sphere
        sph = random_point_on_sphere(u[..., 1], u[..., 2])
        nd = normalize(hit.normal + sph)
        ro = jnp.where(hit_now[..., None], hit.position + hit.normal * 0.01, ro)
        rd = jnp.where(hit_now[..., None], nd, rd)
        # roulette approximation with throughput ~ albedo product skipped;
        # use hit mask only (upper bound on alive)
        alive = hit_now
    return jnp.stack(fractions)


fr = jax.block_until_ready(probe(skey))
print("alive fraction entering bounce 0..3 (no roulette):",
      [round(float(x), 3) for x in fr], flush=True)
