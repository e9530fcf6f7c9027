"""Round-5 adjudication of VERDICT r4 item 3 ("extend phase B's
epilogue to emit the shade row, killing the R-scale gather in
recompute_hit_packed"): time the shade glue's PIECES on the bench
wavefront so the epilogue decision rests on measurements, not the
r4 isolated numbers (which carry a ~20-26 ms committed-input tax).

Pieces, 1M rays (framed bunny primary hits, leaf=512 flagship accel):
  rows-gather    — tables.rows[ids.tri] alone (the gather the item
                   proposes to kill)
  moller+interp  — full recompute_hit_packed (gather + Moller algebra
                   + barycentric normal/uv interp + material fetch)
  rng+brdf       — bounce_uniforms + sphere sample + reflect/lerp mix
  full shade     — everything the integrator does between finder
                   return and the next-ray write

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
  scripts/tpu_shade_profile.py
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt import RenderConfig
from raypt.accel.ctree import build_onehot
from raypt.accel.host_bvh import build_sah
from raypt.accel.traverse import HitIds, find_closest_onehot
from raypt.core.math3d import normalize, reflect, lerp
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.render.shading import build_shade_tables, recompute_hit_packed
from raypt.rng import (bounce_uniforms, frame_key, random_point_on_sphere,
                       sample_key)
from raypt.scenes import stanford_bunny

SIZE = 1024
b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=512)
cfg = RenderConfig(width=SIZE, height=SIZE)
ids_grid, _ = _block_order(pixel_id_grid(cfg))
ro, rd = camera_rays_for_ids(scene, cfg, ids_grid,
                             jnp.full((SIZE, SIZE, 2), 0.5))
ro = ro.reshape(-1, 3)
rd = normalize(rd).reshape(-1, 3)
r = ro.shape[0]
skey = sample_key(frame_key(jax.random.key(0), 0), 0)
pix = jnp.arange(r, dtype=jnp.int32)

ids = find_closest_onehot(scene, accel, ro, rd, expand_n=8192)
tables = jax.jit(build_shade_tables)(scene)
jax.block_until_ready((ids.t, tables.rows))


def timeit(name, f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t)
    print(f"{name}: {min(ts)*1e3:7.1f} ms", flush=True)
    return out


timeit("rows-gather  ", jax.jit(
    lambda tri: tables.rows[jnp.clip(tri, 0, None)]), ids.tri)
timeit("moller+interp", jax.jit(
    lambda o, d: recompute_hit_packed(tables, o, d, ids)), ro, rd)


@jax.jit
def rng_brdf(o, d):
    u = bounce_uniforms(skey, 0, pix)
    sph = random_point_on_sphere(u[..., 1], u[..., 2])
    nd = normalize(d + sph)
    sd = normalize(reflect(d, nd))
    return normalize(lerp(nd, sd, u[..., 0:1]))


timeit("rng+brdf     ", rng_brdf, ro, rd)


@jax.jit
def full_shade(o, d):
    hit, mp = recompute_hit_packed(tables, o, d, ids)
    u = bounce_uniforms(skey, 0, pix)
    albedo = mp[..., 0:3]
    spec = mp[..., 6:9]
    do_spec = (u[..., 0] < mp[..., 10]).astype(jnp.float32)[..., None]
    sph = random_point_on_sphere(u[..., 1], u[..., 2])
    dd = normalize(hit.normal + sph)
    sd = normalize(reflect(d, hit.normal))
    nd = normalize(lerp(dd, sd, do_spec))
    tp = lerp(albedo, spec, do_spec)
    return hit.position + hit.normal * 1e-3, nd, tp


timeit("full shade   ", full_shade, ro, rd)
