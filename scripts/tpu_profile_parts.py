import time, jax, numpy as np, jax.numpy as jnp
from raypt import RenderConfig
from raypt.scenes import cornell_box
from raypt.render.integrator import make_finder, pixel_id_grid, camera_rays_for_ids
from raypt.render.shading import build_shade_tables, recompute_hit_packed
from raypt.render.envmap import sample_env, rotate_y_pi
from raypt.rng import bounce_uniforms, sample_jitter, frame_key, sample_key, random_point_on_sphere
from raypt.core.math3d import normalize
from raypt.accel.traverse import _closest_sphere

b = cornell_box()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1, num_bounces=4, backend="pallas")
key = jax.random.key(0)
skey = sample_key(frame_key(key,0),0)
ids = pixel_id_grid(cfg)
jit = jnp.full((1024,1024,2), 0.5)
ro, rd = camera_rays_for_ids(scene, cfg, ids, jit)
rd = normalize(rd)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    ts=[]
    for _ in range(3):
        t0=time.time(); out = f(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1000:.1f}ms", flush=True)
    return out

timeit("rng bounce_uniforms x4", lambda k: [bounce_uniforms(k, b, ids) for b in range(4)], skey)
timeit("jitter", lambda k: sample_jitter(k, ids), skey)
timeit("env sample 1M", lambda d: sample_env(scene.env, rotate_y_pi(d)), rd)
timeit("sphere pass", lambda o, d: _closest_sphere(scene, o, d), ro, rd)
finder = make_finder(scene, cfg, None)
hit_ids = timeit("pallas finder", lambda o, d: finder(scene, o, d), ro, rd)
tables = build_shade_tables(scene)
timeit("recompute_packed", lambda o, d, i: recompute_hit_packed(tables, o, d, i), ro, rd, hit_ids)
