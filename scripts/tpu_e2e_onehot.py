"""End-to-end fwd render + fwd/bwd bench step: onehot vs bvh(tiled) on
the real bunny workload."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=64)
key = jax.random.key(0)


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


for backend, acc in (("bvh", bvh), ("onehot", accel)):
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                       num_bounces=4, backend=backend)

    @jax.jit
    def fwd(k, cfg=cfg, acc=acc):
        finder = make_finder(scene, cfg, acc)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    img = timeit(f"fwd {backend}", fwd, key)

    @jax.jit
    def fwd_bwd(verts, albedo, k, cfg=cfg, acc=acc):
        def loss(v, a):
            s = scene.replace(
                mesh=scene.mesh.replace(positions=v),
                materials=scene.materials.replace(albedo=a))
            finder = make_finder(s, cfg, acc)
            im = render_sample(s, cfg, sample_key(frame_key(k, 0), 0),
                               finder)
            return jnp.mean(im)
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(verts, albedo)
        return l, grads

    out = timeit(f"fwd+bwd {backend}", fwd_bwd, scene.mesh.positions,
                 scene.materials.albedo, key)
    print(f"  loss={float(out[0]):.6f}", flush=True)
