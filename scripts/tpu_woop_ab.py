"""A/B: flagship fwd + fwd/bwd with MT-mask phase B vs Woop-MXU phase B
(round-4; isolated profile said 981 -> 578 ns/entry)."""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

LEAF = int(os.environ.get("AB_LEAF", 128))
SIZE = int(os.environ.get("AB_SIZE", 1024))

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
bvh = build_sah(scene.mesh)
acc4 = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                    scene.mesh.face_valid, leaf=LEAF, with_woop=True)
acc2 = acc4[:2]
key = jax.random.key(0)
cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                   num_bounces=4, backend="onehot")


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
    print(f"{name}: {min(ts)*1e3:.1f}ms (all {[round(t*1e3) for t in ts]},"
          f" compile {comp:.1f}s)", flush=True)
    return out


imgs = {}
for name, acc in (("mt", acc2), ("woop", acc4)):
    @jax.jit
    def fwd(k, acc=acc):
        finder = make_finder(scene, cfg, acc)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    imgs[name] = timeit(f"fwd {name}", fwd, key)

    @jax.jit
    def fwd_bwd(verts, k, acc=acc):
        def loss(v):
            s = scene.replace(mesh=scene.mesh.replace(positions=v))
            finder = make_finder(s, cfg, acc)
            im = render_sample(s, cfg, sample_key(frame_key(k, 0), 0),
                               finder)
            return jnp.mean(im)
        return jax.value_and_grad(loss)(verts)

    timeit(f"fwd+bwd {name}", fwd_bwd, scene.mesh.positions, key)

d = float(jnp.abs(imgs["mt"] - imgs["woop"]).max())
print(f"max|img_mt - img_woop| = {d:.2e}", flush=True)
