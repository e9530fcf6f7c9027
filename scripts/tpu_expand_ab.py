"""Round-5 A/B: per-ray-exact expansion phase B vs the dense per-tile
union kernel, end-to-end on the bench workload (framed bunny, 1024^2,
4 bounces). Sweeps the expansion program size (rays sharing one
distinct-cluster scan); PLAN_R5 projects ~2.3-2.7x on phase B from the
measured distinct-cid distributions, pending the per-G selection-matmul
cost this script resolves.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python
  scripts/tpu_expand_ab.py [fwd|fwdbwd]
"""
import os
import sys
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

MODE = sys.argv[1] if len(sys.argv) > 1 else "fwd"
LEAF = int(os.environ.get("AB_LEAF", 128))
SWEEP = [int(x) for x in
         os.environ.get("AB_EXPAND", "0,2048,4096,8192").split(",")]
# in-kernel alive-compaction group sizes to cross with the expand sweep
# (0 = off); see kernels/compact.py
COMPACT = [int(x) for x in os.environ.get("AB_COMPACT", "0").split(",")]

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=LEAF)
jax.block_until_ready(accel[1])
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
    print(f"{name}: {min(ts)*1000:.1f}ms (compile {comp:.1f}s, "
          f"all {[round(t*1e3) for t in ts]})", flush=True)
    return out


ref_img = None
for expand in SWEEP:
  for compact in COMPACT:
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                       num_bounces=4, backend="onehot",
                       onehot_leaf=LEAF, onehot_expand=expand,
                       onehot_compact=compact)

    if MODE == "fwd":
        @jax.jit
        def fwd(k, cfg=cfg):
            finder = make_finder(scene, cfg, accel)
            return render_sample(scene, cfg,
                                 sample_key(frame_key(k, 0), 0), finder)

        img = timeit(f"fwd expand={expand} compact={compact}", fwd, key)
        if ref_img is None:
            ref_img = img
        else:
            d = float(jnp.abs(img - ref_img).max())
            print(f"  max|img - ref| = {d:.3e}", flush=True)
    else:
        @jax.jit
        def fwd_bwd(verts, albedo, k, cfg=cfg):
            def loss(v, a):
                s = scene.replace(
                    mesh=scene.mesh.replace(positions=v),
                    materials=scene.materials.replace(albedo=a))
                finder = make_finder(s, cfg, accel)
                im = render_sample(s, cfg, sample_key(frame_key(k, 0), 0),
                                   finder)
                return jnp.mean(im)
            l, grads = jax.value_and_grad(loss, argnums=(0, 1))(verts,
                                                                albedo)
            return l, grads

        out = timeit(f"fwd+bwd expand={expand}", fwd_bwd,
                     scene.mesh.positions, scene.materials.albedo, key)
        print(f"  loss={float(out[0]):.6f}", flush=True)
