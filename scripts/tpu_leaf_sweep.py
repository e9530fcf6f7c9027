"""Sweep packed-leaf arity (1/2/4 triangles per leaf row) on the bench
workload: bunny 1024^2 fwd, 4 bounces, SAH tree (same as bench.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/raypt_xla_cache")
import jax
import jax.numpy as jnp

from raypt import RenderConfig
from raypt.accel import build
from raypt.accel.host_bvh import build_sah
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
if bvh is None:
    bvh = build(scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
jax.block_until_ready(bvh.bmin)
key = jax.random.key(0)

for spec in os.environ.get("LT", "1,2,4").split(","):
    la = spec.endswith("l")
    lt = int(spec.rstrip("l"))
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                       num_bounces=4, backend="bvh", leaf_tris=lt,
                       node_lookahead=la)

    @jax.jit
    def fwd(k):
        finder = make_finder(scene, cfg, bvh)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                             finder)

    t0 = time.time()
    img = fwd(key)
    jax.block_until_ready(img)
    c = time.time() - t0
    ts = []
    for i in range(3):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        img = fwd(k)
        jax.block_until_ready(img)
        ts.append(time.time() - t0)
    dt = min(ts)
    segs = 1024 * 1024 * 4
    print(f"leaf_tris={spec}: compile {c:.0f}s, run {dt*1000:.0f}ms -> "
          f"{segs/dt/1e6:.1f} Mray-seg/s fwd, mean={float(img.mean()):.4f}",
          flush=True)
