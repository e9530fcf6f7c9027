"""Bisect the 1024^2 onehot fwd-render TPU fault.

Standalone walk and finder at 1024^2 pass (tpu_onehot_debug phases);
the full fwd render faults. Axes this script can isolate, via env:
  BIS_BOUNCES   — number of bounces (1..4); secondary wavefronts only
                  exist from bounce 2 on.
  BIS_WALK      — 1 = pallas walk, 0 = jnp walk
  BIS_INTERSECT — 1 = pallas cluster intersect, 0 = jnp intersect
  BIS_OVERFLOW  — 1 = keep the full-scan overflow cond, 0 = strip it
  BIS_SIZE      — image size (default 1024)
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.accel.traverse import find_closest_onehot
from raypt.render.integrator import render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

SIZE = int(os.environ.get("BIS_SIZE", 1024))
BOUNCES = int(os.environ.get("BIS_BOUNCES", 4))
WALK = bool(int(os.environ.get("BIS_WALK", 1)))
INTERSECT = bool(int(os.environ.get("BIS_INTERSECT", 1)))
OVERFLOW = bool(int(os.environ.get("BIS_OVERFLOW", 1)))
SORT = os.environ.get("BIS_SORT", "alive")  # none|alive|mask
CAP = int(os.environ.get("BIS_CAP", 0))
LEAF = int(os.environ.get("BIS_LEAF", 64))
TILE_B = int(os.environ.get("BIS_TILE", 0))

print(f"size={SIZE} bounces={BOUNCES} walk={'pallas' if WALK else 'jnp'} "
      f"intersect={'pallas' if INTERSECT else 'jnp'} overflow={OVERFLOW} "
      f"sort={SORT!r} cap={CAP} leaf={LEAF} tile_b={TILE_B}", flush=True)

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=LEAF)
cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                   num_bounces=BOUNCES, backend="onehot",
                   russian_roulette=True)

def my_finder(scene_, ro, rd, active=None):
    return find_closest_onehot(scene_, accel, ro, rd, active=active,
                               use_pallas_walk=WALK,
                               use_pallas_intersect=INTERSECT,
                               overflow_fallback=OVERFLOW,
                               sort_rays=SORT, cap=CAP, tile_b=TILE_B)


key = jax.random.key(0)


@jax.jit
def fwd(k):
    return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0),
                         my_finder)


t = time.time()
img = fwd(key)
jax.block_until_ready(img)
print(f"fwd ok: {time.time()-t:.1f}s mean={float(img.mean()):.4f}",
      flush=True)
times = []
for _ in range(3):
    t = time.time()
    jax.block_until_ready(fwd(key))
    times.append(time.time() - t)
dt = min(times)
print(f"fwd steady {dt*1e3:.1f} ms "
      f"({SIZE*SIZE*BOUNCES/dt/1e6:.1f} Mray-seg/s)", flush=True)
