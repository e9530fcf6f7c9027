"""Sweep the one-hot walk's radix split (lo_size) at the bench
configuration (leaf=128, rt=1024, unroll=4): bigger lo shrinks the
hi-select chain (fewer (16, R_T) selects per step) at the cost of a
bigger one-hot compare; total MXU flops are invariant (HI*16*LO ~
16*Nt). Round-3 VERDICT item 4 ("restructure the hi-block select")."""
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
from raypt.accel.traverse import _closest_sphere
from raypt.core.math3d import normalize
from raypt.kernels.onehot_walk import pallas_topwalk
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

LEAF = int(os.environ.get("LO_LEAF", 128))

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
cfg = RenderConfig(width=1024, height=1024)
ids_grid, _ = _block_order(pixel_id_grid(cfg))
ro, rd = camera_rays_for_ids(scene, cfg, ids_grid,
                             jnp.full((1024, 1024, 2), 0.5))
rd = normalize(rd)
flat_o = ro.reshape(-1, 3)
flat_d = rd.reshape(-1, 3)
R = flat_o.shape[0]
clusters, table = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                               scene.mesh.face_valid, leaf=LEAF)
nw = -(-clusters.num_clusters // 32)
nt = table.shape[0]
act = jnp.ones((R,), bool)
ts_seed, _ = jax.jit(lambda o, d: _closest_sphere(scene, o, d))(ro, rd)
seed = ts_seed.reshape(-1)
print(f"leaf={LEAF} nt={nt} cw={nw}", flush=True)

ref = None
for lo in (128, 256, 512, 1024):
    hi = -(-nt // lo)
    f = jax.jit(lambda o, d, t, lo=lo: pallas_topwalk(
        table, o, d, t, act, nw, ray_tile=1024, unroll=4, lo_size=lo))
    out = f(flat_o, flat_d, seed)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = f(flat_o, flat_d, seed)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    ok = True
    if ref is None:
        ref = np.asarray(out)
    else:
        ok = bool(np.array_equal(np.asarray(out), ref))
    print(f"lo={lo:5d} (hi_blocks={hi}): {min(ts)*1e3:.1f}ms "
          f"(all {[round(t*1e3) for t in ts]}) match={ok}", flush=True)
