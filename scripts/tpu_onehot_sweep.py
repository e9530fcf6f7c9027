"""Sweep the onehot finder's build/launch knobs on the real framed
bunny at 1024^2 (primary wavefront): cluster leaf size, walk ray_tile,
and unroll. The one-hot fetch matmul costs ~2*Nt*16*R flop per STEP
(independent of the radix split), so halving top-tree rows (leaf x2)
should halve phase A; phase B pays leaf-x wider dense blocks per
worklist entry. This finds the cross-over.

Env: SWEEP_LEAVES="64,128,256" SWEEP_TILES="512,1024"
     SWEEP_UNROLLS="4" SWEEP_SIZE=1024
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.accel.traverse import find_closest_onehot
from raypt.core.math3d import normalize
from raypt.kernels.onehot_walk import pallas_topwalk
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

SIZE = int(os.environ.get("SWEEP_SIZE", 1024))
LEAVES = [int(x) for x in os.environ.get("SWEEP_LEAVES",
                                         "64,128,256").split(",")]
TILES = [int(x) for x in os.environ.get("SWEEP_TILES", "1024").split(",")]
UNROLLS = [int(x) for x in os.environ.get("SWEEP_UNROLLS", "4").split(",")]

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
bvh = build_sah(scene.mesh)
cfg0 = RenderConfig(width=SIZE, height=SIZE)
ids_grid, _ = _block_order(pixel_id_grid(cfg0))
ro, rd = camera_rays_for_ids(scene, cfg0, ids_grid,
                             jnp.full((SIZE, SIZE, 2), 0.5))
rd = normalize(rd)
ro = ro.reshape(-1, 3)
rd = rd.reshape(-1, 3)
R = ro.shape[0]
t0 = jnp.full((R,), 1e30)
act = jnp.ones((R,), bool)


def steady(fn, reps=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t)
    return min(ts)


print(f"devices={jax.devices()} size={SIZE} rays={R}", flush=True)
for leaf in LEAVES:
    accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid, leaf=leaf)
    clusters, table = accel
    nw = -(-clusters.num_clusters // 32)
    print(f"leaf={leaf}: top rows={table.shape[0]} "
          f"clusters={clusters.num_clusters} words={nw}", flush=True)
    for rt in TILES:
        for un in UNROLLS:
            try:
                dt = steady(lambda: pallas_topwalk(
                    table, ro, rd, t0, act, nw, ray_tile=rt, unroll=un))
                mask = pallas_topwalk(table, ro, rd, t0, act, nw,
                                      ray_tile=rt, unroll=un)
                pm = float(jnp.mean(jnp.sum(jnp.unpackbits(
                    mask.view(jnp.uint8), axis=-1), axis=-1)))
                print(f"  walk leaf={leaf} rt={rt} u={un}: {dt*1e3:.1f} ms"
                      f" popmean={pm:.2f}", flush=True)
            except Exception as e:
                print(f"  walk leaf={leaf} rt={rt} u={un}: FAIL "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
    f = jax.jit(lambda o, d: find_closest_onehot(scene, accel, o, d))
    try:
        dt = steady(lambda: f(ro, rd).t)
        hits = f(ro, rd)
        print(f"  finder leaf={leaf}: {dt*1e3:.1f} ms "
              f"({R/dt/1e6:.1f} Mray/s) hit={float(jnp.mean(hits.tri >= 0)):.3f}",
              flush=True)
    except Exception as e:
        print(f"  finder leaf={leaf}: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
print("done", flush=True)
