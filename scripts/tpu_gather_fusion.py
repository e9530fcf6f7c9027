"""Why are in-loop gathers ~500x slower than standalone bulk gathers?

Hypothesis: XLA fuses the gather into the loop-body fusion, losing the
fast bulk-gather emitter. Variants:
  A: plain step (baseline, known slow)
  B: optimization_barrier around the gathered rows
  C: optimization_barrier around the indices (pre-gather)
  D: gather expressed via jnp.take
  E: barrier on both indices and rows
Each: 32 fixed steps over the bunny packed table, R=1M rays.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.packed import pack, ftoi, _mt
from raypt.core.math3d import normalize
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

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
pb = pack(bvh, scene.mesh.positions, scene.mesh.faces,
          scene.mesh.face_valid)
rows = pb.rows
K = 32
R = flat_o.shape[0]


def make_step(gather_mode):
    def step(node, t_best, face, o, d, iv):
        idx = jnp.clip(node, 0, None)
        if gather_mode == "idx_barrier":
            idx = jax.lax.optimization_barrier(idx)
        if gather_mode == "take":
            r = jnp.take(rows, idx, axis=0)
        else:
            r = rows[idx]
        if gather_mode in ("row_barrier", "both"):
            r = jax.lax.optimization_barrier(r)
        is_leaf = r[:, 14] > 0.5
        tn1 = (r[:, 0:3] - o) * iv
        tn2 = (r[:, 3:6] - o) * iv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        nonempty = jnp.all(r[:, 0:3] <= r[:, 3:6], axis=-1)
        hit_box = (tfar >= tnear) & (tnear < t_best) & (tfar > 0.0) & nonempty
        hit, t = _mt(o, d, r[:, 0:3], r[:, 3:6], r[:, 6:9], t_best)
        live = node >= 0
        take = live & is_leaf & hit
        t_best = jnp.where(take, t, t_best)
        face = jnp.where(take, ftoi(r[:, 12]), face)
        nxt_i = jnp.where(hit_box, ftoi(r[:, 12]), ftoi(r[:, 13]))
        nxt = jnp.where(is_leaf, ftoi(r[:, 13]), nxt_i)
        node = jnp.where(live, nxt, node)
        return node, t_best, face
    return step


def bench(name, mode):
    step = make_step(mode)

    @jax.jit
    def kfix(o, d):
        safe = jnp.where(jnp.abs(d) > 1e-12, d,
                         jnp.where(d >= 0, 1e-12, -1e-12))
        iv = 1.0 / safe
        node = jnp.zeros((o.shape[0],), jnp.int32)
        tb = jnp.full((o.shape[0],), 1e30)
        fc = jnp.full((o.shape[0],), -1, jnp.int32)

        def body(_, s):
            return step(s[0], s[1], s[2], o, d, iv)

        return jax.lax.fori_loop(0, K, body, (node, tb, fc))

    out = kfix(flat_o, flat_d)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = kfix(flat_o, flat_d)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{name}: {dt*1000:.1f}ms -> {R*K/dt/1e9:.2f} Grow-visits/s",
          flush=True)
    return out


o_a = bench("A plain", "plain")
o_b = bench("B row_barrier", "row_barrier")
o_c = bench("C idx_barrier", "idx_barrier")
o_d = bench("D take", "take")
o_e = bench("E both", "both")
import numpy as np
for nm, o in (("B", o_b), ("C", o_c), ("D", o_d), ("E", o_e)):
    same = (np.asarray(o[0]) == np.asarray(o_a[0])).all()
    print(f"{nm} matches A:", bool(same), flush=True)
