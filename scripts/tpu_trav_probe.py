"""Traversal-only roofline probe on the bench workload (bunny 1024^2).

Measures:
  (a) pure per-step cost of the packed walk at several wavefront sizes
      (fixed fori_loop of K steps, no condition) -> gather/VPU floor;
  (b) end-to-end primary-wavefront closest-hit time per layout x mode;
  (c) actual node-visit statistics (mean/p99/max) for the primary
      wavefront, so (a) x (c) gives the speed-of-light estimate.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.packed import (pack, pack_cherries, pack_lookahead,
                                pack_quads, _make_step)
from raypt.accel.traverse import find_closest_packed
from raypt.core.math3d import normalize
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = build_sah(scene.mesh)
cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1,
                   num_bounces=4, backend="bvh")
ids_grid, _ = _block_order(pixel_id_grid(cfg))
jit05 = jnp.full((1024, 1024, 2), 0.5)
ro, rd = camera_rays_for_ids(scene, cfg, ids_grid, jit05)
rd = normalize(rd)
flat_o = ro.reshape(-1, 3)
flat_d = rd.reshape(-1, 3)
R = flat_o.shape[0]
print(f"rays={R}", flush=True)


def timeit(name, f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.2f}ms", flush=True)
    return out, min(ts)


tables = {
    "p1": pack(bvh, scene.mesh.positions, scene.mesh.faces,
               scene.mesh.face_valid),
    "la": pack_lookahead(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid),
    "q4la": pack_quads(bvh, scene.mesh.positions, scene.mesh.faces,
                       scene.mesh.face_valid, lookahead=True),
}

# (a) fixed-step cost: K steps over a fixed wavefront, no condition
K = 32
for name, pb in tables.items():
    step = _make_step(pb)

    def kfix(o, d, n_rays):
        o = o[:n_rays]
        d = d[:n_rays]
        safe = jnp.where(jnp.abs(d) > 1e-12, d,
                         jnp.where(d >= 0, 1e-12, -1e-12))
        iv = 1.0 / safe
        node = jnp.zeros((n_rays,), jnp.int32)
        tb = jnp.full((n_rays,), 1e30)
        fc = jnp.full((n_rays,), -1, jnp.int32)

        def body(_, s):
            return step(s[0], s[1], s[2], o, d, iv)

        return jax.lax.fori_loop(0, K, body, (node, tb, fc))

    for n_rays in (1 << 14, 1 << 17, 1 << 20):
        f = jax.jit(lambda o, d, n=n_rays: kfix(o, d, n))
        _, dt = timeit(f"fixed {name} {K}steps R={n_rays}", f, flat_o, flat_d)
        per = dt / K / n_rays
        print(f"   -> {per*1e12:.1f} ps/ray-step, "
              f"{n_rays*K/dt/1e9:.2f} Grow-visits/s", flush=True)

# (c) visit counts for the primary wavefront (p1 layout)
step = _make_step(tables["p1"])


@jax.jit
def visits(o, d):
    safe = jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d >= 0, 1e-12, -1e-12))
    iv = 1.0 / safe
    node = jnp.zeros((o.shape[0],), jnp.int32)
    tb = jnp.full((o.shape[0],), 1e30)
    fc = jnp.full((o.shape[0],), -1, jnp.int32)
    cnt = jnp.zeros((o.shape[0],), jnp.int32)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, tb, fc, cnt = s
        cnt = cnt + (node >= 0).astype(jnp.int32)
        node, tb, fc = step(node, tb, fc, o, d, iv)
        return node, tb, fc, cnt

    node, tb, fc, cnt = jax.lax.while_loop(cond, body, (node, tb, fc, cnt))
    return cnt


cnt = np.asarray(visits(flat_o, flat_d))
print(f"visits p1: mean={cnt.mean():.1f} p50={np.percentile(cnt,50):.0f} "
      f"p99={np.percentile(cnt,99):.0f} max={cnt.max()}", flush=True)

# (b) end-to-end closest-hit per config
active = jnp.ones((R,), bool)
for name, pb in tables.items():
    for mode, tile in (("tiled", 8192), ("compact", 0)):
        f = jax.jit(lambda o, d, pb=pb, mode=mode, tile=tile:
                    find_closest_packed(scene, pb, o, d, tile=tile,
                                        unroll=2, mode=mode))
        timeit(f"find {name} {mode}", f, ro, rd)
