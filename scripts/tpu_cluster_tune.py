import time, jax, numpy as np, jax.numpy as jnp
from raypt import RenderConfig
from raypt.scenes import stanford_bunny
from raypt.accel import build
from raypt.accel.clusters import build_clusters, tile_worklists
from raypt.kernels.cluster_pallas import pallas_cluster_intersect, TILE
from raypt.render.integrator import pixel_id_grid, camera_rays_for_ids, _block_order
from raypt.core.math3d import normalize, BIG

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = jax.jit(build)(scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
cfg = RenderConfig(width=1024, height=1024)
ids, _ = _block_order(pixel_id_grid(cfg))
ro, rd = camera_rays_for_ids(scene, cfg, ids, jnp.full((1024,1024,2), 0.5))
ro = ro.reshape(-1,3); rd = normalize(rd.reshape(-1,3))
t0v = jnp.full((1024*1024,), BIG)

def timeit(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    ts=[]
    for _ in range(3):
        s=time.time(); out=f(*a); jax.block_until_ready(out); ts.append(time.time()-s)
    print(f"  {name}: {min(ts)*1000:.0f}ms", flush=True)
    return out

for leaf in (64, 128):
    cl = jax.jit(lambda *a: build_clusters(*a, leaf=leaf))(
        bvh, scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
    jax.block_until_ready(cl.tri_rows)
    print(f"leaf={leaf}: clusters {int(cl.valid.sum())}/{cl.num_clusters}", flush=True)
    wlf = jax.jit(lambda o, d, t: tile_worklists(cl, o, d, t, tile=TILE, cap=192))
    wl, cnt, ovf = timeit("phase1 worklists", wlf, ro, rd, t0v)
    print(f"  counts mean {float(cnt.mean()):.1f} max {int(cnt.max())} overflow {int(ovf.sum())}", flush=True)
    rows_cm = jnp.transpose(cl.tri_rows, (0, 2, 1))
    kf = jax.jit(lambda w, c, o, d, t: pallas_cluster_intersect(w, c, rows_cm, o, d, t))
    timeit("phase2 kernel", kf, wl, cnt, ro, rd, t0v)
