import time, jax, numpy as np
from raypt import RenderConfig
from raypt.scenes import stanford_bunny
from raypt.accel import build, pack
from raypt.accel.host_bvh import build_sah
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
t0 = time.time()
sah = build_sah(scene.mesh)
print(f"sah host build {time.time()-t0:.2f}s", flush=True)
pb = pack(sah, scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
jax.block_until_ready(pb.rows)
key = jax.random.key(0)
for tile in (1024, 512):
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1, num_bounces=4,
                       backend="bvh", traversal_tile=tile)
    @jax.jit
    def fwd(k):
        finder = make_finder(scene, cfg, pb)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0), finder)
    t0 = time.time(); img = fwd(key); jax.block_until_ready(img); c = time.time()-t0
    ts = []
    for i in range(3):
        t0 = time.time(); img = fwd(jax.random.fold_in(key, i)); jax.block_until_ready(img)
        ts.append(time.time()-t0)
    dt = min(ts); segs = 1024*1024*4
    print(f"SAH tile={tile}: compile {c:.0f}s run {dt*1000:.0f}ms -> {segs/dt/1e6:.1f} Mray-seg/s mean={float(img.mean()):.4f}", flush=True)
