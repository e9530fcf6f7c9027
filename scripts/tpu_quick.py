import sys, time, jax, numpy as np
from raypt import RenderConfig
from raypt.scenes import stanford_bunny
from raypt.accel import build, pack
from raypt.accel.packed import pack_cherries
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key

tile = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
unroll = int(sys.argv[2]) if len(sys.argv) > 2 else 8
leaf_tris = int(sys.argv[3]) if len(sys.argv) > 3 else 1
b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
bvh = jax.jit(build)(scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
pb = jax.jit(pack_cherries if leaf_tris >= 2 else pack)(bvh, scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
jax.block_until_ready(pb.rows)
print("packed ready", flush=True)
key = jax.random.key(0)
cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1, num_bounces=4,
                   backend="bvh", traversal_tile=tile, traversal_unroll=unroll,
                   leaf_tris=leaf_tris)
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
print(f"tile={tile} unroll={unroll} leaf_tris={leaf_tris}: compile {c:.0f}s run {dt*1000:.0f}ms -> {segs/dt/1e6:.1f} Mray-seg/s mean={float(img.mean()):.4f}", flush=True)
