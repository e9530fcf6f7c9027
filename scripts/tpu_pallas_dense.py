import time, jax, numpy as np, jax.numpy as jnp
from raypt import RenderConfig
from raypt.scenes import cornell_box
from raypt.accel import build, pack, build_woop
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key

b = cornell_box()
b.camera.viewport_width = b.camera.viewport_height = 1024
scene = b.freeze()
print("faces:", scene.mesh.num_faces, flush=True)
key = jax.random.key(0)
for backend in ("pallas", "dense", "bvh"):
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1, num_bounces=4,
                       backend=backend)
    @jax.jit
    def fwd(k):
        finder = make_finder(scene, cfg, None)
        return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0), finder)
    try:
        t0 = time.time(); img = fwd(key); jax.block_until_ready(img); c = time.time()-t0
        ts = []
        for i in range(3):
            t0 = time.time(); img = fwd(jax.random.fold_in(key, i)); jax.block_until_ready(img)
            ts.append(time.time()-t0)
        dt = min(ts); segs = 1024*1024*4
        print(f"{backend}: compile {c:.0f}s run {dt*1000:.0f}ms -> {segs/dt/1e6:.1f} Mray-seg/s mean={float(img.mean()):.4f}", flush=True)
    except Exception as e:
        print(f"{backend}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
