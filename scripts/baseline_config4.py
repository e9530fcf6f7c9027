"""BASELINE config #4 at stated scale (round-3 VERDICT item 6):
multi-mesh glTF scene + albedo textures + HDR equirect environment,
1024^2, 8 bounces, russian roulette — run on the chip through the
flagship onehot backend (+ the dielectric glass lobe).

Writes artifacts/config4_render.png + artifacts/config4_meta.json.
Reproduce via CLI:
  python -m raypt.app.cli render --scene config4 --size 1024 \
      --bounces 8 --spp <N> --backend onehot -o out.png
"""
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt.accel.ctree import build_onehot
from raypt.accel.host_bvh import build_sah
from raypt.accel.lbvh import build as lbvh_build
from raypt.core.types import RenderConfig
from raypt.io import write_png
from raypt.render import accumulate, render_frame, to_display
from raypt.scenes.config4 import config4_scene

SIZE = int(os.environ.get("C4_SIZE", 1024))
FRAMES = int(os.environ.get("C4_FRAMES", 16))
SPP_PER_FRAME = int(os.environ.get("C4_SPP", 4))
BACKEND = os.environ.get("C4_BACKEND", "onehot")
LEAF = int(os.environ.get("C4_LEAF", 128))

b = config4_scene()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=SPP_PER_FRAME,
                   num_bounces=8, backend=BACKEND, russian_roulette=True,
                   enable_refraction=True)
print(f"config4: {scene.mesh.num_faces} faces, {SIZE}^2, 8 bounces, "
      f"{FRAMES}x{SPP_PER_FRAME} spp, backend={BACKEND}", flush=True)

bvh = build_sah(scene.mesh)
if bvh is None:
    bvh = lbvh_build(scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid)
if BACKEND == "onehot":
    accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid, leaf=LEAF, with_woop=True)
else:
    accel = bvh
jax.block_until_ready(jax.tree.leaves(accel)[0])

key = jax.random.key(7)
acc = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
t0 = time.time()
img = render_frame(scene, cfg, key, frame_index=0, bvh=accel)
jax.block_until_ready(img)
compile_s = time.time() - t0
acc = accumulate(acc, img, 0)

frame_times = []
for fi in range(1, FRAMES):
    t0 = time.time()
    img = render_frame(scene, cfg, key, frame_index=fi, bvh=accel)
    acc = accumulate(acc, img, fi)
    jax.block_until_ready(acc)
    frame_times.append(time.time() - t0)

os.makedirs("artifacts", exist_ok=True)
write_png("artifacts/config4_render.png", to_display(acc, cfg.exposure))
steady = min(frame_times) if frame_times else compile_s
segs = SIZE * SIZE * SPP_PER_FRAME * 8
meta = {
    "config": "BASELINE configs[3]: multi-mesh glTF + textures + HDR env, "
              f"{SIZE}^2, 8 bounces, russian roulette",
    "backend": BACKEND,
    "device": str(jax.devices()[0]),
    "faces": int(scene.mesh.num_faces),
    "frames": FRAMES, "spp_per_frame": SPP_PER_FRAME,
    "total_spp": FRAMES * SPP_PER_FRAME,
    "first_frame_seconds": round(compile_s, 2),
    "steady_frame_seconds": round(steady, 3),
    "frame_times": [round(t, 3) for t in frame_times],
    "mray_segments_per_s_upper": round(segs / steady / 1e6, 2),
    "refraction": True,
    "mean_radiance": float(acc.mean()),
}
with open("artifacts/config4_meta.json", "w") as f:
    json.dump(meta, f, indent=1)
print(json.dumps(meta, indent=1), flush=True)
