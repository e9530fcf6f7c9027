"""BASELINE config #3 at stated scale: bunny path tracing, 1024^2,
4 bounces, 256 spp progressive, with differentiable materials + camera
gradients evidenced at full scale.

Produces (committed under artifacts/):
  config3_bunny_1024_256spp.png   — the converged progressive render
  config3_gradnorms.json          — loss + grad norms w.r.t. materials
                                    (albedo/specular/roughness) and the
                                    camera frame at the full workload
"""
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

import numpy as np

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel import build
from raypt.io import write_png
from raypt.render import accumulate, render_frame, to_display
from raypt.render.integrator import make_finder, render_sample
from raypt.rng import frame_key, sample_key
from raypt.scenes import stanford_bunny

SIZE = int(os.environ.get("C3_SIZE", 1024))
SPP = int(os.environ.get("C3_SPP", 256))
BOUNCES = 4
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")
os.makedirs(OUT, exist_ok=True)

builder = stanford_bunny()
builder.camera.viewport_width = builder.camera.viewport_height = SIZE
scene = builder.freeze()
cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                   num_bounces=BOUNCES, backend="onehot",
                   russian_roulette=True)
bvh = build_sah(scene.mesh) or build(scene.mesh.positions,
                                     scene.mesh.faces,
                                     scene.mesh.face_valid)
from raypt.accel.ctree import build_onehot
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid,
                     leaf=int(os.environ.get("C3_LEAF", 128)))
key = jax.random.key(0)

# --- progressive 256 spp render (SPP frames of 1 spp, accumulated) ---
acc = None
t0 = time.time()
for fi in range(SPP):
    img = render_frame(scene, cfg, key, frame_index=fi, bvh=accel)
    acc = img if acc is None else accumulate(acc, img, fi)
    if (fi + 1) % 32 == 0:
        jax.block_until_ready(acc)
        print(f"frame {fi+1}/{SPP} ({time.time()-t0:.1f}s)", flush=True)
jax.block_until_ready(acc)
render_s = time.time() - t0
png = os.path.join(OUT, "config3_bunny_1024_256spp.png")
write_png(png, to_display(acc))
print(f"wrote {png} in {render_s:.1f}s", flush=True)

# --- full-scale grads w.r.t. materials + camera ---


@jax.jit
def loss_and_grads(albedo, specular, roughness, cam_origin, cam_frame, k):
    def loss(al, sp, rg, co, cf):
        from raypt.core.types import CameraRays
        cam = scene.camera
        cam = CameraRays(origin=cam.origin + co,
                         lower_left=cam.lower_left + cf[0],
                         horizontal=cam.horizontal + cf[1],
                         vertical=cam.vertical + cf[2])
        s = scene.replace(
            camera=cam,
            materials=scene.materials.replace(albedo=al, specular=sp,
                                              roughness=rg))
        finder = make_finder(s, cfg, accel)
        img = render_sample(s, cfg, sample_key(frame_key(k, 0), 0), finder)
        return jnp.mean((img - jax.lax.stop_gradient(acc)) ** 2)

    l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
        albedo, specular, roughness, cam_origin, cam_frame)
    return l, g


t0 = time.time()
l, g = loss_and_grads(scene.materials.albedo, scene.materials.specular,
                      scene.materials.roughness, jnp.zeros(3),
                      jnp.zeros((3, 3)), key)
jax.block_until_ready((l, g))
step_s = time.time() - t0
names = ["albedo", "specular", "roughness", "camera_origin",
         "camera_frame"]
norms = {n: float(jnp.linalg.norm(gi)) for n, gi in zip(names, g)}
report = {
    "config": "BASELINE #3: bunny 1024^2, 4 bounces, 256 spp, "
              "diff materials+camera",
    "loss": float(l),
    "grad_norms": norms,
    "all_nonzero": all(v > 0 for v in norms.values()),
    "render_seconds_256spp": round(render_s, 1),
    "grad_step_seconds": round(step_s, 2),
    "device": str(jax.devices()[0]),
}
with open(os.path.join(OUT, "config3_gradnorms.json"), "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report), flush=True)
