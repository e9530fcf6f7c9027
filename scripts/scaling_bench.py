"""Weak/strong scaling efficiency on the virtual CPU mesh (stands in
for multi-chip until a pod slice is available; the code path is the
same shard_map program).

NOTE: virtual CPU devices timeshare the same physical cores, so the
efficiency numbers here validate MECHANISM (the program runs and frees
each shard independently), not hardware scaling - that needs a real
pod slice."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
import time
import jax
from raypt.core.types import RenderConfig
from raypt.dist.sharding import default_mesh, render_frame_sharded
from raypt.scenes import cornell_box
from raypt.accel import build

b = cornell_box()
b.camera.viewport_width = b.camera.viewport_height = 128
scene = b.freeze()
cfg = RenderConfig(width=128, height=128, samples_per_pixel=2, num_bounces=3,
                   backend="dense")
key = jax.random.key(0)
base = None
for n in (1, 2, 4, 8):
    mesh = default_mesh(n)
    img = render_frame_sharded(scene, cfg, key, mesh)
    jax.block_until_ready(img)
    ts = []
    for i in range(3):
        t0 = time.time()
        img = render_frame_sharded(scene, cfg, jax.random.fold_in(key, i), mesh)
        jax.block_until_ready(img)
        ts.append(time.time() - t0)
    dt = min(ts)
    rate = 128 * 128 * 2 * 3 / dt / 1e6
    if base is None:
        base = rate
    eff = rate / (base * n)
    print(f"devices={n}: {dt*1000:.0f}ms {rate:.2f} Mray-seg/s "
          f"scaling-efficiency={eff:.2f}", flush=True)
