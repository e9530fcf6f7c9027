"""Scaling-efficiency proxy on one chip (round-2 VERDICT weak #9): the
real >=0.9 multi-chip target can't be measured without a pod slice, so
this quantifies the two things that determine it and commits them as
an artifact:

  1. WORK BALANCE of the row-sharded render: per-shard live
     path-segment counts per bounce on the bench workload. The render
     has NO cross-shard communication (each shard owns its pixel rows
     end-to-end), so the only scaling loss in the forward pass is the
     slowest shard — balance = max/mean work.
  2. COMM VOLUME of the training step: the gradient all-reduce is the
     only collective (AD-inserted psum over scene-parameter grads).
     Volume is a static function of the parameter pytree; the ring
     all-reduce cost model 2*(N-1)/N * bytes / ici_bw bounds its
     wall-clock share.

Writes artifacts/scaling_proxy.json. Runs on CPU (the alive-mask
distribution is backend-independent; uses the bvh finder).
Env: SP_SIZE (512), SP_SHARDS (8).
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"   # ambient env says axon; force CPU
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import numpy as np
import jax
import jax.numpy as jnp

from raypt import RenderConfig
from raypt.accel import build
from raypt.core.math3d import lerp, normalize, reflect
from raypt.render.integrator import (camera_rays_for_ids, make_finder,
                                     pixel_id_grid)
from raypt.render.shading import build_shade_tables, recompute_hit_packed
from raypt.rng import (bounce_uniforms, frame_key, random_point_on_sphere,
                       sample_jitter, sample_key)
from raypt.scenes import stanford_bunny

SIZE = int(os.environ.get("SP_SIZE", 512))
SHARDS = int(os.environ.get("SP_SHARDS", 8))
BOUNCES = 4
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")

b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
bvh = build(scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                   num_bounces=BOUNCES, backend="bvh",
                   russian_roulette=True)
finder = make_finder(scene, cfg, bvh)
key = jax.random.key(0)
skey = sample_key(frame_key(key, 0), 0)

# row-sharded pixel grid: shard s owns rows [s*H/S, (s+1)*H/S) — the
# same row sharding dist/sharding.py uses
ids = pixel_id_grid(cfg)


@jax.jit
def capture(skey):
    jitter = sample_jitter(skey, ids)
    ro, rd = camera_rays_for_ids(scene, cfg, ids, jitter)
    rd = normalize(rd)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    pix = ids.reshape(-1)
    tables = build_shade_tables(scene)
    alive0 = jnp.ones(ro.shape[0], bool)

    def bounce(carry, bi):
        ro, rd, alive = carry
        hids = finder(scene, ro, rd, active=alive)
        hit, mp = recompute_hit_packed(tables, ro, rd, hids)
        hit_now = alive & hit.valid
        u = bounce_uniforms(skey, bi, pix)
        do_spec = (u[..., 0] < mp[..., 10]).astype(jnp.float32)[..., None]
        sph = random_point_on_sphere(u[..., 1], u[..., 2])
        ddir = normalize(hit.normal + sph)
        sdir = normalize(reflect(rd, hit.normal))
        sdir = normalize(lerp(sdir, ddir, (mp[..., 9] ** 2)[..., None]))
        ndir = normalize(lerp(ddir, sdir, do_spec))
        ro2 = jnp.where(hit_now[..., None],
                        hit.position + hit.normal * cfg.normal_offset, ro)
        rd2 = jnp.where(hit_now[..., None], ndir, rd)
        p = jnp.max(jnp.where(hit_now[..., None], mp[..., 0:3], 1.0),
                    axis=-1)
        alive2 = hit_now & (u[..., 3] <= p)
        return (ro2, rd2, alive2), alive

    _, alive_b = jax.lax.scan(bounce, (ro, rd, alive0),
                              jnp.arange(BOUNCES, dtype=jnp.int32))
    return alive_b


alive_b = np.asarray(jax.block_until_ready(capture(skey)))  # (B, H*W)
alive_rows = alive_b.reshape(BOUNCES, SIZE, SIZE).sum(axis=2)  # (B, H)
# contiguous slabs (shard s = rows [s*H/S, (s+1)*H/S)) vs the strided
# assignment dist/sharding.py now uses (shard s = rows s, s+S, ...)
work_contig = alive_rows.reshape(BOUNCES, SHARDS, SIZE // SHARDS).sum(
    axis=2)
work_strided = alive_rows.reshape(BOUNCES, SIZE // SHARDS, SHARDS).sum(
    axis=1).astype(float)                          # (B, SHARDS)

per_bounce = []
for bi in range(BOUNCES):
    w = work_contig[bi].astype(float)
    ws = work_strided[bi]
    per_bounce.append({
        "alive_total": int(w.sum()),
        "shard_work_contiguous": [int(x) for x in w],
        "balance_contiguous": float(w.max() / max(w.mean(), 1e-9)),
        "balance_strided": float(ws.max() / max(ws.mean(), 1e-9)),
    })
total = work_contig.sum(axis=0).astype(float)
balance_contig = float(total.max() / total.mean())
total_s = work_strided.sum(axis=0)
balance = float(total_s.max() / total_s.mean())

# gradient all-reduce volume (the training step's only collective)
from raypt.diff.params import SceneParams
p = SceneParams.init(scene)
grad_bytes = sum(int(np.prod(v.shape)) * 4
                 for v in jax.tree_util.tree_leaves(p))
ICI_BW = 45e9   # v5e per-link ~45 GB/s (one direction, public spec)
N = SHARDS
allreduce_s = 2 * (N - 1) / N * grad_bytes / ICI_BW
step_s = 0.76   # measured bench fwd+bwd step (BENCH, this round)

report = {
    "workload": f"framed bunny {SIZE}^2 x {BOUNCES} bounces, "
                f"{SHARDS} row shards",
    "per_bounce": per_bounce,
    "total_balance_contiguous": balance_contig,
    "total_balance_strided": balance,
    "forward_scaling_efficiency_bound": float(1.0 / balance),
    "grad_allreduce_bytes": grad_bytes,
    "grad_allreduce_est_seconds_at_45GBps_ring": allreduce_s,
    "bench_step_seconds": step_s,
    "comm_fraction_of_step": allreduce_s / step_s,
    "note": "render is collective-free (each shard owns its rows "
            "end-to-end); training adds ONE grad psum per step. "
            "Efficiency bound = 1/balance x (1 - comm fraction "
            "overlap-free worst case).",
}
os.makedirs(OUT, exist_ok=True)
with open(os.path.join(OUT, "scaling_proxy.json"), "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps({k: v for k, v in report.items() if k != "per_bounce"},
                 indent=1))
for bi, pb in enumerate(per_bounce):
    print(f"bounce {bi}: balance contig={pb['balance_contiguous']:.3f} "
          f"strided={pb['balance_strided']:.3f} "
          f"work={pb['shard_work_contiguous']}")
