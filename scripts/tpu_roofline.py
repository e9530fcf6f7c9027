"""Speed-of-light accounting for the flagship onehot path on the bench
workload (framed bunny, 1024^2, 4 bounces) — the measured basis for
ARCHITECTURE.md's roofline section.

Stage 1 measures device primitive rates on THIS chip:
  - MXU bf16 matmul (the one-hot fetch's currency), at the kernel's
    actual operand shape;
  - VPU f32 fused elementwise rate (phase B's currency);
  - gather-unit row rate (the alternative design's currency);
Stage 2 captures the four bounce wavefronts of one real render, then
per bounce:
  - per-ray top-tree visit counts (mean) and per-walk-tile max
    (the MXU walk pays the TILE MAX, a per-ray engine would pay the
    mean — both are reported);
  - per-intersect-tile union counts (phase B pays the union);
Stage 3 times the phases (walk / finder / fwd / fwd+bwd) and derives:
  floor(walk)  = sum_tiles tilemax_steps * per-step matmul flop / MXU
  floor(phaseB)= sum_tiles union * LEAF * TILE * 42 flop / VPU
and reports measured/floor per phase. Writes artifacts/roofline.json.

Env: RL_SIZE (1024), RL_LEAF (64), RL_TILE (0 = kernel default).
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.host_bvh import build_sah
from raypt.accel.ctree import build_onehot
from raypt.accel.traverse import find_closest_onehot
from raypt.core.math3d import BIG, lerp, normalize, reflect
from raypt.kernels.onehot_walk import (RAY_TILE, pallas_topwalk,
                                       prep_radix_table_t)
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid, render_sample,
                                     make_finder)
from raypt.render.shading import build_shade_tables, recompute_hit_packed
from raypt.rng import (bounce_uniforms, frame_key, random_point_on_sphere,
                       sample_jitter, sample_key)
from raypt.scenes import stanford_bunny

SIZE = int(os.environ.get("RL_SIZE", 1024))
LEAF = int(os.environ.get("RL_LEAF", 64))
TILE_B = int(os.environ.get("RL_TILE", 0)) or 256
BOUNCES = 4
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")
os.makedirs(OUT, exist_ok=True)
report = {"size": SIZE, "leaf": LEAF, "tile_b": TILE_B,
          "device": str(jax.devices()[0])}


def steady(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


# ---------------- stage 1: primitive rates ----------------
print("== primitive rates ==", flush=True)
# MXU at the walk's shape class: (M, 256) x (256, 1024) bf16 -> f32,
# chained to stay compute-bound
M = 512


@jax.jit
def mxu_chain(a, b):
    acc = jnp.zeros((M, 1024), jnp.float32)
    for _ in range(64):
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b = (acc[:256] * 1e-6).astype(jnp.bfloat16)
    return acc


a = jnp.ones((M, 256), jnp.bfloat16)
b = jnp.ones((256, 1024), jnp.bfloat16)
dt = steady(mxu_chain, a, b)
mxu_flops = 64 * 2 * M * 256 * 1024 / dt
report["mxu_bf16_flops"] = mxu_flops
print(f"MXU bf16 ({M}x256x1024 chain): {mxu_flops/1e12:.1f} Tflop/s",
      flush=True)

# VPU f32: chained fma on a VMEM-resident block
V = (512, 1024)


@jax.jit
def vpu_chain(x):
    y = x
    for _ in range(256):
        y = y * 1.0000001 + x
    return y


x = jnp.ones(V, jnp.float32)
dt = steady(vpu_chain, x)
vpu_flops = 256 * 2 * V[0] * V[1] / dt
report["vpu_f32_flops"] = vpu_flops
print(f"VPU f32 fma chain: {vpu_flops/1e12:.2f} Tflop/s", flush=True)

# gather rows/s at bunny scale (the design alternative)
N, W, R_G = 1 << 17, 16, 1 << 20
table_g = jax.random.normal(jax.random.key(0), (N, W), jnp.float32)
idx = jax.random.randint(jax.random.key(2), (R_G,), 0, N, jnp.int32)
gat = jax.jit(lambda t, i: t[i].sum(axis=-1))
dt = steady(gat, table_g, idx)
report["gather_rows_per_s"] = R_G / dt
print(f"gather: {R_G/dt/1e9:.3f} Grows/s", flush=True)

# ---------------- stage 2: workload shape ----------------
print("== workload ==", flush=True)
b_ = stanford_bunny()
b_.camera.viewport_width = b_.camera.viewport_height = SIZE
scene = b_.freeze()
bvh = build_sah(scene.mesh)
accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid, leaf=LEAF)
clusters, table = accel
NT = int(table.shape[0])
C_TOTAL = clusters.num_clusters
NW = -(-C_TOTAL // 32)
NT_PAD = int(prep_radix_table_t(table).shape[0] // 16 * 256)
cfg = RenderConfig(width=SIZE, height=SIZE, samples_per_pixel=1,
                   num_bounces=BOUNCES, backend="onehot",
                   russian_roulette=True)
report.update(top_rows=NT, clusters=C_TOTAL)

key = jax.random.key(0)
skey = sample_key(frame_key(key, 0), 0)
ids_grid, _ = _block_order(pixel_id_grid(cfg))


@jax.jit
def capture(skey):
    """One real render pass, emitting each bounce's wavefront."""
    jitter = sample_jitter(skey, ids_grid)
    ro, rd = camera_rays_for_ids(scene, cfg, ids_grid, jitter)
    rd = normalize(rd)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    pix = ids_grid.reshape(-1)
    tables = build_shade_tables(scene)
    alive0 = jnp.ones(ro.shape[0], bool)

    def bounce(carry, bi):
        ro, rd, alive = carry
        ids = find_closest_onehot(scene, accel, ro, rd, active=alive)
        hit, mp = recompute_hit_packed(tables, ro, rd, ids)
        hit_now = alive & hit.valid
        u = bounce_uniforms(skey, bi, pix)
        do_spec = (u[..., 0] < mp[..., 10]).astype(jnp.float32)[..., None]
        sph = random_point_on_sphere(u[..., 1], u[..., 2])
        ddir = normalize(hit.normal + sph)
        sdir = normalize(reflect(rd, hit.normal))
        sdir = normalize(lerp(sdir, ddir, (mp[..., 9] ** 2)[..., None]))
        ndir = normalize(lerp(ddir, sdir, do_spec))
        nro = hit.position + hit.normal * cfg.normal_offset
        ro2 = jnp.where(hit_now[..., None], nro, ro)
        rd2 = jnp.where(hit_now[..., None], ndir, rd)
        alive2 = hit_now & (u[..., 3] <= 0.8)
        return (ro2, rd2, alive2), (ro, rd, alive)

    _, wf = jax.lax.scan(bounce, (ro, rd, alive0),
                         jnp.arange(BOUNCES, dtype=jnp.int32))
    return wf


wf_ro, wf_rd, wf_alive = jax.block_until_ready(capture(skey))


def walk_visits(ro, rd, alive):
    """Per-ray top-tree visit counts via a counting jnp walk (gathers;
    slow but exact)."""
    tab = table.astype(jnp.float32)
    inv = 1.0 / jnp.where(jnp.abs(rd) > 1e-12, rd,
                          jnp.where(rd >= 0, 1e-12, -1e-12))

    def dec(hi, lo):
        return (jnp.round(hi) * 128 + jnp.round(lo)).astype(jnp.int32) - 1

    def cond(st):
        node, _ = st
        return jnp.any(node >= 0)

    def body(st):
        node, cnt = st
        live = node >= 0
        r = tab[jnp.clip(node, 0, None)]
        ok = (r[:, 13] > 0.5) & live
        tn1 = (r[:, 0:3] - ro) * inv
        tn2 = (r[:, 3:6] - ro) * inv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        ne = jnp.all(r[:, 0:3] <= r[:, 3:6], axis=-1)
        hit = (tfar >= tnear) & (tfar > 0) & ne & ok
        is_leaf = r[:, 12] > 0.5
        nxt = jnp.where(hit & ~is_leaf, dec(r[:, 6], r[:, 7]),
                        dec(r[:, 8], r[:, 9]))
        return jnp.where(live, nxt, node), cnt + live.astype(jnp.int32)

    node0 = jnp.where(alive, 0, -1)
    _, cnt = jax.lax.while_loop(cond, body,
                                (node0, jnp.zeros(ro.shape[0], jnp.int32)))
    return cnt


visits_f = jax.jit(walk_visits)
per_bounce = []
for bi in range(BOUNCES):
    ro_b, rd_b, al_b = wf_ro[bi], wf_rd[bi], wf_alive[bi]
    cnt = jax.block_until_ready(visits_f(ro_b, rd_b, al_b))
    cnt = np.asarray(cnt)
    al = np.asarray(al_b)
    tiles_w = cnt.reshape(-1, RAY_TILE)
    tmax = tiles_w.max(axis=1)
    from raypt.accel.clusters import tile_union_counts
    mask = jax.block_until_ready(pallas_topwalk(
        table, ro_b, rd_b, jnp.full((ro_b.shape[0],), BIG), al_b, NW))
    _, ucnt = tile_union_counts(mask, TILE_B, C_TOTAL)
    ucnt = np.asarray(ucnt)
    per_bounce.append({
        "alive": int(al.sum()),
        "visits_mean_alive": float(cnt[al].mean()) if al.any() else 0.0,
        "walk_tile_max_sum": int(tmax.sum()),
        "union_sum": int(ucnt.sum()),
        "union_mean": float(ucnt.mean()),
    })
    print(f"bounce {bi}: {per_bounce[-1]}", flush=True)
report["per_bounce"] = per_bounce

# ---------------- stage 3: phase times + floors ----------------
print("== phases ==", flush=True)
R = SIZE * SIZE
ro0, rd0, al0 = wf_ro[0], wf_rd[0], wf_alive[0]
t_inf = jnp.full((R,), BIG)
dt_walk = steady(lambda: pallas_topwalk(table, ro0, rd0, t_inf, al0, NW))
finder = jax.jit(lambda o, d: find_closest_onehot(scene, accel, o, d))
dt_finder = steady(lambda: finder(ro0, rd0).t)


@jax.jit
def fwd(k):
    f = make_finder(scene, cfg, accel)
    return render_sample(scene, cfg, sample_key(frame_key(k, 0), 0), f)


dt_fwd = steady(fwd, key)


@jax.jit
def fwd_bwd(verts, k):
    def loss(v):
        s = scene.replace(mesh=scene.mesh.replace(positions=v))
        f = make_finder(s, cfg, accel)
        return jnp.mean(render_sample(s, cfg,
                                      sample_key(frame_key(k, 0), 0), f))
    return jax.value_and_grad(loss)(verts)


dt_fwdbwd = steady(fwd_bwd, scene.mesh.positions, key)

# floors from stage-1 rates + stage-2 shape
step_flop = 2 * NT_PAD * 16 * RAY_TILE  # one-hot fetch matmul per step
walk_floor_b0 = per_bounce[0]["walk_tile_max_sum"] * step_flop / mxu_flops
walk_floor_all = sum(pb["walk_tile_max_sum"] for pb in per_bounce) \
    * step_flop / mxu_flops
isect_flop_per_entry = 42 * LEAF * TILE_B
isect_floor_all = sum(pb["union_sum"] for pb in per_bounce) \
    * isect_flop_per_entry / vpu_flops
# the per-ray-exact alternative: every visit is one 64 B gather row
gather_alt = sum(pb["visits_mean_alive"] * pb["alive"]
                 for pb in per_bounce) / report["gather_rows_per_s"]

report.update(
    walk_ms=dt_walk * 1e3, finder_ms=dt_finder * 1e3,
    fwd_ms=dt_fwd * 1e3, fwdbwd_ms=dt_fwdbwd * 1e3,
    fwdbwd_mray_seg_s=R * BOUNCES * 2 / dt_fwdbwd / 1e6,
    walk_floor_b0_ms=walk_floor_b0 * 1e3,
    walk_floor_all_ms=walk_floor_all * 1e3,
    isect_floor_all_ms=isect_floor_all * 1e3,
    gather_design_floor_ms=gather_alt * 1e3,
    walk_b0_pct_of_floor=100 * walk_floor_b0 / dt_walk,
)
print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in report.items() if k != "per_bounce"},
                 indent=1), flush=True)
with open(os.path.join(OUT, "roofline.json"), "w") as f:
    json.dump(report, f, indent=1)
print("written artifacts/roofline.json", flush=True)
