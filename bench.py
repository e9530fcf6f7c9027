#!/usr/bin/env python
"""Benchmark: Mrays/sec/chip fwd+bwd on the north-star workload
(Stanford bunny, 1024x1024, 4 bounces — BASELINE.json "metric").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

Ray accounting: value counts *path segments* traced per second through
the fwd+bwd step — H*W*spp rays per sample pass, each scanned over
`bounces` segments (the reference's upper-bound accounting, SURVEY §6
"implied per-frame ray work"), doubled for the backward pass. The
actually-traced segment rate is lower (rays die to misses/roulette);
extra.segments_upper_bound records the accounting basis explicitly.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
recorded baseline is this framework's own pure-jnp XLA path at round 1
(BASELINE_INTERNAL_MRAYS below) — later rounds must beat it. NOTE
(round 2): round 1's scene had two bugs that made the workload
trivially easy — the bunny was buried under the ground quad (missing
Assimp -90 degree X root-rotation parity, AssimpLoader.cpp:46-48) and
outside the camera frustum entirely, so the "bunny" bench traced only
a flat quad + env. Round 2 fixes the transform and frames the bunny
(~33% of pixels). The 13.5 reference point is kept UNCHANGED, so
vs_baseline now compares a real-bunny workload against an
empty-frame baseline — it understates round-2 speedups.
"""
import json
import os
import sys
import time

# Round-1 recorded single-chip fwd+bwd throughput (TPU v5e, binary
# packed-BVH backend + gather-minimal shading). FIXED reference point:
# later rounds report vs_baseline against this number.
BASELINE_INTERNAL_MRAYS = 13.5

WIDTH = int(os.environ.get("BENCH_WIDTH", 1024))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1024))
BOUNCES = int(os.environ.get("BENCH_BOUNCES", 4))
SPP = int(os.environ.get("BENCH_SPP", 1))
REPS = int(os.environ.get("BENCH_REPS", 3))
# backend: "onehot" = one-hot MXU Pallas walk + dense cluster
# intersection (the flagship path); "bvh" = XLA packed skip-link walk
BACKEND = os.environ.get("BENCH_BACKEND", "onehot")
# traversal-layout overrides for backend="bvh"
LEAF_TRIS = int(os.environ.get("BENCH_LEAF_TRIS", 1))
LOOKAHEAD = bool(int(os.environ.get("BENCH_LOOKAHEAD", 0)))


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the fwd+bwd program takes minutes to
    # compile via the remote toolchain; cache hits make re-runs instant
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/raypt_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from raypt.accel import build
    from raypt.accel.host_bvh import build_sah
    from raypt.core.types import RenderConfig
    from raypt.render.integrator import make_finder, render_sample
    from raypt.rng import frame_key, sample_key
    from raypt.scenes import stanford_bunny

    builder = stanford_bunny()
    builder.camera.viewport_width = WIDTH
    builder.camera.viewport_height = HEIGHT
    scene = builder.freeze()
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, samples_per_pixel=SPP,
                       num_bounces=BOUNCES, backend=BACKEND,
                       russian_roulette=True,
                       leaf_tris=LEAF_TRIS, node_lookahead=LOOKAHEAD)
    bvh = build_sah(scene.mesh)   # native SAH (better tree); None -> LBVH
    if bvh is None:
        bvh = build(scene.mesh.positions, scene.mesh.faces,
                    scene.mesh.face_valid)
    if BACKEND == "onehot":
        from raypt.accel.ctree import build_onehot
        bvh = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                           scene.mesh.face_valid, leaf=64)
        jax.block_until_ready(bvh[1])
    else:
        jax.block_until_ready(bvh.bmin)
    key = jax.random.key(0)

    @jax.jit
    def fwd_bwd(verts, albedo, k):
        def loss(v, a):
            s = scene.replace(
                mesh=scene.mesh.replace(positions=v),
                materials=scene.materials.replace(albedo=a))
            finder = make_finder(s, cfg, bvh)
            img = render_sample(s, cfg, sample_key(frame_key(k, 0), 0),
                                finder)
            return jnp.mean(img)
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(verts, albedo)
        return l, grads

    v0 = scene.mesh.positions
    a0 = scene.materials.albedo

    # compile
    t0 = time.time()
    out = fwd_bwd(v0, a0, key)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    times = []
    for i in range(REPS):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        out = fwd_bwd(v0, a0, k)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    dt = min(times)

    # fwd+bwd path segments per step (upper bound, reference accounting)
    segments = WIDTH * HEIGHT * SPP * BOUNCES * 2
    mrays = segments / dt / 1e6
    result = {
        "metric": "bunny_1024_fwd_bwd",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_INTERNAL_MRAYS, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "step_seconds": round(dt, 4),
            "compile_seconds": round(compile_s, 1),
            "cache_hit": compile_s < 10.0,
            "segments_upper_bound": segments,
            "accounting": "H*W*spp*bounces upper-bound segments, x2 bwd",
            "width": WIDTH, "height": HEIGHT,
            "bounces": BOUNCES, "spp": SPP,
            "loss": float(out[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
