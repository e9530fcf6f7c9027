"""On-TPU kernel gate (round-2 VERDICT item 4): run the flagship Pallas
kernels COMPILED on the real chip at two sizes and assert parity vs
their jnp oracles. Run this before any bench-default change; interpret-
mode tests cannot catch Mosaic compilation/runtime faults.

Usage:  python scripts/tpu_kernel_gate.py          # both sizes
        GATE_SIZES=256 python scripts/tpu_kernel_gate.py

Exit code 0 = both kernels compile, run, and match on hardware.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt import RenderConfig
from raypt.accel.clusters import (WORKLIST_CAP, intersect_worklist_jnp,
                                  worklists_from_masks)
from raypt.accel.ctree import build_onehot, walk_topwalk_jnp
from raypt.accel.host_bvh import build_sah
from raypt.accel.lbvh import build as lbvh_build
from raypt.core.math3d import normalize
from raypt.kernels.cluster_pallas import TILE, pallas_cluster_intersect
from raypt.kernels.onehot_walk import pallas_topwalk
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

SIZES = [int(s) for s in os.environ.get("GATE_SIZES", "256,1024").split(",")]

plat = jax.devices()[0].platform
if plat not in ("tpu", "axon"):
    print(f"SKIP: no TPU (platform={plat})")
    sys.exit(0)

b = stanford_bunny()
scene = b.freeze()
bvh = build_sah(scene.mesh)
if bvh is None:
    bvh = lbvh_build(scene.mesh.positions, scene.mesh.faces,
                     scene.mesh.face_valid)
clusters, table = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                               scene.mesh.face_valid, leaf=64)
num_words = -(-clusters.num_clusters // 32)
print(f"gate: platform={plat} table={tuple(table.shape)} "
      f"clusters={clusters.num_clusters}", flush=True)

fails = 0
for size in SIZES:
    b.camera.viewport_width = b.camera.viewport_height = size
    sc = b.freeze()
    cfg0 = RenderConfig(width=size, height=size)
    ids_grid, _ = _block_order(pixel_id_grid(cfg0))
    ro, rd = camera_rays_for_ids(sc, cfg0, ids_grid,
                                 jnp.full((size, size, 2), 0.5))
    ro = ro.reshape(-1, 3)
    rd = normalize(rd).reshape(-1, 3)
    r = ro.shape[0]
    t0 = jnp.full((r,), 1e30)
    act = jnp.ones((r,), bool)

    # --- phase A: one-hot MXU top-tree walk ---
    t = time.time()
    mask_hw = pallas_topwalk(table, ro, rd, t0, act, num_words)
    jax.block_until_ready(mask_hw)
    dt_hw = time.time() - t
    mask_ref = jax.jit(walk_topwalk_jnp, static_argnames=("num_words",))(
        table, ro, rd, t0, act, num_words=num_words)
    jax.block_until_ready(mask_ref)
    ok_a = bool(jnp.array_equal(mask_hw, mask_ref))
    print(f"[{size}] walk: compiled-on-TPU {dt_hw:.1f}s "
          f"parity={'OK' if ok_a else 'FAIL'}", flush=True)
    fails += not ok_a

    # --- phase A': fused-union walk (r4) vs mask-walk + XLA reduce ---
    from raypt.accel.clusters import tile_union_counts as _tuc
    from raypt.kernels.onehot_walk import pallas_topwalk_union
    u_hw = pallas_topwalk_union(table, ro, rd, t0, act, num_words,
                                union_tile=256)
    jax.block_until_ready(u_hw)
    u_ref, _ = _tuc(mask_ref, 256, clusters.num_clusters)
    ok_u = bool(jnp.array_equal(u_hw, u_ref))
    print(f"[{size}] fused-union walk: parity={'OK' if ok_u else 'FAIL'}",
          flush=True)
    fails += not ok_u

    # --- phase B: worklist kernel and mask kernel, cross-checked ---
    # The jnp oracle scans every worklist slot (O(cap) dense work per
    # tile); at 1024^2 that is watchdog-scale, so it anchors parity at
    # the SMALL size only and the large size cross-checks the two
    # structurally different hardware kernels against each other
    # (worklist fori_loop vs SMEM de Bruijn bit scan). max union
    # (primary wavefront) << cap, so the worklist form is exact here.
    from raypt.accel.clusters import tile_union_counts
    from raypt.kernels.cluster_pallas import pallas_cluster_intersect_mask
    wl, cnt, overflow = worklists_from_masks(mask_ref, TILE, WORKLIST_CAP,
                                             clusters.num_clusters)
    rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
    t = time.time()
    t_hw, f_hw = pallas_cluster_intersect(wl, cnt, rows_cm, ro, rd, t0)
    jax.block_until_ready(t_hw)
    dt_hw = time.time() - t
    union, counts = tile_union_counts(mask_ref, TILE,
                                      clusters.num_clusters)
    t = time.time()
    t_mw, f_mw = pallas_cluster_intersect_mask(union, rows_cm, ro, rd, t0)
    jax.block_until_ready(t_mw)
    dt_mw = time.time() - t

    assert int(jnp.max(counts)) <= WORKLIST_CAP, "gate oracle truncated"
    same_k = (bool(jnp.array_equal(f_hw, f_mw))
              and bool(jnp.allclose(t_hw, t_mw, rtol=1e-5, atol=1e-5)))
    print(f"[{size}] intersect kernels: worklist {dt_hw:.1f}s, "
          f"mask {dt_mw:.1f}s, cross-parity="
          f"{'OK' if same_k else 'FAIL'} "
          f"(max union={int(jnp.max(counts))}, "
          f"overflow={int(jnp.sum(overflow))})", flush=True)
    fails += not same_k

    # --- phase B'': per-ray-exact expansion kernel (round 5) — must be
    # BITWISE equal to the mask kernel on the hardware (exact bf16
    # transport + identical merge order)
    from raypt.kernels.cluster_expand import pallas_cluster_expand
    cwp = -(-num_words // 8) * 8
    mask_cm = jnp.concatenate(
        [mask_ref.T, jnp.zeros((cwp - num_words, r), jnp.int32)], axis=0)
    t = time.time()
    t_xw, f_xw = pallas_cluster_expand(mask_cm, rows_cm, ro, rd, t0,
                                       n_rays=2048)
    jax.block_until_ready(t_xw)
    dt_xw = time.time() - t
    ok_x = (bool(jnp.array_equal(f_xw, f_mw))
            and bool(jnp.array_equal(t_xw, t_mw)))
    print(f"[{size}] expand kernel: {dt_xw:.1f}s, bitwise-parity="
          f"{'OK' if ok_x else 'FAIL'}", flush=True)
    fails += not ok_x

    # --- alive-compaction router (round 5): stable alive-first
    # permutation + inverse, bitwise vs the numpy oracle on a sparse
    # (deep-bounce-shaped) mask; full-alive groups take the identity
    # fast path and must pass originals through untouched
    from raypt.kernels.compact import (pallas_alive_compact,
                                       pallas_alive_uncompact)
    import numpy as _npc
    g = 8192
    alive = _npc.random.default_rng(3).random(r) < 0.11
    alive[: min(g, r)] = True        # one full-alive group -> identity
    alive_j = jnp.asarray(alive)
    t = time.time()
    o_p, d_p, t_p, a_p = pallas_alive_compact(ro, rd, t0, alive_j,
                                              group=g)
    t_syn = jnp.asarray(
        _npc.random.default_rng(4).random(r).astype(_npc.float32) * 50)
    f_syn = jnp.asarray(_npc.random.default_rng(5).integers(
        -1, 1 << 20, size=r).astype(_npc.int32))
    t_u, f_u = pallas_alive_uncompact(t_syn, f_syn, alive_j, group=g)
    jax.block_until_ready((a_p, t_u))
    dt_c = time.time() - t
    order = _npc.concatenate([
        k * g + _npc.argsort(~alive[k * g:(k + 1) * g], kind="stable")
        for k in range(r // g)])
    live_dst = alive[order]
    inv = _npc.zeros(r, _npc.int64)
    inv[order] = _npc.arange(r)
    ok_c = (bool(_npc.array_equal(_npc.asarray(a_p), live_dst))
            and bool(_npc.array_equal(_npc.asarray(o_p)[live_dst],
                                      _npc.asarray(ro)[order][live_dst]))
            and bool(_npc.array_equal(_npc.asarray(t_p)[live_dst],
                                      _npc.asarray(t0)[order][live_dst]))
            and bool(_npc.array_equal(_npc.asarray(t_u)[alive],
                                      _npc.asarray(t_syn)[inv][alive]))
            and bool(_npc.array_equal(_npc.asarray(f_u)[alive],
                                      _npc.asarray(f_syn)[inv][alive])))
    print(f"[{size}] compact/uncompact: {dt_c:.1f}s, bitwise-parity="
          f"{'OK' if ok_c else 'FAIL'}", flush=True)
    fails += not ok_c

    # --- shard_map + Mosaic on REAL hardware geometry (round 5,
    # VERDICT r4 weak #5): the CPU tests run the sharded path only in
    # interpret mode at toy sizes; this runs the FLAGSHIP finder
    # (expansion + compaction kernels, compiled) under shard_map on a
    # 1-device TPU mesh at the gate size — exercising the check_vma
    # plumbing + kernel block geometry together on the chip. A
    # 1-device mesh runs no collectives, but every sharding-path line
    # of find_closest_onehot and the kernels' vma plumbing executes.
    from functools import partial as _part
    from jax.sharding import Mesh as _Mesh, PartitionSpec as _P
    from raypt.accel.traverse import find_closest_onehot as _fco
    accel512 = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                            scene.mesh.face_valid, leaf=384)
    ids_plain = _fco(sc, accel512, ro, rd, expand_n=8192,
                     compact_n=32768)
    mesh1 = _Mesh(jax.devices()[:1], ("tiles",))

    @_part(jax.shard_map, mesh=mesh1,
           in_specs=(_P(), _P("tiles", None), _P("tiles", None)),
           out_specs=_P("tiles"), check_vma=False)
    def _sharded_find(sc_rep, ro_l, rd_l):
        h = _fco(sc_rep, accel512, ro_l, rd_l, expand_n=8192,
                 compact_n=32768)
        return h.t, h.tri, h.sphere

    t_sh, tri_sh, sph_sh = _sharded_find(sc, ro, rd)
    jax.block_until_ready(t_sh)
    ok_sm = (bool(jnp.array_equal(t_sh, ids_plain.t))
             and bool(jnp.array_equal(tri_sh, ids_plain.tri))
             and bool(jnp.array_equal(sph_sh, ids_plain.sphere)))
    print(f"[{size}] shard_map flagship (1-dev TPU mesh, leaf=384 "
          f"expand=8192 compact=32768): parity="
          f"{'OK' if ok_sm else 'FAIL'}", flush=True)
    fails += not ok_sm
    del ids_plain, t_sh, tri_sh, sph_sh, accel512

    if size <= 256:
        t_ref, f_ref = intersect_worklist_jnp(clusters, wl, cnt, ro, rd,
                                              t0, tile=TILE)
        ok_b = (bool(jnp.array_equal(f_hw, f_ref))
                and bool(jnp.allclose(t_hw, t_ref, rtol=1e-5, atol=1e-5)))
        print(f"[{size}] intersect vs jnp oracle: "
              f"parity={'OK' if ok_b else 'FAIL'}", flush=True)
        fails += not ok_b
    else:
        # ADVICE r3: at the large size both kernels share _test_cluster,
        # so cross-parity alone would miss a bug in the extracted
        # intersection math — anchor an independent-jnp-oracle check on
        # a random subset of tiles (bounded work, no watchdog risk).
        n_tiles = r // TILE
        import numpy as _np
        sub = jnp.asarray(_np.random.default_rng(7).choice(
            n_tiles, size=min(16, n_tiles), replace=False).astype(_np.int32))
        ray_rows = (sub[:, None] * TILE
                    + jnp.arange(TILE, dtype=jnp.int32)[None, :]).reshape(-1)
        t_sub, f_sub = intersect_worklist_jnp(
            clusters, wl[sub], cnt[sub], ro[ray_rows], rd[ray_rows],
            t0[ray_rows], tile=TILE)
        ok_s = (bool(jnp.array_equal(f_hw[ray_rows], f_sub))
                and bool(jnp.allclose(t_hw[ray_rows], t_sub,
                                      rtol=1e-5, atol=1e-5)))
        print(f"[{size}] intersect vs jnp oracle "
              f"({int(sub.shape[0])} sampled tiles): "
              f"parity={'OK' if ok_s else 'FAIL'}", flush=True)
        fails += not ok_s

    # free this size's device buffers before the next size: with the
    # round-5 checks added, keeping two sizes' masks + oracles alive
    # OOMed the eager union tree-reduce at 1024 (RESOURCE_EXHAUSTED in
    # tile_union_counts); each size passes standalone
    del mask_hw, mask_ref, u_hw, u_ref, wl, cnt, t_hw, f_hw, union, \
        counts, t_mw, f_mw, mask_cm, t_xw, f_xw, o_p, d_p, t_p, a_p, \
        t_u, f_u, t_syn, f_syn, ro, rd, t0

print("GATE " + ("PASS" if fails == 0 else f"FAIL ({fails})"), flush=True)
sys.exit(1 if fails else 0)
