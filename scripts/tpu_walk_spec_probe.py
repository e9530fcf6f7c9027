"""Round-5 bounded attempt at the walk's %-of-floor gap (VERDICT r4
next-round item 7): SPECULATIVE BOTH-CHILDREN FETCH.

Hypothesis (r4 analysis): the walk step's critical path is
fetch -> slab-test -> select-next -> fetch; issuing BOTH candidate
fetches (left and skip) as soon as the current row is decoded would
overlap the slab test with the second fetch, trading 2x matmul flops
for the dependency-stall removal (~15% predicted at best).

This probe times the production kernel vs the speculative variant on
the real bench wavefront (primary rays, framed bunny, 1024^2) at the
flagship leaf=512 — walk-only, identical outputs asserted.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
  scripts/tpu_walk_spec_probe.py
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

from raypt import RenderConfig
from raypt.accel.ctree import build_onehot
from raypt.accel.host_bvh import build_sah
from raypt.core.math3d import normalize
from raypt.kernels.onehot_walk import (LO, ROW, RAY_TILE,
                                       pallas_topwalk_cm,
                                       prep_radix_table_t)
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

LEAF = int(os.environ.get("WS_LEAF", 512))
SIZE = int(os.environ.get("WS_SIZE", 1024))


def _kernel_spec(o_ref, d_ref, iv_ref, t0_ref, act_ref, tab_ref,
                 mask_ref, *, lo_size: int, hi_blocks: int, cw: int,
                 max_iters: int, unroll: int):
    """Speculative variant: carry = (node, row) with the row already
    fetched; each step decodes left/skip from the row, issues BOTH
    fetches back-to-back (independent MXU ops the scheduler can
    overlap with the slab test), then selects."""
    o = o_ref[:]
    iv = iv_ref[:]
    t0 = t0_ref[:]
    act = act_ref[:]
    tab = tab_ref[:]

    r_t = o.shape[1]
    node0 = jnp.where(act > 0, 0, -1).astype(jnp.int32)
    mask0 = jnp.zeros((cw, r_t), jnp.int32)
    lo_col = jax.lax.broadcasted_iota(jnp.int32, (lo_size, r_t), 0)
    wword = jax.lax.broadcasted_iota(jnp.int32, (cw, r_t), 0)

    def fetch(node):
        live = node >= 0
        lo = node % lo_size
        hi = jnp.where(live, node // lo_size, hi_blocks)
        oh = (lo == lo_col).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(
            tab, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = jnp.zeros((ROW, r_t), jnp.float32)
        for h in range(hi_blocks):
            r = jnp.where(hi == h, t1[h * ROW:(h + 1) * ROW, :], r)
        return r

    def dec(hi, lo):
        return (jnp.round(hi) * 128.0 + jnp.round(lo)).astype(
            jnp.int32) - 1

    def step(node, row, mask):
        live = node >= 0
        # decode BOTH successors first and issue BOTH fetches — the
        # slab test below overlaps with the second matmul
        left = dec(row[6:7], row[7:8])
        skip = dec(row[8:9], row[9:10])
        r_left = fetch(jnp.where(live, left, -1))
        r_skip = fetch(jnp.where(live, skip, -1))

        ok_row = (row[13:14] > 0.5) & live
        tn1 = (row[0:3] - o) * iv
        tn2 = (row[3:6] - o) * iv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=0, keepdims=True)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=0, keepdims=True)
        nonempty = jnp.all(row[0:3] <= row[3:6], axis=0, keepdims=True)
        hit = ((tfar >= tnear) & (tnear < t0) & (tfar > 0.0)
               & nonempty & ok_row)
        is_leaf = row[12:13] > 0.5

        cid = dec(row[10:11], row[11:12])
        want = hit & is_leaf & (cid >= 0)
        safe_cid = jnp.maximum(cid, 0)
        bit = jnp.where(want, jnp.int32(1) << (safe_cid & 31), 0)
        mask = mask | jnp.where((safe_cid >> 5) == wword, bit, 0)

        take_left = hit & ~is_leaf
        nxt = jnp.where(take_left, left, skip)
        row = jnp.where(take_left, r_left, r_skip)
        node = jnp.where(live, nxt, node)
        return node, row, mask

    def cond(state):
        node, _, _, it = state
        return jnp.any(node >= 0) & (it < max_iters)

    def body(state):
        node, row, mask, it = state
        for _ in range(unroll):
            node, row, mask = step(node, row, mask)
        return node, row, mask, it + 1

    row0 = fetch(node0)
    _, _, mask, _ = jax.lax.while_loop(
        cond, body, (node0, row0, mask0, jnp.int32(0)))
    mask_ref[:] = mask


@partial(jax.jit, static_argnames=("num_words", "ray_tile", "unroll"))
def topwalk_spec(table, ro, rd, t0, active, num_words: int,
                 ray_tile: int = RAY_TILE, unroll: int = 4):
    r = ro.shape[0]
    nt = table.shape[0]
    assert r % ray_tile == 0
    grid = (r // ray_tile,)
    tab_radix = prep_radix_table_t(table, LO)
    hi_blocks = tab_radix.shape[0] // ROW
    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe
    iters = -(-(nt + 1) // unroll)
    kernel = partial(_kernel_spec, lo_size=LO, hi_blocks=hi_blocks,
                     cw=num_words, max_iters=iters, unroll=unroll)
    args = (ro.T.reshape(3, r), rd.T.reshape(3, r), inv.T.reshape(3, r),
            t0.reshape(1, r), active.astype(jnp.int32).reshape(1, r),
            tab_radix)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hi_blocks * ROW, LO), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_words, ray_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_words, r), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


b = stanford_bunny()
b.camera.viewport_width = b.camera.viewport_height = SIZE
scene = b.freeze()
bvh = build_sah(scene.mesh)
clusters, table = build_onehot(bvh, scene.mesh.positions,
                               scene.mesh.faces, scene.mesh.face_valid,
                               leaf=LEAF)
nw = -(-clusters.num_clusters // 32)
cfg = RenderConfig(width=SIZE, height=SIZE)
ids_grid, _ = _block_order(pixel_id_grid(cfg))
ro, rd = camera_rays_for_ids(scene, cfg, ids_grid,
                             jnp.full((SIZE, SIZE, 2), 0.5))
ro = ro.reshape(-1, 3)
rd = normalize(rd).reshape(-1, 3)
r = ro.shape[0]
t0 = jnp.full((r,), 1e30)
act = jnp.ones((r,), bool)


def timeit(name, f, reps=3):
    out = f()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t = time.time()
        out = f()
        jax.block_until_ready(out)
        ts.append(time.time() - t)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    return out


base = timeit("baseline walk (cm)",
              lambda: pallas_topwalk_cm(table, ro, rd, t0, act, nw))
spec = timeit("speculative walk  ",
              lambda: topwalk_spec(table, ro, rd, t0, act, nw))
same = bool(jnp.array_equal(base, spec))
print(f"outputs equal: {same}", flush=True)
