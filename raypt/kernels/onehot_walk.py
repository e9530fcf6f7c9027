"""Pallas TPU kernel: one-hot MXU traversal of the cluster top tree.

The megakernel successor for the flagship path (SURVEY §7 M3 /
round-1 VERDICT item 1): the per-visit node fetch — the operation that
bounds the whole XLA skip-link walk at the gather unit's ~0.1 G rows/s
(scripts/tpu_gather_truth.py) — is realized INSIDE the kernel as a
one-hot matmul against a VMEM-resident bf16 row table, riding the MXU
instead of the gather unit. The table encoding (accel/ctree.py) makes
this exact: links/ids as base-128 bf16 digit pairs, boxes rounded
conservatively to bf16.

Layout is TPU-first: RAYS LIVE ON LANES. All per-ray state is (1, R_T)
rows and the fetched node rows come out of the MXU as (16, R_T)
columns, so every VPU op in the walk touches R_T lanes per vector op.
(The first cut kept rays on sublanes; its per-step cost was ~4 us,
~95% of it the hi-block select chain at 32 vregs per op. This layout
runs the same select chain at 2 vregs per op.)

The fetch is radix-decomposed to keep the one-hot small: node id =
hi*LO + lo. Stage 1 contracts the transposed table (HI*16, LO) with a
(LO, R_T) lo-one-hot on the MXU, giving every ray's candidate row for
every hi block; stage 2 selects the ray's hi block with a static
unrolled (16, R_T) select chain.

Per grid step (one tile of ray_tile rays): a `while_loop` walks all
lanes' skip-link paths, `unroll` steps per iteration. Output is a
per-ray wanted-cluster bitmask, (num_words, R) word-major (lanes =
rays), consumed by accel/traverse.py find_closest_onehot.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma_util import pvary_to, vma_of

RAY_TILE = 2048
LO = 256          # radix: node = hi * LO + lo
ROW = 16


def prep_radix_table_t(table: jax.Array, lo: int = LO) -> jax.Array:
    """(Nt, 16) bf16 -> (HI*16, lo) bf16 with
    out[hi*16 + w, l] = table[hi*lo + l, w] (Nt padded with zero rows,
    whose valid flag is 0 so the walk treats them as dead)."""
    nt, row = table.shape
    hi = -(-nt // lo)
    pad = hi * lo - nt
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, row), table.dtype)], axis=0)
    # (hi, lo, 16) -> (hi, 16, lo) -> (hi*16, lo)
    return jnp.transpose(table.reshape(hi, lo, row), (0, 2, 1)).reshape(
        hi * row, lo)


def _kernel(o_ref, d_ref, iv_ref, t0_ref, act_ref, tab_ref, mask_ref,
            union_ref=None, *, lo_size: int, hi_blocks: int, cw: int,
            max_iters: int, unroll: int, union_tile: int = 0):
    o = o_ref[:]                       # (3, R_T) f32
    iv = iv_ref[:]                     # (3, R_T) f32
    t0 = t0_ref[:]                     # (1, R_T) f32
    act = act_ref[:]                   # (1, R_T) i32
    tab = tab_ref[:]                   # (HI*16, LO) bf16

    r_t = o.shape[1]
    node0 = jnp.where(act > 0, 0, -1).astype(jnp.int32)      # (1, R_T)
    mask0 = jnp.zeros((cw, r_t), jnp.int32)
    lo_col = jax.lax.broadcasted_iota(jnp.int32, (lo_size, r_t), 0)
    wword = jax.lax.broadcasted_iota(jnp.int32, (cw, r_t), 0)

    def fetch(node):
        """Radix one-hot row fetch: (1, R_T) node -> (16, R_T) f32."""
        live = node >= 0
        lo = node % lo_size
        hi = jnp.where(live, node // lo_size, hi_blocks)     # sentinel
        oh = (lo == lo_col).astype(jnp.bfloat16)             # (LO, R_T)
        t1 = jax.lax.dot_general(
            tab, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (HI*16, R_T)
        r = jnp.zeros((ROW, r_t), jnp.float32)
        for h in range(hi_blocks):
            r = jnp.where(hi == h, t1[h * ROW:(h + 1) * ROW, :], r)
        return r

    def dec(hi, lo):
        return (jnp.round(hi) * 128.0 + jnp.round(lo)).astype(
            jnp.int32) - 1

    def step(node, mask):
        r = fetch(node)                                      # (16, R_T)
        live = node >= 0                                     # (1, R_T)
        ok_row = (r[13:14] > 0.5) & live
        tn1 = (r[0:3] - o) * iv
        tn2 = (r[3:6] - o) * iv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=0, keepdims=True)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=0, keepdims=True)
        nonempty = jnp.all(r[0:3] <= r[3:6], axis=0, keepdims=True)
        hit = ((tfar >= tnear) & (tnear < t0) & (tfar > 0.0)
               & nonempty & ok_row)
        is_leaf = r[12:13] > 0.5

        cid = dec(r[10:11], r[11:12])
        want = hit & is_leaf & (cid >= 0)
        safe_cid = jnp.maximum(cid, 0)
        bit = jnp.where(want, jnp.int32(1) << (safe_cid & 31), 0)
        mask = mask | jnp.where((safe_cid >> 5) == wword, bit, 0)

        left = dec(r[6:7], r[7:8])
        skip = dec(r[8:9], r[9:10])
        nxt = jnp.where(hit & ~is_leaf, left, skip)
        node = jnp.where(live, nxt, node)
        return node, mask

    def cond(state):
        node, _, it = state
        return jnp.any(node >= 0) & (it < max_iters)

    def body(state):
        node, mask, it = state
        for _ in range(unroll):
            node, mask = step(node, mask)
        return node, mask, it + 1

    _, mask, _ = jax.lax.while_loop(
        cond, body, (node0, mask0, jnp.int32(0)))
    if union_tile == 0:
        mask_ref[:] = mask
        if union_ref is not None:
            # ALSO emit this program's whole-tile union as column 0 of
            # a (cw, 128) padded block (round 5): the expansion
            # kernel's wrapper needs per-group unions + summaries, and
            # OR-folding here kills its (cw, R)-scale XLA reduce
            # (~100 MB of HBM reads per bounce)
            blk = mask
            w = r_t
            while w > 1:
                h = w // 2
                blk = blk[:, :h] | blk[:, h:w]
                w = h
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (cw, 128), 1)
            union_ref[:] = jnp.where(lane0 == 0, blk, 0)
    else:
        # fused union emission: OR-reduce each contiguous union_tile
        # lane block to one column — the per-ray mask never leaves the
        # kernel (kills the (R, cw) HBM materialization + transpose +
        # XLA tree reduce, ~25 ms/bounce in the r4 phase decomposition).
        # The output block is padded to 128 lanes (Mosaic requires
        # 128-divisible minor blocks); the wrapper strips the padding.
        lane = jax.lax.broadcasted_iota(jnp.int32, (cw, 128), 1)
        out = jnp.zeros((cw, 128), jnp.int32)
        for g in range(r_t // union_tile):
            blk = mask[:, g * union_tile:(g + 1) * union_tile]
            w = union_tile
            while w > 1:
                h = w // 2
                blk = blk[:, :h] | blk[:, h:w]
                w = h
            out = jnp.where(lane == g, blk, out)
        mask_ref[:] = out


@partial(jax.jit, static_argnames=("num_words", "interpret", "max_steps",
                                   "ray_tile", "unroll", "lo_size"))
def pallas_topwalk(table: jax.Array, ro: jax.Array, rd: jax.Array,
                   t0: jax.Array, active: jax.Array, num_words: int,
                   interpret: bool = False, max_steps: int = 16384,
                   ray_tile: int = RAY_TILE, unroll: int = 4,
                   lo_size: int = LO) -> jax.Array:
    """Walk the encoded cluster top tree for a wavefront.

    table (Nt, 16) bf16 (ctree.encode_topwalk_table), ro/rd (R, 3) with
    rd normalized, t0 (R,) sphere-seeded best distance, active (R,)
    bool. R must be a multiple of ray_tile. Returns (R, num_words)
    int32 wanted-cluster bitmask. max_steps bounds the in-kernel walk
    (a skip-link walk terminates in <= Nt steps; the default is a
    safety net, not a tuning knob)."""
    return pallas_topwalk_cm(table, ro, rd, t0, active, num_words,
                             interpret=interpret, max_steps=max_steps,
                             ray_tile=ray_tile, unroll=unroll,
                             lo_size=lo_size).T


@partial(jax.jit, static_argnames=("num_words", "interpret", "max_steps",
                                   "ray_tile", "unroll", "lo_size"))
def pallas_topwalk_cm(table: jax.Array, ro: jax.Array, rd: jax.Array,
                      t0: jax.Array, active: jax.Array, num_words: int,
                      interpret: bool = False, max_steps: int = 16384,
                      ray_tile: int = RAY_TILE, unroll: int = 4,
                      lo_size: int = LO) -> jax.Array:
    """pallas_topwalk in the kernel-native COLUMN-MAJOR layout:
    returns (num_words, R) int32 — word-major, rays on lanes — with no
    XLA transpose. This is the direct input layout of the per-ray-exact
    expansion kernel (kernels/cluster_expand.py), which re-blocks it as
    (num_words//8, 8, R) pages; pass num_words padded to a multiple of
    8 for that consumer (extra high words simply stay zero)."""
    r = ro.shape[0]
    nt = table.shape[0]
    assert r % ray_tile == 0, r
    grid = (r // ray_tile,)
    tab_radix = prep_radix_table_t(table, lo_size)
    hi_blocks = tab_radix.shape[0] // ROW

    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    iters = -(-min(max_steps, nt + 1) // unroll)
    kernel = partial(_kernel, lo_size=lo_size, hi_blocks=hi_blocks,
                     cw=num_words, max_iters=iters, unroll=unroll)
    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    iv_t = inv.T.reshape(3, r)
    t0_r = t0.reshape(1, r)
    act_r = active.astype(jnp.int32).reshape(1, r)
    vma = vma_of(ro, rd, t0, active)
    o_t, d_t, iv_t, t0_r, act_r, tab_radix = pvary_to(
        vma, o_t, d_t, iv_t, t0_r, act_r, tab_radix)
    mask = pl.pallas_call(
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
            pl.BlockSpec((hi_blocks * ROW, lo_size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_words, ray_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_words, r), jnp.int32,
                                       vma=vma),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, iv_t, t0_r, act_r, tab_radix)
    return mask

@partial(jax.jit, static_argnames=("num_words", "interpret", "max_steps",
                                   "ray_tile", "unroll", "lo_size"))
def pallas_topwalk_cm_u(table: jax.Array, ro: jax.Array, rd: jax.Array,
                        t0: jax.Array, active: jax.Array, num_words: int,
                        interpret: bool = False, max_steps: int = 16384,
                        ray_tile: int = RAY_TILE, unroll: int = 4,
                        lo_size: int = LO):
    """pallas_topwalk_cm that ALSO returns per-walk-program unions:
    (mask_cm (num_words, R), union_pp (R // ray_tile, num_words)) —
    union_pp[i] = OR over program i's rays. Input layout for the
    expansion kernel: its wrapper OR-folds union_pp over the programs
    of each expansion group instead of tree-reducing the full (cw, R)
    mask (round 5: ~100 MB of HBM reads per bounce on the 1024^2
    bench)."""
    r = ro.shape[0]
    nt = table.shape[0]
    assert r % ray_tile == 0, r
    grid = (r // ray_tile,)
    tab_radix = prep_radix_table_t(table, lo_size)
    hi_blocks = tab_radix.shape[0] // ROW

    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    iters = -(-min(max_steps, nt + 1) // unroll)
    kernel = partial(_kernel, lo_size=lo_size, hi_blocks=hi_blocks,
                     cw=num_words, max_iters=iters, unroll=unroll)
    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    iv_t = inv.T.reshape(3, r)
    t0_r = t0.reshape(1, r)
    act_r = active.astype(jnp.int32).reshape(1, r)
    vma = vma_of(ro, rd, t0, active)
    o_t, d_t, iv_t, t0_r, act_r, tab_radix = pvary_to(
        vma, o_t, d_t, iv_t, t0_r, act_r, tab_radix)
    mask, union = pl.pallas_call(
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
            pl.BlockSpec((hi_blocks * ROW, lo_size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((num_words, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_words, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_words, r), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((num_words, 128 * grid[0]), jnp.int32,
                                 vma=vma),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, iv_t, t0_r, act_r, tab_radix)
    union_pp = union.reshape(num_words, grid[0], 128)[:, :, 0].T
    return mask, union_pp


@partial(jax.jit, static_argnames=("num_words", "interpret", "max_steps",
                                   "ray_tile", "unroll", "lo_size",
                                   "union_tile"))
def pallas_topwalk_union(table: jax.Array, ro: jax.Array, rd: jax.Array,
                         t0: jax.Array, active: jax.Array, num_words: int,
                         interpret: bool = False, max_steps: int = 16384,
                         ray_tile: int = RAY_TILE, unroll: int = 4,
                         lo_size: int = LO,
                         union_tile: int = 256) -> jax.Array:
    """pallas_topwalk with FUSED per-tile union emission: instead of the
    (R, num_words) per-ray mask, returns (R // union_tile, num_words)
    OR-unions over contiguous union_tile-ray blocks — the direct input
    of the mask intersect kernel. The per-ray mask is reduced in
    registers before leaving the kernel, eliminating its HBM round trip
    + transpose + the XLA tree reduce (~25 ms/bounce measured,
    scripts/tpu_phase_decomp.py r4)."""
    r = ro.shape[0]
    nt = table.shape[0]
    assert r % ray_tile == 0, r
    assert ray_tile % union_tile == 0
    assert union_tile > 0 and (union_tile & (union_tile - 1)) == 0, \
        f"union_tile must be a power of two (halving OR-fold), got " \
        f"{union_tile}"
    assert ray_tile // union_tile <= 128, \
        f"union output is padded to 128 lanes per program; " \
        f"ray_tile/union_tile = {ray_tile // union_tile} tiles don't fit"
    tiles_pp = ray_tile // union_tile
    n_tiles = r // union_tile
    grid = (r // ray_tile,)
    tab_radix = prep_radix_table_t(table, lo_size)
    hi_blocks = tab_radix.shape[0] // ROW

    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    iters = -(-min(max_steps, nt + 1) // unroll)
    kernel = partial(_kernel, lo_size=lo_size, hi_blocks=hi_blocks,
                     cw=num_words, max_iters=iters, unroll=unroll,
                     union_tile=union_tile)
    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    iv_t = inv.T.reshape(3, r)
    t0_r = t0.reshape(1, r)
    act_r = active.astype(jnp.int32).reshape(1, r)
    vma = vma_of(ro, rd, t0, active)
    o_t, d_t, iv_t, t0_r, act_r, tab_radix = pvary_to(
        vma, o_t, d_t, iv_t, t0_r, act_r, tab_radix)
    union_cm = pl.pallas_call(
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
            pl.BlockSpec((hi_blocks * ROW, lo_size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_words, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_words, 128 * grid[0]),
                                       jnp.int32, vma=vma),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, iv_t, t0_r, act_r, tab_radix)
    # strip per-program lane padding: (cw, P*128) -> (cw, P, 128) ->
    # keep the first tiles_pp lanes of each program
    union_cm = union_cm.reshape(num_words, grid[0], 128)[:, :, :tiles_pp]
    return union_cm.reshape(num_words, n_tiles).T
