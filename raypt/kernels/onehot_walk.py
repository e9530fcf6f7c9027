"""Pallas TPU kernel: one-hot MXU traversal of the cluster top tree.

The megakernel successor for the flagship path (SURVEY §7 M3 /
round-1 VERDICT item 1): the per-visit node fetch — the operation that
bounds the whole XLA skip-link walk at the gather unit's ~0.1 G rows/s
(scripts/tpu_gather_truth.py) — is realized INSIDE the kernel as a
one-hot matmul against a VMEM-resident bf16 row table, riding the MXU
instead of the gather unit. The table encoding (accel/ctree.py) makes
this exact: links/ids as base-128 bf16 digit pairs, boxes rounded
conservatively to bf16.

The fetch is radix-decomposed to keep the one-hot small: node id =
hi*128 + lo. Stage 1 contracts a (R_T, 128) one-hot over `lo` against
the (128, HI*16) transposed table on the MXU, producing each ray's
candidate row for EVERY hi block; stage 2 selects the ray's hi block
with a static unrolled (R_T, 16) select chain. A flat (R_T, Nt)
one-hot measured ~10x slower at bunny scale (Nt ~3-4k).

Per grid step (one tile of RAY_TILE rays): a `while_loop` walks all
lanes' skip-link paths. Output is a per-ray wanted-cluster bitmask
consumed by the dense cluster-intersection phase
(accel/traverse.py find_closest_onehot).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 256
LO = 128          # radix: node = hi * LO + lo
ROW = 16


def prep_radix_table(table: jax.Array) -> jax.Array:
    """(Nt, 16) bf16 -> (LO, HI*16) bf16 with
    out[lo, hi*16 + w] = table[hi*LO + lo, w] (Nt padded with zero rows,
    whose valid flag is 0 so the walk treats them as dead)."""
    nt, row = table.shape
    hi = -(-nt // LO)
    pad = hi * LO - nt
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, row), table.dtype)], axis=0)
    # (hi, LO, 16) -> (LO, hi, 16) -> (LO, hi*16)
    return jnp.transpose(table.reshape(hi, LO, row), (1, 0, 2)).reshape(
        LO, hi * row)


def _kernel(o_ref, d_ref, iv_ref, t0_ref, act_ref, tab_ref, mask_ref,
            *, hi_blocks: int, cw: int, max_steps: int):
    o = o_ref[:]                       # (R_T, 3) f32
    iv = iv_ref[:]                     # (R_T, 3) f32
    t0 = t0_ref[:]                     # (R_T, 1) f32
    act = act_ref[:]                   # (R_T, 1) i32
    tab = tab_ref[:]                   # (LO, HI*16) bf16

    r_t = o.shape[0]
    node0 = jnp.where(act > 0, 0, -1).astype(jnp.int32)      # (R_T, 1)
    mask0 = jnp.zeros((r_t, cw), jnp.int32)
    lo_col = jax.lax.broadcasted_iota(jnp.int32, (r_t, LO), 1)
    wword = jax.lax.broadcasted_iota(jnp.int32, (r_t, cw), 1)

    def fetch(node):
        """Radix one-hot row fetch: (R_T, 1) node -> (R_T, 16) f32."""
        live = node >= 0
        lo = node & (LO - 1)
        hi = jnp.where(live, node >> 7, hi_blocks)           # sentinel
        oh = (lo == lo_col).astype(jnp.bfloat16)             # (R_T, LO)
        t1 = jax.lax.dot_general(
            oh, tab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (R_T, HI*16)
        r = jnp.zeros((r_t, ROW), jnp.float32)
        for h in range(hi_blocks):
            r = jnp.where(hi == h, t1[:, h * ROW:(h + 1) * ROW], r)
        return r

    def cond(state):
        node, _, it = state
        return jnp.any(node >= 0) & (it < max_steps)

    def body(state):
        node, mask, it = state
        r = fetch(node)

        live = node >= 0                                     # (R_T, 1)
        ok_row = (r[:, 13:14] > 0.5) & live
        tn1 = (r[:, 0:3] - o) * iv
        tn2 = (r[:, 3:6] - o) * iv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1, keepdims=True)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1, keepdims=True)
        nonempty = jnp.all(r[:, 0:3] <= r[:, 3:6], axis=-1, keepdims=True)
        hit = ((tfar >= tnear) & (tnear < t0) & (tfar > 0.0)
               & nonempty & ok_row)
        is_leaf = r[:, 12:13] > 0.5

        def dec(hi, lo):
            return (jnp.round(hi) * 128.0 + jnp.round(lo)).astype(
                jnp.int32) - 1

        cid = dec(r[:, 10:11], r[:, 11:12])
        want = hit & is_leaf & (cid >= 0)
        safe_cid = jnp.maximum(cid, 0)
        bit = jnp.where(want, jnp.int32(1) << (safe_cid & 31), 0)
        mask = mask | jnp.where((safe_cid >> 5) == wword, bit, 0)

        left = dec(r[:, 6:7], r[:, 7:8])
        skip = dec(r[:, 8:9], r[:, 9:10])
        nxt = jnp.where(hit & ~is_leaf, left, skip)
        node = jnp.where(live, nxt, node)
        return node, mask, it + 1

    _, mask, _ = jax.lax.while_loop(
        cond, body, (node0, mask0, jnp.int32(0)))
    mask_ref[:] = mask


@partial(jax.jit, static_argnames=("num_words", "interpret", "max_steps"))
def pallas_topwalk(table: jax.Array, ro: jax.Array, rd: jax.Array,
                   t0: jax.Array, active: jax.Array, num_words: int,
                   interpret: bool = False,
                   max_steps: int = 8192) -> jax.Array:
    """Walk the encoded cluster top tree for a wavefront.

    table (Nt, 16) bf16 (ctree.encode_topwalk_table), ro/rd (R, 3) with
    rd normalized, t0 (R,) sphere-seeded best distance, active (R,)
    bool. R must be a multiple of RAY_TILE. Returns (R, num_words)
    int32 wanted-cluster bitmask. max_steps bounds the in-kernel walk
    (a skip-link walk terminates in <= Nt steps; the default is a
    safety net, not a tuning knob)."""
    r = ro.shape[0]
    nt = table.shape[0]
    assert r % RAY_TILE == 0, r
    grid = (r // RAY_TILE,)
    tab_radix = prep_radix_table(table)
    hi_blocks = tab_radix.shape[1] // ROW

    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    kernel = partial(_kernel, hi_blocks=hi_blocks, cw=num_words,
                     max_steps=min(max_steps, nt + 1))
    mask = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LO, hi_blocks * ROW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, num_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, num_words), jnp.int32),
        interpret=interpret,
    )(ro, rd, inv, t0.reshape(r, 1),
      active.astype(jnp.int32).reshape(r, 1), tab_radix)
    return mask
