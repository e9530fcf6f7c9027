"""Pallas TPU kernels: in-kernel alive-compaction of a ray wavefront
(the round-5 "walk cost tracks the alive fraction" item, VERDICT r4
missing #3 / next-round #2).

Why: on bounces 1-3 the wavefront carries 41/10/2.4% live rays, but
scattered live lanes keep every walk program's while_loop trip count at
near-full-wavefront level (71/69/62 ms vs 49 ms at bounce 0) and give
the per-ray-exact expansion kernel a full complement of programs to
scan. The CUDA megakernel gets this for free — dead threads simply
`break` and the warp scheduler retires them
(/root/reference/RayTracing/main_raytracing.cu:118) — while every
XLA-level compaction is a measured loss (argsort+gather 793 ms,
cumsum+scatter 1105 ms, segmented argsort 772 ms vs 655 ms fwd:
a 1M-row XLA scatter alone is ~90 ms; STATUS.md negative ledger).

The TPU answer, same machinery as kernels/cluster_expand.py: the
permutation runs INSIDE a kernel with the MXU as the lane-router.
Per grid program (one GROUP of lanes):

  1. rank lanes with a log-step shifted-add prefix sum over the alive
     mask — alive lanes get ranks [0, na), dead lanes [na, G), both
     STABLE, forming a full permutation of the group;
  2. route the payload through one-hot selection matmuls in 128-lane
     chunks: S_j[s, i] = 1 iff rank[i] == j*128 + s; compacting is
     pay @ S_j^T per chunk, un-compacting is the transposed
     contraction driven by the SAME ranks recomputed from the same
     alive mask — no index array ever hits HBM.

Because the walk kernel's per-program while_loop exits immediately when
every lane is dead (node0 == -1), compacting groups of a few walk
tiles turns trailing tiles into zero-trip exits, making phase A cost
track ceil(alive/tile) instead of the tile count — and the expansion
kernel's per-cluster selection scans concentrate into the leading
programs the same way.

Exactness: identical to cluster_expand — every f32 crosses the bf16
selection matmuls as three exact 8-bit significand chunks
(cluster_expand.split3_bf16, integer-bitmask truncation so XLA's
excess-precision mode cannot elide it), int payloads as base-256
digits; the selection matrix is 0/1 with one nonzero per output slot,
so each f32-accumulated dot is a plain copy and the round trip is
BITWISE exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster_expand import _lane_prefix_sum, split3_bf16
from .vma_util import pvary_to, vma_of

COMPACT_N = 8192      # lanes per compaction group (grid program)


def _ranks(alive_i32: jax.Array, n: int) -> jax.Array:
    """(1, n) 0/1 alive row -> (1, n) exclusive destination ranks of
    the stable alive-first full permutation."""
    mi = alive_i32
    pref_a = _lane_prefix_sum(mi, n)            # inclusive
    na = jnp.sum(mi)
    di = 1 - mi
    pref_d = _lane_prefix_sum(di, n)
    return jnp.where(mi > 0, pref_a - 1, na + pref_d - 1)


def _sel_chunk(rank: jax.Array, slot: jax.Array, base: int):
    """One-hot chunk selector S (128, n): S[s, i] = 1 iff
    rank[i] == base + s. rank folded into a single comparand before
    the (128, n) compare (Mosaic relayout pitfall, cluster_expand)."""
    sel = (rank >= base) & (rank < base + 128)
    rank_m = jnp.where(sel, rank - base, jnp.int32(-1))
    return (rank_m == slot).astype(jnp.bfloat16)


def _kernel_compact(pay_ref, act_ref, out_ref, *, n: int):
    """Routing cost tracks the ALIVE fraction, not the group size:
      * identity fast path (pl.when): a full-alive or already-prefixed
        group (every bounce-0 group) is a plain VMEM copy — no
        selection matmuls at all;
      * routed path: only ceil(na / 128) destination chunks carry
        alive-lane data, so the chunk loop is a while_loop bounded by
        the group's live count; the remaining destinations are zeroed
        (act row 0 = dead — the walk ignores them and the caller masks
        results with the ORIGINAL alive mask)."""
    act = act_ref[:]                             # (1, n) i32
    rank = _ranks(act, n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    is_id = jnp.all(rank == lane)
    pay = pay_ref[:]                             # (rows, n) bf16

    @pl.when(is_id)
    def _copy():
        out_ref[:] = pay.astype(jnp.float32)

    @pl.when(jnp.logical_not(is_id))
    def _route():
        na = jnp.sum(act)
        slot = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
        out_ref[:] = jnp.zeros((pay.shape[0], n), jnp.float32)

        def cond(j):
            return j * 128 < na

        def body(j):
            s = _sel_chunk(rank, slot, j * 128)
            out_ref[:, pl.ds(j * 128, 128)] = jax.lax.dot_general(
                pay, s, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (rows, 128)
            return j + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))


def _kernel_uncompact(y_ref, act_ref, out_ref, *, n: int):
    """Inverse routing, same alive-bounded structure: only source
    slots [0, na) hold live results; dead destination lanes read zeros
    (face digits 0 decode to -1 and the caller masks by the original
    alive anyway)."""
    act = act_ref[:]
    rank = _ranks(act, n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    is_id = jnp.all(rank == lane)

    @pl.when(is_id)
    def _copy():
        out_ref[:] = y_ref[:].astype(jnp.float32)

    @pl.when(jnp.logical_not(is_id))
    def _route():
        na = jnp.sum(act)
        slot = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
        rows = y_ref.shape[0]

        def cond(st):
            return st[0] * 128 < na

        def body(st):
            j, acc = st
            s = _sel_chunk(rank, slot, j * 128)
            # lane i receives y[:, rank[i]]; each alive lane's rank
            # lands in exactly one chunk, so contributions are disjoint
            acc = acc + jax.lax.dot_general(
                y_ref[:, pl.ds(j * 128, 128)].astype(jnp.bfloat16), s,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (rows, n)
            return j + 1, acc

        _, acc = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((rows, n), jnp.float32)))
        out_ref[:] = acc


def _run(kernel, rows_in, rows_out, pay, act_row, n_prog, group, r,
         interpret, vma):
    return pl.pallas_call(
        partial(kernel, n=group),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((rows_in, group), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_out, group), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, r), jnp.float32,
                                       vma=vma),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pay, act_row)


@partial(jax.jit, static_argnames=("group", "interpret"))
def pallas_alive_compact(ro, rd, t0, alive, group: int = COMPACT_N,
                         interpret: bool = False):
    """Stable alive-first permutation of (ro (R, 3), rd (R, 3),
    t0 (R,), alive (R,) bool) within each `group`-lane block.
    R % group == 0. Returns the permuted quadruple (same shapes,
    bitwise-identical values); invert with pallas_alive_uncompact
    against the ORIGINAL alive mask."""
    r = ro.shape[0]
    assert r % group == 0, (r, group)
    assert group % 128 == 0, group
    n_prog = r // group

    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    oh, om, ol = split3_bf16(o_t)
    dh, dm, dl = split3_bf16(d_t)
    th, tm, tl = split3_bf16(t0.reshape(1, r))
    act_row = alive.astype(jnp.int32).reshape(1, r)
    pay = jnp.concatenate(
        [oh, om, ol, dh, dm, dl, th, tm, tl,
         act_row.astype(jnp.bfloat16),
         jnp.zeros((2, r), jnp.bfloat16)], axis=0)     # (24, R)

    vma = vma_of(ro, rd, t0, alive)
    pay, act_row = pvary_to(vma, pay, act_row)
    out = _run(_kernel_compact, 24, 24, pay, act_row, n_prog, group, r,
               interpret, vma)
    # rows: [0:3]=o_hi [3:6]=o_md [6:9]=o_lo [9:12]=d_hi [12:15]=d_md
    #       [15:18]=d_lo [18]=t_hi [19]=t_md [20]=t_lo [21]=alive
    o_p = out[0:3] + out[3:6] + out[6:9]
    d_p = out[9:12] + out[12:15] + out[15:18]
    t_p = out[18:19] + out[19:20] + out[20:21]
    a_p = out[21:22] > 0.5
    return (o_p.T.reshape(r, 3), d_p.T.reshape(r, 3),
            t_p.reshape(r), a_p.reshape(r))


@partial(jax.jit, static_argnames=("group", "interpret"))
def pallas_alive_uncompact(t, face, alive, group: int = COMPACT_N,
                           interpret: bool = False):
    """Inverse of pallas_alive_compact's permutation, applied to the
    finder results (t (R,) f32, face (R,) i32 in [-1, 2^24 - 1)).
    `alive` is the ORIGINAL (un-permuted) mask the compact call saw."""
    r = t.shape[0]
    assert r % group == 0, (r, group)
    n_prog = r // group

    th, tm, tl = split3_bf16(t.reshape(1, r))
    fp = (face.reshape(1, r) + 1)                 # [0, 2^24): digits
    f_d = jnp.concatenate([fp >> 16, (fp >> 8) & 255, fp & 255],
                          axis=0).astype(jnp.bfloat16)
    y = jnp.concatenate(
        [th, tm, tl, f_d, jnp.zeros((2, r), jnp.bfloat16)], axis=0)
    act_row = alive.astype(jnp.int32).reshape(1, r)

    vma = vma_of(t, face, alive)
    y, act_row = pvary_to(vma, y, act_row)
    out = _run(_kernel_uncompact, 8, 8, y, act_row, n_prog, group, r,
               interpret, vma)
    t_u = out[0] + out[1] + out[2]
    f_u = (jnp.round(out[3]).astype(jnp.int32) << 16) \
        | (jnp.round(out[4]).astype(jnp.int32) << 8) \
        | jnp.round(out[5]).astype(jnp.int32)
    return t_u.reshape(r), (f_u - 1).reshape(r)
