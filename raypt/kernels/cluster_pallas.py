"""Pallas TPU kernel: worklist-driven dense cluster intersection
(phase 2 of the two-level scheme, accel.clusters).

Per grid step (= one ray tile) the kernel loops the tile's worklist up
to its dynamic count; each entry scalar-indexes one cluster's packed
triangle block out of the VMEM-resident table and tests all TILE rays
against all LEAF triangles with dense VPU broadcasts — no gathers, no
per-ray control flow. Worklists/counts ride 8-tile VMEM blocks (the
full arrays exceed the 1 MB SMEM budget, so scalar prefetch is out).

Block layout: tri table (C, 12, LEAF) — component-major so each
(leaf,)-vector broadcasts against (tile,)-ray vectors as (LEAF, TILE)
outer ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math3d import BIG
from .vma_util import pvary_to, vma_of

TILE = 256
BIG_I = 2 ** 30


def _test_cluster(blk, o, d, tb, fb):
    """Dense test of one cluster block (12, LEAF) against the tile's
    rays o/d (3, TILE); returns the merged (t_best, face) carry."""
    eps = 1e-8

    def col(k):                       # (LEAF, 1)
        return blk[k, :][:, None]

    def ray(k):                       # (1, TILE)
        return d[k, :][None, :]

    def org(k):
        return o[k, :][None, :]

    p0x, p0y, p0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)
    dx, dy, dz = ray(0), ray(1), ray(2)
    ox, oy, oz = org(0), org(1), org(2)

    # pvec = d x e2  -> (LEAF, TILE)
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok_det = jnp.abs(det) > eps
    inv_det = jnp.where(ok_det, 1.0, 0.0) / jnp.where(ok_det, det, 1.0)
    tvx = ox - p0x
    tvy = oy - p0y
    tvz = oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    t = jnp.where(hit, t, BIG)        # (LEAF, TILE)

    tmin = jnp.min(t, axis=0)[None, :]               # (1, TILE)
    fid = jax.lax.bitcast_convert_type(blk[9, :], jnp.int32)[:, None]
    lmin = jnp.min(jnp.where(t <= tmin,
                             jnp.broadcast_to(fid, t.shape), BIG_I),
                   axis=0)[None, :]
    better = tmin < tb
    return jnp.where(better, tmin, tb), jnp.where(better, lmin, fb)


def _kernel(worklist_ref, counts_ref, o_ref, d_ref, t0_ref, rows_ref,
            t_ref, f_ref):
    # worklist/counts ride 8-tile SMEM blocks (the full arrays exceed
    # the SMEM budget for scalar prefetch, and dynamic 2D scalar loads
    # from VMEM don't lower); cid/cnt are scalar SMEM reads from row
    # (program_id % 8)
    row = pl.program_id(0) % 8
    cnt = counts_ref[row, 0]
    o = o_ref[:]                          # (3, TILE)
    d = d_ref[:]                          # (3, TILE)

    def body(w, carry):
        tb, fb = carry                    # (1, TILE), (1, TILE)
        cid = worklist_ref[row, w]
        return _test_cluster(rows_ref[cid], o, d, tb, fb)

    t_init = t0_ref[:]                     # (1, TILE)
    f_init = jnp.full(t_init.shape, -1, jnp.int32)
    tb, fb = jax.lax.fori_loop(0, cnt, body, (t_init, f_init))
    t_ref[:] = tb
    f_ref[:] = fb


@partial(jax.jit, static_argnames=("interpret", "tile"))
def pallas_cluster_intersect(worklist, counts, tri_rows_cm, ro, rd, t0,
                             interpret: bool = False, tile: int = TILE):
    """worklist (n_tiles, cap) i32, counts (n_tiles,) i32,
    tri_rows_cm (C, 12, LEAF) f32, ro/rd (R, 3) with R = n_tiles*tile,
    t0 (R,). Returns (t_best (R,), face (R,) i32, -1 = miss)."""
    r = ro.shape[0]
    n_tiles = worklist.shape[0]
    assert r == n_tiles * tile
    assert n_tiles % 8 == 0, "pad ray count to 8*tile multiples"

    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    cap = worklist.shape[1]
    vma = vma_of(worklist, counts, ro, rd, t0)
    worklist, counts, o_t, d_t, t0, tri_rows_cm = pvary_to(
        vma, worklist, counts, o_t, d_t, t0, tri_rows_cm)

    t_out, f_out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, cap), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri table
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, r), jnp.int32, vma=vma),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(worklist, counts.reshape(n_tiles, 1), o_t, d_t,
      t0.reshape(1, r), tri_rows_cm)
    return t_out[0], f_out[0]

def _kernel_grouped(worklist_ref, counts_ref, o_ref, d_ref, t0_ref,
                    rows_ref, t_ref, f_ref, *, group: int):
    """Worklist variant testing `group` clusters per fori_loop
    iteration: the per-entry scalar bookkeeping (loop control + index
    read) amortizes over `group` independent load+test chains that the
    compiler can pipeline against each other. Worklist must be padded
    (width a multiple of group) with the DUMMY cluster id C whose row
    block is all zeros (det==0 -> no hits), so no masking is needed."""
    row = pl.program_id(0) % 8
    cnt = counts_ref[row, 0]
    o = o_ref[:]                          # (3, TILE)
    d = d_ref[:]                          # (3, TILE)

    def body(w, carry):
        tb, fb = carry
        for g in range(group):
            cid = worklist_ref[row, w * group + g]
            tb, fb = _test_cluster(rows_ref[cid], o, d, tb, fb)
        return tb, fb

    t_init = t0_ref[:]
    f_init = jnp.full(t_init.shape, -1, jnp.int32)
    n_it = (cnt + group - 1) // group
    tb, fb = jax.lax.fori_loop(0, n_it, body, (t_init, f_init))
    t_ref[:] = tb
    f_ref[:] = fb


@partial(jax.jit, static_argnames=("interpret", "tile", "group"))
def pallas_cluster_intersect_grouped(worklist, counts, tri_rows_cm, ro, rd,
                                     t0, interpret: bool = False,
                                     tile: int = TILE, group: int = 4):
    """Same contract as pallas_cluster_intersect, but tests `group`
    worklist entries per loop iteration (see _kernel_grouped). -1 pad
    entries are remapped to a dummy all-zero cluster appended to the
    triangle table."""
    r = ro.shape[0]
    n_tiles = worklist.shape[0]
    assert r == n_tiles * tile
    assert n_tiles % 8 == 0, "pad ray count to 8*tile multiples"

    c = tri_rows_cm.shape[0]
    rows = jnp.concatenate(
        [tri_rows_cm, jnp.zeros((1,) + tri_rows_cm.shape[1:],
                                tri_rows_cm.dtype)], axis=0)
    wl = jnp.where(worklist < 0, c, worklist)
    cap = wl.shape[1]
    padw = (-cap) % group
    if padw:
        wl = jnp.concatenate(
            [wl, jnp.full((n_tiles, padw), c, jnp.int32)], axis=1)
        cap += padw

    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    vma = vma_of(wl, counts, ro, rd, t0)
    wl, counts, o_t, d_t, t0, rows = pvary_to(
        vma, wl, counts, o_t, d_t, t0, rows)

    t_out, f_out = pl.pallas_call(
        partial(_kernel_grouped, group=group),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, cap), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri table
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, r), jnp.int32, vma=vma),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(wl, counts.reshape(n_tiles, 1), o_t, d_t,
      t0.reshape(1, r), rows)
    return t_out[0], f_out[0]


# de Bruijn count-trailing-zeros: DBJ_TABLE[((lsb * DBJ) >>> 27) & 31]
# = bit index of the isolated low bit lsb (uint32 wrap == int32 wrap)
DBJ = 0x077CB531
_DBJ_TABLE = [0] * 32
for _k in range(32):
    _DBJ_TABLE[((1 << _k) * DBJ >> 27) & 31] = _k


def _kernel_mask(union_ref, o_ref, d_ref, t0_ref, dbj_ref, rows_ref,
                 t_ref, f_ref, *, cw: int):
    """Mask-driven variant: consumes the tile's wanted-cluster union
    bitmask directly (SMEM scalar words + de Bruijn bit scan) — no
    worklist compaction, no capacity limit, work exactly equals the
    number of set bits."""
    row = pl.program_id(0) % 8
    o = o_ref[:]                          # (3, TILE)
    d = d_ref[:]                          # (3, TILE)

    def word_body(w, carry):
        tb, fb = carry

        def cond(st):
            return st[0] != 0

        def bit_body(st):
            bits, tb, fb = st
            lsb = bits & -bits
            k = dbj_ref[0, jax.lax.shift_right_logical(
                lsb * DBJ, 27) & 31]
            cid = w * 32 + k
            tb, fb = _test_cluster(rows_ref[cid], o, d, tb, fb)
            return bits ^ lsb, tb, fb

        _, tb, fb = jax.lax.while_loop(
            cond, bit_body, (union_ref[row, w], tb, fb))
        return tb, fb

    t_init = t0_ref[:]                     # (1, TILE)
    f_init = jnp.full(t_init.shape, -1, jnp.int32)
    tb, fb = jax.lax.fori_loop(0, cw, word_body, (t_init, f_init))
    t_ref[:] = tb
    f_ref[:] = fb


@partial(jax.jit, static_argnames=("interpret", "tile"))
def pallas_cluster_intersect_mask(union, tri_rows_cm, ro, rd, t0,
                                  interpret: bool = False,
                                  tile: int = TILE):
    """union (n_tiles, CW) i32 wanted-cluster bitmask per ray tile
    (accel.clusters.tile_union_counts), tri_rows_cm (C, 12, LEAF) f32,
    ro/rd (R, 3) with R = n_tiles*tile, t0 (R,). Returns
    (t_best (R,), face (R,) i32, -1 = miss). Unlike the worklist form
    there is NO capacity limit: any number of set bits is consumed."""
    r = ro.shape[0]
    n_tiles, cw = union.shape
    assert r == n_tiles * tile
    assert n_tiles % 8 == 0, "pad ray count to 8*tile multiples"
    # guard the bit scan against stray bits >= c_total in the last
    # union word: the kernel indexes rows_ref[w*32 + k] for EVERY set
    # bit, so a padded/buggy mask producer would read out-of-bounds
    # triangle rows (ADVICE r3 low). c_total = rows table height.
    c_total = tri_rows_cm.shape[0]
    tail = c_total - (cw - 1) * 32            # valid bits in last word
    if 0 < tail < 32:
        last = union[:, cw - 1] & jnp.int32((1 << tail) - 1)
        union = jnp.concatenate([union[:, :cw - 1], last[:, None]], axis=1)

    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    dbj = jnp.asarray(_DBJ_TABLE, jnp.int32).reshape(1, 32)
    vma = vma_of(union, ro, rd, t0)
    union, o_t, d_t, t0, dbj, tri_rows_cm = pvary_to(
        vma, union, o_t, d_t, t0, dbj, tri_rows_cm)

    t_out, f_out = pl.pallas_call(
        partial(_kernel_mask, cw=cw),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, cw), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri table
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, r), jnp.int32, vma=vma),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(union, o_t, d_t, t0.reshape(1, r), dbj, tri_rows_cm)
    return t_out[0], f_out[0]
