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


def _kernel_mask(summary_ref, union_ref, o_ref, d_ref, t0_ref, dbj_ref,
                 rows_ref, t_ref, f_ref, *, cw: int, tile: int, tpp: int):
    """Mask-driven variant: consumes the tile's wanted-cluster union
    bitmask directly (SMEM scalar words + de Bruijn bit scan) — no
    worklist compaction, no capacity limit, work exactly equals the
    number of set bits.

    Two fixed-cost killers (isolated profile, r4):
      * each grid program handles `tpp` consecutive ray tiles (the
        per-grid-step overhead was ~2.5 us);
      * the word loop is a TWO-LEVEL scan: summary_ref holds a bitmask
        of NONZERO union words per tile, so the kernel pops only words
        that actually carry bits (a flat fori over cw words cost
        ~150 ns x cw per tile even for an all-empty union — ~6 us/tile
        at cw = 37, ~100 ms per bench render)."""
    sw = -(-cw // 32)

    def tile_body(s, _):
        o = o_ref[:, pl.ds(s * tile, tile)]       # (3, TILE)
        d = d_ref[:, pl.ds(s * tile, tile)]

        t_init = t0_ref[:, pl.ds(s * tile, tile)]  # (1, TILE)
        f_init = jnp.full(t_init.shape, -1, jnp.int32)
        tb, fb = t_init, f_init
        for j in range(sw):                        # static: sw is 1-2

            def wcond(st):
                return st[0] != 0

            def wbody(st):
                wbits, tb, fb = st
                wlsb = wbits & -wbits
                wk = dbj_ref[0, jax.lax.shift_right_logical(
                    wlsb * DBJ, 27) & 31]
                w = j * 32 + wk

                def cond(st2):
                    return st2[0] != 0

                def bit_body(st2):
                    bits, tb, fb = st2
                    lsb = bits & -bits
                    k = dbj_ref[0, jax.lax.shift_right_logical(
                        lsb * DBJ, 27) & 31]
                    cid = w * 32 + k
                    tb, fb = _test_cluster(rows_ref[cid], o, d, tb, fb)
                    return bits ^ lsb, tb, fb

                _, tb, fb = jax.lax.while_loop(
                    cond, bit_body, (union_ref[s, w], tb, fb))
                return wbits ^ wlsb, tb, fb

            _, tb, fb = jax.lax.while_loop(
                wcond, wbody, (summary_ref[s, j], tb, fb))
        t_ref[:, pl.ds(s * tile, tile)] = tb
        f_ref[:, pl.ds(s * tile, tile)] = fb
        return 0

    jax.lax.fori_loop(0, tpp, tile_body, 0)


def word_summary(union: jax.Array) -> jax.Array:
    """(n_tiles, cw) union bitmask -> (n_tiles, ceil(cw/32)) bitmask of
    NONZERO words (the two-level scan's top level)."""
    n_tiles, cw = union.shape
    sw = -(-cw // 32)
    pad = sw * 32 - cw
    nz = (union != 0).astype(jnp.int32)
    if pad:
        nz = jnp.concatenate(
            [nz, jnp.zeros((n_tiles, pad), jnp.int32)], axis=1)
    return jnp.sum(nz.reshape(n_tiles, sw, 32)
                   << jnp.arange(32, dtype=jnp.int32), axis=-1)


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
    summary = word_summary(union)
    sw = summary.shape[1]
    vma = vma_of(union, ro, rd, t0)
    summary, union, o_t, d_t, t0, dbj, tri_rows_cm = pvary_to(
        vma, summary, union, o_t, d_t, t0, dbj, tri_rows_cm)

    tpp = 8                                     # tiles per grid program
    span = tpp * tile
    t_out, f_out = pl.pallas_call(
        partial(_kernel_mask, cw=cw, tile=tile, tpp=tpp),
        grid=(n_tiles // tpp,),
        in_specs=[
            pl.BlockSpec((tpp, sw), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tpp, cw), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri table
        ],
        out_specs=[
            pl.BlockSpec((1, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, r), jnp.int32, vma=vma),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(summary, union, o_t, d_t, t0.reshape(1, r), dbj, tri_rows_cm)
    return t_out[0], f_out[0]


def _kernel_mask_woop(summary_ref, union_ref, oh_ref, dh_ref, t0_ref,
                      dbj_ref, woop_ref, t_ref, p_ref, *, cw: int,
                      tile: int, tpp: int, leaf: int):
    """Woop-MXU mask variant: per set union bit, ONE f32 contraction
    (4, 3L) x (4, 2T) -> (3L, 2T) on the MXU replaces the dense
    Moller-Trumbore broadcasts, and the VPU epilogue is just
    t = -o'w/d'w, u = o'u + t d'u, v = o'v + t d'v + the hit tests —
    ~2.5x fewer vector-issue slots per pair than _test_cluster (the
    isolated profile showed phase B is VPU-issue-bound, not
    scalar-dispatch-bound). Emits (t_best, packed) with
    packed = cid*leaf + lane (-1 = miss); the face id is resolved by a
    single R-scale gather outside the kernel (fid_flat from
    accel.clusters.build_woop_cm)."""

    sw = -(-cw // 32)

    def tile_body(s, _):
        oh = oh_ref[:, pl.ds(s * tile, tile)]    # (4, T) [o;1]
        dh = dh_ref[:, pl.ds(s * tile, tile)]    # (4, T) [d;0]
        rays = jnp.concatenate([oh, dh], axis=1)  # (4, 2T)

        t_init = t0_ref[:, pl.ds(s * tile, tile)]
        p_init = jnp.full(t_init.shape, -1, jnp.int32)
        tb, pb = t_init, p_init
        for j in range(sw):                       # static: sw is 1-2

            def wcond(st):
                return st[0] != 0

            def wbody(st):
                wbits, tb, pb = st
                wlsb = wbits & -wbits
                wk = dbj_ref[0, jax.lax.shift_right_logical(
                    wlsb * DBJ, 27) & 31]
                w = j * 32 + wk

                def cond(st2):
                    return st2[0] != 0

                def bit_body(st2):
                    bits, tb, pb = st2
                    lsb = bits & -bits
                    k = dbj_ref[0, jax.lax.shift_right_logical(
                        lsb * DBJ, 27) & 31]
                    cid = w * 32 + k
                    # precision=HIGHEST: the MXU's default f32 path is
                    # a single bf16 pass (8-bit mantissa) — u/v/t then
                    # carry O(1e-2) error and hits go wrong (measured:
                    # image diff 50 on TPU while CPU matched exactly)
                    out = jax.lax.dot_general(
                        woop_ref[cid], rays,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)   # (3L, 2T)
                    ou, du = out[0:leaf, :tile], out[0:leaf, tile:]
                    ov, dv = out[leaf:2 * leaf, :tile], out[leaf:2 * leaf,
                                                            tile:]
                    ow, dw = out[2 * leaf:, :tile], out[2 * leaf:, tile:]
                    tq = -ow / dw          # parallel rays -> +-inf/nan,
                    u = ou + tq * du       # rejected by the u+v<=1 test
                    v = ov + tq * dv
                    hit = (tq > 0.0) & (u >= 0.0) & (v >= 0.0) & \
                        (u + v <= 1.0)
                    t = jnp.where(hit, tq, BIG)               # (L, T)
                    tmin = jnp.min(t, axis=0)[None, :]        # (1, T)
                    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                    lmin = jnp.min(jnp.where(t <= tmin, lane, BIG_I),
                                   axis=0)[None, :]
                    better = tmin < tb
                    pb = jnp.where(better, cid * leaf + lmin, pb)
                    tb = jnp.where(better, tmin, tb)
                    return bits ^ lsb, tb, pb

                _, tb, pb = jax.lax.while_loop(
                    cond, bit_body, (union_ref[s, w], tb, pb))
                return wbits ^ wlsb, tb, pb

            _, tb, pb = jax.lax.while_loop(
                wcond, wbody, (summary_ref[s, j], tb, pb))
        t_ref[:, pl.ds(s * tile, tile)] = tb
        p_ref[:, pl.ds(s * tile, tile)] = pb
        return 0

    jax.lax.fori_loop(0, tpp, tile_body, 0)


@partial(jax.jit, static_argnames=("interpret", "tile"))
def pallas_cluster_intersect_mask_woop(union, woop_cm, ro, rd, t0,
                                       interpret: bool = False,
                                       tile: int = TILE):
    """Woop-MXU phase B (see _kernel_mask_woop). union (n_tiles, CW)
    i32, woop_cm (C, 4, 3L) f32 from accel.clusters.build_woop_cm,
    ro/rd (R, 3), t0 (R,). Returns (t_best (R,), packed (R,) i32 with
    packed = cid*L + lane, -1 = miss) — resolve the face id with
    fid_flat[packed]."""
    r = ro.shape[0]
    n_tiles, cw = union.shape
    assert r == n_tiles * tile
    assert n_tiles % 8 == 0, "pad ray count to 8*tile multiples"
    c_total = woop_cm.shape[0]
    leaf = woop_cm.shape[2] // 3
    tail = c_total - (cw - 1) * 32            # stray-high-bit guard
    if 0 < tail < 32:
        last = union[:, cw - 1] & jnp.int32((1 << tail) - 1)
        union = jnp.concatenate([union[:, :cw - 1], last[:, None]], axis=1)

    oh = jnp.concatenate([ro.T, jnp.ones((1, r), ro.dtype)], axis=0)
    dh = jnp.concatenate([rd.T, jnp.zeros((1, r), rd.dtype)], axis=0)
    dbj = jnp.asarray(_DBJ_TABLE, jnp.int32).reshape(1, 32)
    summary = word_summary(union)
    sw = summary.shape[1]
    vma = vma_of(union, ro, rd, t0)
    summary, union, oh, dh, t0, dbj, woop_cm = pvary_to(
        vma, summary, union, oh, dh, t0, dbj, woop_cm)

    tpp = 8
    span = tpp * tile
    t_out, p_out = pl.pallas_call(
        partial(_kernel_mask_woop, cw=cw, tile=tile, tpp=tpp, leaf=leaf),
        grid=(n_tiles // tpp,),
        in_specs=[
            pl.BlockSpec((tpp, sw), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tpp, cw), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full woop table
        ],
        out_specs=[
            pl.BlockSpec((1, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, r), jnp.int32, vma=vma),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(summary, union, oh, dh, t0.reshape(1, r), dbj, woop_cm)
    return t_out[0], p_out[0]
