"""Pallas TPU kernel: per-ray-exact cluster intersection via in-kernel
lane regrouping (the round-5 "cluster-queue expansion", PLAN_R5.md).

Why: the dense-tile phase B (cluster_pallas.pallas_cluster_intersect_
mask) tests every ray of a 256-ray tile against every cluster in the
tile's UNION mask. On incoherent bounce-1..3 wavefronts the union runs
12-62 clusters while each ray wants only ~2.2-3.1, so the tile pays
56-158x the per-ray-exact triangle work (scripts/tpu_phase_decomp.py).
The CUDA megakernel gets per-thread divergence handling for free (each
thread tests only its own BVH leaves and breaks when done,
/root/reference/RayTracing/main_raytracing.cu:118-157); every XLA-level
remedy (global/segmented compaction, sort-based stream expansion) is a
measured loss (STATUS.md negative ledger).

The TPU answer implemented here: the kernel itself regroups rays by
cluster, using the MXU as the lane-permutation engine. Per grid
program (N rays, lanes):

  1. scan the program's DISTINCT wanted clusters with the same
     two-level de Bruijn word scan as the mask kernel (union + summary
     in SMEM);
  2. for cluster c, extract the per-ray interest mask m from the
     per-ray wanted-bitmask pages (VMEM), rank interested lanes with a
     log-step shifted-add prefix sum (Mosaic has no cumsum), and build
     a one-hot SELECTION matrix S (128, N): S[j, i] = 1 iff ray i is
     the j-th interested lane of the current 128-round;
  3. COMPACT: one MXU matmul payload (24, N) x S^T gathers the <=128
     interested rays' (o, d) to the front lanes;
  4. dense-test cluster c's triangle block against the 128 compacted
     rays (the same Moller-Trumbore broadcasts as the mask kernel, at
     half the ray width);
  5. SCATTER-BACK: the transposed one-hot matmul returns each lane's
     (t, face) to its source lane, min-merged into the per-ray carry.
     Clusters wanted by more than 128 rays loop additional 128-lane
     rounds, so total dense work equals the exact per-ray work rounded
     up to 128-lane granularity.

Exactness: the MXU's native operand is bf16, so all values crossing a
selection matmul are split into three bf16 terms (f32's 24-bit
significand = 3 x 8-bit chunks; each residual is exactly
representable, so hi + md + lo == x bitwise). Face ids cross as three
base-256 digits (each < 256, exact in bf16) — valid for meshes under
2^24 faces (asserted by the caller). The selection matrix is 0/1
(exact in bf16) with exactly one nonzero per output slot, so every
f32-accumulated dot product is a plain copy. Results are therefore
BITWISE equal to the dense mask kernel's.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math3d import BIG
from .cluster_pallas import DBJ, _DBJ_TABLE, _test_cluster, word_summary
from .vma_util import pvary_to, vma_of

EXPAND_N = 2048          # rays per grid program (lanes)


def split3_bf16(x: jax.Array):
    """f32 -> three bf16 arrays with hi + md + lo == x exactly:
    24-bit significand = 3 exact 8-bit chunks; each subtraction is
    exact because the rounded term agrees with x in its top bits.

    Domain: exact for |x| >= ~2^-102 (and +-0). Below that the
    residual chunks (scaled by up to 2^-24) fall under bf16's flush-
    to-zero threshold (2^-126) and are lost. Irrelevant here: ray
    origins/directions, the 1e-12-clamped reciprocals, and hit
    distances all sit far inside the exact range.

    CRITICAL implementation note: the truncation rides INTEGER
    bitmasking, NOT a bf16 cast round-trip. Under
    --xla_allow_excess_precision=true (set by TPU runtimes) XLA is
    free to ELIDE `x.astype(bf16).astype(f32)`, which turns the
    residual into x - x = 0 and silently collapses the split to
    hi-only (~4e-3 relative error — measured on v5e as exactly the
    bf16-level hit perturbation in scripts/tpu_expand_diag2.py;
    interpret/CPU runs stayed bitwise-correct, which is what made the
    bug hardware-only). lax.reduce_precision would also work but has
    no Mosaic lowering, and this function runs both in the XLA
    wrapper (payload build) and inside the kernel (t transport).
    Masking the low 16 mantissa bits truncates the magnitude to an
    exactly-bf16-representable value; the final bf16 casts convert
    already-on-grid values exactly, so eliding them is harmless."""
    top = jnp.int32(-65536)            # 0xFFFF0000
    xb = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(xb & top, jnp.float32)
    r1 = x - hi                        # exact: <= 16 significand bits
    rb = jax.lax.bitcast_convert_type(r1, jnp.int32)
    md = jax.lax.bitcast_convert_type(rb & top, jnp.float32)
    lo = (r1 - md).astype(jnp.bfloat16)   # exact: <= 8 bits left
    return hi.astype(jnp.bfloat16), md.astype(jnp.bfloat16), lo


def _lane_prefix_sum(x: jax.Array, n: int) -> jax.Array:
    """Inclusive prefix sum over the lane axis via log-step shifted
    adds (static lane slices; Mosaic has no cumsum lowering)."""
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], k), x.dtype), x[:, :n - k]], axis=1)
        x = x + shifted
        k *= 2
    return x


def _kernel_expand(summary_ref, union_ref, pay_ref, mask_ref, t0_ref,
                   dbj_ref, rows_ref, t_ref, f_ref, *, cw: int, n: int):
    """See module docstring. Block contracts:
      summary_ref (8, sw) SMEM; union_ref (8, cw) SMEM (row = pid % 8)
      pay_ref (24, N) bf16 VMEM: rows [o_hi(3), d_hi(3), o_md(3),
        d_md(3), o_lo(3), d_lo(3), pad(6)]
      mask_ref (cw//8, 8, N) i32 VMEM: per-ray wanted-bitmask pages
      t0_ref (1, N) f32; rows_ref full (C, 12, L) f32 tri table
      outputs t_ref (1, N) f32, f_ref (1, N) i32
    """
    sw = -(-cw // 32)
    row = pl.program_id(0) % 8
    pay = pay_ref[:]                              # (24, N) bf16
    slot = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)

    tb = t0_ref[:]                                # (1, N)
    fb = jnp.full(tb.shape, -1, jnp.int32)
    big_row = jnp.full((1, 128), BIG, jnp.float32)
    zero_f = jnp.zeros((1, 128), jnp.int32)

    for j in range(sw):                           # static: sw is 1-2

        def wcond(st):
            return st[0] != 0

        def wbody(st):
            wbits, tb, fb = st
            wlsb = wbits & -wbits
            wk = dbj_ref[0, jax.lax.shift_right_logical(
                wlsb * DBJ, 27) & 31]
            w = j * 32 + wk
            page = mask_ref[w >> 3]               # (8, N) i32, dynamic
            mrow = jnp.sum(jnp.where(sub == (w & 7), page, 0),
                           axis=0, keepdims=True)  # (1, N)

            def bcond(st2):
                return st2[0] != 0

            def bbody(st2):
                bits, tb, fb = st2
                # BATCH-8 rank pass (round 5): a (1, N) row occupies
                # 64 vregs at 1/8 sublane occupancy, so the per-cluster
                # log-step prefix sum was the cycle's dominant VPU cost
                # (13 steps x 128 vreg-ops). Extract up to 8 set bits
                # (scalar ops), stack their interest rows to (8, N),
                # and rank ALL of them in ONE full-occupancy pass —
                # identical op count to one (1, N) pass, 8x the work.
                # Ascending-lsb order is preserved (invalid slots carry
                # m = 0 and are skipped), so the min-merge sequence —
                # and therefore the result — stays BITWISE identical.
                ms = []
                kcs = []
                b = bits
                for _ in range(8):
                    lsb = b & -b
                    kk = dbj_ref[0, jax.lax.shift_right_logical(
                        lsb * DBJ, 27) & 31]
                    valid = b != 0
                    ms.append(jnp.where(
                        valid,
                        jax.lax.shift_right_logical(mrow, kk) & 1,
                        0))                                # (1, N)
                    kcs.append(jnp.where(valid, kk, 0))
                    b = b & (b - 1)
                m8 = jnp.concatenate(ms, axis=0)           # (8, N)
                rank8 = _lane_prefix_sum(m8, n) - m8       # exclusive

                for jj in range(8):                        # static
                    c = w * 32 + kcs[jj]
                    m = m8[jj:jj + 1]                      # (1, N)
                    rank = rank8[jj:jj + 1]
                    count = jnp.sum(m)

                    def rcond(st3):
                        return st3[0] * 128 < count

                    def rbody(st3, m=m, rank=rank, c=c):
                        r, tb, fb = st3
                        base = r * 128
                        sel = (m > 0) & (rank >= base) & \
                            (rank < base + 128)
                        # rank folded to a single (1, N) comparand
                        # before the (128, N) compare: the two-operand
                        # broadcast form `(rank - base == slot) & sel`
                        # hits a Mosaic relayout error on
                        # vector<128xNxi1> (scripts/tpu_sel_probe.py)
                        rank_m = jnp.where(sel, rank - base,
                                           jnp.int32(-1))
                        s = (rank_m == slot).astype(jnp.bfloat16)
                        g24 = jax.lax.dot_general(
                            pay, s,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        go = g24[0:3] + g24[6:9] + g24[12:15]
                        gd = g24[3:6] + g24[9:12] + g24[15:18]
                        tq, fq = _test_cluster(rows_ref[c], go, gd,
                                               big_row, zero_f)
                        # encode (t, face) for the exact bf16 scatter
                        th, tm, tl = split3_bf16(tq)
                        fqs = jnp.maximum(fq, 0)  # misses never win
                        f_d = jnp.concatenate(
                            [fqs >> 16, (fqs >> 8) & 255, fqs & 255],
                            axis=0).astype(jnp.bfloat16)
                        y = jnp.concatenate([th, tm, tl, f_d], axis=0)
                        z = jax.lax.dot_general(
                            y, s,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        tsel = jnp.where(sel,
                                         z[0:1] + z[1:2] + z[2:3], BIG)
                        fsel = \
                            (jnp.round(z[3:4]).astype(jnp.int32) << 16) \
                            | (jnp.round(z[4:5]).astype(jnp.int32) << 8) \
                            | jnp.round(z[5:6]).astype(jnp.int32)
                        better = tsel < tb
                        return (r + 1, jnp.where(better, tsel, tb),
                                jnp.where(better, fsel, fb))

                    _, tb, fb = jax.lax.while_loop(
                        rcond, rbody, (jnp.int32(0), tb, fb))
                return b, tb, fb

            _, tb, fb = jax.lax.while_loop(
                bcond, bbody, (union_ref[row, w], tb, fb))
            return wbits ^ wlsb, tb, fb

        _, tb, fb = jax.lax.while_loop(
            wcond, wbody, (summary_ref[row, j], tb, fb))

    t_ref[:] = tb
    f_ref[:] = fb


@partial(jax.jit, static_argnames=("interpret", "n_rays"))
def pallas_cluster_expand(mask_cm, tri_rows_cm, ro, rd, t0,
                          interpret: bool = False,
                          n_rays: int = EXPAND_N,
                          union_pp=None):
    """Per-ray-exact phase B (see module docstring).

    mask_cm (CWP, R) i32: per-ray wanted-cluster bitmask in the walk
    kernel's column-major layout (kernels.onehot_walk.pallas_topwalk_cm
    called with num_words = CWP, a multiple of 8), tri_rows_cm
    (C, 12, LEAF) f32, ro/rd (R, 3) rays, t0 (R,) seed distances.
    R must divide into 8 * n_rays program groups. Returns
    (t_best (R,), face (R,) i32, -1 = miss) — bitwise equal to
    pallas_cluster_intersect_mask on the same masks.

    union_pp (round 5): optional (R // walk_tile, CWP) per-walk-program
    unions from pallas_topwalk_cm_u. When given (and the walk tile
    divides n_rays), the per-group distinct-cluster union is OR-folded
    from these tiny rows instead of tree-reducing the full (CWP, R)
    mask — the reduce reads ~100 MB/bounce on the 1024^2 bench."""
    r = ro.shape[0]
    cwp = mask_cm.shape[0]
    assert cwp % 8 == 0, f"pad num_words to a multiple of 8, got {cwp}"
    assert r % n_rays == 0, (r, n_rays)
    n_prog = r // n_rays
    assert n_rays % 128 == 0, n_rays
    c_total = tri_rows_cm.shape[0]
    cw = -(-c_total // 32)
    assert cwp >= cw, (cwp, cw)
    # stray-high-bit guard (same as the mask kernel): the scan indexes
    # rows_ref[w*32+k] for EVERY set bit, so zero any bits >= c_total
    # in the last valid word (higher pad words are asserted zero by the
    # walk's own cid < c_total invariant, but guard this word anyway)
    tail = c_total - (cw - 1) * 32
    if 0 < tail < 32:
        fixed = mask_cm[cw - 1:cw] & jnp.int32((1 << tail) - 1)
        mask_cm = jnp.concatenate(
            [mask_cm[:cw - 1], fixed, mask_cm[cw:]], axis=0)

    # per-program distinct-cluster union + nonzero-word summary
    if union_pp is not None and n_rays % (r // union_pp.shape[0]) == 0:
        wt = r // union_pp.shape[0]                         # walk tile
        if 0 < tail < 32:   # mirror the stray-high-bit guard above
            union_pp = union_pp.at[:, cw - 1].set(
                union_pp[:, cw - 1] & jnp.int32((1 << tail) - 1))
        union = jax.lax.reduce(
            union_pp.reshape(n_prog, n_rays // wt, cwp), jnp.int32(0),
            jax.lax.bitwise_or, (1,))                       # (n_prog, cwp)
    else:
        union = jax.lax.reduce(
            mask_cm.reshape(cwp, n_prog, n_rays), jnp.int32(0),
            jax.lax.bitwise_or, (2,)).T                     # (n_prog, cwp)
    summary = word_summary(union)
    sw = summary.shape[1]
    # summary/union ride 8-program SMEM blocks; pad the (tiny) arrays
    # with zero rows so the block shape divides — padded rows are never
    # read (grid stops at n_prog)
    prog_pad = (-n_prog) % 8
    if prog_pad:
        union = jnp.concatenate(
            [union, jnp.zeros((prog_pad, cwp), jnp.int32)], axis=0)
        summary = jnp.concatenate(
            [summary, jnp.zeros((prog_pad, sw), jnp.int32)], axis=0)

    # payload: (o, d) split into three exact bf16 terms (24 rows)
    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)
    oh, om, ol = split3_bf16(o_t)
    dh, dm, dl = split3_bf16(d_t)
    pay = jnp.concatenate(
        [oh, dh, om, dm, ol, dl,
         jnp.zeros((6, r), jnp.bfloat16)], axis=0)          # (24, R)

    pages = mask_cm.reshape(cwp // 8, 8, r)
    dbj = jnp.asarray(_DBJ_TABLE, jnp.int32).reshape(1, 32)
    vma = vma_of(mask_cm, ro, rd, t0)
    summary, union, pay, pages, t0, dbj, tri_rows_cm = pvary_to(
        vma, summary, union, pay, pages, t0, dbj, tri_rows_cm)

    t_out, f_out = pl.pallas_call(
        partial(_kernel_expand, cw=cwp, n=n_rays),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((8, sw), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cwp), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((24, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cwp // 8, 8, n_rays), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri table
        ],
        out_specs=[
            pl.BlockSpec((1, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, r), jnp.int32, vma=vma),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(summary, union, pay, pages, t0.reshape(1, r), dbj, tri_rows_cm)
    return t_out[0], f_out[0]
