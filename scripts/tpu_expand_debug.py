"""Bisect the expand kernel's hardware mismatch: run each stage of the
per-cluster cycle as a mini-kernel on the chip and compare to numpy.

Stages: (1) mask-page sublane select + dynamic bit shift -> m
        (2) lane prefix-sum rank
        (3) selection matrix build + compact matmul (payload roundtrip)
        (4) scatter-back roundtrip (t + face digits)
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt.kernels.cluster_expand import _lane_prefix_sum, split3_bf16

N = 2048
CW8 = 2            # pages
rng = np.random.default_rng(0)
mask_np = rng.integers(0, 2 ** 31, size=(CW8 * 8, N), dtype=np.int32)
pages = jnp.asarray(mask_np.reshape(CW8, 8, N))
wk = jnp.asarray([[11, 7]], jnp.int32)     # word 11, bit 7 (dynamic)


def k_stage12(wk_ref, mask_ref, m_ref, rank_ref):
    w = wk_ref[0, 0]
    k = wk_ref[0, 1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, N), 0)
    page = mask_ref[w >> 3]
    mrow = jnp.sum(jnp.where(sub == (w & 7), page, 0), axis=0,
                   keepdims=True)
    m = jax.lax.shift_right_logical(mrow, k) & 1
    m_ref[:] = m
    rank_ref[:] = _lane_prefix_sum(m, N) - m


@jax.jit
def run12(wk, pages):
    return pl.pallas_call(
        k_stage12,
        in_specs=[pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.int32),
                   jax.ShapeDtypeStruct((1, N), jnp.int32)],
    )(wk, pages)


m_hw, rank_hw = [np.asarray(x) for x in run12(wk, pages)]
m_ref = (mask_np[11] >> 7) & 1
rank_ref = np.cumsum(m_ref) - m_ref
print("stage1 m:", "OK" if np.array_equal(m_hw[0], m_ref) else "FAIL",
      flush=True)
print("stage2 rank:",
      "OK" if np.array_equal(rank_hw[0], rank_ref) else "FAIL", flush=True)
if not np.array_equal(rank_hw[0], rank_ref):
    bad = np.nonzero(rank_hw[0] != rank_ref)[0]
    print("  first bad lanes", bad[:8], rank_hw[0][bad[:8]],
          rank_ref[bad[:8]])


def k_stage34(pay_ref, m_ref, go_ref, gsel_ref):
    m = m_ref[:]
    rank = _lane_prefix_sum(m, N) - m
    slot = jax.lax.broadcasted_iota(jnp.int32, (128, N), 0)
    sel = (m > 0) & (rank < 128)
    rank_m = jnp.where(sel, rank, jnp.int32(-1))
    s = (rank_m == slot).astype(jnp.bfloat16)
    pay = pay_ref[:]
    g24 = jax.lax.dot_general(
        pay, s, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # (24, 128)
    go = g24[0:3] + g24[6:9] + g24[12:15]
    gd = g24[3:6] + g24[9:12] + g24[15:18]
    gcat = jnp.concatenate([go, gd], axis=0)      # (6, 128)
    # scatter the compacted values straight back (identity roundtrip)
    h, md, lo = split3_bf16(gcat)
    y = jnp.concatenate([h, md, lo], axis=0)      # (18, 128) bf16
    z = jax.lax.dot_general(
        y, s, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (18, N)
    back = z[0:6] + z[6:12] + z[12:18]
    go_ref[:] = gcat
    gsel_ref[:] = jnp.where(sel, back[0:6], -1.0)


@jax.jit
def run34(pay, m):
    return pl.pallas_call(
        k_stage34,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((6, 128), jnp.float32),
                   jax.ShapeDtypeStruct((6, N), jnp.float32)],
    )(pay, m)


od = rng.normal(size=(6, N)).astype(np.float32) * 3
oh, om, ol = split3_bf16(jnp.asarray(od[0:3]))
dh, dm, dl = split3_bf16(jnp.asarray(od[3:6]))
pay = jnp.concatenate([oh, dh, om, dm, ol, dl,
                       jnp.zeros((6, N), jnp.bfloat16)], axis=0)
m = jnp.asarray(m_ref.reshape(1, N).astype(np.int32))
go_hw, back_hw = [np.asarray(x) for x in run34(pay, m)]
sel_lanes = np.nonzero((m_ref > 0) & (rank_ref < 128))[0]
go_ref = np.full((6, 128), 0.0, np.float32)
go_ref[0:3, :len(sel_lanes)] = od[0:3, sel_lanes]
go_ref[3:6, :len(sel_lanes)] = od[3:6, sel_lanes]
print("stage3 compact:",
      "OK" if np.array_equal(go_hw[:, :len(sel_lanes)],
                             go_ref[:, :len(sel_lanes)]) else "FAIL",
      f"({len(sel_lanes)} selected)", flush=True)
if not np.array_equal(go_hw[:, :len(sel_lanes)],
                      go_ref[:, :len(sel_lanes)]):
    d = np.abs(go_hw[:, :len(sel_lanes)] - go_ref[:, :len(sel_lanes)])
    print("  maxdiff", d.max(), "at", np.unravel_index(d.argmax(),
                                                       d.shape))
back_ref = np.where((m_ref > 0) & (rank_ref < 128), 1.0, 0.0)
ok4 = True
for r in range(6):
    want = np.where(back_ref > 0, od[r], -1.0)
    if not np.array_equal(back_hw[r], want):
        ok4 = False
        bad = np.nonzero(back_hw[r] != want)[0]
        print(f"  stage4 row {r}: {len(bad)} bad, first",
              bad[:4], back_hw[r][bad[:4]], want[bad[:4]])
print("stage4 scatter:", "OK" if ok4 else "FAIL", flush=True)


# --- stage 5: dynamic page index on a BLOCKED 3D ref under a grid (the
# real kernel's configuration; stages 1-4 used an unblocked full ref) ---
def k_stage5(wk_ref, mask_ref, m_ref):
    w = wk_ref[0, 0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, N), 0)
    page = mask_ref[w >> 3]
    mrow = jnp.sum(jnp.where(sub == (w & 7), page, 0), axis=0,
                   keepdims=True)
    m_ref[:] = jax.lax.shift_right_logical(mrow, wk_ref[0, 1]) & 1


@jax.jit
def run5(wk, pages2):
    return pl.pallas_call(
        k_stage5,
        grid=(2,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((CW8, 8, N), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2 * N), jnp.int32),
    )(wk, pages2)


mask2_np = rng.integers(0, 2 ** 31, size=(CW8 * 8, 2 * N), dtype=np.int32)
pages2 = jnp.asarray(mask2_np.reshape(CW8, 8, 2 * N))
m5 = np.asarray(run5(wk, pages2))[0]
m5_ref = (mask2_np[11] >> 7) & 1
print("stage5 blocked-3D dynamic page:",
      "OK" if np.array_equal(m5, m5_ref) else "FAIL", flush=True)
if not np.array_equal(m5, m5_ref):
    bad = np.nonzero(m5 != m5_ref)[0]
    print("  bad lanes", len(bad), "first", bad[:6],
          "program split at", N)
