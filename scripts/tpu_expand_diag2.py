"""Stage-6 diagnosis: run the REAL expand-kernel control flow on the
real 256^2 wavefront, but with the triangle test replaced by in-kernel
selection-matrix invariant checks:

  viol1[i] = max over clusters of |colsum(S)[i] - sel[i]|
             (a lane selected by != 1 slots => compaction collision)
  viol2[i] = max over clusters of |scatter(slot ids)[i] - (rank-base)[i]|
             on selected lanes (scatter goes to the wrong lane)
  nclus[i] = number of cluster-rounds that selected lane i
             (should equal the ray's mask popcount if every wanted
             cluster reaches the ray exactly once)
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

from raypt import RenderConfig
from raypt.accel.ctree import build_onehot, walk_topwalk_jnp
from raypt.accel.host_bvh import build_sah
from raypt.core.math3d import normalize
from raypt.kernels.cluster_expand import _lane_prefix_sum
from raypt.kernels.cluster_pallas import DBJ, _DBJ_TABLE, word_summary
from raypt.render.integrator import (_block_order, camera_rays_for_ids,
                                     pixel_id_grid)
from raypt.scenes import stanford_bunny

N = int(os.environ.get("DIAG_N", 2048))


def _kernel_diag(summary_ref, union_ref, pay_ref, o_ref, mask_ref,
                 dbj_ref, v1_ref, v2_ref, nc_ref, v3_ref,
                 *, cw: int, n: int):
    from raypt.kernels.cluster_expand import split3_bf16
    sw = -(-cw // 32)
    row = pl.program_id(0) % 8
    slot = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
    slotv = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
    ones128 = jnp.ones((1, 128), jnp.bfloat16)

    v1 = jnp.zeros((1, n), jnp.float32)
    v2 = jnp.zeros((1, n), jnp.float32)
    nc = jnp.zeros((1, n), jnp.int32)
    v3 = jnp.zeros((1, n), jnp.float32)
    pay = pay_ref[:]
    otrue = o_ref[:]                       # (6, n) f32

    for j in range(sw):

        def wcond(st):
            return st[0] != 0

        def wbody(st):
            wbits, v1, v2, nc, v3 = st
            wlsb = wbits & -wbits
            wk = dbj_ref[0, jax.lax.shift_right_logical(
                wlsb * DBJ, 27) & 31]
            w = j * 32 + wk
            page = mask_ref[w >> 3]
            mrow = jnp.sum(jnp.where(sub == (w & 7), page, 0),
                           axis=0, keepdims=True)

            def bcond(st2):
                return st2[0] != 0

            def bbody(st2):
                bits, v1, v2, nc, v3 = st2
                lsb = bits & -bits
                k = dbj_ref[0, jax.lax.shift_right_logical(
                    lsb * DBJ, 27) & 31]
                m = jax.lax.shift_right_logical(mrow, k) & 1
                count = jnp.sum(m)
                rank = _lane_prefix_sum(m, n) - m

                def rcond(st3):
                    return st3[0] * 128 < count

                def rbody(st3):
                    r, v1, v2, nc, v3 = st3
                    base = r * 128
                    sel = (m > 0) & (rank >= base) & (rank < base + 128)
                    rank_m = jnp.where(sel, rank - base, jnp.int32(-1))
                    s = (rank_m == slot).astype(jnp.bfloat16)
                    z1 = jax.lax.dot_general(
                        ones128, s,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (1, n)
                    selv = sel.astype(jnp.float32)
                    v1 = jnp.maximum(v1, jnp.abs(z1 - selv))
                    z2 = jax.lax.dot_general(
                        slotv.astype(jnp.bfloat16), s,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (1, n)
                    want = jnp.where(sel, (rank_m).astype(jnp.float32),
                                     0.0)
                    v2 = jnp.maximum(v2, jnp.abs(
                        jnp.where(sel, z2, 0.0) - want))
                    nc = nc + sel.astype(jnp.int32)
                    # payload-dot reconstruction + full transport check
                    g24 = jax.lax.dot_general(
                        pay, s,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    go = g24[0:3] + g24[6:9] + g24[12:15]   # (3, 128)
                    gd = g24[3:6] + g24[9:12] + g24[15:18]
                    backs = []
                    for gpart in (go, gd):       # PROVEN 9-row transport
                        th, tm, tl = split3_bf16(gpart)
                        y = jnp.concatenate([th, tm, tl], axis=0)
                        z = jax.lax.dot_general(
                            y, s,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (9, n)
                        backs.append(z[0:3] + z[3:6] + z[6:9])
                    dvo = jnp.max(jnp.abs(backs[0] - otrue[0:3]), axis=0,
                                  keepdims=True)
                    dvd = jnp.max(jnp.abs(backs[1] - otrue[3:6]), axis=0,
                                  keepdims=True)
                    v3 = jnp.maximum(v3, jnp.where(sel, dvo, 0.0))
                    v2 = jnp.maximum(v2, jnp.where(sel, dvd, 0.0))
                    return r + 1, v1, v2, nc, v3

                _, v1, v2, nc, v3 = jax.lax.while_loop(
                    rcond, rbody, (jnp.int32(0), v1, v2, nc, v3))
                return bits ^ lsb, v1, v2, nc, v3

            _, v1, v2, nc, v3 = jax.lax.while_loop(
                bcond, bbody, (union_ref[row, w], v1, v2, nc, v3))
            return wbits ^ wlsb, v1, v2, nc, v3

        _, v1, v2, nc, v3 = jax.lax.while_loop(
            wcond, wbody, (summary_ref[row, j], v1, v2, nc, v3))

    v1_ref[:] = v1
    v2_ref[:] = v2
    nc_ref[:] = nc
    v3_ref[:] = v3


@partial(jax.jit, static_argnames=("n_rays",))
def run_diag(mask_cm, ro, rd_g, n_rays: int):
    from raypt.kernels.cluster_expand import split3_bf16
    cwp, r = mask_cm.shape
    o_t = ro.T.reshape(3, r)
    d_t = rd_g.T.reshape(3, r)
    oh, om, ol = split3_bf16(o_t)
    dh, dm, dl = split3_bf16(d_t)
    pay = jnp.concatenate([oh, dh, om, dm, ol, dl,
                           jnp.zeros((6, r), jnp.bfloat16)], axis=0)
    o_t = jnp.concatenate([o_t, d_t], axis=0)          # (6, r) truth
    n_prog = r // n_rays
    union = jax.lax.reduce(
        mask_cm.reshape(cwp, n_prog, n_rays), jnp.int32(0),
        jax.lax.bitwise_or, (2,)).T
    summary = word_summary(union)
    sw = summary.shape[1]
    prog_pad = (-n_prog) % 8
    if prog_pad:
        union = jnp.concatenate(
            [union, jnp.zeros((prog_pad, cwp), jnp.int32)], axis=0)
        summary = jnp.concatenate(
            [summary, jnp.zeros((prog_pad, sw), jnp.int32)], axis=0)
    pages = mask_cm.reshape(cwp // 8, 8, r)
    dbj = jnp.asarray(_DBJ_TABLE, jnp.int32).reshape(1, 32)
    return pl.pallas_call(
        partial(_kernel_diag, cw=cwp, n=n_rays),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((8, sw), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cwp), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((24, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cwp // 8, 8, n_rays), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(summary, union, pay, o_t, pages, dbj)


b = stanford_bunny()
scene = b.freeze()
bvh = build_sah(scene.mesh)
clusters, table = build_onehot(bvh, scene.mesh.positions,
                               scene.mesh.faces, scene.mesh.face_valid,
                               leaf=64)
num_words = -(-clusters.num_clusters // 32)
size = 256
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
mask_ref = jax.jit(walk_topwalk_jnp, static_argnames=("num_words",))(
    table, ro, rd, t0, act, num_words=num_words)
cwp = -(-num_words // 8) * 8
mask_cm = jnp.concatenate(
    [mask_ref.T, jnp.zeros((cwp - num_words, r), jnp.int32)], axis=0)
v1, v2, nc, v3 = [np.asarray(x) for x in run_diag(mask_cm, ro, rd, N)]
mask_np = np.asarray(mask_ref).astype(np.uint32)
pop = np.zeros(r, np.int64)
for w in range(num_words):
    col = mask_np[:, w]
    for k in range(32):
        pop += (col >> k) & 1
print(f"viol1 (colsum != sel): max={v1.max()} nbad={(v1[0] != 0).sum()}")
print(f"viol2 REPURPOSED = d-rows reconstruction: max={v2.max()} "
      f"nbad={(v2[0] != 0).sum()}")
nc_bad = np.nonzero(nc[0] != pop)[0]
print(f"nclus != popcount: {len(nc_bad)} rays")
print(f"viol3 = o-rows reconstruction: max={v3.max()} "
      f"nbad={(v3[0] != 0).sum()}")
if len(nc_bad):
    print("  first", nc_bad[:8], "nc", nc[0][nc_bad[:8]],
          "pop", pop[nc_bad[:8]])
    print("  by program:",
          np.bincount(nc_bad // N, minlength=r // N))
