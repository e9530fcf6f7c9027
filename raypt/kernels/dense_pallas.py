"""Pallas TPU kernel: fused MXU ray/triangle closest-hit (Woop form).

The megakernel successor for the dense path (SURVEY §7 M3): one kernel
fuses the 6 Woop matmuls, the unit-triangle hit tests, and the
closest-hit reduction, with the triangle transform table resident in
VMEM across the whole grid — no HBM traffic per visit at all for scenes
that fit (<= ~16k triangles per table).

Layouts are TPU-first:
  rays (3, R): components on sublanes, rays on lanes;
  transforms as three (3, T) matrices (one per unit-space output
  component) so each product is a plain (R,3)x(3,T) MXU contraction
  with no in-kernel transpose or strided slicing;
  argmin realized as min + masked index-min (two lane reductions —
  portable where a native argmin lowering is not).

grid = ray tiles; per tile the kernel loops triangle chunks with a
fori carry of (t_best, face). The jnp fallback (accel.dense) is the
correctness oracle; parity is tested in tests/test_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math3d import BIG

RAY_TILE = 256
TRI_CHUNK = 2048
BIG_I = 2 ** 30  # python int: avoids captured-constant in the kernel


def _kernel(o_ref, d_ref, t0_ref, wu_ref, wv_ref, ww_ref, cu_ref, cv_ref,
            cw_ref, t_ref, f_ref, *, tri_chunks: int, tri_chunk: int):
    o = o_ref[:]                       # (3, R)
    d = d_ref[:]                       # (3, R)

    def chunk(ci, carry):
        t_best, face = carry
        sl = pl.ds(ci * tri_chunk, tri_chunk)
        wu = wu_ref[:, sl]             # (3, TC)
        wv = wv_ref[:, sl]
        ww = ww_ref[:, sl]
        dn = (((0,), (0,)), ((), ()))

        def mm(a, b):
            return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)

        ou = mm(o, wu) + cu_ref[0, sl][None, :]    # (R, TC)
        ov = mm(o, wv) + cv_ref[0, sl][None, :]
        ow = mm(o, ww) + cw_ref[0, sl][None, :]
        du = mm(d, wu)
        dv = mm(d, wv)
        dw = mm(d, ww)

        ok_dw = jnp.abs(dw) > 1e-12
        t = jnp.where(ok_dw, -ow / jnp.where(ok_dw, dw, 1.0), BIG)
        u = ou + t * du
        v = ov + t * dv
        hit = ok_dw & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
        t = jnp.where(hit, t, BIG)

        tmin = jnp.min(t, axis=1)                            # (R,)
        col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        imin = jnp.min(jnp.where(t <= tmin[:, None], col, BIG_I), axis=1)
        better = tmin < t_best
        t_best = jnp.where(better, tmin, t_best)
        face = jnp.where(better, imin + ci * tri_chunk, face)
        return t_best, face

    t_init = t0_ref[0, :]
    f_init = jnp.full(t_init.shape, -1, jnp.int32)
    t_best, face = jax.lax.fori_loop(0, tri_chunks, chunk, (t_init, f_init))
    t_ref[0, :] = t_best
    f_ref[0, :] = face


@partial(jax.jit, static_argnames=("interpret", "tri_chunk"))
def pallas_closest_dense(wu, wv, ww, cu, cv, cw, ro, rd, t0,
                         interpret: bool = False,
                         tri_chunk: int = TRI_CHUNK):
    """wu/wv/ww (3, T), cu/cv/cw (1, T), ro/rd (R, 3) rd normalized,
    t0 (R,) initial best. Returns (t_best (R,), face (R,), -1 = miss).
    R padded to RAY_TILE, T padded to tri_chunk by the caller wrapper
    (small scenes use a small chunk so padding work stays proportional).
    """
    r = ro.shape[0]
    t = wu.shape[1]
    assert r % RAY_TILE == 0 and t % tri_chunk == 0
    grid = (r // RAY_TILE,)
    tri_chunks = t // tri_chunk

    o_t = ro.T.reshape(3, r)
    d_t = rd.T.reshape(3, r)

    kernel = partial(_kernel, tri_chunks=tri_chunks, tri_chunk=tri_chunk)
    t_out, f_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, t0.reshape(1, r), wu, wv, ww, cu, cv, cw)
    return t_out[0], f_out[0]


def pick_tri_chunk(t: int) -> int:
    """Chunk = smallest multiple of 256 covering t, capped at TRI_CHUNK."""
    return min(TRI_CHUNK, max(256, -(-t // 256) * 256))


def prepare_woop_mats(woop, tri_chunk: int = TRI_CHUNK):
    """Split WoopTris (T,3,3)+(T,3) into the kernel's six matrices,
    padded to a multiple of tri_chunk."""
    t = woop.num_tris
    pad = (-t) % tri_chunk
    m = woop.m
    c = woop.c
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad, 3, 3))])
        c = jnp.concatenate([c, jnp.zeros((pad, 3))])
    # m[t, i, j]: output comp i from input comp j -> w_i (3, T) = m[:, i, :].T
    wu = m[:, 0, :].T
    wv = m[:, 1, :].T
    ww = m[:, 2, :].T
    cu = c[:, 0].reshape(1, -1)
    cv = c[:, 1].reshape(1, -1)
    cw = c[:, 2].reshape(1, -1)
    return wu, wv, ww, cu, cv, cw
