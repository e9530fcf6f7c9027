"""MXU-dense ray/triangle intersection via Woop unit-triangle
transforms.

The TPU's compute power lives in the MXU (systolic matmul); pointer-
chasing BVH traversal can't use it. But with Woop's transform each
triangle becomes an affine map A_t^-1 (p - p0) into "unit triangle
space", and then for every (ray, triangle) pair:

  o' = M_t ro + c_t          d' = M_t rd
  t  = -o'_w / d'_w          u = o'_u + t d'_u     v = o'_v + t d'_v
  hit iff u >= 0, v >= 0, u + v <= 1, t > 0

o' and d' over ALL pairs are two matmuls: (R, 3) @ (3, 3T) — pure MXU
work at ~hundreds of Tflops, followed by cheap (R, T) elementwise tests
and a min-reduction. No gathers anywhere.

This is the fast path for small scenes (Cornell-box class, <= ~16k
triangles) and the building block for the two-level cluster scheme
(top-tree -> cluster worklists -> dense Woop blocks per cluster).

Numerical note: the transform is algebraically identical to
Moller-Trumbore (same u, v, t), so parity tests against
math3d.intersect_triangle hold to f32 roundoff.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math3d import BIG
from ..core.types import Scene


@struct.dataclass
class WoopTris:
    m: jax.Array        # (T, 3, 3) world->unit-triangle linear map
    c: jax.Array        # (T, 3)    offset (-M @ p0)
    valid: jax.Array    # (T,) bool

    @property
    def num_tris(self) -> int:
        return self.m.shape[0]


def build_woop(positions: jax.Array, faces: jax.Array,
               face_valid: jax.Array) -> WoopTris:
    """Precompute per-triangle Woop transforms (analytic 3x3 inverse of
    A = [e1 | e2 | n], n = e1 x e2). Degenerate/padded faces get zero
    maps (d'_w == 0 -> never hit)."""
    positions = jax.lax.stop_gradient(positions)
    p0 = positions[faces[:, 0]]
    p1 = positions[faces[:, 1]]
    p2 = positions[faces[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0
    n = jnp.cross(e1, e2)
    a = jnp.stack([e1, e2, n], axis=-1)          # (T, 3, 3) columns e1,e2,n
    det = jnp.linalg.det(a)
    ok = face_valid & (jnp.abs(det) > 1e-18)
    # analytic inverse via adjugate
    adj = jnp.stack([
        jnp.cross(a[:, :, 1], a[:, :, 2]),
        jnp.cross(a[:, :, 2], a[:, :, 0]),
        jnp.cross(a[:, :, 0], a[:, :, 1]),
    ], axis=1)                                    # (T, 3, 3) rows
    safe_det = jnp.where(ok, det, 1.0)
    m = jnp.where(ok[:, None, None], adj / safe_det[:, None, None], 0.0)
    c = -jnp.einsum("tij,tj->ti", m, p0)
    return WoopTris(m=m, c=c, valid=ok)


def closest_dense(woop: WoopTris, ro: jax.Array, rd: jax.Array,
                  t0: jax.Array, active=None,
                  ray_tile: int = 2048, tri_chunk: int = 2048):
    """Closest triangle over all pairs. ro/rd (R, 3) rd normalized,
    t0 (R,) initial best. Returns (t_best (R,), face (R,) i32, -1=miss).

    Processes triangles in chunks to bound the (tile, chunk) intermediate
    and ray tiles via lax.map. All matmuls carry
    preferred_element_type=f32 so the MXU accumulates in full precision.
    """
    tcount = woop.num_tris
    r = ro.shape[0]
    # layout: (3, T*3) with [j, t*3+i] = M[t, i, j] so that
    # (rays @ w).reshape(R, T, 3)[r, t, i] = sum_j M[t,i,j] * ray[r,j]
    w = jnp.transpose(woop.m, (2, 0, 1)).reshape(3, tcount * 3)
    cflat = woop.c.reshape(tcount * 3)

    pad_r = (-r) % ray_tile
    if pad_r:
        ro = jnp.concatenate([ro, jnp.zeros((pad_r, 3))])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad_r, 3))])
        t0 = jnp.concatenate([t0, jnp.full((pad_r,), BIG)])

    n_chunks = -(-tcount // tri_chunk)
    pad_t = n_chunks * tri_chunk - tcount
    if pad_t:
        w = jnp.concatenate([w, jnp.zeros((3, pad_t * 3))], axis=1)
        cflat = jnp.concatenate([cflat, jnp.zeros((pad_t * 3,))])
    w_chunks = w.reshape(3, n_chunks, tri_chunk * 3).transpose(1, 0, 2)
    c_chunks = cflat.reshape(n_chunks, tri_chunk * 3)

    def tile_fn(args):
        o_t, d_t, tb0 = args                      # (RT,3), (RT,3), (RT,)

        def chunk(carry, wc):
            tb, face = carry
            wmat, cvec, cbase = wc                # (3, TC*3), (TC*3,), ()
            o_p = (o_t @ wmat + cvec).reshape(ray_tile, tri_chunk, 3)
            d_p = (d_t @ wmat).reshape(ray_tile, tri_chunk, 3)
            dz = d_p[..., 2]
            safe = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
            t = jnp.where(jnp.abs(dz) > 1e-12, -o_p[..., 2] / safe, BIG)
            u = o_p[..., 0] + t * d_p[..., 0]
            v = o_p[..., 1] + t * d_p[..., 1]
            hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
            t = jnp.where(hit, t, BIG)
            i = jnp.argmin(t, axis=1)
            tmin = jnp.take_along_axis(t, i[:, None], axis=1)[:, 0]
            better = tmin < tb
            gi = cbase + i.astype(jnp.int32)
            return (jnp.where(better, tmin, tb),
                    jnp.where(better, gi, face)), None

        (tb, face_out), _ = jax.lax.scan(
            chunk, (tb0, jnp.full((ray_tile,), -1, jnp.int32)
                    + (tb0 * 0).astype(jnp.int32)),
            (w_chunks, c_chunks,
             jnp.arange(n_chunks, dtype=jnp.int32) * tri_chunk))
        return tb, face_out

    o_tiles = ro.reshape(-1, ray_tile, 3)
    d_tiles = rd.reshape(-1, ray_tile, 3)
    t_tiles = t0.reshape(-1, ray_tile)
    tb, face = jax.lax.map(tile_fn, (o_tiles, d_tiles, t_tiles))
    tb = tb.reshape(-1)[:r]
    face = face.reshape(-1)[:r]
    return tb, face
