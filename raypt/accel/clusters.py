"""Two-level cluster acceleration: dense-culled, MXU-friendly.

The TPU-native answer to per-ray pointer chasing (SURVEY §7 "Hard
parts"): instead of walking a deep tree per ray, cut the LBVH into
morton-contiguous *clusters* of <= LEAF tris and work at two levels:

  1. CULL (VPU, dense): every ray tile (TILE rays) slab-tests ALL
     cluster boxes at once — a (TILE, C) elementwise pass with zero
     gathers — and reduces to a per-tile *worklist* of clusters any of
     its rays may hit, nearest-first.
  2. INTERSECT (Pallas/MXU): per tile, loop worklist entries; each
     entry scalar-indexes the cluster's packed triangle block out of a
     VMEM-resident table ((C, LEAF*12) fits: bunny = 1086 x 768 f32 =
     3.3 MB) and tests all TILE rays x LEAF tris densely (Woop form).
     Extra tests for rays that didn't want a cluster are free min-work,
     so no per-ray candidate bookkeeping is needed.

Correctness does not depend on the worklist order or on per-ray
pruning: the worklist contains every cluster hit by any ray of the
tile (up to WORKLIST_CAP, asserted >= the max a tile can see), and the
final t is a min over all tested triangles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math3d import BIG
from .lbvh import LBVH

CLUSTER_LEAF = 64       # max triangles per cluster
# Per-tile worklist capacity. 512 covers the worst tile on the bench
# workload in ONE kernel pass (measured max union 457 on the bounce-1
# wavefront at 1024^2; 675 ms fwd vs 693 ms for cap=192 + residual
# rounds). Tiles needing more spill into the bounded residual rounds
# of find_closest_onehot. SMEM block cost: 8 x cap x 4 B = 16 KB.
WORKLIST_CAP = 512


@struct.dataclass
class Clusters:
    bmin: jax.Array       # (C, 3) cluster bounds
    bmax: jax.Array       # (C, 3)
    tri_rows: jax.Array   # (C, LEAF, 12) [p0, e1, e2, fid, pad, pad]
    valid: jax.Array      # (C,) bool (padded cluster slots)

    @property
    def num_clusters(self) -> int:
        return self.bmin.shape[0]


def build_clusters(bvh: LBVH, positions: jax.Array, faces: jax.Array,
                   face_valid: jax.Array,
                   leaf: int = CLUSTER_LEAF) -> Clusters:
    """Cut the binary LBVH at subtree size <= leaf into morton-contiguous
    clusters. Fixed shapes: C_cap = ceil(2 * N / leaf) (a cut node's
    parent has > leaf tris, so each cut holds > leaf/2 on average;
    2N/leaf is a safe upper bound... use N // (leaf // 2) + 2)."""
    from .ctree import tree_structure
    positions = jax.lax.stop_gradient(positions)
    n = bvh.num_leaves
    ni = n - 1
    total = 2 * n - 1
    is_leaf_bin = jnp.arange(total) >= ni
    # masked structural arrays: robust to host SAH trees with unused
    # internal slots / detached padding leaves (see ctree.tree_structure)
    parent, counts, l_int, r_int, attached = tree_structure(bvh)
    used = bvh.left[:ni] >= 0

    starts = jnp.where(is_leaf_bin, jnp.arange(total) - ni, 0).astype(jnp.int32)

    def up_round(_, s):
        si = jnp.where(used, jnp.minimum(s[l_int[:ni]], s[r_int[:ni]]), 0)
        return s.at[:ni].set(si)

    starts = jax.lax.fori_loop(0, 64, up_round, starts)

    cut = attached & (counts <= leaf)
    cut = cut & (jnp.where(parent >= 0,
                           counts[jnp.clip(parent, 0, None)],
                           leaf + 1) > leaf)

    c_cap = max(n // max(leaf // 2, 1) + 2, 8)
    cluster_id = jnp.cumsum(cut.astype(jnp.int32)) - 1
    dump = c_cap  # extra slot
    tgt = jnp.where(cut & (cluster_id < c_cap), cluster_id, dump).astype(
        jnp.int32)

    bmin = jnp.full((c_cap + 1, 3), BIG, jnp.float32).at[tgt].set(bvh.bmin)
    bmax = jnp.full((c_cap + 1, 3), -BIG, jnp.float32).at[tgt].set(bvh.bmax)
    cvalid = jnp.zeros((c_cap + 1,), bool).at[tgt].set(cut)

    # triangle blocks: lf[starts : starts+counts] padded to `leaf`,
    # built at CLUSTER scale (c_cap+1, leaf), not tree scale — a
    # (2N-1, leaf, 3) gather materializes eagerly with the minor dim
    # padded to a 128-lane tile and OOMs HBM at leaf=256 on the bunny
    cl_start = jnp.zeros((c_cap + 1,), jnp.int32).at[tgt].set(starts)
    cl_count = jnp.zeros((c_cap + 1,), jnp.int32).at[tgt].set(
        jnp.where(cut, counts, 0))
    lf = bvh.leaf_face
    slot = cl_start[:, None] + jnp.arange(leaf)[None, :]
    slot_ok = jnp.arange(leaf)[None, :] < cl_count[:, None]
    tri_ids = jnp.where(slot_ok, lf[jnp.clip(slot, 0, n - 1)], 0)
    fvalid = slot_ok & face_valid[tri_ids]
    p0 = positions[faces[tri_ids, 0]]
    p1 = positions[faces[tri_ids, 1]]
    p2 = positions[faces[tri_ids, 2]]
    e1 = jnp.where(fvalid[..., None], p1 - p0, 0.0)
    e2 = jnp.where(fvalid[..., None], p2 - p0, 0.0)
    fid_f = jax.lax.bitcast_convert_type(tri_ids.astype(jnp.int32),
                                         jnp.float32)
    tri_rows = jnp.concatenate([
        jnp.where(fvalid[..., None], p0, 0.0), e1, e2, fid_f[..., None],
        jnp.zeros(p0.shape[:-1] + (2,), jnp.float32)], axis=-1)

    return Clusters(bmin=bmin[:c_cap], bmax=bmax[:c_cap],
                    tri_rows=tri_rows[:c_cap], valid=cvalid[:c_cap])


def build_woop_cm(clusters: Clusters):
    """Woop affine transforms for the MXU phase-B kernel
    (kernels.cluster_pallas.pallas_cluster_intersect_mask_woop).

    Per triangle (p0, e1, e2): W = [e1 e2 n]^-1 with n = e1 x e2 maps
    world points to unit-triangle coords, so with the affine pair
    A = W, b = -W p0 the whole ray test collapses to ONE matmul per
    cluster: out = woop (4, 3L)^T-contracted with [o;1]/[d;0] (4, T),
    then t = -o'w/d'w, u = o'u + t d'u, v = o'v + t d'v — ~2.5x fewer
    VPU ops per pair than Moller-Trumbore, with the contraction on the
    MXU (Woop et al. 2013 unit-triangle formulation; public technique).

    Returns (woop_cm (C, 4, 3L) f32, fid_flat (C*L,) i32):
      woop_cm[c, k, r*L + j] = k-th affine coefficient (A[r,0..2], b[r])
      of row r (u/v/w) of triangle j; degenerate/padded triangles are
      encoded to always miss (A = 0, b_w = 1 -> t = -1/0 = -inf).
      fid_flat[c*L + j] = global face id (for the post-kernel gather).
    """
    import numpy as np
    rows = clusters.tri_rows                     # (C, L, 12)
    c, leaf, _ = rows.shape
    rows_np = np.asarray(jax.lax.stop_gradient(rows), np.float64)
    p0 = rows_np[..., 0:3]
    e1 = rows_np[..., 3:6]
    e2 = rows_np[..., 6:9]
    # UNIT normal: with n = e1 x e2 unnormalized, det(m) ~ area^2 and
    # the f32 inverse of sliver triangles carries O(1) relative error
    # in t (measured max |dt| = 8.7 on the bunny, round 4); a unit
    # third column keeps the conditioning ~1/edge and the f64 host
    # inversion makes the downcast to f32 the only rounding step.
    n = np.cross(e1, e2)
    nl = np.linalg.norm(n, axis=-1, keepdims=True)
    ok = nl[..., 0] > 1e-20
    n = n / np.where(nl > 1e-20, nl, 1.0)
    m = np.stack([e1, e2, n], axis=-1)           # (C, L, 3, 3) columns
    safe_m = np.where(ok[..., None, None], m,
                      np.broadcast_to(np.eye(3), m.shape))
    w = np.linalg.inv(safe_m)                    # (C, L, 3, 3) rows u,v,w
    b = -np.einsum("clij,clj->cli", w, p0)       # (C, L, 3)
    a4 = np.concatenate([w, b[..., None]], axis=-1)    # (C, L, 3, 4)
    # miss encoding for degenerate rows: A = 0, b = (0, 0, 1)
    miss = np.zeros((3, 4))
    miss[2, 3] = 1.0
    a4 = np.where(ok[..., None, None], a4, miss)
    # (C, L, 3, 4) -> (C, 4, 3, L) -> (C, 4, 3L): lane r*L+j = row r tri j
    woop_cm = np.transpose(a4, (0, 3, 2, 1)).reshape(c, 4, 3 * leaf)
    fid_flat = jax.lax.bitcast_convert_type(rows[..., 9],
                                            jnp.int32).reshape(c * leaf)
    return jnp.asarray(woop_cm, jnp.float32), fid_flat


def tile_worklists(clusters: Clusters, ro: jax.Array, rd: jax.Array,
                   t0: jax.Array, tile: int,
                   cap: int = WORKLIST_CAP):
    """Dense cull: rays (R, 3) grouped in `tile`-sized tiles (R divisible
    by tile) -> per-tile worklists.

    Returns (worklist (n_tiles, cap) i32 cluster ids [-1 pad],
             counts (n_tiles,) i32, overflow (n_tiles,) bool).
    Worklist is ordered by the tile's min entry distance (nearest
    first) so phase 2 shrinks t_best quickly."""
    r = ro.shape[0]
    n_tiles = r // tile
    c = clusters.num_clusters

    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv_all = 1.0 / safe

    def one_group(args):
        o_g, inv_g, t0_g = args            # (G*tile, 3), ..., (G*tile,)
        g = o_g.shape[0] // tile
        # accumulate the slab test per axis: intermediates stay (N, C)
        tn = jnp.full((o_g.shape[0], c), -jnp.inf)
        tf = jnp.full((o_g.shape[0], c), jnp.inf)
        for k in range(3):
            t1 = (clusters.bmin[None, :, k] - o_g[:, k:k + 1]) * inv_g[:, k:k + 1]
            t2 = (clusters.bmax[None, :, k] - o_g[:, k:k + 1]) * inv_g[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        hit = ((tf >= tn) & (tf > 0.0) & (tn < t0_g[:, None])
               & clusters.valid[None, :])
        hit_t = hit.reshape(g, tile, c)
        tile_hit = jnp.any(hit_t, axis=1)                      # (G, C)
        tnc = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf).reshape(g, tile, c)
        tile_tn = jnp.min(tnc, axis=1)                         # (G, C)
        order = jnp.argsort(tile_tn, axis=1)
        counts_g = jnp.sum(tile_hit, axis=1).astype(jnp.int32)
        k2 = min(c, cap)
        wl = jnp.where(jnp.arange(k2)[None, :] < jnp.minimum(counts_g, k2)[:, None],
                       order[:, :k2].astype(jnp.int32), -1)
        if k2 < cap:
            wl = jnp.concatenate(
                [wl, jnp.full((g, cap - k2), -1, jnp.int32)], axis=1)
        return wl, counts_g

    # group tiles so each map step works on ~256k ray-cluster pairs
    group = max(1, min(n_tiles, max(1, (1 << 18) // max(tile, 1) // max(c // 256, 1))))
    while n_tiles % group:
        group -= 1
    o_gs = ro.reshape(n_tiles // group, group * tile, 3)
    inv_gs = inv_all.reshape(n_tiles // group, group * tile, 3)
    t0_gs = t0.reshape(n_tiles // group, group * tile)
    wl, counts = jax.lax.map(one_group, (o_gs, inv_gs, t0_gs))
    worklist = wl.reshape(n_tiles, cap)
    counts = counts.reshape(n_tiles)
    overflow = counts > cap
    return worklist, jnp.minimum(counts, cap), overflow


def first_wanted(mask: jax.Array) -> jax.Array:
    """Per-ray id of the lowest set bit in the wanted-cluster bitmask
    (= nearest-in-morton wanted cluster), or 1<<29 when the mask is
    empty. Used as the phase-B ray-binning key: rays sharing their
    first wanted cluster share most of their worklist, so tiles of
    them have unions near the per-ray popcount.

    mask (R, CW) int32. Returns (R,) int32."""
    lsb = mask & -mask                                  # isolate low bit
    f = lsb.view(jnp.uint32).astype(jnp.float32)
    idx = (f.view(jnp.uint32) >> 23).astype(jnp.int32) - 127  # log2
    cw = mask.shape[1]
    base = jnp.arange(cw, dtype=jnp.int32) * 32
    cand = jnp.where(lsb != 0, base[None, :] + idx, jnp.int32(1) << 29)
    return jnp.min(cand, axis=1)


def tile_union_counts(mask: jax.Array, tile: int, c_total: int):
    """OR-union of per-ray wanted-cluster bitmasks over each ray tile.

    mask (R, CW) int32, R divisible by tile. Returns
    (union (n_tiles, CW) i32, counts (n_tiles,) i32 — TRUE set-bit
    counts, not clamped).

    `tile` must be a power of two: the log-tree OR below halves the
    tile axis each round, and an odd intermediate width would silently
    numpy-broadcast (n, half, cw) | (n, half+1, cw) and drop the last
    row's bits (ADVICE r3 medium — reachable since tile_b became a
    parameter)."""
    assert tile > 0 and (tile & (tile - 1)) == 0, \
        f"tile_union_counts requires a power-of-two tile, got {tile}"
    r, cw = mask.shape
    n_tiles = r // tile
    m = mask.reshape(n_tiles, tile, cw)
    # OR-union over the tile (log-tree reduction)
    t = tile
    while t > 1:
        half = t // 2
        m = m[:, :half] | m[:, half:t]
        t = half
    union = m[:, 0]                                    # (n_tiles, CW)
    pop = jnp.sum(jnp.unpackbits(union.view(jnp.uint8), axis=-1)
                  .astype(jnp.int32), axis=-1)
    return union, pop


def worklist_slice(union: jax.Array, c_total: int, cap: int,
                   round_: int = 0):
    """Compact the union's set bits (ascending cluster id) and return
    the slice [round_*cap, (round_+1)*cap) as a worklist.

    Returns (worklist (n_tiles, cap) i32 [-1 pad]). Compaction rides
    top_k (a row-wise scatter here measured ~90ms at 1M rays — top_k
    stays on the vector unit)."""
    n_tiles = union.shape[0]
    cid = jnp.arange(c_total, dtype=jnp.int32)
    wanted = (union[:, cid >> 5] >> (cid & 31)[None, :]) & 1   # (T, C)
    k = min((round_ + 1) * cap, c_total)
    keys = wanted * (c_total - cid)[None, :]
    vals, idxs = jax.lax.top_k(keys, k)
    lo = round_ * cap
    if lo >= k:
        return jnp.full((n_tiles, cap), -1, jnp.int32)
    vals = vals[:, lo:]
    idxs = idxs[:, lo:]
    wl = jnp.where(vals > 0, idxs.astype(jnp.int32), -1)
    if wl.shape[1] < cap:
        wl = jnp.concatenate(
            [wl, jnp.full((n_tiles, cap - wl.shape[1]), -1, jnp.int32)],
            axis=1)
    return wl


def worklists_from_masks(mask: jax.Array, tile: int, cap: int,
                         c_total: int):
    """Per-tile worklists from per-ray wanted-cluster bitmasks (the
    one-hot top-walk output, kernels/onehot_walk.py). Unlike
    tile_worklists' dense box cull, the union here is exact per ray —
    measured ~5-10x tighter on incoherent wavefronts.

    mask (R, CW) int32, R divisible by tile. Returns
    (worklist (n_tiles, cap) i32 [-1 pad], counts, overflow)."""
    union, counts = tile_union_counts(mask, tile, c_total)
    wl = worklist_slice(union, c_total, cap, 0)
    return wl, jnp.minimum(counts, cap), counts > cap


def intersect_worklist_jnp(clusters: Clusters, worklist, counts,
                           ro, rd, t0, tile: int):
    """Reference jnp implementation of phase 2 (correctness oracle and
    CPU fallback; the TPU path is kernels.cluster_pallas). Scans every
    worklist slot with masking — O(cap) work, fine for tests."""
    eps = 1e-8
    r = ro.shape[0]
    n_tiles = r // tile
    o_t = ro.reshape(n_tiles, tile, 3)
    d_t = rd.reshape(n_tiles, tile, 3)
    tb0 = t0.reshape(n_tiles, tile)
    zero_i = (tb0[:, :1] * 0).astype(jnp.int32)
    f0 = jnp.zeros((n_tiles, tile), jnp.int32) + zero_i - 1

    def slot(carry, w):
        tb, fb = carry
        cid = worklist[:, w]                           # (T,)
        ok_slot = (cid >= 0)
        rows = clusters.tri_rows[jnp.clip(cid, 0, None)]  # (T, leaf, 12)
        p0 = rows[..., 0:3][:, None]                   # (T, 1, leaf, 3)
        e1 = rows[..., 3:6][:, None]
        e2 = rows[..., 6:9][:, None]
        fid = jax.lax.bitcast_convert_type(rows[..., 9], jnp.int32)[:, None]
        o = o_t[:, :, None]                            # (T, tile, 1, 3)
        d = d_t[:, :, None]
        pvec = jnp.cross(d, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        ok_det = jnp.abs(det) > eps
        inv_det = jnp.where(ok_det, 1.0, 0.0) / jnp.where(ok_det, det, 1.0)
        tvec = o - p0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        hit = (ok_det & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 0.0)
               & ok_slot[:, None, None])
        t = jnp.where(hit, t, jnp.inf)                 # (T, tile, leaf)
        tmin = jnp.min(t, axis=-1)
        col = jnp.argmin(t, axis=-1)
        fmin = jnp.take_along_axis(
            jnp.broadcast_to(fid, t.shape), col[..., None], axis=-1)[..., 0]
        better = tmin < tb
        return (jnp.where(better, tmin, tb),
                jnp.where(better, fmin, fb)), None

    (tb, fb), _ = jax.lax.scan(slot, (tb0, f0),
                               jnp.arange(worklist.shape[1]))
    return tb.reshape(r), fb.reshape(r)
