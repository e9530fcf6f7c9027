"""LBVH: fully-parallel, jit-compilable BVH construction on device.

TPU-native replacement for the reference's recursive CPU midpoint-split
builder (RayTracing/BVH.cpp:8-124). The reference builder is inherently
sequential (in-place partition + recursion, BVH.cpp:59-124) and rebuilds
on the host every time geometry changes; here the whole build is a
fixed-shape jnp program (morton codes -> sort -> Karras 2012 radix tree
-> bottom-up AABB refit -> skip links), so it runs on the TPU, fuses
under jit, and re-runs cheaply when vertices move.

Output layout is traversal-oriented: instead of the reference's
{first_index, prim_count} nodes walked with a 64-entry stack
(main_raytracing.cu:33-81), we emit *skip links*: every node knows its
left child and the node to jump to when its subtree is skipped or
finished. Traversal then needs no stack at all — per-ray state is one
int — which is exactly the shape the TPU's vector lanes want
(SURVEY §7 "Hard parts: traversal in Pallas").

Node id space (N = leaf count = padded face capacity):
  internal nodes: ids [0, N-2]  (root is id 0)
  leaves:         ids [N-1, 2N-2], leaf j has id (N-1) + j
Leaf j holds sorted face `leaf_face[j]`; padded/invalid faces sort last
with empty AABBs so they are never visited.

Topology is non-differentiable by construction: `build` applies
stop_gradient to its inputs; gradients w.r.t. vertices flow through the
differentiable hit recompute (accel.traverse.recompute_hit), not through
the tree (SURVEY §7 "Differentiating through discrete structure").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math3d import BIG


@struct.dataclass
class LBVH:
    left: jax.Array       # (2N-1,) i32 left-child node id (-1 for leaves)
    skip: jax.Array       # (2N-1,) i32 next node when subtree is done (-1 = exit)
    bmin: jax.Array       # (2N-1, 3) f32
    bmax: jax.Array       # (2N-1, 3) f32
    leaf_face: jax.Array  # (N,) i32 face id for leaf j (id = N-1+j)

    @property
    def num_leaves(self) -> int:
        return self.leaf_face.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.left.shape[0]


def _expand_bits(v: jax.Array) -> jax.Array:
    """Insert two zero bits after each of the low 10 bits (morton)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton3d(xyz01: jax.Array) -> jax.Array:
    """30-bit morton code from coords in [0,1]^3, (..., 3) -> (...,) uint32."""
    q = jnp.clip(xyz01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return ((_expand_bits(q[..., 0]) << 2)
            | (_expand_bits(q[..., 1]) << 1)
            | _expand_bits(q[..., 2]))


def _clz32(x: jax.Array) -> jax.Array:
    return jax.lax.clz(x.astype(jnp.uint32)).astype(jnp.int32)


def build(positions: jax.Array, faces: jax.Array, face_valid: jax.Array) -> LBVH:
    """Build the LBVH over (possibly padded) faces. All shapes static.

    positions (V,3) f32, faces (F,3) i32, face_valid (F,) bool. F >= 2.
    """
    positions = jax.lax.stop_gradient(positions)
    n = faces.shape[0]
    assert n >= 2, "LBVH needs at least 2 (padded) faces"

    p0 = positions[faces[:, 0]]
    p1 = positions[faces[:, 1]]
    p2 = positions[faces[:, 2]]
    centroid = (p0 + p1 + p2) / 3.0

    # Scene bounds over valid centroids only (invalid faces go to the top
    # morton corner so they sort to the end).
    vmask = face_valid[:, None]
    cmin = jnp.min(jnp.where(vmask, centroid, BIG), axis=0)
    cmax = jnp.max(jnp.where(vmask, centroid, -BIG), axis=0)
    extent = jnp.maximum(cmax - cmin, 1e-9)
    unit = jnp.clip((centroid - cmin) / extent, 0.0, 1.0)
    codes = jnp.where(face_valid, morton3d(unit), jnp.uint32(0xFFFFFFFF))

    order = jnp.argsort(codes, stable=True).astype(jnp.int32)
    codes = codes[order]
    leaf_face = order  # leaf j -> original face id

    num_internal = n - 1
    idx = jnp.arange(num_internal, dtype=jnp.int32)

    def delta(i, j):
        """Common-prefix length between sorted codes i and j; ties broken
        by index bits (Karras 2012 sec. 4); -1 outside [0, n-1]."""
        ok = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = codes[i] ^ codes[jc]
        d = jnp.where(x == 0,
                      32 + _clz32(i.astype(jnp.uint32) ^ jc.astype(jnp.uint32)),
                      _clz32(x))
        return jnp.where(ok, d, -1)

    # --- determine range direction and length (vectorized over nodes) ---
    d_dir = jnp.sign(delta(idx, idx + 1) - delta(idx, idx - 1)).astype(jnp.int32)
    d_dir = jnp.where(d_dir == 0, 1, d_dir)
    delta_min = delta(idx, idx - d_dir)

    # upper bound on range length by doubling (log2 steps, static count)
    def grow(l_max, _):
        cond = delta(idx, idx + l_max * d_dir) > delta_min
        return jnp.where(cond, l_max * 2, l_max), None
    l_max, _ = jax.lax.scan(grow, jnp.full((num_internal,), 2, jnp.int32),
                            None, length=32)

    # binary search exact range length: largest l with
    # delta(i, i + l*d) > delta_min, accumulated over descending powers
    # of two (the predicate is monotone in l for sorted distinct keys).
    t_seq = (2 ** jnp.arange(30, -1, -1, dtype=jnp.int32))

    def search_len(l, t):
        use = (t < l_max) & (t >= 1)
        cand = l + jnp.where(use, t, 0)
        ok = use & (delta(idx, idx + cand * d_dir) > delta_min)
        return jnp.where(ok, cand, l), None
    l, _ = jax.lax.scan(search_len, jnp.zeros((num_internal,), jnp.int32),
                        t_seq)
    j = idx + l * d_dir
    first = jnp.minimum(idx, j)
    last = jnp.maximum(idx, j)

    # --- find split position (highest differing bit within [first, last]) ---
    delta_node = delta(idx, j)

    def search_split(s, t):
        use = t >= 1
        cand = s + jnp.where(use, t, 0)
        ok = use & (cand < l) & (delta(idx, idx + cand * d_dir) > delta_node)
        return jnp.where(ok, cand, s), None
    # ceil-halving sequence: powers of two again suffice for exactness
    s, _ = jax.lax.scan(search_split, jnp.zeros((num_internal,), jnp.int32),
                        t_seq)
    gamma = idx + s * d_dir + jnp.minimum(d_dir, 0)

    left_is_leaf = (first == gamma)
    right_is_leaf = (last == gamma + 1)
    leaf_base = num_internal  # python int: also used as a static slice bound
    left_child = jnp.where(left_is_leaf, leaf_base + gamma, gamma)
    right_child = jnp.where(right_is_leaf, leaf_base + gamma + 1, gamma + 1)

    total = 2 * n - 1
    left_arr = jnp.full((total,), -1, jnp.int32).at[:num_internal].set(left_child)
    right_arr = jnp.full((total,), -1, jnp.int32).at[:num_internal].set(right_child)

    parent = jnp.full((total,), -1, jnp.int32)
    parent = parent.at[left_child].set(idx)
    parent = parent.at[right_child].set(idx)
    is_left = jnp.zeros((total,), bool).at[left_child].set(True)

    # --- bottom-up AABB refit (fixpoint over <= 64 levels) ---
    lp0, lp1, lp2 = p0[leaf_face], p1[leaf_face], p2[leaf_face]
    leaf_valid = face_valid[leaf_face]
    lmin = jnp.minimum(jnp.minimum(lp0, lp1), lp2)
    lmax = jnp.maximum(jnp.maximum(lp0, lp1), lp2)
    lmin = jnp.where(leaf_valid[:, None], lmin, BIG)
    lmax = jnp.where(leaf_valid[:, None], lmax, -BIG)

    bmin = jnp.full((total, 3), BIG, jnp.float32).at[leaf_base:].set(lmin)
    bmax = jnp.full((total, 3), -BIG, jnp.float32).at[leaf_base:].set(lmax)

    def refit_round(_, boxes):
        bmin, bmax = boxes
        lc = jnp.clip(left_arr[:num_internal], 0, total - 1)
        rc = jnp.clip(right_arr[:num_internal], 0, total - 1)
        nmin = jnp.minimum(bmin[lc], bmin[rc])
        nmax = jnp.maximum(bmax[lc], bmax[rc])
        return bmin.at[:num_internal].set(nmin), bmax.at[:num_internal].set(nmax)

    bmin, bmax = jax.lax.fori_loop(0, 64, refit_round, (bmin, bmax))

    # --- skip links (fixpoint: left child -> sibling, right child -> parent's skip)
    node_ids = jnp.arange(total, dtype=jnp.int32)
    sibling = jnp.where(is_left, right_arr[jnp.clip(parent, 0, total - 1)],
                        left_arr[jnp.clip(parent, 0, total - 1)])

    def skip_round(_, skip):
        par = jnp.clip(parent, 0, total - 1)
        new = jnp.where(parent < 0, -1,
                        jnp.where(is_left, sibling, skip[par]))
        return new
    skip = jax.lax.fori_loop(0, 64, skip_round,
                             jnp.full((total,), -1, jnp.int32))

    return LBVH(left=left_arr, skip=skip, bmin=bmin, bmax=bmax,
                leaf_face=leaf_face)


def refit(bvh: LBVH, positions: jax.Array, faces: jax.Array,
          face_valid: jax.Array) -> LBVH:
    """Recompute AABBs for fixed topology (vertices moved — e.g. a step
    of inverse rendering). Mirrors the reference's UpdateBounds pass
    (BVH.cpp:45-57) but bottom-up and in parallel."""
    positions = jax.lax.stop_gradient(positions)
    n = bvh.num_leaves
    total = bvh.num_nodes
    num_internal = n - 1
    lf = bvh.leaf_face
    p0 = positions[faces[lf, 0]]
    p1 = positions[faces[lf, 1]]
    p2 = positions[faces[lf, 2]]
    lvalid = face_valid[lf][:, None]
    lmin = jnp.where(lvalid, jnp.minimum(jnp.minimum(p0, p1), p2), BIG)
    lmax = jnp.where(lvalid, jnp.maximum(jnp.maximum(p0, p1), p2), -BIG)
    bmin = bvh.bmin.at[num_internal:].set(lmin)
    bmax = bvh.bmax.at[num_internal:].set(lmax)

    def refit_round(_, boxes):
        bmin, bmax = boxes
        lc = jnp.clip(bvh.left[:num_internal], 0, total - 1)
        # sibling of left child is the right child: recover from skip of left
        rc = jnp.clip(bvh.skip[lc], 0, total - 1)
        nmin = jnp.minimum(bmin[lc], bmin[rc])
        nmax = jnp.maximum(bmax[lc], bmax[rc])
        return bmin.at[:num_internal].set(nmin), bmax.at[:num_internal].set(nmax)

    bmin, bmax = jax.lax.fori_loop(0, 64, refit_round, (bmin, bmax))
    return bvh.replace(bmin=bmin, bmax=bmax)
