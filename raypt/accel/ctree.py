"""Cluster-level top tree for the one-hot MXU traversal kernel.

Why this exists (measured on TPU v5e, scripts/tpu_onehot_probe.py +
tpu_gather_truth.py): the XLA gather unit sustains only ~0.1-0.3 G
rows/s on data-dependent row fetches — the hard wall of round 1's
packed skip-link walk (the whole per-visit cost is the gather). The
MXU, however, can realize a gather from a SMALL table as a one-hot
matmul at effectively 10-100x that rate. So the traversal is split:

  * a TOP TREE over morton-contiguous triangle clusters (~2N/leaf
    nodes, ~2.2k for the bunny at 64-tri clusters) — small enough that
    every node fetch in the walk is a fused one-hot matmul inside a
    Pallas kernel (kernels/onehot_walk.py), never touching the gather
    unit;
  * cluster leaf blocks intersected densely (accel/clusters.py +
    kernels/cluster_pallas.py) with per-ray wanted-cluster masks from
    the walk, replacing round 1's loose per-tile box unions.

The top tree is literally the top of the triangle LBVH: nodes with
subtree size > leaf stay internal, the morton-contiguous cut nodes
(subtree size <= leaf) become its leaves, ids compacted by cumsum —
pure jnp, jit-able, reference-free (the reference has no two-level
structure at all; its megakernel walks one global BVH,
main_raytracing.cu:33-81).

Exact bf16 table encoding for the kernel's MXU fetch:
  * links and cluster ids are stored as TWO base-128 digits, each an
    integer < 256 and therefore EXACT in bf16 (8-bit mantissa);
    id = hi*128 + lo - 1 (the -1 lets id -1 encode as (0, 0)).
  * boxes are conservatively rounded to bf16: bmin down, bmax up —
    a ray can gain a false-positive cluster (harmless: phase 2 tests
    its triangles and misses) but can never lose a true hit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math3d import BIG
from .lbvh import LBVH

ROW = 16  # bf16 slots per encoded row


def tree_structure(bvh: LBVH):
    """Robust structural arrays for ANY LBVH-layout tree, including
    host SAH trees with UNUSED internal slots (left == -1) and
    DETACHED padded leaves (the Karras builder uses every slot, the
    native SAH builder does not — round-2 bug: unmasked parent
    scatters routed left=-1 through clip() into node 0 and detached
    padding leaves self-qualified as cluster cuts).

    Returns (parent, counts, l_int, r_int, attached):
      parent  (2N-1,) i32, -1 for root/detached/unused
      counts  (2N-1,) i32 subtree leaf count (0 on unused internals)
      l_int/r_int clipped child ids (valid only where left >= 0)
      attached (2N-1,) bool — reachable from the root
    """
    n = bvh.num_leaves
    ni = n - 1
    total = 2 * n - 1
    left = bvh.left
    used = left[:ni] >= 0
    l_int = jnp.clip(left, 0, total - 1)
    right = jnp.where(left >= 0, bvh.skip[l_int], -1)
    r_int = jnp.clip(right, 0, total - 1)

    dump = total
    idx_i = jnp.arange(ni, dtype=jnp.int32)
    l_tgt = jnp.where(used, l_int[:ni], dump)
    r_tgt = jnp.where(used, r_int[:ni], dump)
    parent = jnp.full((total + 1,), -1, jnp.int32)
    parent = parent.at[l_tgt].set(idx_i).at[r_tgt].set(idx_i)[:total]

    is_leaf_bin = jnp.arange(total) >= ni
    counts0 = jnp.where(is_leaf_bin, 1, 0).astype(jnp.int32)

    def up_round(_, c):
        ci = jnp.where(used, c[l_int[:ni]] + c[r_int[:ni]], 0)
        return c.at[:ni].set(ci)

    counts = jax.lax.fori_loop(0, 64, up_round, counts0)

    # attachment: fixpoint walking parents up to the root
    root_ok = jnp.arange(total) == 0

    def att_round(_, a):
        par_ok = a[jnp.clip(parent, 0, total - 1)] & (parent >= 0)
        return root_ok | par_ok

    attached = jax.lax.fori_loop(0, 64, att_round, root_ok)
    return parent, counts, l_int, r_int, attached


@struct.dataclass
class ClusterTree:
    """Compacted top tree over clusters (f32 reference form)."""
    bmin: jax.Array        # (Nt, 3) f32
    bmax: jax.Array        # (Nt, 3) f32
    left: jax.Array        # (Nt,) i32 left child (top id), -1 for leaves
    skip: jax.Array        # (Nt,) i32 next-on-skip (top id), -1 = done
    cluster: jax.Array     # (Nt,) i32 cluster id for leaves, -1 internal
    valid: jax.Array       # (Nt,) bool (padded top slots)

    @property
    def num_nodes(self) -> int:
        return self.left.shape[0]


def build_cluster_tree(bvh: LBVH, leaf: int = 64,
                       n_top_cap: int = 0) -> ClusterTree:
    """Derive the compacted top tree from a triangle LBVH. The cluster
    ids match accel.clusters.build_clusters(bvh, ..., leaf=leaf) exactly
    (same cut + same cumsum numbering)."""
    n = bvh.num_leaves
    ni = n - 1
    total = 2 * n - 1
    left = bvh.left
    is_leaf_bin = jnp.arange(total) >= ni
    parent, counts, l_int, r_int, attached = tree_structure(bvh)

    cut = attached & (counts <= leaf)
    cut = cut & (jnp.where(parent >= 0,
                           counts[jnp.clip(parent, 0, None)],
                           leaf + 1) > leaf)
    is_top = cut | (attached & (~is_leaf_bin) & (counts > leaf))

    c_cap = max(n // max(leaf // 2, 1) + 2, 8)
    n_top = n_top_cap or (2 * c_cap + 1)

    top_id = jnp.cumsum(is_top.astype(jnp.int32)) - 1       # (total,)
    cluster_id = jnp.cumsum(cut.astype(jnp.int32)) - 1

    def remap(e):
        ok = e >= 0
        return jnp.where(ok, top_id[jnp.clip(e, 0, total - 1)], -1).astype(
            jnp.int32)

    dump = n_top
    tgt = jnp.where(is_top & (top_id < n_top), top_id, dump).astype(jnp.int32)

    src_left = jnp.where(cut, -1, remap(left))
    src_skip = remap(bvh.skip)
    src_cluster = jnp.where(cut, cluster_id, -1).astype(jnp.int32)

    bmin = jnp.full((n_top + 1, 3), BIG, jnp.float32).at[tgt].set(bvh.bmin)
    bmax = jnp.full((n_top + 1, 3), -BIG, jnp.float32).at[tgt].set(bvh.bmax)
    t_left = jnp.full((n_top + 1,), -1, jnp.int32).at[tgt].set(src_left)
    t_skip = jnp.full((n_top + 1,), -1, jnp.int32).at[tgt].set(src_skip)
    t_clus = jnp.full((n_top + 1,), -1, jnp.int32).at[tgt].set(src_cluster)
    t_valid = jnp.zeros((n_top + 1,), bool).at[tgt].set(is_top)

    return ClusterTree(bmin=bmin[:n_top], bmax=bmax[:n_top],
                       left=t_left[:n_top], skip=t_skip[:n_top],
                       cluster=t_clus[:n_top], valid=t_valid[:n_top])


# ---------------------------------------------------------------------------
# Exact bf16 row encoding for the MXU one-hot fetch
# ---------------------------------------------------------------------------


def _bf16_down(x: jax.Array) -> jax.Array:
    """Largest bf16 <= x (conservative lower bound)."""
    b = x.astype(jnp.bfloat16)
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.int32)
    # next-below in bf16: for positive values subtract 1 ulp, for
    # negative add 1 to the magnitude bits
    stepped = jnp.where(bits & 0x8000 > 0, bits + 1,
                        jnp.maximum(bits - 1, 0))
    # -0 wraps to 0x0001 (+eps); route through the signed path: when
    # b == 0 and we need to go down, produce smallest negative
    stepped = jnp.where((bits & 0x7FFF) == 0, 0x8001, stepped)
    down = jax.lax.bitcast_convert_type(
        stepped.astype(jnp.uint16), jnp.bfloat16)
    return jnp.where(b.astype(jnp.float32) <= x, b, down)


def _bf16_up(x: jax.Array) -> jax.Array:
    """Smallest bf16 >= x (conservative upper bound)."""
    return -_bf16_down(-x)


def _digits(ids: jax.Array):
    """id (>= -1, < 128*256-1) -> two bf16-exact digits; -1 -> (0, 0)."""
    v = ids.astype(jnp.int32) + 1
    return ((v // 128).astype(jnp.bfloat16),
            (v % 128).astype(jnp.bfloat16))


def decode_digits(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Inverse of _digits (operates on f32/bf16 values from the fetch)."""
    v = (jnp.round(hi.astype(jnp.float32)) * 128.0
         + jnp.round(lo.astype(jnp.float32)))
    return v.astype(jnp.int32) - 1


# row layout (16 bf16):
#  [0:3] bmin (rounded down)   [3:6] bmax (rounded up)
#  [6]   left hi   [7] left lo
#  [8]   skip hi   [9] skip lo
#  [10]  cluster hi [11] cluster lo
#  [12]  is_leaf (0/1)  [13] valid (0/1)  [14:16] unused
def encode_topwalk_table(tree: ClusterTree) -> jax.Array:
    """(Nt, 16) bf16 — the kernel's one-hot-fetchable row table."""
    nt = tree.num_nodes
    # _digits is exact only for ids < 128*256-1: each digit must round-
    # trip bf16 (<= 255 has an 8-bit mantissa path). Links/cluster ids
    # are all < nt, so the static node count bounds every encoded id.
    if nt >= 128 * 256 - 1:
        raise ValueError(
            f"onehot top tree has {nt} nodes; the bf16 digit-pair "
            f"encoding is exact only below {128 * 256 - 1} ids — raise "
            f"`leaf` in build_onehot to coarsen the clustering")
    rows = jnp.zeros((nt, ROW), jnp.bfloat16)
    rows = rows.at[:, 0:3].set(_bf16_down(tree.bmin))
    rows = rows.at[:, 3:6].set(_bf16_up(tree.bmax))
    lh, ll = _digits(tree.left)
    sh, sl = _digits(tree.skip)
    ch, cl = _digits(tree.cluster)
    rows = rows.at[:, 6].set(lh).at[:, 7].set(ll)
    rows = rows.at[:, 8].set(sh).at[:, 9].set(sl)
    rows = rows.at[:, 10].set(ch).at[:, 11].set(cl)
    rows = rows.at[:, 12].set((tree.cluster >= 0).astype(jnp.bfloat16))
    rows = rows.at[:, 13].set(tree.valid.astype(jnp.bfloat16))
    return rows


def build_onehot(bvh: LBVH, positions: jax.Array, faces: jax.Array,
                 face_valid: jax.Array, leaf: int = 64,
                 with_woop: bool = False):
    """Build the full one-hot finder accel: (Clusters, encoded top-tree
    table). Consumed by accel.traverse.find_closest_onehot.

    with_woop=True appends (woop_cm, fid_flat) — the Woop affine table
    for the MXU phase-B kernel (clusters.build_woop_cm) — giving a
    4-tuple; find_closest_onehot accepts either arity."""
    from .clusters import build_clusters, build_woop_cm
    clusters = build_clusters(bvh, positions, faces, face_valid, leaf=leaf)
    tree = build_cluster_tree(bvh, leaf=leaf)
    table = encode_topwalk_table(tree)
    if with_woop:
        woop_cm, fid_flat = build_woop_cm(clusters)
        return clusters, table, woop_cm, fid_flat
    return clusters, table


def walk_topwalk_jnp(table: jax.Array, ro: jax.Array, rd: jax.Array,
                     t0: jax.Array, active: jax.Array,
                     num_words: int) -> jax.Array:
    """Reference walk over the ENCODED table (jnp; the Pallas kernel's
    correctness oracle — must consume the same bf16 rows the kernel
    sees). Returns (R, num_words) int32 wanted-cluster bitmask."""
    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe
    r_count = ro.shape[0]
    node = jnp.where(active, 0, -1).astype(jnp.int32)
    mask = jnp.zeros((r_count, num_words), jnp.int32)
    tab_f32 = table.astype(jnp.float32)
    word_ids = jnp.arange(num_words, dtype=jnp.int32)[None, :]

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, mask = s
        r = tab_f32[jnp.clip(node, 0, None)]          # (R, 16)
        live = node >= 0
        ok_row = (r[:, 13] > 0.5) & live
        tn1 = (r[:, 0:3] - ro) * inv
        tn2 = (r[:, 3:6] - ro) * inv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        nonempty = jnp.all(r[:, 0:3] <= r[:, 3:6], axis=-1)
        hit = (tfar >= tnear) & (tnear < t0) & (tfar > 0.0) & nonempty & ok_row
        is_leaf = r[:, 12] > 0.5

        cid = decode_digits(r[:, 10], r[:, 11])
        want = hit & is_leaf & (cid >= 0)
        w = jnp.where(want, cid >> 5, -1)
        bit = jnp.where(want, 1 << (cid & 31), 0)
        mask = mask | jnp.where(w[:, None] == word_ids, bit[:, None], 0)

        left = decode_digits(r[:, 6], r[:, 7])
        skip = decode_digits(r[:, 8], r[:, 9])
        nxt = jnp.where(hit & ~is_leaf, left, skip)
        node = jnp.where(live, nxt, node)
        return node, mask

    _, mask = jax.lax.while_loop(cond, body, (node, mask))
    return mask
