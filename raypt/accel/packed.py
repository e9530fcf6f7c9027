"""Packed traversal layout: one 64-byte row per BVH node.

Why: the straightforward traversal gathers bmin/bmax/left/skip from
four arrays plus three vertex rows per leaf — ~8 scattered gathers per
node visit. On TPU each gather op costs far more than its bytes; the
loop becomes latency-bound (measured 0.44 Mray-seg/s on v5e).

Packed design (TPU-first):
  * one (num_nodes, 16) float32 table, one gather per visit;
  * leaf rows carry the triangle *inline* (p0, e1, e2 edge form), so a
    leaf visit does the Moller-Trumbore test directly — no leaf box
    test (for 1-triangle leaves the box test costs as much as the
    triangle test and saves nothing, unlike the reference's
    multi-triangle leaves, main_raytracing.cu:49-72);
  * integer links (next-if-hit / next-if-miss / face id) are bitcast
    into float slots so the whole row rides one vector register load.

Row layout (16 x f32):
  internal: [0:3]=bmin [3:6]=bmax [12]=left-child [13]=skip [14]=0
  leaf:     [0:3]=p0   [3:6]=e1  [6:9]=e2 [12]=face-id [13]=skip [14]=1
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math3d import BIG
from .lbvh import LBVH

ROW = 16


@struct.dataclass
class PackedLBVH:
    rows: jax.Array   # (2N-1, 16) f32

    @property
    def num_nodes(self) -> int:
        return self.rows.shape[0]


def _itof(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)


def ftoi(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def pack(bvh: LBVH, positions: jax.Array, faces: jax.Array,
         face_valid: jax.Array) -> PackedLBVH:
    """Assemble the packed table from an LBVH + current vertex positions.
    Cheap (pure layout); re-run after refit/vertex updates."""
    positions = jax.lax.stop_gradient(positions)
    n = bvh.num_leaves
    total = bvh.num_nodes
    ni = n - 1

    rows = jnp.zeros((total, ROW), jnp.float32)
    # internal nodes
    rows = rows.at[:ni, 0:3].set(bvh.bmin[:ni])
    rows = rows.at[:ni, 3:6].set(bvh.bmax[:ni])
    rows = rows.at[:ni, 12].set(_itof(bvh.left[:ni]))
    rows = rows.at[:ni, 13].set(_itof(bvh.skip[:ni]))

    # leaves: inline triangle in edge form; invalid faces get degenerate
    # triangles (e1 = e2 = 0 -> det == 0 -> never hit)
    lf = bvh.leaf_face
    p0 = positions[faces[lf, 0]]
    p1 = positions[faces[lf, 1]]
    p2 = positions[faces[lf, 2]]
    ok = face_valid[lf][:, None]
    e1 = jnp.where(ok, p1 - p0, 0.0)
    e2 = jnp.where(ok, p2 - p0, 0.0)
    rows = rows.at[ni:, 0:3].set(p0)
    rows = rows.at[ni:, 3:6].set(e1)
    rows = rows.at[ni:, 6:9].set(e2)
    rows = rows.at[ni:, 12].set(_itof(lf))
    rows = rows.at[ni:, 13].set(_itof(bvh.skip[ni:]))
    rows = rows.at[ni:, 14].set(1.0)
    return PackedLBVH(rows=rows)


def traverse_wavefront(pbvh: PackedLBVH, ro: jax.Array, rd: jax.Array,
                       t0: jax.Array, active: jax.Array,
                       max_iters: int | None = None,
                       unroll: int = 8):
    """Vectorized skip-link walk over a whole wavefront of rays.

    ro/rd (R, 3) with rd normalized, t0 (R,) initial best distance
    (seeded with the sphere pass, reference parity), active (R,) bool.
    Returns (t_best (R,), face_id (R,) int32, -1 = none).

    One `lax.while_loop` whose body performs `unroll` traversal steps:
    each step is a single (R, 16) gather + slab test + Moller-Trumbore
    on the same registers. Unrolling amortizes the loop's fixed
    per-iteration cost (condition sync + scheduling; measured ~2-15us
    on v5e regardless of width) and lets the compiler overlap the
    gathers of consecutive steps. Rays that are inactive or done sit at
    node -1 (clamped gather of row 0) and no-op until the whole
    wavefront finishes its current chunk.
    """
    eps = 1e-8

    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    node0 = jnp.where(active, 0, -1).astype(jnp.int32)
    t_best0 = t0
    face0 = node0 * 0 - 1   # derived from node0: varying-typed under shard_map
    rows = pbvh.rows

    def cond(state):
        node, _, _, it = state
        alive = jnp.any(node >= 0)
        if max_iters is None:
            return alive
        return alive & (it < max_iters)

    def body(state):
        node, t_best, face, it = state
        for _ in range(unroll):
            node, t_best, face = _step(node, t_best, face)
        return node, t_best, face, it + jnp.int32(1)

    def _step(node, t_best, face):
        r = rows[jnp.clip(node, 0, None)]          # (R, 16) single gather
        is_leaf = r[:, 14] > 0.5

        # slab test (internal rows)
        tn1 = (r[:, 0:3] - ro) * inv
        tn2 = (r[:, 3:6] - ro) * inv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        nonempty = jnp.all(r[:, 0:3] <= r[:, 3:6], axis=-1)
        hit_box = (tfar >= tnear) & (tnear < t_best) & (tfar > 0.0) & nonempty

        # Moller-Trumbore (leaf rows; p0=r[0:3], e1=r[3:6], e2=r[6:9])
        pvec = jnp.cross(rd, r[:, 6:9])
        det = jnp.sum(r[:, 3:6] * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > eps, 1.0, 0.0) / jnp.where(
            jnp.abs(det) > eps, det, 1.0)
        tvec = ro - r[:, 0:3]
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, r[:, 3:6])
        v = jnp.sum(rd * qvec, axis=-1) * inv_det
        t = jnp.sum(r[:, 6:9] * qvec, axis=-1) * inv_det
        tri_hit = ((jnp.abs(det) > eps) & (u >= 0) & (v >= 0)
                   & (u + v <= 1.0) & (t > 0.0) & (t < t_best))

        live = node >= 0
        take = live & is_leaf & tri_hit
        t_best = jnp.where(take, t, t_best)
        face = jnp.where(take, ftoi(r[:, 12]), face)

        nxt_internal = jnp.where(hit_box, ftoi(r[:, 12]), ftoi(r[:, 13]))
        nxt = jnp.where(is_leaf, ftoi(r[:, 13]), nxt_internal)
        node = jnp.where(live, nxt, node)
        return node, t_best, face

    _, t_best, face, _ = jax.lax.while_loop(
        cond, body, (node0, t_best0, face0,
                     (t0[..., :0].sum() * 0).astype(jnp.int32)))
    return t_best, face


# ---------------------------------------------------------------------------
# Cherry-merged layout: 2 triangles per leaf row (32 x f32)
# ---------------------------------------------------------------------------

ROW2 = 32


@struct.dataclass
class Packed2LBVH:
    """Packed table with *cherry-merged* leaves: every internal node
    whose two children are both singleton leaves is rewritten in place
    as a 2-triangle leaf row (its children stay in the table but become
    unreachable — no renumbering, skip links unchanged).

    Why: the traversal loop is gather-rate bound and the TPU gather
    unit is ROW-rate bound (a 32-wide row costs the same as 16-wide,
    scripts/tpu_gather_width.py), so halving the node visits below a
    cherry is pure profit: a ray that would have visited cherry + both
    children (3 gathers) now visits one row (1 gather, 2 inline
    Moller-Trumbore tests on the VPU).

    Row layout (32 x f32):
      internal: [0:3]=bmin [3:6]=bmax [18]=left [20]=skip [21]=0
      leaf:     [0:3]=p0a [3:6]=e1a [6:9]=e2a
                [9:12]=p0b [12:15]=e1b [15:18]=e2b
                [18]=face_a [19]=face_b [20]=skip [21]=1
      (a singleton leaf keeps a degenerate second triangle: e1b=e2b=0
       -> det 0 -> never hits.)
    """
    rows: jax.Array   # (2N-1, 32) f32

    @property
    def num_nodes(self) -> int:
        return self.rows.shape[0]


def pack_cherries(bvh: LBVH, positions: jax.Array, faces: jax.Array,
                  face_valid: jax.Array) -> Packed2LBVH:
    """Assemble the cherry-merged 32-wide table. Pure jnp (jittable, so
    it can run under the render jit with traced vertex positions, like
    pack())."""
    positions = jax.lax.stop_gradient(positions)
    n = bvh.num_leaves
    ni = n - 1
    total = bvh.num_nodes
    lf = bvh.leaf_face
    skip = bvh.skip
    left = bvh.left

    def tri(fid):
        f = faces[fid]
        ok = face_valid[fid][:, None]
        p0 = positions[f[:, 0]]
        e1 = jnp.where(ok, positions[f[:, 1]] - p0, 0.0)
        e2 = jnp.where(ok, positions[f[:, 2]] - p0, 0.0)
        return p0, e1, e2

    # cherry detection over internal nodes: skip of a left child is its
    # right sibling, so right[i] = skip[left[i]]
    l = left[:ni]
    r = skip[jnp.clip(l, 0, total - 1)]
    cherry = (l >= ni) & (r >= ni)
    fa = lf[jnp.clip(l - ni, 0, n - 1)]
    fb = lf[jnp.clip(r - ni, 0, n - 1)]
    p0a, e1a, e2a = tri(fa)
    p0b, e1b, e2b = tri(fb)
    c = cherry[:, None]

    irows = jnp.zeros((ni, ROW2), jnp.float32)
    irows = irows.at[:, 0:3].set(jnp.where(c, p0a, bvh.bmin[:ni]))
    irows = irows.at[:, 3:6].set(jnp.where(c, e1a, bvh.bmax[:ni]))
    irows = irows.at[:, 6:9].set(jnp.where(c, e2a, 0.0))
    irows = irows.at[:, 9:12].set(jnp.where(c, p0b, 0.0))
    irows = irows.at[:, 12:15].set(jnp.where(c, e1b, 0.0))
    irows = irows.at[:, 15:18].set(jnp.where(c, e2b, 0.0))
    irows = irows.at[:, 18].set(_itof(jnp.where(cherry, fa, left[:ni])))
    irows = irows.at[:, 19].set(_itof(jnp.where(cherry, fb, -1)))
    irows = irows.at[:, 20].set(_itof(skip[:ni]))
    irows = irows.at[:, 21].set(cherry.astype(jnp.float32))

    # singleton leaf rows (unreachable under a cherry but kept in place —
    # no renumbering)
    p0, e1, e2 = tri(lf)
    lrows = jnp.zeros((n, ROW2), jnp.float32)
    lrows = lrows.at[:, 0:3].set(p0)
    lrows = lrows.at[:, 3:6].set(e1)
    lrows = lrows.at[:, 6:9].set(e2)
    lrows = lrows.at[:, 18].set(_itof(lf))
    lrows = lrows.at[:, 19].set(_itof(jnp.full((n,), -1, jnp.int32)))
    lrows = lrows.at[:, 20].set(_itof(skip[ni:]))
    lrows = lrows.at[:, 21].set(1.0)
    return Packed2LBVH(rows=jnp.concatenate([irows, lrows], axis=0))


# ---------------------------------------------------------------------------
# Lookahead layout: 16-wide rows, internal rows carry both CHILDREN's boxes
# ---------------------------------------------------------------------------


@struct.dataclass
class PackedLALBVH:
    """16-wide packed table with *lookahead* internal rows: instead of a
    node's own box, an internal row carries both children's boxes plus
    all three links — exactly 16 f32 slots, so the table stays the same
    size as PackedLBVH (fits VMEM for ~130k-node trees, which the
    64-wide quad table does not).

    One gather culls both children: a child whose box misses is never
    gathered. Correctness on skip-entry (arriving at a right sibling
    whose box was rejected at the parent) is automatic: child boxes are
    contained in the parent's, so a ray that missed the parent's box
    misses both child boxes and the row falls through to its skip.

    Row layout (16 x f32):
      internal: [0:3]=lmin [3:6]=lmax [6:9]=rmin [9:12]=rmax
                [12]=left [13]=skip [15]=right, [14]=0
      leaf:     [0:3]=p0 [3:6]=e1 [6:9]=e2 [12]=face [13]=skip [14]=1
    """
    rows: jax.Array   # (2N-1, 16) f32

    @property
    def num_nodes(self) -> int:
        return self.rows.shape[0]


def pack_lookahead(bvh: LBVH, positions: jax.Array, faces: jax.Array,
                   face_valid: jax.Array) -> PackedLALBVH:
    """Assemble the 16-wide lookahead table (pure jnp, jittable)."""
    positions = jax.lax.stop_gradient(positions)
    n = bvh.num_leaves
    total = bvh.num_nodes
    ni = n - 1

    lc = jnp.clip(bvh.left[:ni], 0, total - 1)
    rc = jnp.clip(bvh.skip[lc], 0, total - 1)   # right child = skip of left

    rows = jnp.zeros((total, ROW), jnp.float32)
    rows = rows.at[:ni, 0:3].set(bvh.bmin[lc])
    rows = rows.at[:ni, 3:6].set(bvh.bmax[lc])
    rows = rows.at[:ni, 6:9].set(bvh.bmin[rc])
    rows = rows.at[:ni, 9:12].set(bvh.bmax[rc])
    rows = rows.at[:ni, 12].set(_itof(bvh.left[:ni]))
    rows = rows.at[:ni, 13].set(_itof(bvh.skip[:ni]))
    rows = rows.at[:ni, 15].set(_itof(rc))

    lf = bvh.leaf_face
    p0 = positions[faces[lf, 0]]
    p1 = positions[faces[lf, 1]]
    p2 = positions[faces[lf, 2]]
    ok = face_valid[lf][:, None]
    rows = rows.at[ni:, 0:3].set(p0)
    rows = rows.at[ni:, 3:6].set(jnp.where(ok, p1 - p0, 0.0))
    rows = rows.at[ni:, 6:9].set(jnp.where(ok, p2 - p0, 0.0))
    rows = rows.at[ni:, 12].set(_itof(lf))
    rows = rows.at[ni:, 13].set(_itof(bvh.skip[ni:]))
    rows = rows.at[ni:, 14].set(1.0)
    return PackedLALBVH(rows=rows)


def traverse_wavefront_la(pbvh: PackedLALBVH, ro: jax.Array, rd: jax.Array,
                          t0: jax.Array, active: jax.Array,
                          unroll: int = 2):
    """Skip-link walk over the 16-wide lookahead table. Same contract
    as traverse_wavefront."""
    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    node0 = jnp.where(active, 0, -1).astype(jnp.int32)
    face0 = node0 * 0 - 1
    rows = pbvh.rows

    def _slab(r, base, t_best):
        tn1 = (r[:, base:base + 3] - ro) * inv
        tn2 = (r[:, base + 3:base + 6] - ro) * inv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        nonempty = jnp.all(r[:, base:base + 3] <= r[:, base + 3:base + 6],
                           axis=-1)
        return (tfar >= tnear) & (tnear < t_best) & (tfar > 0.0) & nonempty

    def _step(node, t_best, face):
        r = rows[jnp.clip(node, 0, None)]          # (R, 16) single gather
        is_leaf = r[:, 14] > 0.5

        hit, t = _mt(ro, rd, r[:, 0:3], r[:, 3:6], r[:, 6:9], t_best)
        live = node >= 0
        take = live & is_leaf & hit
        t_best = jnp.where(take, t, t_best)
        face = jnp.where(take, ftoi(r[:, 12]), face)

        hl = _slab(r, 0, t_best)
        hr = _slab(r, 6, t_best)
        nxt_internal = jnp.where(
            hl, ftoi(r[:, 12]),
            jnp.where(hr, ftoi(r[:, 15]), ftoi(r[:, 13])))
        nxt = jnp.where(is_leaf, ftoi(r[:, 13]), nxt_internal)
        node = jnp.where(live, nxt, node)
        return node, t_best, face

    def body(state):
        node, t_best, face = state
        for _ in range(unroll):
            node, t_best, face = _step(node, t_best, face)
        return node, t_best, face

    _, t_best, face = jax.lax.while_loop(
        lambda s: jnp.any(s[0] >= 0), body, (node0, t0, face0))
    return t_best, face


# ---------------------------------------------------------------------------
# Quad-leaf layout: up to 4 triangles per leaf row (64 x f32)
# ---------------------------------------------------------------------------

ROW4 = 64


@struct.dataclass
class Packed4LBVH:
    """Packed table with *quad-collapsed* leaves: every internal node
    whose subtree holds <= 4 triangles is rewritten in place as a leaf
    row carrying all of them inline (its descendants stay in the table
    but become unreachable — no renumbering, skip links unchanged).

    Generalizes Packed2LBVH's cherry merge one level further: the TPU
    gather unit is ROW-rate bound independent of row width up to 64
    floats (scripts/tpu_gather_width.py), so a 4-leaf subtree that used
    to cost up to 7 row visits (3 internal + 4 leaves) now costs 1 —
    the 4 extra Moller-Trumbore tests ride the VPU, which is ~10-20x
    cheaper per element than the gather unit.

    Row layout (64 x f32):
      internal: [0:3]=bmin [3:6]=bmax [48]=left [49]=skip [50]=0
      leaf:     [9k : 9k+9] = (p0, e1, e2) of triangle k, k in 0..3
                [44:48]=face ids (-1 = empty slot, degenerate tri)
                [49]=skip [50]=1

    With lookahead=True, internal rows instead carry both CHILDREN's
    boxes ([0:3]=lmin [3:6]=lmax [6:9]=rmin [9:12]=rmax, [48]=left
    [51]=right [49]=skip): one gather culls both children, so a child
    whose box misses is never gathered at all. Correctness on skip-entry
    (arriving at a right sibling whose box was already rejected at the
    parent) is automatic: child boxes are contained in the parent's, so
    a ray that missed the parent's box misses both child boxes and the
    row falls through to its skip link.
    """
    rows: jax.Array   # (2N-1, 64) f32
    lookahead: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_nodes(self) -> int:
        return self.rows.shape[0]


def _subtree_ranges(bvh: LBVH):
    """(cnt, first): per-node subtree leaf count and first leaf rank.
    Both BVH sources put a subtree's leaves at contiguous ranks (Karras
    ranges; host DFS preorder), so (first, cnt) identifies the whole
    subtree. Bottom-up fixpoint like the AABB refit (<= 64 levels)."""
    n = bvh.num_leaves
    ni = n - 1
    total = bvh.num_nodes
    lc = jnp.clip(bvh.left[:ni], 0, total - 1)
    rc = jnp.clip(bvh.skip[lc], 0, total - 1)   # right child = skip of left

    cnt0 = jnp.concatenate([jnp.zeros((ni,), jnp.int32),
                            jnp.ones((n,), jnp.int32)])
    cnt = jax.lax.fori_loop(
        0, 64, lambda _, c: c.at[:ni].set(c[lc] + c[rc]), cnt0)
    first0 = jnp.concatenate([jnp.zeros((ni,), jnp.int32),
                              jnp.arange(n, dtype=jnp.int32)])
    first = jax.lax.fori_loop(
        0, 64, lambda _, f: f.at[:ni].set(f[lc]), first0)
    return cnt, first


def pack_quads(bvh: LBVH, positions: jax.Array, faces: jax.Array,
               face_valid: jax.Array,
               lookahead: bool = False) -> Packed4LBVH:
    """Assemble the quad-collapsed 64-wide table. Pure jnp (jittable,
    runs under the render jit with traced vertex positions)."""
    K = 4
    positions = jax.lax.stop_gradient(positions)
    n = bvh.num_leaves
    ni = n - 1
    total = bvh.num_nodes
    lf = bvh.leaf_face

    cnt, first = _subtree_ranges(bvh)
    is_quad = cnt <= K          # all original leaves (cnt=1) included

    # up to K leaf ranks per node; empty slots -> face id -1
    ranks = jnp.clip(first[:, None] + jnp.arange(K, dtype=jnp.int32)[None],
                     0, n - 1)
    fids = lf[ranks]                                   # (total, K)
    slot_ok = jnp.arange(K, dtype=jnp.int32)[None] < cnt[:, None]
    ok = slot_ok & face_valid[fids]
    fids = jnp.where(slot_ok, fids, -1)

    f = faces[jnp.clip(fids, 0, None)]                 # (total, K, 3)
    p0 = positions[f[..., 0]]
    e1 = jnp.where(ok[..., None], positions[f[..., 1]] - p0, 0.0)
    e2 = jnp.where(ok[..., None], positions[f[..., 2]] - p0, 0.0)
    tri36 = jnp.concatenate([p0, e1, e2], axis=-1).reshape(total, K * 9)

    box36 = jnp.zeros((total, K * 9), jnp.float32)
    lc = jnp.clip(bvh.left, 0, total - 1)
    rc = jnp.clip(bvh.skip[lc], 0, total - 1)
    if lookahead:
        box36 = box36.at[:, 0:3].set(bvh.bmin[lc])
        box36 = box36.at[:, 3:6].set(bvh.bmax[lc])
        box36 = box36.at[:, 6:9].set(bvh.bmin[rc])
        box36 = box36.at[:, 9:12].set(bvh.bmax[rc])
    else:
        box36 = box36.at[:, 0:3].set(bvh.bmin)
        box36 = box36.at[:, 3:6].set(bvh.bmax)

    rows = jnp.zeros((total, ROW4), jnp.float32)
    rows = rows.at[:, 0:36].set(jnp.where(is_quad[:, None], tri36, box36))
    rows = rows.at[:, 44:48].set(_itof(fids))
    rows = rows.at[:, 48].set(_itof(bvh.left))
    rows = rows.at[:, 49].set(_itof(bvh.skip))
    rows = rows.at[:, 50].set(is_quad.astype(jnp.float32))
    rows = rows.at[:, 51].set(_itof(rc))
    return Packed4LBVH(rows=rows, lookahead=lookahead)


def traverse_wavefront4(pbvh: Packed4LBVH, ro: jax.Array, rd: jax.Array,
                        t0: jax.Array, active: jax.Array,
                        unroll: int = 2):
    """Skip-link walk over the quad-collapsed 64-wide table. Same
    contract as traverse_wavefront."""
    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    node0 = jnp.where(active, 0, -1).astype(jnp.int32)
    face0 = node0 * 0 - 1
    rows = pbvh.rows

    def _slab(r, base, t_best):
        tn1 = (r[:, base:base + 3] - ro) * inv
        tn2 = (r[:, base + 3:base + 6] - ro) * inv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        nonempty = jnp.all(r[:, base:base + 3] <= r[:, base + 3:base + 6],
                           axis=-1)
        return (tfar >= tnear) & (tnear < t_best) & (tfar > 0.0) & nonempty

    def _step(node, t_best, face):
        r = rows[jnp.clip(node, 0, None)]          # (R, 64) single gather
        is_leaf = r[:, 50] > 0.5

        tris = r[:, 0:36].reshape(-1, 4, 9)        # (R, 4, 9)
        hk, tk = _mt(ro[:, None, :], rd[:, None, :], tris[..., 0:3],
                     tris[..., 3:6], tris[..., 6:9], t_best[:, None])
        tk = jnp.where(hk, tk, BIG)
        tmin = jnp.min(tk, axis=1)
        kbest = jnp.argmin(tk, axis=1)
        fids = ftoi(r[:, 44:48])                   # (R, 4)
        fid = jnp.take_along_axis(fids, kbest[:, None], axis=1)[:, 0]

        live = node >= 0
        take = live & is_leaf & (tmin < t_best)
        t_best = jnp.where(take, tmin, t_best)
        face = jnp.where(take, fid, face)

        if pbvh.lookahead:
            hl = _slab(r, 0, t_best)
            hr = _slab(r, 6, t_best)
            nxt_internal = jnp.where(
                hl, ftoi(r[:, 48]),
                jnp.where(hr, ftoi(r[:, 51]), ftoi(r[:, 49])))
        else:
            hit_box = _slab(r, 0, t_best)
            nxt_internal = jnp.where(hit_box, ftoi(r[:, 48]),
                                     ftoi(r[:, 49]))
        nxt = jnp.where(is_leaf, ftoi(r[:, 49]), nxt_internal)
        node = jnp.where(live, nxt, node)
        return node, t_best, face

    def body(state):
        node, t_best, face = state
        for _ in range(unroll):
            node, t_best, face = _step(node, t_best, face)
        return node, t_best, face

    _, t_best, face = jax.lax.while_loop(
        lambda s: jnp.any(s[0] >= 0), body, (node0, t0, face0))
    return t_best, face


def _mt(ro, rd, p0, e1, e2, t_best, eps=1e-8):
    """Branchless Moller-Trumbore: returns (hit, t)."""
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    ok = jnp.abs(det) > eps
    inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    tvec = ro - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 0.0) & (t < t_best)
    return hit, t


def traverse_wavefront2(pbvh: Packed2LBVH, ro: jax.Array, rd: jax.Array,
                        t0: jax.Array, active: jax.Array,
                        unroll: int = 2):
    """Skip-link walk over the cherry-merged 32-wide table. Same
    contract as traverse_wavefront."""
    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe

    node0 = jnp.where(active, 0, -1).astype(jnp.int32)
    face0 = node0 * 0 - 1
    rows = pbvh.rows

    def cond(state):
        node, _, _ = state
        return jnp.any(node >= 0)

    def _step(node, t_best, face):
        r = rows[jnp.clip(node, 0, None)]          # (R, 32) single gather
        is_leaf = r[:, 21] > 0.5

        tn1 = (r[:, 0:3] - ro) * inv
        tn2 = (r[:, 3:6] - ro) * inv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        nonempty = jnp.all(r[:, 0:3] <= r[:, 3:6], axis=-1)
        hit_box = (tfar >= tnear) & (tnear < t_best) & (tfar > 0.0) & nonempty

        ha, ta = _mt(ro, rd, r[:, 0:3], r[:, 3:6], r[:, 6:9], t_best)
        hb, tb = _mt(ro, rd, r[:, 9:12], r[:, 12:15], r[:, 15:18], t_best)
        ta = jnp.where(ha, ta, BIG)
        tb = jnp.where(hb, tb, BIG)
        b_wins = tb < ta
        tmin = jnp.where(b_wins, tb, ta)
        fid = jnp.where(b_wins, ftoi(r[:, 19]), ftoi(r[:, 18]))

        live = node >= 0
        take = live & is_leaf & (tmin < t_best)
        t_best = jnp.where(take, tmin, t_best)
        face = jnp.where(take, fid, face)

        nxt_internal = jnp.where(hit_box, ftoi(r[:, 18]), ftoi(r[:, 20]))
        nxt = jnp.where(is_leaf, ftoi(r[:, 20]), nxt_internal)
        node = jnp.where(live, nxt, node)
        return node, t_best, face

    def body(state):
        node, t_best, face = state
        for _ in range(unroll):
            node, t_best, face = _step(node, t_best, face)
        return node, t_best, face

    _, t_best, face = jax.lax.while_loop(cond, body, (node0, t0, face0))
    return t_best, face


def _make_step(pbvh, eps=1e-8):
    """Build a traversal step fn (node, t_best, face, o, d, iv) -> same,
    dispatching on the packed-table layout. Used by the compacting walk
    (which permutes rays between phases, so o/d/iv are arguments)."""
    rows = pbvh.rows

    def slab(r, base, o, iv, t_best):
        tn1 = (r[:, base:base + 3] - o) * iv
        tn2 = (r[:, base + 3:base + 6] - o) * iv
        tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
        tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
        nonempty = jnp.all(r[:, base:base + 3] <= r[:, base + 3:base + 6],
                           axis=-1)
        return (tfar >= tnear) & (tnear < t_best) & (tfar > 0.0) & nonempty

    if isinstance(pbvh, Packed4LBVH):
        la = pbvh.lookahead

        def step4(node, t_best, face, o, d, iv):
            r = rows[jnp.clip(node, 0, None)]
            is_leaf = r[:, 50] > 0.5
            tris = r[:, 0:36].reshape(-1, 4, 9)
            hk, tk = _mt(o[:, None, :], d[:, None, :], tris[..., 0:3],
                         tris[..., 3:6], tris[..., 6:9], t_best[:, None])
            tk = jnp.where(hk, tk, BIG)
            tmin = jnp.min(tk, axis=1)
            kbest = jnp.argmin(tk, axis=1)
            fid = jnp.take_along_axis(ftoi(r[:, 44:48]), kbest[:, None],
                                      axis=1)[:, 0]
            live = node >= 0
            take = live & is_leaf & (tmin < t_best)
            t_best = jnp.where(take, tmin, t_best)
            face = jnp.where(take, fid, face)
            if la:
                hl = slab(r, 0, o, iv, t_best)
                hr = slab(r, 6, o, iv, t_best)
                nxt_i = jnp.where(hl, ftoi(r[:, 48]),
                                  jnp.where(hr, ftoi(r[:, 51]),
                                            ftoi(r[:, 49])))
            else:
                nxt_i = jnp.where(slab(r, 0, o, iv, t_best),
                                  ftoi(r[:, 48]), ftoi(r[:, 49]))
            nxt = jnp.where(is_leaf, ftoi(r[:, 49]), nxt_i)
            node = jnp.where(live, nxt, node)
            return node, t_best, face

        return step4

    if isinstance(pbvh, PackedLALBVH):
        def step_la(node, t_best, face, o, d, iv):
            r = rows[jnp.clip(node, 0, None)]
            is_leaf = r[:, 14] > 0.5
            hit, t = _mt(o, d, r[:, 0:3], r[:, 3:6], r[:, 6:9], t_best)
            live = node >= 0
            take = live & is_leaf & hit
            t_best = jnp.where(take, t, t_best)
            face = jnp.where(take, ftoi(r[:, 12]), face)
            hl = slab(r, 0, o, iv, t_best)
            hr = slab(r, 6, o, iv, t_best)
            nxt_i = jnp.where(hl, ftoi(r[:, 12]),
                              jnp.where(hr, ftoi(r[:, 15]), ftoi(r[:, 13])))
            nxt = jnp.where(is_leaf, ftoi(r[:, 13]), nxt_i)
            node = jnp.where(live, nxt, node)
            return node, t_best, face

        return step_la

    if isinstance(pbvh, Packed2LBVH):
        def step2(node, t_best, face, o, d, iv):
            r = rows[jnp.clip(node, 0, None)]
            is_leaf = r[:, 21] > 0.5
            hit_box = slab(r, 0, o, iv, t_best)
            ha, ta = _mt(o, d, r[:, 0:3], r[:, 3:6], r[:, 6:9], t_best)
            hb, tb = _mt(o, d, r[:, 9:12], r[:, 12:15], r[:, 15:18], t_best)
            ta = jnp.where(ha, ta, BIG)
            tb = jnp.where(hb, tb, BIG)
            b_wins = tb < ta
            tmin = jnp.where(b_wins, tb, ta)
            fid = jnp.where(b_wins, ftoi(r[:, 19]), ftoi(r[:, 18]))
            live = node >= 0
            take = live & is_leaf & (tmin < t_best)
            t_best = jnp.where(take, tmin, t_best)
            face = jnp.where(take, fid, face)
            nxt_i = jnp.where(hit_box, ftoi(r[:, 18]), ftoi(r[:, 20]))
            nxt = jnp.where(is_leaf, ftoi(r[:, 20]), nxt_i)
            node = jnp.where(live, nxt, node)
            return node, t_best, face

        return step2

    def step1(node, t_best, face, o, d, iv):
        r = rows[jnp.clip(node, 0, None)]
        is_leaf = r[:, 14] > 0.5
        hit_box = slab(r, 0, o, iv, t_best)
        hit, t = _mt(o, d, r[:, 0:3], r[:, 3:6], r[:, 6:9], t_best)
        live = node >= 0
        take = live & is_leaf & hit
        t_best = jnp.where(take, t, t_best)
        face = jnp.where(take, ftoi(r[:, 12]), face)
        nxt_i = jnp.where(hit_box, ftoi(r[:, 12]), ftoi(r[:, 13]))
        nxt = jnp.where(is_leaf, ftoi(r[:, 13]), nxt_i)
        node = jnp.where(live, nxt, node)
        return node, t_best, face

    return step1


def traverse_wavefront_compact(pbvh, ro: jax.Array,
                               rd: jax.Array, t0: jax.Array,
                               active: jax.Array,
                               phase_steps=(24, 24, 24, 32),
                               min_prefix: int = 16384,
                               unroll: int = 4,
                               unrolled: bool = False):
    """Multi-phase compacting wavefront walk — the fast full-wavefront
    alternative to tiling.

    Why (measured on v5e, scripts/tpu_sort_probe.py + finder timings):
    *bulk* gathers are throughput-bound (~0.5ms per 1M x 8 f32 rows)
    while `lax.map`-tiled while-loops pay ~90us of fixed cost per tile
    *entry* plus a sync per iteration — at 1024-ray tiles that fixed
    cost alone was ~370ms of a 520ms bunny frame. So instead of many
    small latency-bound loops, run a few big throughput-bound ones:

      phase k: `phase_steps[k]` traversal steps over the
          first `prefix` rays (static slice, no per-iteration cond);
      between phases: stable-compact rays still walking (node >= 0) to
          the front of the prefix, then halve the prefix — finished and
          dead rays stop being gathered at all;
      safety net: a `while_loop` over the final prefix, then one over
          the full wavefront, so rays deeper than the phase budget (or
          overflowing a halved prefix) always complete. In the tuned
          steady state both exit after ~0 iterations.

    unrolled=True runs each phase as straight-line Python-unrolled
    steps instead of a `fori_loop`. Measured on v5e
    (scripts/tpu_loop_isolate.py): a row gather INSIDE any XLA loop
    lowers to a slow serialized path (~0.09 G rows/s) while the same
    gather in straight-line code hits the bulk emitter (~15 G rows/s,
    HBM-bound) — 170x. Unrolling trades compile time for that.

    Returns (t_best (R,), face (R,) int32, -1 = none)."""
    R = ro.shape[0]

    safe = jnp.where(jnp.abs(rd) > 1e-12, rd,
                     jnp.where(rd >= 0, 1e-12, -1e-12))
    inv = 1.0 / safe
    _step = _make_step(pbvh)

    # full-wavefront state; `idx` tracks each row's original ray id
    node = jnp.where(active, 0, -1).astype(jnp.int32)
    t_best = t0
    face = node * 0 - 1
    idx = jnp.arange(R, dtype=jnp.int32)
    o, d, iv = ro, rd, inv

    def fori_phase(n, state):
        nd, tb, fc, o_, d_, iv_ = state

        if unrolled:
            for _ in range(n):
                nd, tb, fc = _step(nd, tb, fc, o_, d_, iv_)
            return nd, tb, fc, o_, d_, iv_

        def body(_, s):
            nd, tb, fc = _step(s[0], s[1], s[2], o_, d_, iv_)
            return (nd, tb, fc)

        nd, tb, fc = jax.lax.fori_loop(0, n, body, (nd, tb, fc),
                                       unroll=unroll)
        return nd, tb, fc, o_, d_, iv_

    def while_phase(state):
        nd, tb, fc, o_, d_, iv_ = state

        def cond(s):
            return jnp.any(s[0] >= 0)

        def body(s):
            nd, tb, fc = s
            for _ in range(unroll):
                nd, tb, fc = _step(nd, tb, fc, o_, d_, iv_)
            return (nd, tb, fc)

        nd, tb, fc = jax.lax.while_loop(cond, body, (nd, tb, fc))
        return nd, tb, fc, o_, d_, iv_

    prefix = R
    for k in phase_steps:
        if prefix < R:  # compact the still-running rays to the front
            perm = jnp.argsort(node[: 2 * prefix] < 0, stable=True)
            sl = jax.lax.optimization_barrier(tuple(
                a[: 2 * prefix][perm]
                for a in (node, t_best, face, idx, o, d, iv)))
            node, t_best, face, idx, o, d, iv = (
                jnp.concatenate([s, a[2 * prefix:]], axis=0)
                for s, a in zip(sl, (node, t_best, face, idx, o, d, iv)))
        st = fori_phase(k, (node[:prefix], t_best[:prefix], face[:prefix],
                            o[:prefix], d[:prefix], iv[:prefix]))
        node = jnp.concatenate([st[0], node[prefix:]])
        t_best = jnp.concatenate([st[1], t_best[prefix:]])
        face = jnp.concatenate([st[2], face[prefix:]])
        if prefix // 2 >= min_prefix:
            prefix //= 2

    # safety: finish the final prefix, then anything left anywhere
    st = while_phase((node[:prefix], t_best[:prefix], face[:prefix],
                      o[:prefix], d[:prefix], iv[:prefix]))
    node = jnp.concatenate([st[0], node[prefix:]])
    t_best = jnp.concatenate([st[1], t_best[prefix:]])
    face = jnp.concatenate([st[2], face[prefix:]])
    node, t_best, face, _, _, _ = while_phase(
        (node, t_best, face, o, d, iv))

    out_t = jnp.zeros_like(t_best).at[idx].set(t_best)
    out_f = jnp.zeros_like(face).at[idx].set(face)
    return out_t, out_f
