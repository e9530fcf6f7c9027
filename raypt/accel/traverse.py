"""Closest-hit queries: stackless skip-link BVH traversal and the
brute-force fallback, plus the differentiable hit recompute.

Reference hot path being replaced: BVHRayHit's 64-entry per-thread
stack walk + per-sphere brute loop (main_raytracing.cu:33-109).

TPU-native structure (SURVEY §7):
  * the *finder* returns only discrete results (closest triangle id /
    sphere id / distance) and runs under stop_gradient — data-dependent
    while-loops never see tangents;
  * `recompute_hit` re-evaluates the intersection analytically for the
    chosen primitive in plain jnp, so position / normal / distance are
    differentiable w.r.t. vertices, sphere params, and ray origin/dir.
    This is the standard detach-topology trick for differentiable ray
    tracing and keeps autodiff away from the traversal loop.

Tie-breaking parity: the reference intersects spheres first and lets a
triangle win only when strictly closer (BVHRayHit is seeded with the
sphere distance and requires `distance < result.distance`,
main_raytracing.cu:62,105); we reproduce that.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math3d import (BIG, dot, dot_keep, intersect_aabb, normalize,
                           intersect_sphere, intersect_triangle)
from ..core.types import Scene
from .lbvh import LBVH


@struct.dataclass
class HitIds:
    """Discrete (non-differentiable) closest-hit result."""
    t: jax.Array          # (...,) f32 closest distance (BIG = miss)
    tri: jax.Array        # (...,) i32 face id, -1 if not a triangle hit
    sphere: jax.Array     # (...,) i32 sphere id, -1 if not a sphere hit

    @property
    def valid(self) -> jax.Array:
        return self.t < BIG


@struct.dataclass
class Hit:
    """Differentiable hit attributes (HitData analogue,
    main_raytracing.cu:23-31)."""
    valid: jax.Array      # (...,) bool
    t: jax.Array          # (...,) f32
    position: jax.Array   # (..., 3)
    normal: jax.Array     # (..., 3) shading normal, faces the ray for tris
    uv: jax.Array         # (..., 2)
    mat_id: jax.Array     # (...,) i32
    front_face: jax.Array  # (...,) bool — ray struck the outside
                           # (false = exiting a volume; drives the
                           # dielectric eta in the refraction lobe)


# ---------------------------------------------------------------------------
# Brute-force finder (reference sphere loop main_raytracing.cu:89-103; used
# for small scenes and as the correctness oracle for the BVH path)
# ---------------------------------------------------------------------------

def _closest_sphere(scene: Scene, ro, rd):
    """Dense (R, S) sphere pass — fully vectorized broadcast, no vmap
    (a vmap'd per-ray argmin lowered ~10x slower on TPU)."""
    sp = scene.spheres
    if sp.capacity == 0:   # static shape: sphere-free scene, skip the pass
        miss = ro[..., 0] * 0.0 + BIG
        return miss, miss.astype(jnp.int32) * 0 - 1
    flat_o = ro.reshape(-1, 1, 3)
    flat_d = rd.reshape(-1, 1, 3)
    hit, t = intersect_sphere(flat_o, flat_d, sp.center[None], sp.radius[None])
    t = jnp.where(hit & sp.valid[None], t, BIG)          # (R, S)
    tmin = jnp.min(t, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    imin = jnp.min(jnp.where(t <= tmin[:, None], col, jnp.int32(2 ** 30)),
                   axis=1)
    i = jnp.where(tmin < BIG, imin, -1)
    return tmin.reshape(ro.shape[:-1]), i.reshape(ro.shape[:-1])


def _closest_triangle_brute(scene: Scene, ro, rd):
    m = scene.mesh
    p0 = m.positions[m.faces[:, 0]]
    p1 = m.positions[m.faces[:, 1]]
    p2 = m.positions[m.faces[:, 2]]

    def one_ray(o, d):
        hit, t, _, _ = intersect_triangle(o[None, :], d[None, :], p0, p1, p2)
        t = jnp.where(hit & m.face_valid, t, BIG)
        i = jnp.argmin(t)
        return t[i], jnp.where(t[i] < BIG, i.astype(jnp.int32), -1)

    flat_o = ro.reshape(-1, 3)
    flat_d = rd.reshape(-1, 3)
    t, i = jax.vmap(one_ray)(flat_o, flat_d)
    return t.reshape(ro.shape[:-1]), i.reshape(ro.shape[:-1])


def find_closest_bruteforce(scene: Scene, ro, rd, active=None) -> HitIds:
    """rd must be normalized. Batched over leading dims. `active` is
    accepted for signature parity with the packed finder (a dead ray
    costs the same as a live one here)."""
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    ts, si = _closest_sphere(scene, ro, rd)
    tt, ti = _closest_triangle_brute(scene, ro, rd)
    tri_wins = tt < ts  # strict: sphere keeps ties (reference parity)
    return HitIds(
        t=jnp.minimum(ts, tt),
        tri=jnp.where(tri_wins, ti, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )


# ---------------------------------------------------------------------------
# Wavefront sorting
# ---------------------------------------------------------------------------

def sort_wavefront(flat_d: jax.Array, flat_a: jax.Array):
    """Stable permutation compacting a ray wavefront: alive rays first
    (original order preserved), dead rays last. Returns (order, inv).

    Why this pays on TPU: the traversal while-loop per tile runs to the
    MAX node-visit count over its lanes, and `lax.map` runs tiles
    sequentially with an early-exit condition — so compacting dead rays
    (a) turns trailing tiles into all-dead tiles that exit after zero
    iterations, and (b) packs the live rays of ~1/alive_fraction
    formerly part-dead tiles into one tile, cutting total loop
    iterations roughly by the live fraction. The *stable* order is
    essential: it preserves the image-block spatial locality of the ray
    stream, keeping per-tile visit-count maxima low (a direction-octant
    key was measured 28% WORSE than no sorting at all — it scatters rays
    from the whole frame into each tile, lifting every tile's max trip
    count to the global max). Bulk sort/gather/scatter are
    throughput-bound: ~0.4-1.6ms per 1M rays on v5e
    (scripts/tpu_sort_probe.py), two orders of magnitude below what
    dead-tile skipping saves on deep-bounce wavefronts.

    flat_d is unused by the key but kept in the signature for
    experiments with direction-aware keys."""
    del flat_d
    key = (~flat_a).astype(jnp.int32)
    order = jnp.argsort(key, stable=True)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return order, inv


# ---------------------------------------------------------------------------
# BVH finder: stackless skip-link walk, tiled over rays
# ---------------------------------------------------------------------------

def _traverse_one(bvh: LBVH, p0, p1, p2, face_valid, o, d, t0):
    """Single-ray skip-link traversal. p0/p1/p2 are pre-gathered leaf
    triangle vertices in *leaf order* (index by leaf id directly)."""
    n_leaf = bvh.num_leaves
    leaf_base = n_leaf - 1
    # NaN-free reciprocal: clamp tiny components away from zero so the
    # slab test never produces 0 * inf (reference divides directly,
    # Math.h:52-55, relying on IEEE inf semantics).
    safe_d = jnp.where(jnp.abs(d) > 1e-12,
                       d, jnp.where(d >= 0, 1e-12, -1e-12))
    inv_d = 1.0 / safe_d

    def cond(state):
        node, _, _ = state
        return node >= 0

    def body(state):
        node, t_best, best_leaf = state
        hit_box = intersect_aabb(o, inv_d, bvh.bmin[node], bvh.bmax[node],
                                 t_best)
        is_leaf = node >= leaf_base
        leaf = jnp.clip(node - leaf_base, 0, n_leaf - 1)
        h, t, _, _ = intersect_triangle(o, d, p0[leaf], p1[leaf], p2[leaf])
        take = is_leaf & hit_box & h & face_valid[leaf] & (t < t_best)
        t_best = jnp.where(take, t, t_best)
        best_leaf = jnp.where(take, leaf, best_leaf)
        nxt = jnp.where(hit_box & ~is_leaf, bvh.left[node], bvh.skip[node])
        return nxt, t_best, best_leaf

    # init derived from the ray so its sharding "varying" type matches
    # under shard_map (fresh literals would be replicated-typed)
    zero_i = (d[0] * 0.0).astype(jnp.int32)
    _, t_best, best_leaf = jax.lax.while_loop(
        cond, body, (zero_i, t0 + d[0] * 0.0, zero_i - 1))
    return t_best, best_leaf


def find_closest_packed(scene: Scene, pbvh, ro, rd, active=None,
                        tile: int = 0, unroll: int = 8,
                        sort_rays: bool = False,
                        mode: str = "tiled") -> HitIds:
    """Packed-wavefront closest hit (the fast path): spheres brute-force
    first (reference ordering), then one fused skip-link walk over the
    whole ray wavefront (tile=0) or over `tile`-sized chunks.

    `active` (bool, ray-shaped) lets the integrator mask dead rays so
    they neither gather nor extend the loop trip count. `sort_rays`
    additionally compacts the wavefront (sort_wavefront) so dead tiles
    exit immediately. mode="compact" uses the multi-phase compacting
    full-wavefront walk instead of tiling (fastest measured)."""
    from .packed import (Packed2LBVH, Packed4LBVH, PackedLALBVH,
                         traverse_wavefront, traverse_wavefront2,
                         traverse_wavefront4, traverse_wavefront_la,
                         traverse_wavefront_compact)
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    ts, si = _closest_sphere(scene, ro, rd)
    shape = ro.shape[:-1]
    flat_o = ro.reshape(-1, 3)
    flat_d = rd.reshape(-1, 3)
    flat_t = ts.reshape(-1)
    flat_a = (jnp.ones(flat_t.shape, bool) if active is None
              else active.reshape(-1))
    n = flat_o.shape[0]
    is2 = isinstance(pbvh, Packed2LBVH)
    is4 = isinstance(pbvh, Packed4LBVH)
    isla = isinstance(pbvh, PackedLALBVH)
    if mode in ("compact", "unrolled"):
        t_best, face = traverse_wavefront_compact(
            pbvh, flat_o, flat_d, flat_t, flat_a,
            unrolled=(mode == "unrolled"))
        t_best = t_best.reshape(shape)
        face = face.reshape(shape)
        tri_wins = face >= 0
        return HitIds(
            t=t_best,
            tri=jnp.where(tri_wins, face, -1),
            sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
        )
    inv = None
    if sort_rays and n > 1:
        order, inv = sort_wavefront(flat_d, flat_a)
        # barrier: keep the permutation gathers materialized — XLA
        # otherwise fuses them into the traversal loop body, re-gathering
        # through `order` on every step
        flat_o, flat_d, flat_t, flat_a = jax.lax.optimization_barrier(
            (flat_o[order], flat_d[order], flat_t[order], flat_a[order]))
    if tile and n > tile:
        pad = (-n) % tile
        if pad:
            flat_o = jnp.concatenate([flat_o, jnp.zeros((pad, 3))])
            flat_d = jnp.concatenate(
                [flat_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))])
            flat_t = jnp.concatenate([flat_t, jnp.full((pad,), BIG)])
            flat_a = jnp.concatenate([flat_a, jnp.zeros((pad,), bool)])
        trav = (traverse_wavefront4 if is4
                else traverse_wavefront_la if isla
                else traverse_wavefront2 if is2 else traverse_wavefront)
        t_best, face = jax.lax.map(
            lambda args: trav(pbvh, *args, unroll=unroll),
            (flat_o.reshape(-1, tile, 3), flat_d.reshape(-1, tile, 3),
             flat_t.reshape(-1, tile), flat_a.reshape(-1, tile)))
        t_best = t_best.reshape(-1)[:n]
        face = face.reshape(-1)[:n]
    else:
        trav = (traverse_wavefront4 if is4
                else traverse_wavefront_la if isla
                else traverse_wavefront2 if is2 else traverse_wavefront)
        t_best, face = trav(pbvh, flat_o, flat_d, flat_t,
                            flat_a, unroll=unroll)
    if inv is not None:
        t_best = t_best[inv]
        face = face[inv]
    t_best = t_best.reshape(shape)
    face = face.reshape(shape)
    tri_wins = face >= 0
    return HitIds(
        t=t_best,
        tri=jnp.where(tri_wins, face, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )


def find_closest_wide(scene: Scene, wbvh, ro, rd, active=None,
                      tile: int = 0, stack_d: int = 0) -> HitIds:
    """Wide-BVH (4-ary, fat-leaf, ordered-stack) closest hit — the fast
    TPU path (accel.wide). Same contract as find_closest_packed.

    Stack-overflow guard: rays whose per-ray stack dropped a subtree are
    re-traversed with a 4x deeper stack under `lax.cond`, so the retry
    is free when nothing overflows and correct when something does."""
    from .wide import STACK_D, traverse_wide
    stack_d = stack_d or STACK_D
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    ts, si = _closest_sphere(scene, ro, rd)
    shape = ro.shape[:-1]
    flat_o = ro.reshape(-1, 3)
    flat_d = rd.reshape(-1, 3)
    flat_t = ts.reshape(-1)
    flat_a = (jnp.ones(flat_t.shape, bool) if active is None
              else active.reshape(-1))
    n = flat_o.shape[0]
    if tile and n > tile:
        pad = (-n) % tile
        if pad:
            flat_o = jnp.concatenate([flat_o, jnp.zeros((pad, 3))])
            flat_d = jnp.concatenate(
                [flat_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))])
            flat_t = jnp.concatenate([flat_t, jnp.full((pad,), BIG)])
            flat_a = jnp.concatenate([flat_a, jnp.zeros((pad,), bool)])
        t_best, face, ovf = jax.lax.map(
            lambda args: traverse_wide(wbvh, *args, stack_d=stack_d),
            (flat_o.reshape(-1, tile, 3), flat_d.reshape(-1, tile, 3),
             flat_t.reshape(-1, tile), flat_a.reshape(-1, tile)))
        t_best = t_best.reshape(-1)
        face = face.reshape(-1)
        ovf = ovf.reshape(-1)
    else:
        t_best, face, ovf = traverse_wide(wbvh, flat_o, flat_d, flat_t,
                                          flat_a, stack_d=stack_d)

    def _retry(_):
        t2, f2, _ = traverse_wide(wbvh, flat_o, flat_d, flat_t,
                                  flat_a & ovf, stack_d=4 * stack_d)
        return t2, f2

    def _keep(_):
        return jnp.full_like(t_best, BIG), jnp.full_like(face, -1)

    t2, f2 = jax.lax.cond(jnp.any(ovf), _retry, _keep, None)
    t_best = jnp.where(ovf, t2, t_best)[:n]
    face = jnp.where(ovf, f2, face)[:n]
    t_best = t_best.reshape(shape)
    face = face.reshape(shape)
    tri_wins = face >= 0
    return HitIds(
        t=t_best,
        tri=jnp.where(tri_wins, face, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )


def find_closest_dense(scene: Scene, woop, ro, rd, active=None,
                       ray_tile: int = 2048, tri_chunk: int = 2048) -> HitIds:
    """MXU-dense closest hit via Woop-transform matmuls (accel.dense) —
    the fast path for small scenes where T x R pair testing beats
    traversal. Same contract as the other finders."""
    from .dense import closest_dense
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    ts, si = _closest_sphere(scene, ro, rd)
    shape = ro.shape[:-1]
    t_best, face = closest_dense(woop, ro.reshape(-1, 3), rd.reshape(-1, 3),
                                 ts.reshape(-1), active=active,
                                 ray_tile=ray_tile, tri_chunk=tri_chunk)
    t_best = t_best.reshape(shape)
    face = face.reshape(shape)
    tri_wins = face >= 0
    return HitIds(
        t=t_best,
        tri=jnp.where(tri_wins, face, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )


def find_closest_cluster(scene: Scene, clusters, ro, rd, active=None,
                         use_pallas: bool = True, cap: int = 0) -> HitIds:
    """Two-level dense-culled cluster finder (accel.clusters +
    kernels.cluster_pallas): per-tile cluster worklists by dense box
    testing, then dense per-cluster intersection. No per-ray pointer
    chasing at all.

    Worklist-overflow guard: a tile touching more than `cap` clusters
    gets a truncated (nearest-first) worklist, which could silently miss
    a hit — those tiles are re-intersected against EVERY cluster under
    `lax.cond`, so the fallback costs nothing when no tile overflows."""
    from .clusters import WORKLIST_CAP, intersect_worklist_jnp, tile_worklists
    from ..kernels.cluster_pallas import TILE, pallas_cluster_intersect
    cap = cap or WORKLIST_CAP
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    ts, si = _closest_sphere(scene, ro, rd)
    shape = ro.shape[:-1]
    flat_o = ro.reshape(-1, 3)
    flat_d = rd.reshape(-1, 3)
    flat_t = ts.reshape(-1)
    flat_a = (jnp.ones(flat_t.shape, bool) if active is None
              else active.reshape(-1))
    n = flat_o.shape[0]
    pad = (-n) % (8 * TILE)   # 8-tile groups (Mosaic block constraint)
    if pad:
        flat_o = jnp.concatenate([flat_o, jnp.zeros((pad, 3))])
        flat_d = jnp.concatenate(
            [flat_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))])
        flat_t = jnp.concatenate([flat_t, jnp.full((pad,), BIG)])
        flat_a = jnp.concatenate([flat_a, jnp.zeros((pad,), bool)])
    # dead rays contribute no clusters and accept no hits
    seed = jnp.where(flat_a, flat_t, -BIG)
    wl, cnt, overflow = tile_worklists(clusters, flat_o, flat_d, seed,
                                       tile=TILE, cap=cap)
    if use_pallas:
        rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
        t_best, face = pallas_cluster_intersect(wl, cnt, rows_cm, flat_o,
                                                flat_d, seed,
                                                interpret=not _tpu_backend())
    else:
        t_best, face = intersect_worklist_jnp(clusters, wl, cnt, flat_o,
                                              flat_d, seed, tile=TILE)

    n_tiles = flat_o.shape[0] // TILE
    c_total = clusters.num_clusters

    def _full_scan(_):
        # exhaustive worklist = every cluster, for every tile (only the
        # overflowed tiles' results are kept by the caller)
        wl_full = jnp.broadcast_to(
            jnp.arange(c_total, dtype=jnp.int32)[None, :], (n_tiles, c_total))
        cnt_full = jnp.full((n_tiles,), c_total, jnp.int32)
        return intersect_worklist_jnp(clusters, wl_full, cnt_full, flat_o,
                                      flat_d, seed, tile=TILE)

    def _keep(_):
        return jnp.full_like(t_best, BIG), jnp.full_like(face, -1)

    t_fb, f_fb = jax.lax.cond(jnp.any(overflow), _full_scan, _keep, None)
    ov_ray = jnp.repeat(overflow, TILE)
    t_best = jnp.where(ov_ray, t_fb, t_best)
    face = jnp.where(ov_ray, f_fb, face)
    t_best = jnp.where(flat_a, t_best, BIG)[:n].reshape(shape)
    face = jnp.where(flat_a, face, -1)[:n].reshape(shape)
    tri_wins = face >= 0
    return HitIds(
        t=t_best,
        tri=jnp.where(tri_wins, face, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )


def _spread3(x: jax.Array) -> jax.Array:
    """Spread the low 7 bits of x to every third bit (int32 morton
    helper): bit k -> bit 3k."""
    x = x & 0x7F
    x = (x | (x << 8)) & 0x0100F00F
    x = (x | (x << 4)) & 0x010C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def onehot_sort_key(flat_o, flat_d, flat_a, bmin, bmax) -> jax.Array:
    """Ray-binning key for the onehot finder: dead-last |
    6-bit-per-axis origin morton | direction octant. Rays from the
    same surface patch heading the same way want nearly the same
    clusters, so sorting by this key collapses the per-tile mask union
    toward the per-ray popcount (measured 84 -> ~popmean on the
    bounce-1 wavefront; the union is what phase B pays for)."""
    ext = jnp.maximum(bmax - bmin, 1e-6)
    q = jnp.clip(((flat_o - bmin) / ext) * 64.0, 0.0, 63.0).astype(
        jnp.int32)
    m = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
         | (_spread3(q[:, 2]) << 2))                        # 18 bits
    octant = ((flat_d[:, 0] < 0).astype(jnp.int32) * 4
              + (flat_d[:, 1] < 0).astype(jnp.int32) * 2
              + (flat_d[:, 2] < 0).astype(jnp.int32))
    key = (m << 3) | octant
    return jnp.where(flat_a, key, jnp.int32(1) << 30)


def find_closest_onehot(scene: Scene, accel, ro, rd, active=None,
                        use_pallas_walk: bool = True,
                        use_pallas_intersect: bool = True,
                        cap: int = 0,
                        overflow_fallback: bool = True,
                        sort_rays="none",
                        tile_b: int = 0,
                        segment_sort: int = 0,
                        walk_tile: int = 0,
                        expand_n: int = 0,
                        compact_n: int = 0) -> HitIds:
    """Two-phase one-hot MXU finder — the flagship TPU path.

    accel = (Clusters, encoded top-tree table) from
    accel.build_onehot(). Phase A walks the cluster top tree inside a
    Pallas kernel where every node fetch is a one-hot matmul (MXU)
    instead of a gather-unit row fetch (kernels/onehot_walk.py); phase
    B densely intersects each tile's EXACT wanted-cluster union
    (kernels/cluster_pallas.py).

    sort_rays: "alive" stably compacts live rays to the front before
    the walk, collapsing phase A's per-tile max trip counts on deep
    bounces (47/13/3.4% alive at bounces 1-3 but near-full-wavefront
    walk cost unsorted) — yet EVERY implementation measured a net LOSS
    (fwd at leaf=128: none 667 ms, argsort+gather 793 ms,
    cumsum+scatter 1105 ms — XLA's 1M argsort is ~30 ms/bounce and a
    1M-row scatter ~90 ms): the ~150 ms the walk floors promise is
    cheaper than any global data movement XLA offers. Compaction has
    to happen inside a kernel via DMA if at all (round-4 item).
    Default "none". "mask"
    additionally re-bins rays after the walk by their first wanted
    cluster id; "none" disables both. Exactness is unaffected (each
    ray's own mask is always inside its tile's union). Full re-binning
    was measured a net LOSS on the 1024^2 bunny fwd render: none
    641 ms, (origin morton | direction octant) 832 ms (tile-union max
    457 -> 705 — same-origin primaries collapse to an octant-only
    key), first-wanted 1348 ms (lowest-id bit is not a similarity key,
    and the in-program 1M-ray mask permute is expensive). The
    32x32-pixel block layout's spatial locality is the best phase-B
    grouping we found.

    tile_b: phase-B ray-tile width (default kernels.cluster_pallas.TILE
    = 256; 128/512 measured wash/loss on v5e). walk_tile: phase-A rays
    per walk program (default kernels.onehot_walk.RAY_TILE = 1024;
    512/256 measured losses e2e). segment_sort > 0 stable-partitions
    live rays to the front WITHIN that group size before the walk —
    locality-preserving compaction, MEASURED A LOSS on v5e (772 vs
    655 ms fwd at 2048; kept for experiments, default off).

    When no ray sorting is requested and both Pallas kernels are in
    use, the walk runs in FUSED-UNION form (pallas_topwalk_union): the
    per-ray mask is OR-reduced to per-tile unions inside the kernel.

    expand_n > 0 routes phase B through the PER-RAY-EXACT expansion
    kernel (kernels/cluster_expand.py, round 5): the walk emits the
    full per-ray mask and the intersect kernel regroups lanes by
    cluster in-kernel (rank -> one-hot-permute compact -> dense test ->
    scatter), so each cluster is tested only against the rays that want
    it instead of its whole 256-ray tile — killing the 56-158x
    union-vs-popcount waste on incoherent bounces
    (scripts/tpu_phase_decomp.py). expand_n is the rays-per-program
    granularity (2048 measured best; larger programs share more
    distinct clusters but pay more per selection matmul). Results are
    bitwise equal to the mask path. Requires no ray sorting and the
    default (non-Woop) accel.

    overflow_fallback handles tiles whose union exceeds `cap` with
    additional BOUNDED phase-B rounds over worklist slices
    [r*cap, (r+1)*cap) — each behind a lax.cond that only fires if any
    tile actually has that many clusters. (Round 2's single exhaustive
    full-scan cond was unbounded work — tile_count x c_total dense
    tests — and hit the device watchdog on the bounce-1 wavefront at
    1024^2: the BENCH_r02 'kernel fault'.)"""
    from .clusters import (WORKLIST_CAP, first_wanted,
                           intersect_worklist_jnp, tile_union_counts,
                           worklist_slice)
    from .ctree import walk_topwalk_jnp
    from ..kernels.cluster_pallas import (
        TILE, pallas_cluster_intersect_mask,
        pallas_cluster_intersect_mask_woop)
    from ..kernels.onehot_walk import RAY_TILE, pallas_topwalk
    clusters, table = accel[0], accel[1]
    woop = accel[2:4] if len(accel) >= 4 else None
    cap = cap or WORKLIST_CAP
    tile_b = tile_b or TILE
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    ts, si = _closest_sphere(scene, ro, rd)
    shape = ro.shape[:-1]
    flat_o = ro.reshape(-1, 3)
    flat_d = rd.reshape(-1, 3)
    flat_t = ts.reshape(-1)
    flat_a = (jnp.ones(flat_t.shape, bool) if active is None
              else active.reshape(-1))
    n = flat_o.shape[0]
    chunk = max(8 * tile_b, RAY_TILE)
    if expand_n:
        chunk = max(chunk, 8 * expand_n, walk_tile or RAY_TILE)
    if compact_n:
        chunk = max(chunk, compact_n)
    pad = (-n) % chunk
    if pad:
        flat_o = jnp.concatenate([flat_o, jnp.zeros((pad, 3))])
        flat_d = jnp.concatenate(
            [flat_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))])
        flat_t = jnp.concatenate([flat_t, jnp.full((pad,), BIG)])
        flat_a = jnp.concatenate([flat_a, jnp.zeros((pad,), bool)])

    mode = {False: "none", True: "mask"}.get(sort_rays, sort_rays)
    do_sort = mode != "none" and flat_o.shape[0] > tile_b
    inv = None
    if segment_sort and not do_sort and \
            flat_o.shape[0] % segment_sort == 0:
        # SEGMENTED stable alive-partition (r4): compact live rays to
        # the front WITHIN each segment_sort-ray group. Unlike the
        # global compactions (all measured losses — they scatter rays
        # from the whole frame into each tile, exploding the per-tile
        # cluster unions), a local partition preserves the pixel-block
        # spatial order, so dead tiles/walk-programs empty out on deep
        # bounces while unions stay tight.
        g = segment_sort
        r_all = flat_o.shape[0]
        n_seg = r_all // g
        key = (~flat_a).astype(jnp.int32).reshape(n_seg, g)
        order_l = jnp.argsort(key, axis=1, stable=True)
        base = (jnp.arange(n_seg, dtype=order_l.dtype) * g)[:, None]
        order = (order_l + base).reshape(-1)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(r_all, dtype=order.dtype))
        flat_o, flat_d, flat_t, flat_a = jax.lax.optimization_barrier(
            (flat_o[order], flat_d[order], flat_t[order], flat_a[order]))
    if do_sort:
        # pre-walk alive compaction (stable): phase A's per-tile
        # while_loop runs to the MAX lane trip count, so grouping dead
        # rays turns trailing tiles into zero-iteration exits — walk
        # cost scales with the alive fraction on deep bounces. On the
        # roofline capture, bounces 1-3 carry 47/13/3.4% live rays yet
        # their scattered layout kept walk_tile_max_sum at ~full-
        # wavefront level (68k/64k/55k vs 36k step-tiles at bounce 0).
        # compaction without a sort: two prefix sums + scatters.
        # ALSO a measured loss (see docstring) — XLA 1M-row scatters
        # run ~90 ms each. inv1[i] = destination of ray i; scatter
        # compacts, gather-by-inv1 unsorts.
        ai = flat_a.astype(jnp.int32)
        na = jnp.sum(ai)
        inv1 = jnp.where(flat_a, jnp.cumsum(ai) - 1,
                         na + jnp.cumsum(1 - ai) - 1)

        def _scat(x):
            return jnp.zeros_like(x).at[inv1].set(x)

        flat_o, flat_d, flat_t, flat_a = jax.lax.optimization_barrier(
            (_scat(flat_o), _scat(flat_d), _scat(flat_t), _scat(flat_a)))
        if mode == "alive":
            inv = inv1

    c_total = clusters.num_clusters
    num_words = -(-c_total // 32)
    if (expand_n and use_pallas_walk and use_pallas_intersect
            and mode == "none" and woop is None and not segment_sort):
        # PER-RAY-EXACT path (round 5): walk emits the full per-ray
        # mask in kernel-native (cw, R) layout (padded to 8-row pages);
        # the expansion kernel regroups lanes per cluster and tests
        # each cluster only against its interested rays.
        from ..kernels.cluster_expand import pallas_cluster_expand
        from ..kernels.onehot_walk import pallas_topwalk_cm_u
        assert scene.mesh.faces.shape[0] < (1 << 24), \
            "expand path encodes face ids as 3 bf16 base-256 digits"
        orig_a = flat_a
        if compact_n and flat_o.shape[0] % compact_n == 0:
            # in-kernel alive-compaction (kernels/compact.py): live
            # rays stably permuted to each group's front so trailing
            # walk tiles zero-trip and the expansion kernel's cluster
            # scans concentrate into the leading programs; (t, face)
            # are un-permuted in-kernel below. Bitwise-neutral.
            from ..kernels.compact import (pallas_alive_compact,
                                           pallas_alive_uncompact)
            flat_o, flat_d, flat_t, flat_a = pallas_alive_compact(
                flat_o, flat_d, flat_t, flat_a, group=compact_n,
                interpret=not _tpu_backend())
        cwp = -(-num_words // 8) * 8
        # dual-output walk: per-ray mask + per-walk-program unions, so
        # the expansion wrapper's group-union fold reads tiny rows
        # instead of tree-reducing the full (cwp, R) mask (round 5)
        mask_cm, union_pp = pallas_topwalk_cm_u(
            table, flat_o, flat_d, flat_t, flat_a, cwp,
            interpret=not _tpu_backend(),
            ray_tile=walk_tile or RAY_TILE)
        seed = jnp.where(flat_a, flat_t, -BIG)
        rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
        t_best, face = pallas_cluster_expand(
            mask_cm, rows_cm, flat_o, flat_d, seed,
            interpret=not _tpu_backend(), n_rays=expand_n,
            union_pp=union_pp)
        if compact_n and flat_o.shape[0] % compact_n == 0:
            t_best, face = pallas_alive_uncompact(
                t_best, face, orig_a, group=compact_n,
                interpret=not _tpu_backend())
            flat_a = orig_a
        t_best = jnp.where(flat_a, t_best, BIG)[:n].reshape(shape)
        face = jnp.where(flat_a, face, -1)[:n].reshape(shape)
        tri_wins = face >= 0
        return HitIds(
            t=t_best,
            tri=jnp.where(tri_wins, face, -1),
            sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
        )
    fused_union = (use_pallas_walk and use_pallas_intersect
                   and mode == "none" and woop is None
                   and (walk_tile or RAY_TILE) % tile_b == 0)
    if fused_union:
        # fused path: the walk kernel OR-reduces per-ray masks to
        # per-tile unions in registers — the (R, cw) mask never hits
        # HBM and the XLA tree reduce disappears (~25 ms/bounce,
        # scripts/tpu_phase_decomp.py r4)
        from ..kernels.onehot_walk import pallas_topwalk_union
        union = pallas_topwalk_union(table, flat_o, flat_d, flat_t,
                                     flat_a, num_words,
                                     interpret=not _tpu_backend(),
                                     union_tile=tile_b,
                                     ray_tile=walk_tile or RAY_TILE)
        mask = None
    elif use_pallas_walk:
        mask = pallas_topwalk(table, flat_o, flat_d, flat_t, flat_a,
                              num_words, interpret=not _tpu_backend())
    else:
        mask = walk_topwalk_jnp(table, flat_o, flat_d, flat_t, flat_a,
                                num_words)

    if do_sort and mode == "mask":
        skey = jnp.where(flat_a, first_wanted(mask), jnp.int32(1) << 29)
        order2 = jnp.argsort(skey, stable=True)
        inv2 = jnp.zeros_like(order2).at[order2].set(
            jnp.arange(order2.shape[0], dtype=order2.dtype))
        inv = inv2[inv1]
        # barrier: keep the permutation gathers materialized (see
        # find_closest_packed)
        mask, flat_o, flat_d, flat_t, flat_a = jax.lax.optimization_barrier(
            (mask[order2], flat_o[order2], flat_d[order2],
             flat_t[order2], flat_a[order2]))

    if not fused_union:
        union, counts = tile_union_counts(mask, tile_b, c_total)
    seed = jnp.where(flat_a, flat_t, -BIG)
    if use_pallas_intersect and woop is not None:
        # Woop-MXU phase B — OPT-IN via a 4-tuple accel
        # (build_onehot(with_woop=True)). MEASURED NET LOSS on v5e
        # (scripts/tpu_woop_ab.py, r4): 578 vs 981 ns/entry isolated,
        # but e2e fwd 1077 ms vs 664 ms — the MXU's exact-f32 path is
        # 6 bf16 passes and a K=4 contraction is pass-latency-bound
        # (1-pass bf16 is 953 ms AND numerically wrong: u/v/t need
        # f32). Kept for table-driven experiments; MT kernel is the
        # flagship. Face id resolved by ONE R-scale gather.
        woop_cm, fid_flat = woop
        t_best, packed = pallas_cluster_intersect_mask_woop(
            union, woop_cm, flat_o, flat_d, seed,
            interpret=not _tpu_backend(), tile=tile_b)
        face = jnp.where(packed >= 0,
                         fid_flat[jnp.clip(packed, 0, None)], -1)
        overflow_fallback = False
    elif use_pallas_intersect:
        # mask-driven kernel: consumes the union bitmask directly (de
        # Bruijn bit scan in SMEM) — no worklist compaction, no
        # capacity limit, hence no overflow machinery on this path
        rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
        t_best, face = pallas_cluster_intersect_mask(
            union, rows_cm, flat_o, flat_d, seed,
            interpret=not _tpu_backend(), tile=tile_b)
        overflow_fallback = False
    else:
        wl = worklist_slice(union, c_total, cap, 0)
        cnt = jnp.minimum(counts, cap)

        def isect(wl_, cnt_, t0_):
            return intersect_worklist_jnp(clusters, wl_, cnt_, flat_o,
                                          flat_d, t0_, tile=tile_b)

        t_best, face = isect(wl, cnt, seed)

    if overflow_fallback and c_total > cap:
        # bounded residual: if any tile's union exceeds cap, keep
        # consuming worklist slices [r*cap, (r+1)*cap) until the max
        # count is covered. One lax.cond guards the whole thing, and
        # every round is bounded (cap slots), so the fallback can cost
        # at most ceil(c_total/cap) kernel passes — never the
        # unbounded tile_count x c_total dense scan that round 2 shipped.
        n_rounds = -(-c_total // cap)

        def _residual(args):
            t_in, f_in = args
            cid = jnp.arange(c_total, dtype=jnp.int32)
            wanted = (union[:, cid >> 5] >> (cid & 31)[None, :]) & 1
            keys = wanted * (c_total - cid)[None, :]
            vals, idxs = jax.lax.top_k(keys, c_total)
            wl_full = jnp.where(vals > 0, idxs.astype(jnp.int32), -1)
            padc = n_rounds * cap - c_total
            if padc:
                wl_full = jnp.concatenate(
                    [wl_full, jnp.full((wl_full.shape[0], padc), -1,
                                       jnp.int32)], axis=1)
            max_cnt = jnp.max(counts)

            def cond_fn(st):
                r = st[0]
                return (r * cap < max_cnt) & (r < n_rounds)

            def body_fn(st):
                r, t_c, f_c = st
                wl_r = jax.lax.dynamic_slice_in_dim(wl_full, r * cap,
                                                    cap, 1)
                cnt_r = jnp.clip(counts - r * cap, 0, cap)
                t_r, f_r = isect(wl_r, cnt_r, t_c)
                keep_new = f_r >= 0
                return (r + 1, jnp.where(keep_new, t_r, t_c),
                        jnp.where(keep_new, f_r, f_c))

            _, t_o, f_o = jax.lax.while_loop(
                cond_fn, body_fn, (jnp.int32(1), t_in, f_in))
            return t_o, f_o

        t_best, face = jax.lax.cond(jnp.any(counts > cap), _residual,
                                    lambda a: a, (t_best, face))

    if inv is not None:
        t_best = t_best[inv]
        face = face[inv]
        flat_a = flat_a[inv]
    t_best = jnp.where(flat_a, t_best, BIG)[:n].reshape(shape)
    face = jnp.where(flat_a, face, -1)[:n].reshape(shape)
    tri_wins = face >= 0
    return HitIds(
        t=t_best,
        tri=jnp.where(tri_wins, face, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )


def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def find_closest_bvh(scene: Scene, bvh: LBVH, ro, rd,
                     tile: int = 4096) -> HitIds:
    """rd must be normalized. Rays are processed in tiles of `tile` so
    each tile's traversal loop terminates independently (the pure-XLA
    analogue of the Pallas tile-wavefront kernel; a vmap'd while_loop
    runs to the max trip count of its batch, so smaller batches bound
    the divergence cost)."""
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    m = scene.mesh
    lf = bvh.leaf_face
    p0 = m.positions[m.faces[lf, 0]]
    p1 = m.positions[m.faces[lf, 1]]
    p2 = m.positions[m.faces[lf, 2]]
    fvalid = m.face_valid[lf]

    ts, si = _closest_sphere(scene, ro, rd)

    shape = ro.shape[:-1]
    flat_o = ro.reshape(-1, 3)
    flat_d = rd.reshape(-1, 3)
    flat_ts = ts.reshape(-1)
    n = flat_o.shape[0]
    pad = (-n) % tile
    if pad:
        flat_o = jnp.concatenate([flat_o, jnp.zeros((pad, 3), flat_o.dtype)])
        flat_d = jnp.concatenate(
            [flat_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))])
        flat_ts = jnp.concatenate([flat_ts, jnp.full((pad,), BIG)])

    trav = jax.vmap(partial(_traverse_one, bvh, p0, p1, p2, fvalid))
    o_t = flat_o.reshape(-1, tile, 3)
    d_t = flat_d.reshape(-1, tile, 3)
    s_t = flat_ts.reshape(-1, tile)
    t_best, best_leaf = jax.lax.map(lambda a: trav(*a), (o_t, d_t, s_t))
    t_best = t_best.reshape(-1)[:n].reshape(shape)
    best_leaf = best_leaf.reshape(-1)[:n].reshape(shape)

    tri = jnp.where(best_leaf >= 0, lf[jnp.clip(best_leaf, 0, None)], -1)
    tri_wins = best_leaf >= 0  # traversal seeded with sphere t => strict win
    return HitIds(
        t=t_best,
        tri=jnp.where(tri_wins, tri, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )


# ---------------------------------------------------------------------------
# Differentiable hit recompute
# ---------------------------------------------------------------------------

def recompute_hit(scene: Scene, ro, rd, ids: HitIds) -> Hit:
    """Re-evaluate the chosen primitive's intersection differentiably.

    Triangle shading normal: correctly barycentric-interpolated
    ((1-u-v)*n0 + u*n1 + v*n2) then flipped to face the ray
    (main_raytracing.cu:63-69). NOTE the reference permutes the
    barycentric weights when interpolating normals (it pairs glm's
    (v1, v2) weights with (v0, v1) normals) — a quirk SURVEY §7 lists
    under bugs not to reproduce; we interpolate correctly.
    Sphere normal: (p - center) / radius, no backface flip
    (main_raytracing.cu:99 parity).
    """
    m = scene.mesh
    sp = scene.spheres

    is_tri = ids.tri >= 0
    is_sph = ids.sphere >= 0

    fi = jnp.clip(ids.tri, 0, None)
    f = m.faces[fi]
    v0, v1, v2 = m.positions[f[..., 0]], m.positions[f[..., 1]], m.positions[f[..., 2]]
    n0, n1, n2 = m.normals[f[..., 0]], m.normals[f[..., 1]], m.normals[f[..., 2]]
    t0, t1, t2 = m.uvs[f[..., 0]], m.uvs[f[..., 1]], m.uvs[f[..., 2]]
    _, tt, u, v = intersect_triangle(ro, rd, v0, v1, v2)
    w = 1.0 - u - v
    tri_n = normalize(w[..., None] * n0 + u[..., None] * n1 + v[..., None] * n2)
    backface = dot(rd, tri_n) >= 0.0
    tri_n = jnp.where(backface[..., None], -tri_n, tri_n)
    tri_uv = w[..., None] * t0 + u[..., None] * t1 + v[..., None] * t2
    tri_mat = m.face_material[fi]

    si = jnp.clip(ids.sphere, 0, None)
    c = sp.center[si]
    r = sp.radius[si]
    _, st = intersect_sphere(ro, rd, c, r)
    sph_mat = sp.material[si]

    t = jnp.where(is_tri, tt, jnp.where(is_sph, st, BIG))
    pos = ro + rd * t[..., None]
    sph_n = (pos - c) / jnp.maximum(r, 1e-12)[..., None]
    normal = jnp.where(is_tri[..., None], tri_n,
                       jnp.where(is_sph[..., None], sph_n, 0.0))
    uv = jnp.where(is_tri[..., None], tri_uv, 0.0)
    mat = jnp.where(is_tri, tri_mat, jnp.where(is_sph, sph_mat, 0))
    valid = is_tri | is_sph
    front = jnp.where(is_tri, ~backface,
                      is_sph & (dot(rd, sph_n) < 0.0))
    return Hit(valid=valid, t=t, position=pos, normal=normal, uv=uv,
               mat_id=mat.astype(jnp.int32), front_face=front)
