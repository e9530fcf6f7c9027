"""One-hot MXU traversal: cluster top-tree invariants, encoded-table
walk vs brute force, Pallas kernel (interpret) parity, end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.accel import build, find_closest_bruteforce, find_closest_onehot
from raypt.accel.clusters import build_clusters
from raypt.accel.ctree import (build_cluster_tree, build_onehot,
                               encode_topwalk_table, walk_topwalk_jnp,
                               _bf16_down, _bf16_up, _digits, decode_digits)
from raypt.core.math3d import BIG, normalize
from raypt.core.scene import MaterialDef, SceneBuilder


def _scene(rng, ntri=300, nsph=3):
    b = SceneBuilder()
    m0 = b.add_material(MaterialDef(albedo=(0.5, 0.5, 0.5)))
    for _ in range(ntri):
        base = rng.uniform(-5, 5, 3)
        b.add_triangle(base, base + rng.uniform(-1, 1, 3),
                       base + rng.uniform(-1, 1, 3), m0)
    for _ in range(nsph):
        b.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.2, 1.0), m0)
    return b.freeze()


def _rays(rng, n):
    ro = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    rd = normalize(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)))
    return ro, rd


def test_bf16_conservative_rounding():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([
        rng.normal(size=1000) * np.exp(rng.uniform(-20, 20, 1000)),
        [0.0, -0.0, 1e30, -1e30, 1.0, -1.0]]).astype(np.float32))
    lo = np.asarray(_bf16_down(x), np.float32)
    hi = np.asarray(_bf16_up(x), np.float32)
    x = np.asarray(x)
    assert (lo <= x).all(), (lo[lo > x][:4], x[lo > x][:4])
    assert (hi >= x).all()
    # tight: within one bf16 ulp
    assert (np.abs(lo - x) <= np.abs(x) * 2 ** -7 + 1e-38).all()


def test_digit_roundtrip():
    ids = jnp.asarray([-1, 0, 1, 127, 128, 1000, 4094], jnp.int32)
    hi, lo = _digits(ids)
    back = decode_digits(hi.astype(jnp.float32), lo.astype(jnp.float32))
    assert np.array_equal(np.asarray(back), np.asarray(ids))


def test_cluster_tree_invariants(rng):
    """Every cluster id appears exactly once as a top-tree leaf; a full
    (non-culling) walk from the root via left/skip reaches every valid
    node exactly once."""
    scene = _scene(rng, ntri=400, nsph=0)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    cl = build_clusters(bvh, scene.mesh.positions, scene.mesh.faces,
                        scene.mesh.face_valid, leaf=16)
    tree = build_cluster_tree(bvh, leaf=16)
    left = np.asarray(tree.left)
    skip = np.asarray(tree.skip)
    clus = np.asarray(tree.cluster)
    valid = np.asarray(tree.valid)
    bmin = np.asarray(tree.bmin)
    bmax = np.asarray(tree.bmax)

    # exhaustive DFS walk (always descend)
    seen = []
    node = 0
    for _ in range(tree.num_nodes + 2):
        if node < 0:
            break
        seen.append(node)
        node = left[node] if left[node] >= 0 else skip[node]
    seen = np.asarray(seen)
    assert len(seen) == valid.sum()
    # each valid cluster id appears exactly once among visited leaves
    leaf_cids = clus[seen]
    leaf_cids = leaf_cids[leaf_cids >= 0]
    n_valid_clusters = int(np.asarray(cl.valid).sum())
    assert sorted(leaf_cids.tolist()) == list(range(n_valid_clusters))
    # parent boxes contain children (walked pairs)
    for e in seen:
        if left[e] >= 0:
            c = left[e]
            assert (bmin[e] <= bmin[c] + 1e-5).all()
            assert (bmax[e] >= bmax[c] - 1e-5).all()


def test_encoded_walk_masks_cover_bruteforce_hits(rng):
    """Every brute-force triangle hit's cluster must be flagged in the
    walk's wanted mask (conservative bf16 boxes => no false negatives)."""
    scene = _scene(rng, ntri=400, nsph=2)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    cl = build_clusters(bvh, scene.mesh.positions, scene.mesh.faces,
                        scene.mesh.face_valid, leaf=16)
    tree = build_cluster_tree(bvh, leaf=16)
    table = encode_topwalk_table(tree)
    ro, rd = _rays(rng, 512)
    from raypt.accel.traverse import _closest_sphere
    ts, _ = _closest_sphere(scene, ro, rd)
    c_total = cl.num_clusters
    nw = -(-c_total // 32)
    mask = walk_topwalk_jnp(table, ro, rd, ts,
                            jnp.ones((512,), bool), nw)
    mask = np.asarray(mask)

    ref = find_closest_bruteforce(scene, ro, rd)
    tri = np.asarray(ref.tri)
    # face -> cluster map
    rows_fid = jax.lax.bitcast_convert_type(cl.tri_rows[..., 9], jnp.int32)
    rows_fid = np.asarray(rows_fid)
    cvalid = np.asarray(cl.valid)
    f2c = {}
    for c in range(c_total):
        if not cvalid[c]:
            continue
        for f in rows_fid[c][np.asarray(
                np.abs(np.asarray(cl.tri_rows[c, :, 3:9])).sum(-1) > 0)]:
            f2c[int(f)] = c
    for i in range(512):
        if tri[i] >= 0:
            c = f2c[int(tri[i])]
            assert (int(mask[i, c >> 5]) >> (c & 31)) & 1, (i, tri[i], c)


def test_pallas_topwalk_matches_jnp(rng):
    """Pallas kernel (interpret mode) == encoded jnp walk, bit for bit."""
    from raypt.kernels.onehot_walk import RAY_TILE, pallas_topwalk
    scene = _scene(rng, ntri=300, nsph=0)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    cl = build_clusters(bvh, scene.mesh.positions, scene.mesh.faces,
                        scene.mesh.face_valid, leaf=16)
    tree = build_cluster_tree(bvh, leaf=16)
    table = encode_topwalk_table(tree)
    n = RAY_TILE * 2
    ro, rd = _rays(rng, n)
    act = jnp.asarray(rng.uniform(size=n) < 0.8)
    t0 = jnp.full((n,), BIG)
    nw = -(-cl.num_clusters // 32)
    a = walk_topwalk_jnp(table, ro, rd, t0, act, nw)
    b = pallas_topwalk(table, ro, rd, t0, act, nw, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_onehot_finder_matches_bruteforce(rng):
    scene = _scene(rng, ntri=300, nsph=3)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid, leaf=16)
    ro, rd = _rays(rng, 1000)   # non-multiple of the tile
    a = find_closest_bruteforce(scene, ro, rd)
    for pw in (False, True):
        c = find_closest_onehot(scene, accel, ro, rd, use_pallas_walk=pw,
                                use_pallas_intersect=False)
        assert np.allclose(np.asarray(a.t), np.asarray(c.t),
                           rtol=1e-4, atol=1e-4), pw
        assert np.array_equal(np.asarray(a.sphere), np.asarray(c.sphere))


def test_onehot_worklist_overflow_fallback(rng):
    from raypt.accel.traverse import find_closest_onehot as fco
    scene = _scene(rng, ntri=300, nsph=1)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid, leaf=8)
    ro, rd = _rays(rng, 512)
    a = find_closest_bruteforce(scene, ro, rd)
    c = fco(scene, accel, ro, rd, use_pallas_walk=False,
            use_pallas_intersect=False, cap=2)
    assert np.allclose(np.asarray(a.t), np.asarray(c.t),
                       rtol=1e-4, atol=1e-4)


def test_onehot_backend_renders(rng):
    from raypt.core.types import EnvMap, RenderConfig
    from raypt.render import render_frame
    b = SceneBuilder(env=EnvMap.constant((0.4, 0.5, 0.6)))
    m0 = b.add_material(MaterialDef(albedo=(0.6, 0.6, 0.6)))
    for _ in range(150):
        base = rng.uniform(-3, 3, 3) - [0, 0, 5]
        b.add_triangle(base, base + rng.uniform(-1, 1, 3),
                       base + rng.uniform(-1, 1, 3), m0)
    scene = b.freeze()
    cfg_o = RenderConfig(width=16, height=16, samples_per_pixel=1,
                         num_bounces=3, backend="onehot",
                         russian_roulette=False)
    cfg_b = cfg_o.replace(backend="bruteforce")
    ia = render_frame(scene, cfg_o, jax.random.key(0))
    ib = render_frame(scene, cfg_b, jax.random.key(0))
    assert np.allclose(np.asarray(ia), np.asarray(ib), rtol=1e-3, atol=1e-3)


@pytest.mark.experimental
def test_grouped_intersect_matches_worklist(rng):
    """pallas_cluster_intersect_grouped (G entries per loop iteration,
    dummy-cluster padding) must agree exactly with the per-entry
    worklist kernel for every G, including G that doesn't divide the
    count."""
    from raypt.accel.clusters import worklists_from_masks
    from raypt.kernels.cluster_pallas import (
        TILE, pallas_cluster_intersect, pallas_cluster_intersect_grouped)
    scene = _scene(rng, ntri=300, nsph=0)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    clusters, table = build_onehot(bvh, scene.mesh.positions,
                                   scene.mesh.faces, scene.mesh.face_valid,
                                   leaf=16)
    ro, rd = _rays(rng, 8 * TILE)
    t0 = jnp.full((8 * TILE,), BIG)
    num_words = -(-clusters.num_clusters // 32)
    mask = walk_topwalk_jnp(table, ro, rd, t0,
                            jnp.ones((8 * TILE,), bool), num_words)
    wl, cnt, _ = worklists_from_masks(mask, TILE, 64,
                                      clusters.num_clusters)
    rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
    t_a, f_a = pallas_cluster_intersect(wl, cnt, rows_cm, ro, rd, t0,
                                        interpret=True)
    for g in (2, 3, 4):
        t_g, f_g = pallas_cluster_intersect_grouped(
            wl, cnt, rows_cm, ro, rd, t0, interpret=True, group=g)
        assert np.array_equal(np.asarray(f_a), np.asarray(f_g)), g
        assert np.allclose(np.asarray(t_a), np.asarray(t_g)), g


@pytest.mark.experimental
def test_woop_mask_kernel_matches_mt(rng):
    """pallas_cluster_intersect_mask_woop (Woop affine + MXU) must
    agree with the Moller-Trumbore mask kernel: same t to fp tolerance,
    same face wherever the winning t is not a near-tie."""
    from raypt.accel.clusters import build_woop_cm, tile_union_counts
    from raypt.kernels.cluster_pallas import (
        TILE, pallas_cluster_intersect_mask,
        pallas_cluster_intersect_mask_woop)
    scene = _scene(rng, ntri=300, nsph=0)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    clusters, table = build_onehot(bvh, scene.mesh.positions,
                                   scene.mesh.faces, scene.mesh.face_valid,
                                   leaf=16)
    ro, rd = _rays(rng, 8 * TILE)
    t0 = jnp.full((8 * TILE,), BIG)
    num_words = -(-clusters.num_clusters // 32)
    mask = walk_topwalk_jnp(table, ro, rd, t0,
                            jnp.ones((8 * TILE,), bool), num_words)
    union, _ = tile_union_counts(mask, TILE, clusters.num_clusters)
    rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
    woop_cm, fid_flat = build_woop_cm(clusters)
    t_a, f_a = pallas_cluster_intersect_mask(union, rows_cm, ro, rd, t0,
                                             interpret=True)
    t_w, p_w = pallas_cluster_intersect_mask_woop(union, woop_cm, ro, rd,
                                                  t0, interpret=True)
    f_w = np.where(np.asarray(p_w) >= 0,
                   np.asarray(fid_flat)[np.clip(np.asarray(p_w), 0, None)],
                   -1)
    t_a = np.asarray(t_a)
    t_w = np.asarray(t_w)
    hit_a = np.asarray(f_a) >= 0
    assert np.array_equal(hit_a, f_w >= 0)
    assert np.allclose(t_a[hit_a], t_w[hit_a], rtol=1e-3, atol=1e-4), \
        float(np.abs(t_a[hit_a] - t_w[hit_a]).max())
    same = np.asarray(f_a) == f_w
    # differing faces are allowed only on near-tie t
    assert (same | np.isclose(t_a, t_w, rtol=1e-3, atol=1e-4)).all()


@pytest.mark.experimental
def test_onehot_finder_woop_accel_matches_bruteforce(rng):
    """find_closest_onehot with the 4-tuple (woop-table) accel routes
    phase B through the MXU kernel and still matches brute force."""
    scene = _scene(rng, ntri=300, nsph=3)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid, leaf=16, with_woop=True)
    assert len(accel) == 4
    ro, rd = _rays(rng, 1000)
    a = find_closest_bruteforce(scene, ro, rd)
    c = find_closest_onehot(scene, accel, ro, rd)
    assert np.allclose(np.asarray(a.t), np.asarray(c.t),
                       rtol=1e-3, atol=1e-4)
    assert np.array_equal(np.asarray(a.sphere), np.asarray(c.sphere))
    same = np.asarray(a.tri) == np.asarray(c.tri)
    assert (same | np.isclose(np.asarray(a.t), np.asarray(c.t),
                              rtol=1e-4)).all()


def test_topwalk_union_matches_mask_reduce(rng):
    """pallas_topwalk_union (fused in-kernel OR-reduction, r4) must
    equal tile_union_counts(pallas_topwalk(...)) exactly, including
    with dead rays and at both supported union tiles."""
    from raypt.accel.clusters import tile_union_counts
    from raypt.kernels.onehot_walk import (pallas_topwalk,
                                           pallas_topwalk_union)
    scene = _scene(rng, ntri=300, nsph=0)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    clusters, table = build_onehot(bvh, scene.mesh.positions,
                                   scene.mesh.faces, scene.mesh.face_valid,
                                   leaf=16)
    nw = -(-clusters.num_clusters // 32)
    ro, rd = _rays(rng, 2048)
    t0 = jnp.full((2048,), BIG)
    act = jnp.asarray(rng.random(2048) < 0.6)
    mask = pallas_topwalk(table, ro, rd, t0, act, nw, interpret=True)
    for ut in (256, 128):
        u_ref, _ = tile_union_counts(mask, ut, clusters.num_clusters)
        u_fused = pallas_topwalk_union(table, ro, rd, t0, act, nw,
                                       interpret=True, union_tile=ut)
        assert np.array_equal(np.asarray(u_ref), np.asarray(u_fused)), ut
