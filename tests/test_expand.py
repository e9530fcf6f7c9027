"""Per-ray-exact expansion phase B (kernels/cluster_expand.py, round 5):
bitwise parity with the dense mask kernel, exact bf16 transport, and
the multi-round path for clusters wanted by > 128 rays."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.accel import build, find_closest_bruteforce, find_closest_onehot
from raypt.accel.clusters import tile_union_counts
from raypt.accel.ctree import build_onehot, walk_topwalk_jnp
from raypt.core.math3d import BIG, normalize
from raypt.core.scene import MaterialDef, SceneBuilder


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _scene(rng, ntri=300, nsph=0):
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


@pytest.mark.smoke
def test_split3_bf16_exact(rng):
    """hi + md + lo must reproduce f32 bitwise across the documented
    domain |x| >= ~2^-102 (below that, residual chunks flush in the
    bf16 cast — see split3_bf16; ray data sits far inside)."""
    from raypt.kernels.cluster_expand import split3_bf16
    x = np.concatenate([
        (rng.normal(size=1000) * 10.0 ** rng.integers(
            -25, 30, 1000)).astype(np.float32),
        np.array([0.0, -0.0, 1e30, -1e30, 1e-25, np.pi], np.float32),
    ])
    x = x[(np.abs(x) >= 2.0 ** -100) | (x == 0)]
    hi, md, lo = split3_bf16(jnp.asarray(x))
    back = (hi.astype(jnp.float32) + md.astype(jnp.float32)
            + lo.astype(jnp.float32))
    assert np.array_equal(np.asarray(back), x), \
        np.abs(np.asarray(back) - x).max()


@pytest.mark.smoke
def test_expand_kernel_bitwise_matches_mask(rng):
    """pallas_cluster_expand must be BITWISE equal to
    pallas_cluster_intersect_mask (same masks, same merge order)."""
    from raypt.kernels.cluster_expand import pallas_cluster_expand
    from raypt.kernels.cluster_pallas import pallas_cluster_intersect_mask
    scene = _scene(rng, ntri=300)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    clusters, table = build_onehot(bvh, scene.mesh.positions,
                                   scene.mesh.faces,
                                   scene.mesh.face_valid, leaf=16)
    r = 2048
    ro, rd = _rays(rng, r)
    t0 = jnp.full((r,), BIG)
    c_total = clusters.num_clusters
    cw = -(-c_total // 32)
    cwp = -(-cw // 8) * 8
    mask = walk_topwalk_jnp(table, ro, rd, t0, jnp.ones((r,), bool), cw)
    union, _ = tile_union_counts(mask, 256, c_total)
    rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
    t_a, f_a = pallas_cluster_intersect_mask(union, rows_cm, ro, rd, t0,
                                             interpret=True)
    mask_cm = jnp.concatenate(
        [mask.T, jnp.zeros((cwp - cw, r), jnp.int32)], axis=0)
    t_b, f_b = pallas_cluster_expand(mask_cm, rows_cm, ro, rd, t0,
                                     interpret=True, n_rays=256)
    assert np.array_equal(np.asarray(t_a), np.asarray(t_b))
    assert np.array_equal(np.asarray(f_a), np.asarray(f_b))
    assert (np.asarray(f_b) >= 0).sum() > 50  # real hits exercised


def test_expand_multi_round_popular_cluster(rng):
    """A cluster wanted by > 128 rays of one program must loop extra
    128-lane rounds and still match (exercises rcond/rbody)."""
    from raypt.kernels.cluster_expand import pallas_cluster_expand
    from raypt.kernels.cluster_pallas import pallas_cluster_intersect_mask
    scene = _scene(rng, ntri=60)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    clusters, table = build_onehot(bvh, scene.mesh.positions,
                                   scene.mesh.faces,
                                   scene.mesh.face_valid, leaf=16)
    r = 2048
    # near-parallel rays from a small disc: every ray of the program
    # wants the same few clusters -> counts >> 128
    o0 = np.array([0.0, 0.0, -8.0])
    ro = jnp.asarray(o0 + rng.normal(size=(r, 3)) * 0.05, jnp.float32)
    rd = normalize(jnp.asarray(
        np.array([0.0, 0.0, 1.0]) + rng.normal(size=(r, 3)) * 0.02,
        jnp.float32))
    t0 = jnp.full((r,), BIG)
    c_total = clusters.num_clusters
    cw = -(-c_total // 32)
    cwp = -(-cw // 8) * 8
    mask = walk_topwalk_jnp(table, ro, rd, t0, jnp.ones((r,), bool), cw)
    counts = np.asarray(mask).astype(np.uint32)
    # confirm the fixture really creates a >128-interest cluster
    per_cluster = np.zeros(c_total, np.int64)
    for w in range(cw):
        for k in range(32):
            cid = w * 32 + k
            if cid < c_total:
                per_cluster[cid] = ((counts[:, w] >> k) & 1).sum()
    assert per_cluster.max() > 128, per_cluster.max()
    union, _ = tile_union_counts(mask, 256, c_total)
    rows_cm = jnp.transpose(clusters.tri_rows, (0, 2, 1))
    t_a, f_a = pallas_cluster_intersect_mask(union, rows_cm, ro, rd, t0,
                                             interpret=True)
    mask_cm = jnp.concatenate(
        [mask.T, jnp.zeros((cwp - cw, r), jnp.int32)], axis=0)
    # n_rays=2048: ONE program holding all rays -> per-cluster counts
    # up to 2048, many rounds
    t_b, f_b = pallas_cluster_expand(mask_cm, rows_cm, ro, rd, t0,
                                     interpret=True, n_rays=2048)
    assert np.array_equal(np.asarray(t_a), np.asarray(t_b))
    assert np.array_equal(np.asarray(f_a), np.asarray(f_b))


@pytest.mark.smoke
def test_expand_finder_matches_default(rng):
    """find_closest_onehot(expand_n=256) must equal the default path on
    a scene with spheres and dead rays (seeding, masking, tail)."""
    scene = _scene(rng, ntri=300, nsph=3)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid, leaf=16)
    ro, rd = _rays(rng, 1000)
    active = jnp.asarray(rng.uniform(size=1000) < 0.6)
    a = find_closest_onehot(scene, accel, ro, rd, active=active)
    b = find_closest_onehot(scene, accel, ro, rd, active=active,
                            expand_n=256)
    assert np.array_equal(np.asarray(a.t), np.asarray(b.t))
    assert np.array_equal(np.asarray(a.tri), np.asarray(b.tri))
    assert np.array_equal(np.asarray(a.sphere), np.asarray(b.sphere))
    c = find_closest_bruteforce(scene, ro, rd)
    hit = np.asarray(a.tri) >= 0
    assert np.allclose(np.asarray(a.t)[np.asarray(active)],
                       np.asarray(c.t)[np.asarray(active)],
                       rtol=1e-3, atol=1e-4)
    assert hit.sum() > 20
