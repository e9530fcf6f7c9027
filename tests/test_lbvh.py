"""LBVH structural invariants (SURVEY §4: every primitive in exactly
one leaf; parent AABB contains child AABBs — the parallel analogue of
the reference's triangle-count audit, BVH.cpp:37-42)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.accel import build, refit


def _random_soup(rng, ntri, cap):
    v = ntri * 3
    pos = jnp.asarray(rng.uniform(-10, 10, (v, 3)).astype(np.float32))
    faces = jnp.asarray(np.arange(cap * 3).reshape(cap, 3) % v, jnp.int32)
    valid = jnp.asarray(np.arange(cap) < ntri)
    return pos, faces, valid


def _check_invariants(bvh, cap):
    n = bvh.num_leaves
    left = np.asarray(bvh.left)
    skip = np.asarray(bvh.skip)
    bmin = np.asarray(bvh.bmin)
    bmax = np.asarray(bvh.bmax)
    lf = np.asarray(bvh.leaf_face)

    # skip-link walk visits every leaf exactly once
    node, steps, visits = 0, 0, []
    while node >= 0 and steps <= 10 * n:
        steps += 1
        if node >= n - 1:
            visits.append(node - (n - 1))
            node = skip[node]
        else:
            node = left[node]
    assert sorted(visits) == list(range(n)), "skip walk must cover all leaves"

    # leaf_face is a permutation of all faces
    assert sorted(lf.tolist()) == list(range(cap))

    # parent boxes contain non-empty children
    for i in range(n - 1):
        l = left[i]
        r = skip[l]  # skip of a left child is its right sibling
        for ch in (l, r):
            if np.any(bmin[ch] <= bmax[ch]):
                assert np.all(bmin[i] <= bmin[ch] + 1e-5)
                assert np.all(bmax[i] >= bmax[ch] - 1e-5)


@pytest.mark.parametrize("ntri,cap", [(2, 2), (5, 8), (100, 128), (1000, 1024)])
def test_invariants(rng, ntri, cap):
    pos, faces, valid = _random_soup(rng, ntri, cap)
    bvh = jax.jit(build)(pos, faces, valid)
    _check_invariants(bvh, cap)


def test_duplicate_centroids(rng):
    """All-equal morton codes must still build a valid (index-split)
    tree — the reference's fallback axes can fail here and leave fat
    leaves (BVH.cpp:74-107); LBVH handles it via index tiebreak."""
    pos = jnp.asarray(np.tile(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                       np.float32), (16, 1)))
    faces = jnp.asarray(np.arange(48).reshape(16, 3) % 48, jnp.int32)
    valid = jnp.ones((16,), bool)
    bvh = build(pos, faces, valid)
    _check_invariants(bvh, 16)


def test_all_invalid():
    pos = jnp.zeros((3, 3), jnp.float32)
    faces = jnp.zeros((8, 3), jnp.int32)
    valid = jnp.zeros((8,), bool)
    bvh = build(pos, faces, valid)
    # root box must be empty -> traversal exits immediately
    assert float(bvh.bmin[0, 0]) > float(bvh.bmax[0, 0])


def test_refit_tracks_moved_vertices(rng):
    pos, faces, valid = _random_soup(rng, 64, 64)
    bvh = build(pos, faces, valid)
    moved = pos + 5.0
    bvh2 = refit(bvh, moved, faces, valid)
    assert np.allclose(np.asarray(bvh2.bmin[0]),
                       np.asarray(bvh.bmin[0]) + 5.0, atol=1e-4)
    assert np.allclose(np.asarray(bvh2.bmax[0]),
                       np.asarray(bvh.bmax[0]) + 5.0, atol=1e-4)
    _check_invariants(bvh2, 64)


def test_build_is_jittable_and_stable(rng):
    pos, faces, valid = _random_soup(rng, 33, 64)
    b1 = build(pos, faces, valid)
    b2 = jax.jit(build)(pos, faces, valid)
    assert np.array_equal(np.asarray(b1.left), np.asarray(b2.left))
    assert np.array_equal(np.asarray(b1.skip), np.asarray(b2.skip))
    assert np.allclose(np.asarray(b1.bmin), np.asarray(b2.bmin))
