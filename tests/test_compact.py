"""In-kernel alive-compaction (kernels/compact.py, round 5): the
stable alive-first permutation and its inverse must be BITWISE exact
(split3-bf16 transport through the one-hot selection matmuls), and the
compacted expand path must return identical hits to the uncompacted
one."""
import numpy as np
import jax.numpy as jnp
import pytest

from raypt.accel import find_closest_onehot
from raypt.accel.ctree import build_onehot
from raypt.accel import build
from raypt.core.math3d import normalize
from raypt.kernels.compact import (pallas_alive_compact,
                                   pallas_alive_uncompact)

from test_expand import _rays, _scene  # noqa: F401 (shared builders)


def _np_order(alive, group):
    """Oracle: stable alive-first permutation within each group."""
    r = alive.shape[0]
    return np.concatenate([
        g * group + np.argsort(~alive[g * group:(g + 1) * group],
                               kind="stable")
        for g in range(r // group)])


@pytest.mark.smoke
def test_compact_bitwise_permutation(rng):
    """Contract: within each group, the first na destination lanes
    hold the alive lanes' data BITWISE (stable order); trailing lanes
    are dead (act=0 — their payload is unspecified: the routed path
    zeroes them, the identity path passes originals through)."""
    r, g = 1024, 256
    ro = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32) * 1e3)
    rd = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    t0 = jnp.asarray((rng.random(r) * 1e8).astype(np.float32))
    alive = jnp.asarray(rng.random(r) < 0.3)
    o_p, d_p, t_p, a_p = pallas_alive_compact(ro, rd, t0, alive,
                                              group=g, interpret=True)
    order = _np_order(np.asarray(alive), g)
    live = np.asarray(alive)[order]          # alive-first per group
    assert np.array_equal(np.asarray(a_p), live)
    assert np.array_equal(np.asarray(o_p)[live], np.asarray(ro)[order][live])
    assert np.array_equal(np.asarray(d_p)[live], np.asarray(rd)[order][live])
    assert np.array_equal(np.asarray(t_p)[live], np.asarray(t0)[order][live])


@pytest.mark.smoke
def test_uncompact_inverts(rng):
    """Alive source lanes' results return to their original lanes
    bitwise; dead lanes decode to (0, -1) on the routed path (callers
    mask by the original alive either way)."""
    r, g = 2048, 512
    alive = jnp.asarray(rng.random(r) < 0.1)
    t_res = jnp.asarray((rng.random(r) * 100).astype(np.float32))
    f_res = jnp.asarray(
        rng.integers(-1, (1 << 24) - 1, size=r).astype(np.int32))
    t_u, f_u = pallas_alive_uncompact(t_res, f_res, alive, group=g,
                                      interpret=True)
    order = _np_order(np.asarray(alive), g)
    inv = np.zeros(r, np.int64)
    inv[order] = np.arange(r)
    live = np.asarray(alive)
    assert np.array_equal(np.asarray(t_u)[live], np.asarray(t_res)[inv][live])
    assert np.array_equal(np.asarray(f_u)[live], np.asarray(f_res)[inv][live])


def test_compact_all_dead_and_all_alive(rng):
    r, g = 512, 256
    ro = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    t0 = jnp.asarray(rng.random(r).astype(np.float32))
    for frac in (0.0, 1.0):
        alive = jnp.asarray(np.full(r, frac > 0.5))
        o_p, d_p, t_p, a_p = pallas_alive_compact(
            ro, rd, t0, alive, group=g, interpret=True)
        assert np.array_equal(np.asarray(o_p), np.asarray(ro))
        assert np.array_equal(np.asarray(a_p), np.asarray(alive))


def test_expand_with_compaction_matches_uncompacted(rng):
    """find_closest_onehot(expand_n, compact_n) == plain expand path,
    on a sparse active mask (the deep-bounce shape compaction is
    for)."""
    scene = _scene(rng, ntri=400)
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    accel = build_onehot(bvh, scene.mesh.positions, scene.mesh.faces,
                         scene.mesh.face_valid, leaf=16)
    ro, rd = _rays(rng, 4096)
    active = jnp.asarray(rng.random(4096) < 0.2)
    base = find_closest_onehot(scene, accel, ro, rd, active=active,
                               expand_n=512, walk_tile=512)
    comp = find_closest_onehot(scene, accel, ro, rd, active=active,
                               expand_n=512, walk_tile=512,
                               compact_n=1024)
    assert np.array_equal(np.asarray(base.t), np.asarray(comp.t))
    assert np.array_equal(np.asarray(base.tri), np.asarray(comp.tri))
    assert np.array_equal(np.asarray(base.sphere),
                          np.asarray(comp.sphere))
