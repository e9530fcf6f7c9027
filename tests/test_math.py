"""Unit tests for raypt.core.math3d (the glm/Math.h replacement)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raypt.core import math3d as m


pytestmark = pytest.mark.smoke

def test_normalize_unit_and_zero():
    v = jnp.array([[3.0, 0, 0], [0, 0, 0], [1, 2, 2]])
    n = np.asarray(m.normalize(v))
    assert np.allclose(n[0], [1, 0, 0])
    assert np.all(np.isfinite(n[1]))
    assert np.isclose(np.linalg.norm(n[2]), 1.0, atol=1e-5)


def test_reflect_mirror():
    d = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    r = np.asarray(m.reflect(d, n))
    assert np.allclose(r, [1.0, 1.0, 0.0])


def test_intersect_sphere_basic():
    ro = jnp.array([0.0, 0.0, 5.0])
    rd = jnp.array([0.0, 0.0, -1.0])
    hit, t = m.intersect_sphere(ro, rd, jnp.zeros(3), 1.0)
    assert bool(hit) and np.isclose(float(t), 4.0, atol=1e-5)
    # miss
    hit, t = m.intersect_sphere(ro, jnp.array([0.0, 1.0, 0.0]), jnp.zeros(3), 1.0)
    assert not bool(hit) and float(t) >= 1e29
    # sphere entirely behind the origin -> reject (far root also < 0)
    hit, _ = m.intersect_sphere(jnp.array([0.0, 0.0, -5.0]), rd, jnp.zeros(3), 1.0)
    assert not bool(hit)


def test_intersect_sphere_inside():
    """glm::intersectRaySphere returns the FAR root for rays starting
    inside/on the sphere (glm/gtx/intersect.inl:135-154: distance =
    t0 > t1 + eps ? t0 - t1 : t0 + t1), so interiors ARE hit — a camera
    inside a sphere sees its inner surface."""
    # center start: exits at the far side, t = radius
    hit, t = m.intersect_sphere(jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]),
                                jnp.zeros(3), 1.0)
    assert bool(hit) and np.isclose(float(t), 1.0, atol=1e-5)
    # off-center inside start
    hit, t = m.intersect_sphere(jnp.array([0.0, 0.0, 0.5]),
                                jnp.array([0.0, 0.0, 1.0]),
                                jnp.zeros(3), 1.0)
    assert bool(hit) and np.isclose(float(t), 0.5, atol=1e-5)
    # inside start moving away from center still hits the shell behind
    hit, t = m.intersect_sphere(jnp.array([0.0, 0.0, 0.5]),
                                jnp.array([0.0, 0.0, -1.0]),
                                jnp.zeros(3), 1.0)
    assert bool(hit) and np.isclose(float(t), 1.5, atol=1e-5)


def test_intersect_triangle_hit_and_bary():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    ro = jnp.array([0.2, 0.3, 1.0])
    rd = jnp.array([0.0, 0.0, -1.0])
    hit, t, u, v = m.intersect_triangle(ro, rd, v0, v1, v2)
    assert bool(hit)
    assert np.isclose(float(t), 1.0, atol=1e-6)
    assert np.isclose(float(u), 0.2, atol=1e-6)  # weight of v1
    assert np.isclose(float(v), 0.3, atol=1e-6)  # weight of v2


def test_intersect_triangle_backface_accepted():
    """glm::intersectRayTriangle accepts backface hits (the reference
    relies on this + normal flip, main_raytracing.cu:60,68-69)."""
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    ro = jnp.array([0.2, 0.3, -1.0])
    rd = jnp.array([0.0, 0.0, 1.0])
    hit, t, _, _ = m.intersect_triangle(ro, rd, v0, v1, v2)
    assert bool(hit) and np.isclose(float(t), 1.0, atol=1e-6)


def test_intersect_triangle_edge_cases():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    rd = jnp.array([0.0, 0.0, -1.0])
    # outside
    hit, *_ = m.intersect_triangle(jnp.array([0.9, 0.9, 1.0]), rd, v0, v1, v2)
    assert not bool(hit)
    # parallel ray (det ~ 0)
    hit, *_ = m.intersect_triangle(jnp.array([0.0, 0.0, 1.0]),
                                   jnp.array([1.0, 0.0, 0.0]), v0, v1, v2)
    assert not bool(hit)
    # degenerate triangle
    hit, *_ = m.intersect_triangle(jnp.array([0.0, 0.0, 1.0]), rd, v0, v0, v0)
    assert not bool(hit)


def test_intersect_aabb():
    ro = jnp.array([0.0, 0.0, 5.0])
    inv = 1.0 / jnp.array([1e-12, 1e-12, -1.0])
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    assert bool(m.intersect_aabb(ro, inv, bmin, bmax, m.BIG))
    # behind current best distance -> culled (reference Math.h:60 parity)
    assert not bool(m.intersect_aabb(ro, inv, bmin, bmax, 1.0))
    # ray starting inside
    assert bool(m.intersect_aabb(jnp.zeros(3), inv, bmin, bmax, m.BIG))


def test_euler_matrix_orthonormal():
    r = np.asarray(m.euler_to_mat(0.3, -1.2, 0.0))
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(r), 1.0, atol=1e-6)


def test_aces_constants():
    # x=0 -> 0, large x -> 1, monotone
    xs = jnp.linspace(0.0, 20.0, 100)
    ys = np.asarray(m.aces_film(xs))
    assert ys[0] == 0.0
    assert ys[-1] > 0.99
    assert np.all(np.diff(ys) >= -1e-6)
    # spot value: ACES(1.0) = (1*(2.51+0.03))/(1*(2.43+0.59)+0.14)
    assert np.isclose(float(m.aces_film(jnp.float32(1.0))),
                      2.54 / 3.16, atol=1e-5)
