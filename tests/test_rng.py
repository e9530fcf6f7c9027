"""Distribution-level RNG parity (SURVEY §7: threefry replaces XORWOW;
parity is statistical, not bitwise)."""
import numpy as np
import jax
import jax.numpy as jnp

from raypt.rng import (bounce_uniforms, frame_key, random_point_on_sphere,
                       sample_jitter, sample_key)


import pytest

pytestmark = pytest.mark.smoke

def test_sphere_points_are_unit_and_uniform():
    key = jax.random.key(7)
    u = jax.random.uniform(key, (20000, 2))
    p = np.asarray(random_point_on_sphere(u[:, 0], u[:, 1]))
    r = np.linalg.norm(p, axis=-1)
    assert np.allclose(r, 1.0, atol=1e-5)
    # uniform on the sphere: mean ~ 0, E[z^2] = 1/3 per component
    assert np.all(np.abs(p.mean(axis=0)) < 0.02)
    assert np.allclose((p ** 2).mean(axis=0), 1 / 3, atol=0.01)


def _ids(h, w):
    return jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)


def test_jitter_and_bounce_draw_ranges():
    k = sample_key(frame_key(jax.random.key(0), 3), 1)
    j = np.asarray(sample_jitter(k, _ids(16, 16)))
    assert j.shape == (16, 16, 2)
    assert (j >= 0).all() and (j < 1).all()
    u = np.asarray(bounce_uniforms(k, 2, _ids(16, 16)))
    assert u.shape == (16, 16, 4)
    assert (u >= 0).all() and (u < 1).all()


def test_streams_decorrelated():
    k = frame_key(jax.random.key(0), 0)
    a = np.asarray(bounce_uniforms(sample_key(k, 0), 0, _ids(64, 64)))
    b = np.asarray(bounce_uniforms(sample_key(k, 0), 1, _ids(64, 64)))
    c = np.asarray(bounce_uniforms(sample_key(k, 1), 0, _ids(64, 64)))
    assert abs(np.corrcoef(a.ravel(), b.ravel())[0, 1]) < 0.03
    assert abs(np.corrcoef(a.ravel(), c.ravel())[0, 1]) < 0.03


def test_pixel_id_streams_are_layout_invariant():
    """The same pixel id draws the same numbers regardless of the shape
    or slicing of the id array — the property that makes sharded
    rendering bitwise-equal to single-device rendering."""
    k = sample_key(frame_key(jax.random.key(0), 0), 0)
    full = np.asarray(bounce_uniforms(k, 1, _ids(8, 8)))
    rows = np.asarray(bounce_uniforms(k, 1, _ids(8, 8)[3:5]))
    assert np.array_equal(full[3:5], rows)
    flat = np.asarray(bounce_uniforms(k, 1, _ids(8, 8).reshape(-1)))
    assert np.array_equal(full.reshape(-1, 4), flat)


def test_frames_reproducible():
    k1 = np.asarray(jax.random.key_data(frame_key(jax.random.key(5), 9)))
    k2 = np.asarray(jax.random.key_data(frame_key(jax.random.key(5), 9)))
    assert np.array_equal(k1, k2)
