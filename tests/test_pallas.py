"""Pallas dense kernel parity vs the brute-force oracle (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU — see
scripts/tpu_pallas_dense.py timings)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.core.scene import MaterialDef, SceneBuilder
from raypt.core.types import EnvMap, RenderConfig
from raypt.accel import find_closest_bruteforce
from raypt.kernels.intersect import make_pallas_finder
from raypt.kernels.dense_pallas import pick_tri_chunk
from raypt.core.math3d import normalize


def _scene(rng, ntri=100, nsph=3):
    b = SceneBuilder()
    m0 = b.add_material(MaterialDef(albedo=(0.5, 0.5, 0.5)))
    for _ in range(ntri):
        base = rng.uniform(-5, 5, 3)
        b.add_triangle(base, base + rng.uniform(-1, 1, 3),
                       base + rng.uniform(-1, 1, 3), m0)
    for _ in range(nsph):
        b.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.3, 1.0), m0)
    return b.freeze()


def test_pallas_matches_bruteforce(rng):
    scene = _scene(rng)
    finder = make_pallas_finder(scene, RenderConfig(backend="pallas"))
    ro = jnp.asarray(rng.uniform(-6, 6, (512, 3)).astype(np.float32))
    rd = normalize(jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32)))
    a = find_closest_bruteforce(scene, ro, rd)
    c = finder(scene, ro, rd)
    assert np.allclose(np.asarray(a.t), np.asarray(c.t), rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.asarray(a.sphere), np.asarray(c.sphere))
    same = np.asarray(a.tri) == np.asarray(c.tri)
    assert (same | np.isclose(np.asarray(a.t), np.asarray(c.t),
                              rtol=1e-6)).all()


def test_pallas_backend_image_matches(rng):
    scene = _scene(rng, ntri=40)
    cfg_p = RenderConfig(width=16, height=16, samples_per_pixel=1,
                         num_bounces=2, backend="pallas",
                         russian_roulette=False)
    cfg_b = cfg_p.replace(backend="bruteforce")
    from raypt.render import render_frame
    ia = render_frame(scene, cfg_p, jax.random.key(0))
    ib = render_frame(scene, cfg_b, jax.random.key(0))
    assert np.allclose(np.asarray(ia), np.asarray(ib), rtol=1e-3, atol=1e-3)


def test_pick_tri_chunk():
    assert pick_tri_chunk(16) == 256
    assert pick_tri_chunk(256) == 256
    assert pick_tri_chunk(257) == 512
    assert pick_tri_chunk(100000) == 2048
