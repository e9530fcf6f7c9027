"""Integrator semantics: analytic cases, backend equivalence, and
progressive-accumulation parity with the reference megakernel."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.accel import build
from raypt.core.scene import MaterialDef, SceneBuilder
from raypt.core.types import EnvMap, RenderConfig
from raypt.render import (accumulate, make_finder, render_aovs, render_frame,
                          sample_env)


pytestmark = pytest.mark.smoke

def _cfg(**kw):
    base = dict(width=32, height=32, samples_per_pixel=1, num_bounces=2,
                backend="bruteforce", russian_roulette=False)
    base.update(kw)
    return RenderConfig(**base)


def test_env_only():
    """No geometry: every pixel = clamped env radiance
    (main_raytracing.cu:151-155 parity incl. the 50.0 clamp)."""
    b = SceneBuilder(env=EnvMap.constant((0.25, 100.0, 0.5)))
    b.add_material(MaterialDef())
    scene = b.freeze()
    img = np.asarray(render_frame(scene, _cfg(), jax.random.key(0)))
    assert np.allclose(img, [0.25, 50.0, 0.5], atol=1e-5)


def test_emissive_direct_hit():
    """Camera facing an emissive wall: radiance == emissive exactly
    (throughput is 1 on the first bounce)."""
    b = SceneBuilder(env=EnvMap.constant((0, 0, 0)))
    m = b.add_material(MaterialDef(albedo=(0, 0, 0), emissive=(2.0, 3.0, 4.0)))
    b.add_quad((-50, -50, -5), (50, -50, -5), (50, 50, -5), (-50, 50, -5), m)
    scene = b.freeze()
    img = np.asarray(render_frame(scene, _cfg(), jax.random.key(0)))
    assert np.allclose(img, [2.0, 3.0, 4.0], atol=1e-5)


def test_black_absorber_blocks_env():
    """A black wall (albedo 0) in front of a bright env: throughput dies
    after one bounce -> image ~ 0."""
    b = SceneBuilder(env=EnvMap.constant((10.0, 10.0, 10.0)))
    m = b.add_material(MaterialDef(albedo=(0, 0, 0)))
    b.add_quad((-50, -50, -5), (50, -50, -5), (50, 50, -5), (-50, 50, -5), m)
    scene = b.freeze()
    img = np.asarray(render_frame(scene, _cfg(num_bounces=4), jax.random.key(0)))
    assert img.max() < 1e-5


def test_mirror_sees_env():
    """Perfect mirror (specular_percent=1, roughness=0, specular=1)
    facing a constant env: one bounce then env -> exactly env color."""
    b = SceneBuilder(env=EnvMap.constant((0.2, 0.4, 0.6)))
    m = b.add_material(MaterialDef(albedo=(0, 0, 0), specular=(1, 1, 1),
                                   specular_percent=1.0, roughness=0.0))
    b.add_quad((-50, -50, -5), (50, -50, -5), (50, 50, -5), (-50, 50, -5), m)
    scene = b.freeze()
    img = np.asarray(render_frame(scene, _cfg(num_bounces=3), jax.random.key(0)))
    assert np.allclose(img, [0.2, 0.4, 0.6], atol=1e-4)


def _random_mixed_scene(rng):
    b = SceneBuilder(env=EnvMap.constant((0.3, 0.5, 0.8)))
    lam = b.add_material(MaterialDef(albedo=(0.6, 0.5, 0.4)))
    glow = b.add_material(MaterialDef(albedo=(0, 0, 0), emissive=(4, 3, 2)))
    for _ in range(40):
        base = rng.uniform(-4, 4, 3) - [0, 0, 6]
        b.add_triangle(base, base + rng.uniform(-1.5, 1.5, 3),
                       base + rng.uniform(-1.5, 1.5, 3), lam)
    b.add_sphere((0, 2, -5), 1.0, glow)
    b.add_sphere((-2, -1, -4), 0.8, lam)
    return b.freeze()


def test_bvh_backend_matches_bruteforce_image(rng):
    """Same RNG streams + same hit decisions => identical images across
    backends (the backend only changes *how* the closest hit is found)."""
    scene = _random_mixed_scene(rng)
    key = jax.random.key(3)
    cfg_b = _cfg(num_bounces=3, samples_per_pixel=2, russian_roulette=True)
    img_brute = np.asarray(render_frame(scene, cfg_b, key))
    bvh = build(scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
    img_bvh = np.asarray(render_frame(scene, cfg_b.replace(backend="bvh"),
                                      key, bvh=bvh))
    assert np.allclose(img_brute, img_bvh, rtol=1e-4, atol=1e-4)


def test_russian_roulette_unbiased(rng):
    """RR keeps the estimator unbiased: mean image with and without
    roulette agree at high spp (main_raytracing.cu:140-147 1/p boost)."""
    scene = _random_mixed_scene(rng)
    cfg_no = _cfg(width=16, height=16, num_bounces=3, samples_per_pixel=64)
    cfg_rr = cfg_no.replace(russian_roulette=True)
    a = np.asarray(render_frame(scene, cfg_no, jax.random.key(1)))
    b = np.asarray(render_frame(scene, cfg_rr, jax.random.key(2)))
    # Monte-Carlo agreement on the mean (loose, but catches 1/p mistakes)
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.1


def test_accumulate_is_running_mean():
    imgs = [jnp.full((4, 4, 3), float(i)) for i in range(5)]
    acc = jnp.zeros((4, 4, 3))
    for i, im in enumerate(imgs):
        acc = accumulate(acc, im, i)
    assert np.allclose(np.asarray(acc), np.mean(np.arange(5.0)), atol=1e-6)


def test_aovs(rng):
    scene = _random_mixed_scene(rng)
    aov = render_aovs(scene, _cfg())
    assert aov["depth"].shape == (32, 32)
    assert aov["normal"].shape == (32, 32, 3)
    hits = np.asarray(aov["hit"])
    assert hits.any()
    d = np.asarray(aov["depth"])
    assert (d[hits] > 0).all()
    n = np.asarray(aov["normal"])[hits]
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_deterministic_given_key(rng):
    scene = _random_mixed_scene(rng)
    cfg = _cfg(samples_per_pixel=2, russian_roulette=True)
    a = np.asarray(render_frame(scene, cfg, jax.random.key(9)))
    b = np.asarray(render_frame(scene, cfg, jax.random.key(9)))
    assert np.array_equal(a, b)
