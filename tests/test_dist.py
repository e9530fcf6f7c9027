"""Multi-device sharding on the 8-way virtual CPU mesh (SURVEY §4:
multi-host testing without a pod)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.core.scene import MaterialDef, SceneBuilder
from raypt.core.types import EnvMap, RenderConfig
from raypt.dist import default_mesh, loss_and_grad_sharded, render_frame_sharded
from raypt.render import render_frame


pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device mesh")


def _scene(rng):
    b = SceneBuilder(env=EnvMap.constant((0.4, 0.6, 0.9)))
    lam = b.add_material(MaterialDef(albedo=(0.6, 0.5, 0.4)))
    glow = b.add_material(MaterialDef(albedo=(0, 0, 0), emissive=(5, 4, 3)))
    for _ in range(30):
        base = rng.uniform(-4, 4, 3) - [0, 0, 6]
        b.add_triangle(base, base + rng.uniform(-1.5, 1.5, 3),
                       base + rng.uniform(-1.5, 1.5, 3), lam)
    b.add_sphere((0, 2, -5), 1.0, glow)
    return b.freeze()


def _cfg(**kw):
    base = dict(width=16, height=24, samples_per_pixel=1, num_bounces=2,
                backend="bruteforce", russian_roulette=True)
    base.update(kw)
    return RenderConfig(**base)


def test_sharded_matches_single_device(rng):
    """Pixel-id keyed RNG makes the row-sharded render bitwise equal to
    the single-device render."""
    scene = _scene(rng)
    cfg = _cfg()
    key = jax.random.key(5)
    ref = np.asarray(render_frame(scene, cfg, key))
    mesh = default_mesh(8)
    img = np.asarray(render_frame_sharded(scene, cfg, key, mesh))
    assert img.shape == ref.shape
    assert np.allclose(img, ref, atol=1e-6), float(np.abs(img - ref).max())


def test_sharded_odd_height(rng):
    """H not divisible by the mesh size exercises the padding path."""
    scene = _scene(rng)
    cfg = _cfg(height=19)
    key = jax.random.key(6)
    ref = np.asarray(render_frame(scene, cfg, key))
    img = np.asarray(render_frame_sharded(scene, cfg, key, default_mesh(8)))
    assert np.allclose(img, ref, atol=1e-6)


def test_sharded_loss_and_grad_matches(rng):
    """psum'd sharded grads == single-device grads of the same loss."""
    scene = _scene(rng)
    cfg = _cfg(width=8, height=16, russian_roulette=False)
    key = jax.random.key(7)
    target = render_frame(scene, cfg, key) * 0.8

    from raypt.render.integrator import (make_finder, render_sample)
    from raypt.rng import frame_key, sample_key

    def loss_fn(albedo, scene_in, cfg_in, key_in, pixel_ids, tgt, mask):
        s = scene_in.replace(materials=scene_in.materials.replace(albedo=albedo))
        finder = make_finder(s, cfg_in, None)
        img = render_sample(s, cfg_in, sample_key(frame_key(key_in, 0), 0),
                            finder, pixel_ids=pixel_ids)
        return jnp.sum(((img - tgt) ** 2) * mask[:, None, None])

    mesh = default_mesh(8)
    loss_sh, grad_sh = loss_and_grad_sharded(
        loss_fn, scene, scene.materials.albedo, cfg, mesh, key, target)

    # unsharded oracle
    from raypt.render.integrator import pixel_id_grid
    ids = pixel_id_grid(cfg)
    mask = jnp.ones((cfg.height,), jnp.float32)

    def full_loss(albedo):
        return loss_fn(albedo, scene, cfg, key, ids, target, mask)

    loss_ref, grad_ref = jax.value_and_grad(full_loss)(scene.materials.albedo)
    assert np.isclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    assert np.allclose(np.asarray(grad_sh), np.asarray(grad_ref),
                       rtol=1e-4, atol=1e-6)


def test_bvh_backend_sharded(rng):
    from raypt.accel import build
    scene = _scene(rng)
    cfg = _cfg(backend="bvh")
    bvh = build(scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
    key = jax.random.key(8)
    ref = np.asarray(render_frame(scene, cfg, key, bvh=bvh))
    img = np.asarray(render_frame_sharded(scene, cfg, key, default_mesh(8),
                                          bvh=bvh))
    assert np.allclose(img, ref, atol=1e-6)
