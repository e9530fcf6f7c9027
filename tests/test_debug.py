"""Debug-mode checkify render (SURVEY §5.2 — NaN/Inf/OOB checks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax._src.checkify import JaxRuntimeError

from raypt.app.debug import checked_render_frame
from raypt.core.scene import MaterialDef, SceneBuilder
from raypt.core.types import EnvMap, RenderConfig


def _tiny_scene():
    b = SceneBuilder(env=EnvMap.constant((0.4, 0.5, 0.6)))
    m0 = b.add_material(MaterialDef(albedo=(0.7, 0.6, 0.5)))
    b.add_quad((-2, -1, -6), (2, -1, -6), (2, -1, -2), (-2, -1, -2), m0)
    b.add_sphere((0, 0, -4), 0.8, m0)
    b.camera.viewport_width = b.camera.viewport_height = 16
    return b.freeze()


def test_checked_render_clean_scene_passes():
    scene = _tiny_scene()
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1,
                       num_bounces=3, backend="bruteforce")
    err, img = checked_render_frame(scene, cfg, jax.random.key(0),
                                    throw=False)
    assert err.get() is None
    assert np.isfinite(np.asarray(img)).all()


def test_checked_render_catches_nan_albedo():
    scene = _tiny_scene()
    bad = scene.replace(materials=scene.materials.replace(
        albedo=scene.materials.albedo.at[0, 0].set(jnp.nan)))
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1,
                       num_bounces=3, backend="bruteforce")
    err, _ = checked_render_frame(bad, cfg, jax.random.key(0), throw=False)
    msg = err.get()
    assert msg is not None and "nan" in msg.lower()
    with pytest.raises(JaxRuntimeError):
        checked_render_frame(bad, cfg, jax.random.key(0), throw=True)


def test_checked_render_catches_nan_vertex_bvh():
    """A poisoned vertex flows through the packed BVH walk; checkify
    must still surface it (errors thread through the while-loop)."""
    b = SceneBuilder(env=EnvMap.constant((0.3, 0.3, 0.3)))
    m0 = b.add_material(MaterialDef(albedo=(0.6, 0.6, 0.6)))
    rngv = np.random.default_rng(0)
    for _ in range(80):
        base = rngv.uniform(-2, 2, 3) - [0, 0, 5]
        b.add_triangle(base, base + rngv.uniform(-1, 1, 3),
                       base + rngv.uniform(-1, 1, 3), m0)
    b.camera.viewport_width = b.camera.viewport_height = 8
    scene = b.freeze()
    bad = scene.replace(mesh=scene.mesh.replace(
        positions=scene.mesh.positions.at[0, 0].set(jnp.nan)))
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1,
                       num_bounces=2, backend="bvh")
    err, _ = checked_render_frame(bad, cfg, jax.random.key(0), throw=False)
    assert err.get() is not None
