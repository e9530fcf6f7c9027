"""Dielectric refraction lobe (round-3 VERDICT item 10: the reference
carries Materials.ior but never reads it — GPUScene.h:73 / SURVEY §7
"bugs not to reproduce"; raypt wires it as a capability upgrade behind
cfg.enable_refraction)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raypt.core.math3d import refract, schlick_fresnel
from raypt.core.scene import MaterialDef, SceneBuilder
from raypt.core.types import EnvMap, RenderConfig
from raypt.render import render_frame

@pytest.mark.smoke
def test_refract_snell():
    """refract() obeys Snell's law for a unit incident/normal pair."""
    n = jnp.asarray([0.0, 1.0, 0.0])
    for theta_deg in (10.0, 30.0, 55.0):
        th = np.deg2rad(theta_deg)
        d = jnp.asarray([np.sin(th), -np.cos(th), 0.0])
        eta = 1.0 / 1.5
        out = refract(d, n, eta)
        assert abs(float(jnp.linalg.norm(out)) - 1.0) < 1e-5
        sin_t = float(jnp.abs(out[0]))
        assert abs(sin_t - eta * np.sin(th)) < 1e-5


@pytest.mark.smoke
def test_refract_tir_returns_zero():
    n = jnp.asarray([0.0, 1.0, 0.0])
    th = np.deg2rad(60.0)     # > critical angle for eta = 1.5
    d = jnp.asarray([np.sin(th), -np.cos(th), 0.0])
    out = refract(d, n, 1.5)  # exiting glass into air
    assert float(jnp.linalg.norm(out)) == 0.0


@pytest.mark.smoke
def test_schlick_limits():
    # normal incidence: r0 = ((1-1.5)/(2.5))^2 = 0.04
    assert abs(float(schlick_fresnel(jnp.float32(1.0), 1.0, 1.5)) - 0.04) \
        < 1e-6
    # grazing: reflectance -> 1
    assert float(schlick_fresnel(jnp.float32(0.0), 1.0, 1.5)) > 0.99


def _glass_sphere_scene():
    # direction-dependent sky so bending is observable
    gy = np.linspace(0.0, 1.0, 16)[:, None, None]
    gx = np.linspace(0.0, 1.0, 32)[None, :, None]
    sky = np.broadcast_to(gy * np.ones_like(gx), (16, 32, 3)).astype(
        np.float32) + 0.1 * np.broadcast_to(gx, (16, 32, 3))
    b = SceneBuilder(env=EnvMap(data=jnp.asarray(sky), is_cube=False))
    glass = b.add_material(MaterialDef(albedo=(1.0, 1.0, 1.0),
                                       refraction_percent=1.0, ior=1.5))
    b.add_sphere((0.0, 0.0, -3.0), 1.2, glass)
    b.camera.viewport_width = b.camera.viewport_height = 32
    return b.freeze()


def test_glass_sphere_renders_and_differs():
    scene = _glass_sphere_scene()
    key = jax.random.key(3)
    cfg_off = RenderConfig(width=32, height=32, samples_per_pixel=2,
                           num_bounces=4, backend="bruteforce",
                           russian_roulette=False)
    cfg_on = cfg_off.replace(enable_refraction=True)
    img_off = np.asarray(render_frame(scene, cfg_off, key))
    img_on = np.asarray(render_frame(scene, cfg_on, key))
    assert np.isfinite(img_on).all()
    # with the lobe off the sphere acts diffuse; on, it transmits the
    # sky through — the sphere region must change substantially
    assert np.abs(img_on - img_off).max() > 0.05
    # transmitted radiance is bounded by the sky (albedo=1 tint only)
    assert img_on.max() <= float(np.asarray(scene.env.data).max()) + 1e-4


def test_refraction_flag_is_bitwise_noop_without_glass():
    """enable_refraction=True with zero refraction_percent everywhere
    must not change a single pixel (the static gate only adds all-false
    selects) nor the RNG stream (separately-folded key)."""
    b = SceneBuilder()
    m = b.add_material(MaterialDef(albedo=(0.7, 0.4, 0.2)))
    b.add_sphere((0.0, 0.0, -3.0), 1.0, m)
    b.camera.viewport_width = b.camera.viewport_height = 16
    scene = b.freeze()
    key = jax.random.key(0)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1,
                       num_bounces=3, backend="bruteforce")
    a = np.asarray(render_frame(scene, cfg, key))
    c = np.asarray(render_frame(scene, cfg.replace(enable_refraction=True),
                                key))
    assert np.array_equal(a, c)


def test_glass_gradients_flow():
    """d(image)/d(ior) is finite and nonzero through the refraction
    path (bending direction depends smoothly on ior)."""
    scene = _glass_sphere_scene()
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1,
                       num_bounces=3, backend="bruteforce",
                       russian_roulette=False, enable_refraction=True)
    key = jax.random.key(1)

    def loss(ior):
        s = scene.replace(materials=scene.materials.replace(
            ior=jnp.full_like(scene.materials.ior, ior)))
        img = render_frame(s, cfg, key)
        return jnp.mean(img * jnp.linspace(0, 1, 16)[:, None, None])

    g = jax.grad(loss)(jnp.float32(1.5))
    assert np.isfinite(float(g)) and abs(float(g)) > 0.0
