"""Differentiability: pixel gradients w.r.t. vertices, materials, and
camera validated against finite differences (BASELINE: "pixel-gradient
allclose vs CPU reference"; SURVEY §7 M4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.core.scene import MaterialDef, SceneBuilder
from raypt.core.types import EnvMap, RenderConfig
from raypt.diff import SceneParams, apply_params, fit, stack_views
from raypt.render import render_frame


def _scene():
    """Deterministic smooth setup: no specular choice (spec_pct=0), no
    roulette -> the integrand is smooth in vertices/materials/camera."""
    b = SceneBuilder(env=EnvMap.constant((0.3, 0.3, 0.3)))
    mat = b.add_material(MaterialDef(albedo=(0.6, 0.4, 0.2)))
    b.add_triangle((-1, -0.5, -3), (1, -0.5, -3), (0, 1.2, -3), mat)
    b.add_quad((-6, -1, 4), (6, -1, 4), (6, -1, -8), (-6, -1, -8),
               b.add_material(MaterialDef(albedo=(0.5, 0.5, 0.5))))
    return b


def _cfg(**kw):
    base = dict(width=16, height=16, samples_per_pixel=1, num_bounces=2,
                backend="bruteforce", russian_roulette=False)
    base.update(kw)
    return RenderConfig(**base)


def _loss_of(scene):
    cfg = _cfg()
    key = jax.random.key(0)

    def loss(s):
        img = render_frame(s, cfg, key)
        return jnp.mean(img * jnp.array([0.2126, 0.7152, 0.0722]))
    return loss


def test_grad_wrt_vertices_depth_fd():
    """Depth AOV is the clean smooth function of vertex positions
    (Moller-Trumbore t); validate the full gather->intersect->select
    chain against central differences."""
    from raypt.render import render_aovs
    scene = _scene().freeze()
    cfg = _cfg()

    def f(positions):
        s = scene.replace(mesh=scene.mesh.replace(positions=positions))
        aov = render_aovs(s, cfg)
        return jnp.mean(aov["depth"])

    g = np.asarray(jax.grad(f)(scene.mesh.positions))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    idx = np.argsort(np.abs(g).ravel())[-3:]
    eps = 1e-3
    p0 = np.asarray(scene.mesh.positions)
    for i in idx:
        d = np.zeros(p0.size)
        d[i] = eps
        d = d.reshape(p0.shape)
        fd = (float(f(jnp.asarray(p0 + d))) - float(f(jnp.asarray(p0 - d)))) / (2 * eps)
        an = g.ravel()[i]
        assert np.isclose(fd, an, rtol=0.05, atol=1e-5), (i, fd, an)


def test_grad_wrt_vertices_radiance():
    """Radiance gradients w.r.t. positions flow through barycentric
    normal interpolation: needs varying vertex normals + a non-constant
    env. Checks finiteness and a nonzero smooth component."""
    import jax.numpy as jnp2
    b = SceneBuilder(env=EnvMap.constant((0.3, 0.3, 0.3)))
    mat = b.add_material(MaterialDef(albedo=(0.8, 0.7, 0.6)))
    pos = np.array([[-1, -0.5, -3], [1, -0.5, -3], [0, 1.2, -3]], np.float32)
    nrm = np.array([[-0.5, 0, 1], [0.5, 0, 1], [0, 0.5, 1]], np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    b.add_mesh(pos, nrm, np.array([[0, 1, 2]]), material=mat)
    # gradient sky: equirect with vertical ramp
    ramp = np.linspace(2.0, 0.0, 16, dtype=np.float32)[:, None, None]
    env = EnvMap(data=jnp2.asarray(np.broadcast_to(
        ramp, (16, 32, 3)).copy()), is_cube=False)
    scene = b.freeze().replace(env=env)
    cfg = _cfg()
    key = jax.random.key(2)

    def f(positions):
        s = scene.replace(mesh=scene.mesh.replace(positions=positions))
        return jnp.mean(render_frame(s, cfg, key))

    g = np.asarray(jax.grad(f)(scene.mesh.positions))
    assert np.isfinite(g).all()
    assert np.abs(g[:3]).max() > 1e-6  # triangle vertices influence shading


def test_grad_wrt_albedo_fd():
    scene = _scene().freeze()
    loss = _loss_of(scene)

    def f(albedo):
        return loss(scene.replace(materials=scene.materials.replace(albedo=albedo)))

    g = np.asarray(jax.grad(f)(scene.materials.albedo))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    a0 = np.asarray(scene.materials.albedo)
    eps = 1e-3
    i = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    d = np.zeros_like(a0)
    d[i] = eps
    fd = (float(f(jnp.asarray(a0 + d))) - float(f(jnp.asarray(a0 - d)))) / (2 * eps)
    assert np.isclose(fd, g[i], rtol=0.02, atol=1e-6)


def test_grad_wrt_camera_fd():
    scene = _scene().freeze()
    loss = _loss_of(scene)

    def f(origin):
        return loss(scene.replace(camera=scene.camera.replace(origin=origin)))

    g = np.asarray(jax.grad(f)(scene.camera.origin))
    assert np.isfinite(g).all()
    o0 = np.asarray(scene.camera.origin)
    eps = 1e-3
    i = int(np.argmax(np.abs(g)))
    d = np.zeros(3)
    d[i] = eps
    fd = (float(f(jnp.asarray(o0 + d))) - float(f(jnp.asarray(o0 - d)))) / (2 * eps)
    assert np.isclose(fd, g[i], rtol=0.15, atol=1e-4)


def test_scene_params_roundtrip():
    scene = _scene().freeze()
    p = SceneParams.init(scene)
    s2 = apply_params(scene, p)
    assert np.allclose(np.asarray(s2.materials.albedo),
                       np.asarray(scene.materials.albedo), atol=1e-5)
    assert np.allclose(np.asarray(s2.mesh.positions),
                       np.asarray(scene.mesh.positions), atol=1e-6)
    assert np.allclose(np.asarray(s2.materials.emissive),
                       np.asarray(scene.materials.emissive), atol=1e-4)


def test_inverse_rendering_recovers_albedo():
    """End-to-end: perturb albedo, recover it from 2 views (tiny
    BASELINE-config-5 analogue)."""
    scene = _scene().freeze()
    cfg = _cfg(width=12, height=12)
    views = [scene.camera]
    from raypt.core.camera import Camera
    c2 = Camera(position=(0.6, 0.7, 2.2), angle_y=10.0,
                viewport_width=12, viewport_height=12)
    views.append(c2.rays())

    finder = None
    key = jax.random.key(1)
    targets = jnp.stack([
        render_frame(scene.replace(camera=v), cfg, jax.random.fold_in(key, i))
        for i, v in enumerate(views)])

    # perturb albedo of material 0
    bad = scene.replace(materials=scene.materials.replace(
        albedo=scene.materials.albedo.at[0].set(jnp.array([0.2, 0.8, 0.9]))))

    params, losses = fit(bad, cfg, views, targets,
                         trainable=("albedo_logits",), steps=150,
                         learning_rate=0.08, key=key)
    assert losses[-1] < losses[0] * 0.05, losses[::20]
    rec = np.asarray(apply_params(bad, params).materials.albedo[0])
    tgt = np.asarray(scene.materials.albedo[0])
    assert np.allclose(rec, tgt, atol=0.08), (rec, tgt)
