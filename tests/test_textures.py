"""Albedo-texture shading (capability upgrade; the reference's materials
carry no textures, GPUScene.h:66-74)."""
import numpy as np
import jax
import pytest

from raypt.core.scene import MaterialDef, SceneBuilder
from raypt.core.types import EnvMap, RenderConfig
from raypt.render import render_frame


def _textured_quad_scene(tex):
    b = SceneBuilder(env=EnvMap.constant((1.0, 1.0, 1.0)))
    tid = b.add_texture(tex)
    m = b.add_material(MaterialDef(albedo=(1, 1, 1), texture=tid))
    pos = np.array([[-2, -2, -4], [2, -2, -4], [2, 2, -4], [-2, 2, -4]],
                   np.float32)
    nrm = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(pos, nrm, np.array([[0, 1, 2], [0, 2, 3]]), uvs=uv, material=m)
    return b.freeze()


def test_halfsplit_texture_modulates_albedo():
    """Left half black / right half white texture: the lit (white) side
    must be much brighter than the black side."""
    tex = np.zeros((64, 64, 3), np.float32)
    tex[:, 32:] = 1.0
    scene = _textured_quad_scene(tex)
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=4,
                       num_bounces=3, backend="bruteforce",
                       russian_roulette=False)
    img = np.asarray(render_frame(scene, cfg, jax.random.key(0)))
    # quad covers image pixels [16:48]; u=0 is world x=-2 -> image RIGHT?
    # camera at origin, angle 0 looks down -z with +x to image... u grows
    # with world x; the camera x axis maps to image x directly here.
    left = img[20:44, 18:30].mean()
    right = img[20:44, 34:46].mean()
    lo, hi = (left, right) if left < right else (right, left)
    assert hi > 3 * lo + 0.05, (left, right)


def test_untextured_materials_unaffected():
    tex = np.full((8, 8, 3), 0.25, np.float32)
    b = SceneBuilder(env=EnvMap.constant((0.5, 0.5, 0.5)))
    b.add_texture(tex)  # registered but unused
    m = b.add_material(MaterialDef(albedo=(0.8, 0.8, 0.8)))  # texture=-1
    b.add_quad((-50, -50, -5), (50, -50, -5), (50, 50, -5), (-50, 50, -5), m)
    scene = b.freeze()
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=4,
                       num_bounces=3, backend="bruteforce",
                       russian_roulette=False)
    img = np.asarray(render_frame(scene, cfg, jax.random.key(1)))
    b2 = SceneBuilder(env=EnvMap.constant((0.5, 0.5, 0.5)))
    m2 = b2.add_material(MaterialDef(albedo=(0.8, 0.8, 0.8)))
    b2.add_quad((-50, -50, -5), (50, -50, -5), (50, 50, -5), (-50, 50, -5), m2)
    img2 = np.asarray(render_frame(b2.freeze(), cfg, jax.random.key(1)))
    assert np.allclose(img, img2, atol=1e-5)


def test_texture_resolution_mismatch_rejected():
    b = SceneBuilder()
    b.add_texture(np.zeros((8, 8, 3), np.float32))
    with pytest.raises(ValueError):
        b.add_texture(np.zeros((16, 16, 3), np.float32))


# ---------------------------------------------------------------------------
# Environment mip chain + cube/equirect conversion (render.envmap)
# ---------------------------------------------------------------------------

def test_mip_chain_shapes_and_mean():
    import jax.numpy as jnp
    from raypt.render.envmap import build_mip_chain
    img = jnp.asarray(np.random.default_rng(0).random((16, 32, 3)),
                      jnp.float32)
    chain = build_mip_chain(img)
    assert [c.shape[:2] for c in chain] == [(16, 32), (8, 16), (4, 8),
                                            (2, 4), (1, 2), (1, 1)]
    for c in chain:  # box filter preserves the mean exactly
        assert np.allclose(float(c.mean()), float(img.mean()), atol=1e-5)
    cube = jnp.asarray(np.random.default_rng(1).random((6, 8, 8, 3)),
                       jnp.float32)
    chain = build_mip_chain(cube)
    assert [c.shape for c in chain][:2] == [(6, 8, 8, 3), (6, 4, 4, 3)]


def test_sample_env_lod_matches_lod0_and_blends():
    import jax.numpy as jnp
    from raypt.core.types import EnvMap
    from raypt.render.envmap import build_mip_chain, sample_env, \
        sample_env_lod
    rng = np.random.default_rng(2)
    env = EnvMap(data=jnp.asarray(rng.random((8, 16, 3)), jnp.float32),
                 is_cube=False)
    chain = build_mip_chain(env.data)
    d = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    assert np.allclose(sample_env_lod(env, chain, d, 0.0),
                       sample_env(env, d), atol=1e-6)
    # the last lod is the global mean everywhere
    top = sample_env_lod(env, chain, d, float(len(chain) - 1))
    assert np.allclose(top, np.asarray(chain[-1]).mean(axis=(0, 1)),
                       atol=1e-4)


def test_equirect_cube_roundtrip():
    import jax.numpy as jnp
    from raypt.core.types import EnvMap
    from raypt.render.envmap import cube_to_equirect, equirect_to_cube, \
        sample_env
    # smooth low-frequency panorama -> conversions should agree closely
    h, w = 32, 64
    v = np.linspace(0, np.pi, h)[:, None]
    u = np.linspace(-np.pi, np.pi, w)[None, :]
    pano = np.stack([np.sin(u) * np.sin(v) * 0.5 + 0.5,
                     np.broadcast_to(np.cos(v) * 0.5 + 0.5, (h, w)),
                     np.cos(u) * np.sin(v) * 0.25 + 0.5], -1)
    pano = jnp.asarray(pano, jnp.float32)
    cube = equirect_to_cube(pano, size=32)
    assert cube.shape == (6, 32, 32, 3)
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    a = sample_env(EnvMap(data=pano, is_cube=False), d)
    b = sample_env(EnvMap(data=cube, is_cube=True), d)
    assert float(jnp.abs(a - b).max()) < 0.06
    # and back again
    pano2 = cube_to_equirect(cube, height=32)
    assert pano2.shape == (32, 64, 3)
    c = sample_env(EnvMap(data=pano2, is_cube=False), d)
    assert float(jnp.abs(a - c).max()) < 0.1
