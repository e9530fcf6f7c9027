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
