"""Golden-image regression tests (SURVEY §4: the reference shipped an
unused PPM-compare harness; we actually wire one). Goldens are CPU
renders committed to tests/golden/ — any semantic change to the
integrator, RNG streams, camera, or scenes shows up here.

Regenerate intentionally with:
  JAX_PLATFORMS=cpu PYTHONPATH=. python tests/regen_golden.py
"""
import os

import numpy as np
import jax
import pytest

from raypt.core.types import RenderConfig
from raypt.render import render_frame
from raypt.scenes import cornell_box, triangle_ground

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


pytestmark = pytest.mark.smoke

def test_triangle_golden():
    b = triangle_ground()
    b.camera.viewport_width = b.camera.viewport_height = 32
    scene = b.freeze()
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2,
                       num_bounces=3, backend="bruteforce")
    img = np.asarray(render_frame(scene, cfg, jax.random.key(42)))
    ref = np.load(os.path.join(GOLDEN, "triangle_32.npy"))
    assert np.allclose(img, ref, rtol=1e-4, atol=1e-4)


def test_cornell_golden():
    b = cornell_box()
    b.camera.viewport_width = b.camera.viewport_height = 24
    scene = b.freeze()
    cfg = RenderConfig(width=24, height=24, samples_per_pixel=2,
                       num_bounces=4, backend="dense")
    img = np.asarray(render_frame(scene, cfg, jax.random.key(7)))
    ref = np.load(os.path.join(GOLDEN, "cornell_24.npy"))
    assert np.allclose(img, ref, rtol=1e-4, atol=1e-4)


def test_cornell_structure():
    """Semantic sanity of the Cornell render: bright emissive ceiling
    patch, colored side walls (camera at yaw 180 mirrors left/right)."""
    b = cornell_box()
    b.camera.viewport_width = b.camera.viewport_height = 48
    scene = b.freeze()
    cfg = RenderConfig(width=48, height=48, samples_per_pixel=4,
                       num_bounces=3, backend="dense")
    img = np.asarray(render_frame(scene, cfg, jax.random.key(0)))
    # the emissive panel (radiance ~20) must appear in the upper third
    assert img[:16].max() > 10.0
    left = img[14:34, 2:10]           # world +x wall (red) on image left
    right = img[14:34, 38:46]         # world -x wall (green) on image right
    assert left[..., 0].mean() > left[..., 1].mean()    # red dominant
    assert right[..., 1].mean() > right[..., 0].mean()  # green dominant
