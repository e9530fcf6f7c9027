"""Camera ray-gen parity: closed form vs the reference's matrix-inverse
derivation (Camera::Update, Scene.cpp:15-36)."""
import math

import numpy as np
import jax.numpy as jnp

from raypt.core.camera import Camera


import pytest

pytestmark = pytest.mark.smoke

def _glm_perspective_rh_no(fovy, aspect, near, far):
    t = math.tan(fovy / 2.0)
    p = np.zeros((4, 4), np.float32)
    p[0, 0] = 1.0 / (aspect * t)
    p[1, 1] = 1.0 / t
    p[2, 2] = -(far + near) / (far - near)
    p[2, 3] = -(2.0 * far * near) / (far - near)
    p[3, 2] = -1.0
    return p


def _reference_frame(cam: Camera):
    """Replicate Camera::Update literally: unproject NDC corners through
    inverse(perspectiveRH) then transform to world."""
    proj = _glm_perspective_rh_no(math.radians(cam.fov_y), cam.aspect,
                                  cam.near, 1000.0)
    inv = np.linalg.inv(proj)
    llc4 = inv @ np.array([-1, -1, -1, 1], np.float32)
    urc4 = inv @ np.array([1, 1, -1, 1], np.float32)
    llc = llc4[:3] / llc4[3]
    urc = urc4[:3] / urc4[3]
    size = urc - llc
    rot = np.asarray(cam.rotation())
    origin = np.asarray(cam.position, np.float32)
    horizontal = rot @ np.array([size[0], 0, 0], np.float32)
    vertical = rot @ np.array([0, size[1], 0], np.float32)
    lower_left = origin + rot @ llc
    return origin, lower_left, horizontal, vertical


def test_rays_match_matrix_derivation():
    cam = Camera(position=(1.0, -2.0, 3.0), angle_x=15.0, angle_y=140.0,
                 viewport_width=640, viewport_height=480)
    rays = cam.rays()
    o, llc, hor, ver = _reference_frame(cam)
    assert np.allclose(np.asarray(rays.origin), o, atol=1e-4)
    assert np.allclose(np.asarray(rays.lower_left), llc, atol=1e-4)
    assert np.allclose(np.asarray(rays.horizontal), hor, atol=1e-4)
    assert np.allclose(np.asarray(rays.vertical), ver, atol=1e-4)


def test_get_ray_center_is_forward():
    cam = Camera(angle_y=180.0, viewport_width=100, viewport_height=100)
    rays = cam.rays()
    ro, rd = rays.get_ray(jnp.float32(0.5), jnp.float32(0.5))
    d = np.asarray(rd)
    d = d / np.linalg.norm(d)
    # yaw 180 looks down +z (reference default view, RayTracing.cpp:159)
    assert np.allclose(d, [0, 0, 1], atol=1e-5)
    assert np.allclose(np.asarray(ro), [0, 0, 0], atol=1e-6)


def test_get_ray_batched():
    cam = Camera(viewport_width=64, viewport_height=32)
    rays = cam.rays()
    u = jnp.linspace(0, 1, 8).reshape(2, 4)
    v = jnp.linspace(0, 1, 8).reshape(2, 4)
    ro, rd = rays.get_ray(u, v)
    assert ro.shape == (2, 4, 3) and rd.shape == (2, 4, 3)


def test_fly_controls():
    cam = Camera()
    cam.move(forward=2.0)
    assert np.allclose(cam.position, [0, 0, -2], atol=1e-6)  # -z forward
    cam.rotate(d_yaw_deg=180.0)
    cam.move(forward=2.0)
    assert np.allclose(cam.position, [0, 0, 0], atol=1e-5)
