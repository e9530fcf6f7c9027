"""Host-side fly camera with reference-parity ray-gen derivation.

Reference: RayTracing::Camera (Scene.h:33-71, Scene.cpp:15-36).
The reference derives the world-space ray-gen frame from
perspectiveRH(fov_y=90, aspect, near=1, far=1000) by unprojecting the
NDC corners. We compute the same frame in closed form:

  camera-space lower-left of the near plane = (-aspect*t*n, -t*n, -n)
  with t = tan(fov_y/2), n = near. viewport size = (2*aspect*t*n, 2*t*n).
  world frame: R = Ry(yaw) @ Rx(pitch)   (glm::quat(vec3(ax, ay, 0)))
  horizontal = R @ (2*aspect*t*n, 0, 0); vertical = R @ (0, 2*t*n, 0)
  lower_left = origin + R @ llc_cam

(A finite-difference test against the matrix-inverse derivation lives in
tests/test_camera.py.)
"""
from __future__ import annotations

import math
import dataclasses

import jax.numpy as jnp

from .math3d import euler_to_mat
from .types import CameraRays


@dataclasses.dataclass
class Camera:
    """Mutable host camera (reference Scene.h:33-71). Angles in degrees,
    fov_y in degrees (default 90 per Scene.h:67), near plane 1.0
    (Scene.cpp:19)."""
    position: tuple = (0.0, 0.0, 0.0)
    angle_x: float = 0.0      # pitch, degrees
    angle_y: float = 0.0      # yaw, degrees (bunny scene sets 180, RayTracing.cpp:159)
    fov_y: float = 90.0
    near: float = 1.0
    viewport_width: int = 1024
    viewport_height: int = 768

    @property
    def aspect(self) -> float:
        return self.viewport_width / self.viewport_height

    def rotation(self):
        """World-from-camera rotation: Ry(yaw) @ Rx(pitch)."""
        ax = math.radians(self.angle_x)
        ay = math.radians(self.angle_y)
        return euler_to_mat(ax, ay)

    def forward(self):
        # reference GetForward() = -transform[2] (Scene.h:51): -Z column
        return -self.rotation()[:, 2]

    def right(self):
        return self.rotation()[:, 0]

    def up(self):
        return self.rotation()[:, 1]

    def rays(self) -> CameraRays:
        """Derive the jittable ray-gen frame (Camera::Update parity)."""
        t = math.tan(math.radians(self.fov_y) * 0.5)
        a = self.aspect
        n = self.near
        half_w = a * t * n
        half_h = t * n
        rot = self.rotation()
        origin = jnp.asarray(self.position, jnp.float32)
        llc_cam = jnp.array([-half_w, -half_h, -n], jnp.float32)
        horizontal = rot @ jnp.array([2 * half_w, 0, 0], jnp.float32)
        vertical = rot @ jnp.array([0, 2 * half_h, 0], jnp.float32)
        lower_left = origin + rot @ llc_cam
        return CameraRays(origin=origin, lower_left=lower_left,
                          horizontal=horizontal, vertical=vertical)

    # fly controls (reference Scene::Update WASD/QE, Scene.cpp:141-180)
    def move(self, forward=0.0, right=0.0, up=0.0):
        rot = self.rotation()
        p = jnp.asarray(self.position, jnp.float32)
        p = p + (-rot[:, 2]) * forward + rot[:, 0] * right + rot[:, 1] * up
        self.position = tuple(float(x) for x in p)

    def rotate(self, d_yaw_deg=0.0, d_pitch_deg=0.0):
        self.angle_y += d_yaw_deg
        self.angle_x += d_pitch_deg
