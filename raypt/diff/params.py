"""Optimizable scene parameterization for inverse rendering.

The reference has no differentiable path at all; this realizes the
north star's "full reverse-mode gradients w.r.t. vertex positions,
materials, and camera" (BASELINE.json) on top of the detach-topology
integrator (raypt.accel.traverse.recompute_hit).

Parameters live in unconstrained space and are mapped into the scene:
  vertex_offsets: additive, world units
  albedo/specular: sigmoid -> (0, 1)
  roughness/specular_percent: sigmoid -> (0, 1)
  emissive: softplus -> [0, inf)
  camera: origin delta + ray-frame deltas
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from ..core.types import CameraRays, Scene


def _inv_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x) - jnp.log1p(-x)


def _inv_softplus(x, eps=1e-6):
    x = jnp.maximum(x, eps)
    return x + jnp.log(-jnp.expm1(-x))


@struct.dataclass
class SceneParams:
    """Unconstrained optimizable parameters. Any field may be frozen by
    simply excluding it from the optax gradient transform (or zeroing
    its grads)."""
    vertex_offsets: jax.Array        # (V, 3)
    albedo_logits: jax.Array         # (M, 3)
    specular_logits: jax.Array       # (M, 3)
    emissive_raw: jax.Array          # (M, 3) softplus-space
    roughness_logits: jax.Array      # (M,)
    specular_percent_logits: jax.Array  # (M,)
    cam_origin_delta: jax.Array      # (3,)
    cam_frame_delta: jax.Array       # (3, 3): lower_left/horizontal/vertical
    # Optional coarse displacement field: a (K, K, K) SCALAR lattice
    # over the mesh bbox, trilinearly sampled at each vertex and applied
    # along the vertex normal. A frequency-limited geometry
    # parameterization: views that observe part of the surface
    # determine the field everywhere, so occluded regions (e.g. the
    # bunny underside on an orbit-ring capture) recover too. Scalar ×
    # normal rather than a vector lattice because near-touching
    # surfaces with opposing normals (ears) need opposite offsets from
    # the same spatial cell.
    lattice_scalar: Optional[jax.Array] = None   # (K, K, K)

    @staticmethod
    def init(scene: Scene, lattice: int = 0) -> "SceneParams":
        """Parameters reproducing `scene` exactly (zero-residual init).
        lattice > 0 enables the coarse displacement field at that
        resolution."""
        m = scene.materials
        return SceneParams(
            vertex_offsets=jnp.zeros_like(scene.mesh.positions),
            albedo_logits=_inv_sigmoid(m.albedo),
            specular_logits=_inv_sigmoid(m.specular),
            emissive_raw=_inv_softplus(m.emissive + 1e-6),
            roughness_logits=_inv_sigmoid(m.roughness),
            specular_percent_logits=_inv_sigmoid(m.specular_percent),
            cam_origin_delta=jnp.zeros(3),
            cam_frame_delta=jnp.zeros((3, 3)),
            lattice_scalar=(jnp.zeros((lattice,) * 3) if lattice
                            else None),
        )


def sample_lattice(lat: jax.Array, pos: jax.Array, bmin: jax.Array,
                   bmax: jax.Array) -> jax.Array:
    """Trilinear sample of a (K, K, K) scalar lattice at world points
    pos (..., 3) over the [bmin, bmax] box. Differentiable w.r.t. lat."""
    k = lat.shape[0]
    u = (pos - bmin) / jnp.maximum(bmax - bmin, 1e-6) * (k - 1)
    u = jnp.clip(u, 0.0, k - 1 - 1e-4)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    out = 0.0
    for dx in (0, 1):
        wx = f[..., 0] if dx else 1.0 - f[..., 0]
        for dy in (0, 1):
            wy = f[..., 1] if dy else 1.0 - f[..., 1]
            for dz in (0, 1):
                wz = f[..., 2] if dz else 1.0 - f[..., 2]
                c = lat[jnp.minimum(i0[..., 0] + dx, k - 1),
                        jnp.minimum(i0[..., 1] + dy, k - 1),
                        jnp.minimum(i0[..., 2] + dz, k - 1)]
                out = out + wx * wy * wz * c
    return out


def geometry_offsets(scene: Scene, p: SceneParams) -> jax.Array:
    """Total per-vertex world-space offset realized by the parameters:
    free vertex_offsets plus the coarse lattice displacement along the
    vertex normal (when enabled)."""
    off = p.vertex_offsets
    if p.lattice_scalar is not None:
        base = jax.lax.stop_gradient(scene.mesh.positions)
        bmin = jnp.min(base, axis=0)
        bmax = jnp.max(base, axis=0)
        n = scene.mesh.normals
        n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        s = sample_lattice(p.lattice_scalar, base, bmin, bmax)
        off = off + s[:, None] * jax.lax.stop_gradient(n)
    return off


def apply_params(scene: Scene, p: SceneParams) -> Scene:
    """Realize parameters into a concrete scene (fully differentiable)."""
    mesh = scene.mesh.replace(
        positions=scene.mesh.positions + geometry_offsets(scene, p))
    mats = scene.materials.replace(
        albedo=jax.nn.sigmoid(p.albedo_logits),
        specular=jax.nn.sigmoid(p.specular_logits),
        emissive=jax.nn.softplus(p.emissive_raw),
        roughness=jax.nn.sigmoid(p.roughness_logits),
        specular_percent=jax.nn.sigmoid(p.specular_percent_logits),
    )
    cam = scene.camera
    cam = CameraRays(
        origin=cam.origin + p.cam_origin_delta,
        lower_left=cam.lower_left + p.cam_frame_delta[0],
        horizontal=cam.horizontal + p.cam_frame_delta[1],
        vertical=cam.vertical + p.cam_frame_delta[2],
    )
    return scene.replace(mesh=mesh, materials=mats, camera=cam)


def freeze_except(grads: SceneParams, trainable: Sequence[str]) -> SceneParams:
    """Zero gradients of all fields not named in `trainable`."""
    updates = {}
    for f in grads.__dataclass_fields__:
        g = getattr(grads, f)
        if f not in trainable and g is not None:
            updates[f] = jnp.zeros_like(g)
    return grads.replace(**updates) if updates else grads
