"""Pallas finder backend: closest-hit via the fused MXU dense kernel.

Drop-in Finder (same contract as accel.traverse finders): sphere pass
in jnp (reference ordering), triangles via kernels.dense_pallas.
Used through RenderConfig(backend="pallas"); falls back to interpret
mode automatically on CPU so tests run everywhere.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel.dense import WoopTris, build_woop
from ..accel.traverse import HitIds, _closest_sphere
from ..core.math3d import BIG
from .dense_pallas import (RAY_TILE, pallas_closest_dense, pick_tri_chunk,
                           prepare_woop_mats)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def make_pallas_finder(scene, cfg, bvh=None):
    woop = bvh if isinstance(bvh, WoopTris) else build_woop(
        scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
    tri_chunk = pick_tri_chunk(woop.num_tris)
    mats = prepare_woop_mats(woop, tri_chunk)
    interpret = not _on_tpu()
    return partial(_pallas_finder, mats, tri_chunk, interpret)


def _pallas_finder(mats, tri_chunk, interpret, scene, ro, rd, active=None):
    scene, ro, rd = jax.lax.stop_gradient((scene, ro, rd))
    ts, si = _closest_sphere(scene, ro, rd)
    shape = ro.shape[:-1]
    flat_o = ro.reshape(-1, 3)
    flat_d = rd.reshape(-1, 3)
    flat_t = ts.reshape(-1)
    n = flat_o.shape[0]
    pad = (-n) % RAY_TILE
    if pad:
        flat_o = jnp.concatenate([flat_o, jnp.zeros((pad, 3))])
        flat_d = jnp.concatenate(
            [flat_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))])
        flat_t = jnp.concatenate([flat_t, jnp.full((pad,), BIG)])
    t_best, face = pallas_closest_dense(*mats, flat_o, flat_d, flat_t,
                                        interpret=interpret,
                                        tri_chunk=tri_chunk)
    t_best = t_best[:n].reshape(shape)
    face = face[:n].reshape(shape)
    tri_wins = face >= 0
    return HitIds(
        t=t_best,
        tri=jnp.where(tri_wins, face, -1),
        sphere=jnp.where(~tri_wins & (ts < BIG), si, -1),
    )
