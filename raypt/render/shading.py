"""Gather-minimal differentiable hit shading.

Profiling on TPU v5e showed the integrator floor is NOT traversal but
the ~18 scattered gathers per ray-bounce in the naive hit recompute
(faces -> 3x positions, 3x normals, 3x uvs, then 5 material columns):
XLA's gather unit sustains only ~1e8 rows/s. This module restructures
shading to

  * ONE (F, 32) packed shade-row gather per triangle hit — the row is
    assembled once per render from live vertex arrays, so gradients
    w.r.t. positions/normals/uvs flow through the (cheap, F-sized)
    assembly rather than R-sized scattered gathers;
  * material and sphere property fetches as one-hot matmuls against
    tiny (M, 12)/(S, 8) tables — MXU work instead of gathers.

Everything here is differentiable; the Woop/MT recompute matches
accel.traverse.recompute_hit (the slow oracle) to f32 roundoff.

Shade row layout (32 x f32):
  [0:3] p0  [3:6] e1  [6:9] e2
  [9:12] n0 [12:15] n1 [15:18] n2
  [18:20] uv0 [20:22] uv1 [22:24] uv2
  [24] material id (as float)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.math3d import BIG, GLM_EPS, dot, normalize
from ..core.types import Scene
from ..accel.traverse import Hit, HitIds

SHADE_ROW = 32


@struct.dataclass
class ShadeTables:
    rows: jax.Array      # (F, 32) per-face shade rows
    mats: jax.Array      # (M, 16) [albedo, emissive, specular, rough,
                         #          spec%, texture, refr%, ior, pad, pad]
    sph: jax.Array       # (S, 8)  [center, radius, mat, pad, pad, pad]


def build_shade_tables(scene: Scene) -> ShadeTables:
    m = scene.mesh
    f = m.faces
    p0 = m.positions[f[:, 0]]
    p1 = m.positions[f[:, 1]]
    p2 = m.positions[f[:, 2]]
    n0 = m.normals[f[:, 0]]
    n1 = m.normals[f[:, 1]]
    n2 = m.normals[f[:, 2]]
    t0 = m.uvs[f[:, 0]]
    t1 = m.uvs[f[:, 1]]
    t2 = m.uvs[f[:, 2]]
    nfaces = f.shape[0]
    rows = jnp.zeros((nfaces, SHADE_ROW), jnp.float32)
    rows = rows.at[:, 0:3].set(p0)
    rows = rows.at[:, 3:6].set(p1 - p0)
    rows = rows.at[:, 6:9].set(p2 - p0)
    rows = rows.at[:, 9:12].set(n0)
    rows = rows.at[:, 12:15].set(n1)
    rows = rows.at[:, 15:18].set(n2)
    rows = rows.at[:, 18:20].set(t0)
    rows = rows.at[:, 20:22].set(t1)
    rows = rows.at[:, 22:24].set(t2)
    rows = rows.at[:, 24].set(m.face_material.astype(jnp.float32))

    mt = scene.materials
    mats = jnp.concatenate([
        mt.albedo, mt.emissive, mt.specular,
        mt.roughness[:, None], mt.specular_percent[:, None],
        mt.texture.astype(jnp.float32)[:, None],
        mt.refraction_percent[:, None], mt.ior[:, None],
        jnp.zeros((mt.capacity, 2), jnp.float32)], axis=-1)  # (M, 16)

    sp = scene.spheres
    sph = jnp.concatenate([
        sp.center, sp.radius[:, None],
        sp.material.astype(jnp.float32)[:, None],
        jnp.zeros((sp.capacity, 3), jnp.float32)], axis=-1)  # (S, 8)
    return ShadeTables(rows=rows, mats=mats, sph=sph)


def _one_hot_fetch(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table (N, W), ids (...,) i32 -> (..., W) via one-hot matmul
    (gather-free; N is small so this rides the MXU)."""
    n = table.shape[0]
    flat = ids.reshape(-1)
    oh = (flat[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]).astype(
        table.dtype)
    out = oh @ table
    return out.reshape(ids.shape + (table.shape[1],))


def recompute_hit_packed(tables: ShadeTables, ro, rd, ids: HitIds):
    """Differentiable hit attributes + material properties with one
    shade-row gather per ray. Returns (Hit, matprops (..., 16))."""
    eps = 1e-8
    is_tri = ids.tri >= 0
    is_sph = ids.sphere >= 0

    r = tables.rows[jnp.clip(ids.tri, 0, None)]          # (..., 32)
    p0 = r[..., 0:3]
    e1 = r[..., 3:6]
    e2 = r[..., 6:9]
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    ok_det = jnp.abs(det) > eps
    inv_det = jnp.where(ok_det, 1.0, 0.0) / jnp.where(ok_det, det, 1.0)
    tvec = ro - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=-1) * inv_det
    tt = jnp.sum(e2 * qvec, axis=-1) * inv_det
    w = 1.0 - u - v
    tri_n = normalize(w[..., None] * r[..., 9:12]
                      + u[..., None] * r[..., 12:15]
                      + v[..., None] * r[..., 15:18])
    backface = dot(rd, tri_n) >= 0.0
    tri_n = jnp.where(backface[..., None], -tri_n, tri_n)
    tri_uv = (w[..., None] * r[..., 18:20] + u[..., None] * r[..., 20:22]
              + v[..., None] * r[..., 22:24])
    tri_mat = r[..., 24]

    if tables.sph.shape[0]:
        s = _one_hot_fetch(tables.sph, jnp.clip(ids.sphere, 0, None))
        center = s[..., 0:3]
        radius = s[..., 3]
        sph_mat = s[..., 4]
        # sphere t recompute (differentiable, glm semantics INCLUDING
        # the far root when the ray starts inside — the finder's
        # intersect_sphere returns it, so the near-root-only form here
        # misplaced every interior hit; critical for refraction)
        oc = ro - center
        bq = jnp.sum(oc * rd, axis=-1)
        cq = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = bq * bq - cq
        pos_disc = disc > 0.0
        half = jnp.sqrt(jnp.where(pos_disc, jnp.maximum(disc, 1e-12), 1.0))
        st = jnp.where(-bq > half + GLM_EPS, -bq - half, -bq + half)
    else:   # static shape: sphere-free scene, skip the recompute
        center = ro * 0.0
        radius = tt * 0.0
        sph_mat = tt * 0.0
        st = tt * 0.0 + BIG

    t = jnp.where(is_tri, tt, jnp.where(is_sph, st, BIG))
    pos = ro + rd * t[..., None]
    sph_n = (pos - center) / jnp.maximum(radius, 1e-12)[..., None]
    normal = jnp.where(is_tri[..., None], tri_n,
                       jnp.where(is_sph[..., None], sph_n, 0.0))
    uv = jnp.where(is_tri[..., None], tri_uv, 0.0)
    mat_f = jnp.where(is_tri, tri_mat, jnp.where(is_sph, sph_mat, 0.0))
    mat_id = jnp.round(mat_f).astype(jnp.int32)
    valid = is_tri | is_sph
    front = jnp.where(is_tri, ~backface,
                      is_sph & (dot(rd, sph_n) < 0.0))

    matprops = _one_hot_fetch(tables.mats, mat_id)       # (..., 16)
    hit = Hit(valid=valid, t=t, position=pos, normal=normal, uv=uv,
              mat_id=mat_id, front_face=front)
    return hit, matprops


def sample_albedo_texture(textures: jax.Array, tex_id: jax.Array,
                          uv: jax.Array) -> jax.Array:
    """Bilinear sample of the albedo texture stack (K, TH, TW, 3) at hit
    uv (wrap addressing); tex_id < 0 -> 1.0 (untextured). Capability
    upgrade over the reference (its materials carry no textures)."""
    th, tw = textures.shape[1], textures.shape[2]
    k = textures.shape[0]
    x = uv[..., 0] * tw - 0.5
    y = (1.0 - uv[..., 1]) * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), tw)
    x1i = jnp.mod(x0i + 1, tw)
    y0i = jnp.mod(y0.astype(jnp.int32), th)
    y1i = jnp.mod(y0i + 1, th)
    ti = jnp.clip(tex_id, 0, k - 1)
    a = textures[ti, y0i, x0i]
    b = textures[ti, y0i, x1i]
    c = textures[ti, y1i, x0i]
    d = textures[ti, y1i, x1i]
    rgb = (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy
    return jnp.where((tex_id >= 0)[..., None], rgb, 1.0)
