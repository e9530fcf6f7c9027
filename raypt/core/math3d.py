"""Vector math foundation for the TPU path tracer.

TPU-native replacement for the reference's glm-based device math
(reference: RayTracing/Math.h:10-71, glm intersect helpers used at
RayTracing/main_raytracing.cu:60,94). Everything here is pure jnp over
arrays whose *last* axis is the vector axis, so every function vmaps /
batches trivially and fuses under jit.

Conventions:
  - vectors are float32 arrays shaped (..., 3)
  - ray directions passed to intersection helpers must be normalized
    (the reference normalizes once per ray, main_raytracing.cu:39,86)
  - "no hit" is encoded as distance == BIG (1e30), matching the
    reference sentinel (main_raytracing.cu:85).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e30  # reference max_distance sentinel, main_raytracing.cu:85
EPS = 1e-8


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched dot product over the last axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def dot_keep(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.cross(a, b)


def length(v: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jax.Array) -> jax.Array:
    """Safe normalize: returns v * rsqrt(|v|^2), guarding the zero vector."""
    sq = dot_keep(v, v)
    return v * jax.lax.rsqrt(jnp.maximum(sq, EPS * EPS))


def reflect(d: jax.Array, n: jax.Array) -> jax.Array:
    """glm::reflect semantics: d - 2*dot(d,n)*n (main_raytracing.cu:130)."""
    return d - 2.0 * dot_keep(d, n) * n


def lerp(a, b, t):
    """glm::lerp / mix semantics."""
    return a + (b - a) * t


def refract(d: jax.Array, n: jax.Array, eta) -> jax.Array:
    """glm::refract semantics for a unit incident d and unit normal n
    facing AGAINST d (dot(d, n) < 0): Snell refraction with relative
    index eta = n_incident / n_transmitted. Returns the zero vector on
    total internal reflection (k < 0), like glm."""
    cos_i = -dot_keep(d, n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    # sqrt evaluated at a safe argument on TIR lanes: sqrt'(0) = inf
    # would leak NaN cotangents through the where (selected-away
    # branches still get differentiated)
    k_safe = jnp.where(tir, 1.0, jnp.maximum(k, 0.0))
    out = eta * d + (eta * cos_i - jnp.sqrt(k_safe)) * n
    return jnp.where(tir, 0.0, out)


def schlick_fresnel(cos_i, ior_a, ior_b):
    """Schlick's reflectance approximation for a dielectric interface
    from index ior_a into ior_b at incidence cosine cos_i (>= 0)."""
    r0 = ((ior_a - ior_b) / (ior_a + ior_b)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cos_i) ** 5


# ---------------------------------------------------------------------------
# Intersections
# ---------------------------------------------------------------------------

GLM_EPS = 1.1920929e-07  # std::numeric_limits<float>::epsilon()


def intersect_sphere(ro, rd, center, radius):
    """Ray/sphere intersection, exact glm::intersectRaySphere semantics
    (glm/gtx/intersect.inl:135-154, used at main_raytracing.cu:94).

    glm form: t0 = dot(center - ro, rd); dSq = |center - ro|^2 - t0^2;
    miss if dSq > r^2; half-chord t1 = sqrt(r^2 - dSq);
    t = (t0 > t1 + eps) ? t0 - t1 : t0 + t1   (far root when the ray
    starts inside or on the sphere — interiors ARE hit); hit iff t > eps.

    Batched over leading dims of every operand.
    """
    diff = center - ro
    t0 = dot(diff, rd)                    # rd normalized => a == 1
    d2 = dot(diff, diff) - t0 * t0
    r2 = radius * radius
    within = d2 <= r2
    # safe-where: sqrt'(0) = inf would leak NaN through the miss branch
    # of jnp.where under reverse-mode AD, so clamp the unselected lane
    # (and the tangent case) away from zero.
    t1 = jnp.sqrt(jnp.where(within, jnp.maximum(r2 - d2, EPS * EPS), 1.0))
    t = jnp.where(t0 > t1 + GLM_EPS, t0 - t1, t0 + t1)
    hit = within & (t > GLM_EPS)
    return hit, jnp.where(hit, t, BIG)


def intersect_triangle(ro, rd, v0, v1, v2):
    """Moller-Trumbore, glm::intersectRayTriangle semantics
    (main_raytracing.cu:60): front- AND back-face hits accepted
    (glm's version accepts both and returns signed barycentrics; the
    reference then rejects t < 0 at main_raytracing.cu:62).

    Returns (hit, t, u, v) where (u, v) weight v1, v2 and the reference
    interpolates normals as n0*u + n1*v + n2*(1-u-v)... NB the reference
    maps bary.x -> v0, bary.y -> v1 (main_raytracing.cu:63-66) because
    glm returns barycentrics for (v1, v2) in (x, y); we return (u, v)
    weighting (v1, v2) and the caller mirrors the reference's
    interpolation n = n0*(1-u-v)... see integrator.

    All inputs broadcast; rd must be normalized for t to be a distance.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(rd, e2)
    det = dot(e1, pvec)
    # safe-where: 1/det on degenerate (padded) faces would be inf and
    # poison reverse-mode through jnp.where; divide by a clamped det.
    ok_det = jnp.abs(det) > EPS
    inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    tvec = ro - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(rd, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (jnp.abs(det) > EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    return hit, jnp.where(hit, t, BIG), u, v


def intersect_aabb(ro, inv_rd, bmin, bmax, tmax):
    """Slab test, reference Math::IntersectAABB semantics (Math.h:50-61):
    returns True iff the ray hits the box nearer than the current best
    hit distance `tmax`.

    Takes the precomputed reciprocal direction (the reference divides
    per test; we hoist the reciprocal out of the traversal loop).

    Rejects *inverted* (empty) boxes (min > max): the LBVH encodes
    "no geometry" subtrees (padded faces) as inverted boxes, and a
    plain slab test would treat those as unbounded intervals and walk
    the entire empty subtree (the reference never uploads empty nodes
    so it has no such case).
    """
    t1 = (bmin - ro) * inv_rd
    t2 = (bmax - ro) * inv_rd
    tnear = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tfar = jnp.min(jnp.maximum(t1, t2), axis=-1)
    nonempty = jnp.all(bmin <= bmax, axis=-1)
    return (tfar >= tnear) & (tnear < tmax) & (tfar > 0.0) & nonempty


# ---------------------------------------------------------------------------
# AABB helpers (reference Math.h:25-43)
# ---------------------------------------------------------------------------

def aabb_empty():
    return jnp.full((3,), BIG, jnp.float32), jnp.full((3,), -BIG, jnp.float32)


def aabb_union(amin, amax, bmin, bmax):
    return jnp.minimum(amin, bmin), jnp.maximum(amax, bmax)


# ---------------------------------------------------------------------------
# Transforms (reference Math::ComposeMatrix Math.h:63-70, glm euler quats)
# ---------------------------------------------------------------------------

def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], jnp.float32)


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)


def euler_to_mat(ax, ay, az=0.0):
    """glm::quat(vec3(ax, ay, az)) rotation matrix: R = Ry * Rx * Rz for
    az=0 reduces to Ry(yaw) @ Rx(pitch) — the reference camera only uses
    x/y angles (Scene.cpp:18).
    """
    return rot_y(ay) @ rot_x(ax) @ rot_z(az)


def compose_matrix(translation, rot3, scale):
    """TRS compose (Math.h:63-70). rot3 is a 3x3; returns 4x4."""
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot3 * scale[None, :])
    m = m.at[:3, 3].set(translation)
    return m


def transform_points(mat4, pts):
    """Apply a 4x4 to (..., 3) points (w=1)."""
    return pts @ mat4[:3, :3].T + mat4[:3, 3]


def transform_dirs(mat4, dirs):
    """Apply a 4x4 to (..., 3) directions (w=0)."""
    return dirs @ mat4[:3, :3].T


# ---------------------------------------------------------------------------
# Tone mapping (reference HLSL PS, main.cpp:78-93)
# ---------------------------------------------------------------------------

def aces_film(x):
    """ACES filmic curve, exact constants from the reference pixel shader
    (main.cpp:78-86)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap(hdr, exposure=0.5):
    """exposure then ACES, matching the reference present path
    (main.cpp:88-93: `ACESFilm(color.rgb * 0.5)`)."""
    return aces_film(hdr * exposure)
