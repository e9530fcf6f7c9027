"""Environment-light sampling in pure jnp.

Reference: the megakernel samples a mip-mapped CUDA cubemap texture with
hardware bilinear filtering, after rotating the miss direction 180
degrees about Y (main_raytracing.cu:151-155: `quat(vec3(0, PI, 0)) *
dir` then `texCubemapLod(..., 0)`), and clamps radiance to 50.

TPU-native: the cubemap is a plain (6, H, W, 3) array; face selection +
bilinear filtering are branchless jnp (gathers fuse into the megastep).
Equirectangular panoramas (H, W, 3) are supported as well — they are
the common HDR interchange format and avoid cube-seam handling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import EnvMap


def _bilinear(img: jax.Array, x: jax.Array, y: jax.Array,
              wrap_x: bool = False) -> jax.Array:
    """Sample img (H, W, C) at continuous pixel coords (x, y) with
    bilinear filtering; y clamped, x clamped or wrapped."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    if wrap_x:
        x0 = jnp.mod(x0, w)
        x1 = jnp.mod(x1, w)
    else:
        x0 = jnp.clip(x0, 0, w - 1)
        x1 = jnp.clip(x1, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    y1 = jnp.clip(y1, 0, h - 1)
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def _cube_faceuv(d: jax.Array):
    """CUDA cubemap face selection + per-face (s, t) in [0,1]
    (face order +x, -x, +y, -y, +z, -z; D3D/CUDA t runs top-down)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)))
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)
    sc = jnp.where(is_x, jnp.where(x > 0, -z, z),
                   jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(is_y, jnp.where(y > 0, z, -z), -y)
    s = (sc / ma + 1.0) * 0.5
    t = (tc / ma + 1.0) * 0.5
    return face.astype(jnp.int32), s, t


def sample_env(env: EnvMap, d: jax.Array) -> jax.Array:
    """Sample radiance for unit directions d (..., 3) -> (..., 3)."""
    if env.is_cube:
        face, s, t = _cube_faceuv(d)
        h, w = env.data.shape[1], env.data.shape[2]
        x = s * w - 0.5
        y = t * h - 0.5
        # gather the four texels of the selected face for each ray
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        a = env.data[face, y0i, x0i]
        b = env.data[face, y0i, x1i]
        c = env.data[face, y1i, x0i]
        e = env.data[face, y1i, x1i]
        return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + e * fx) * fy
    else:
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        u = jnp.arctan2(x, -z) / (2.0 * jnp.pi) + 0.5
        v = jnp.arccos(jnp.clip(y, -1.0, 1.0)) / jnp.pi
        h, w = env.data.shape[0], env.data.shape[1]
        return _bilinear(env.data, u * w - 0.5, v * h - 0.5, wrap_x=True)


def build_env_quads(env: EnvMap):
    """Precompute the 2x2-texel 'quad table': one row per texel holding
    its bilinear neighborhood [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] — so
    a bilinear env sample costs ONE gather instead of four (the TPU
    gather unit is row-rate-bound; this cut env sampling ~4x).

    Returns (quads (F*H*W, 12), (H, W)) with F = 6 for cubemaps, 1 for
    equirect (x-wrapped)."""
    data = env.data if env.is_cube else env.data[None]
    f, h, w = data.shape[0], data.shape[1], data.shape[2]
    xs1 = jnp.minimum(jnp.arange(w) + 1, w - 1)
    if not env.is_cube:
        xs1 = jnp.mod(jnp.arange(w) + 1, w)
    ys1 = jnp.minimum(jnp.arange(h) + 1, h - 1)
    t00 = data
    t01 = data[:, :, xs1]
    t10 = data[:, ys1]
    t11 = data[:, ys1][:, :, xs1]
    quads = jnp.concatenate([t00, t01, t10, t11], axis=-1)   # (F,H,W,12)
    return quads.reshape(f * h * w, 12), (h, w)


def sample_env_quads(env: EnvMap, quads, hw, d: jax.Array) -> jax.Array:
    """Bilinear env sample via the quad table (one gather per ray)."""
    h, w = hw
    if env.is_cube:
        face, s, t = _cube_faceuv(d)
        x = s * w - 0.5
        y = t * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        idx = (face * h + y0i) * w + x0i
    else:
        x_, y_, z_ = d[..., 0], d[..., 1], d[..., 2]
        u = jnp.arctan2(x_, -z_) / (2.0 * jnp.pi) + 0.5
        v = jnp.arccos(jnp.clip(y_, -1.0, 1.0)) / jnp.pi
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.mod(x0.astype(jnp.int32), w)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        idx = y0i * w + x0i
    q = quads[idx]                                           # (..., 12)
    a, bq, c, e = q[..., 0:3], q[..., 3:6], q[..., 6:9], q[..., 9:12]
    return (a * (1 - fx) + bq * fx) * (1 - fy) + (c * (1 - fx) + e * fx) * fy


def rotate_y_pi(d: jax.Array) -> jax.Array:
    """quat(vec3(0, PI, 0)) * d == (-x, y, -z): the reference rotates the
    env lookup 180 degrees about Y (main_raytracing.cu:151)."""
    return jnp.stack([-d[..., 0], d[..., 1], -d[..., 2]], axis=-1)


# ---------------------------------------------------------------------------
# Mip chain + LOD sampling. The reference binds a mip-mapped cubemap
# and samples it with texCubemapLod (main_raytracing.cu:154) — always at
# lod 0, but the mip machinery exists in its texture subsystem
# (utils/CUDATexture.cpp:112-172 uploads every mip level). We expose the
# equivalent: box-filtered mip generation + explicit-LOD sampling.
# ---------------------------------------------------------------------------


def build_mip_chain(data: jax.Array, max_levels: int = 0) -> list:
    """Box-filter mip pyramid. data is (H, W, C) or (F, H, W, C); each
    level halves H and W (stops at 1 or after max_levels > 0 levels).
    Returns [level0, level1, ...]."""
    lead = data.ndim == 4
    img = data if lead else data[None]
    chain = [data]
    while max(img.shape[1], img.shape[2]) > 1:
        if max_levels and len(chain) >= max_levels:
            break
        f, h, w, c = img.shape
        kh, kw = (2 if h > 1 else 1), (2 if w > 1 else 1)
        h2, w2 = h // kh, w // kw
        img = img[:, : h2 * kh, : w2 * kw]
        img = img.reshape(f, h2, kh, w2, kw, c).mean(axis=(2, 4))
        chain.append(img if lead else img[0])
    return chain


def sample_env_lod(env: EnvMap, chain: list, d: jax.Array,
                   lod) -> jax.Array:
    """Trilinear environment sample: bilinear in the two mip levels
    bracketing `lod` (scalar or per-ray), linear between them. lod 0 ==
    sample_env. Capability parity with texCubemapLod."""
    lod = jnp.asarray(lod, jnp.float32)
    n = len(chain)
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, n - 1)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]

    def at_level(i):
        return sample_env(env.replace(data=chain[i]), d)

    if n == 1:
        return at_level(0)
    levels = jnp.stack([at_level(i) for i in range(n)])   # (L, ..., 3)
    a = jnp.take_along_axis(
        levels, jnp.broadcast_to(l0, d.shape[:-1])[None, ..., None], 0)[0]
    l1 = jnp.minimum(l0 + 1, n - 1)
    b = jnp.take_along_axis(
        levels, jnp.broadcast_to(l1, d.shape[:-1])[None, ..., None], 0)[0]
    return a * (1.0 - frac) + b * frac


# ---------------------------------------------------------------------------
# Cubemap <-> equirectangular conversion utilities (the reference ships
# a cubemap DDS; HDR panoramas are equirect — these bridge the two).
# ---------------------------------------------------------------------------

# direction basis per CUDA/D3D face: dir = normalize(axis + s'*s_axis +
# t'*t_axis) with s', t' in [-1, 1] (t runs top-down, see _cube_faceuv)
_FACE_AXES = (
    ((1, 0, 0), (0, 0, -1), (0, -1, 0)),    # +x
    ((-1, 0, 0), (0, 0, 1), (0, -1, 0)),    # -x
    ((0, 1, 0), (1, 0, 0), (0, 0, 1)),      # +y
    ((0, -1, 0), (1, 0, 0), (0, 0, -1)),    # -y
    ((0, 0, 1), (1, 0, 0), (0, -1, 0)),     # +z
    ((0, 0, -1), (-1, 0, 0), (0, -1, 0)),   # -z
)


def _face_dirs(size: int) -> jax.Array:
    """(6, size, size, 3) unit directions at cube-face texel centers."""
    sp = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    s = sp[None, :]
    t = sp[:, None]
    faces = []
    for axis, s_ax, t_ax in _FACE_AXES:
        d = (jnp.asarray(axis, jnp.float32)[None, None]
             + s[..., None] * jnp.asarray(s_ax, jnp.float32)
             + t[..., None] * jnp.asarray(t_ax, jnp.float32))
        faces.append(d / jnp.linalg.norm(d, axis=-1, keepdims=True))
    return jnp.stack(faces)


def equirect_to_cube(data: jax.Array, size: int = 0) -> jax.Array:
    """Equirect (H, W, C) -> cubemap (6, size, size, C) by bilinear
    resampling (size defaults to H/2 ~ matching angular resolution)."""
    h = data.shape[0]
    if not size:
        size = max(h // 2, 1)
    dirs = _face_dirs(size)
    env = EnvMap(data=data, is_cube=False)
    return sample_env(env, dirs)


def cube_to_equirect(data: jax.Array, height: int = 0) -> jax.Array:
    """Cubemap (6, S, S, C) -> equirect (height, 2*height, C)."""
    s = data.shape[1]
    if not height:
        height = 2 * s
    width = 2 * height
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * jnp.pi
    u = ((jnp.arange(width, dtype=jnp.float32) + 0.5) / width - 0.5) \
        * (2.0 * jnp.pi)
    y = jnp.cos(v)[:, None] * jnp.ones((1, width))
    sy = jnp.sin(v)[:, None]
    x = sy * jnp.sin(u)[None, :]
    z = -sy * jnp.cos(u)[None, :]
    dirs = jnp.stack([x, y, z], axis=-1)
    env = EnvMap(data=data, is_cube=True)
    return sample_env(env, dirs)
