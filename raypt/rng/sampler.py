"""Counter-based RNG for path tracing — threefry replaces the
reference's per-pixel curand XORWOW state array.

Reference: Random.{h,cu} — one 48-byte curandState per pixel allocated
and seeded by a dedicated kernel (RayTracing.cpp:213-221, Random.cu:3-13),
then advanced statefully inside the megakernel.

TPU-native design: *zero* RNG state in memory. Every draw is a pure
function of (base key, frame, sample, bounce, pixel id), so

  * no per-pixel state to allocate, shard, or re-seed on resize (the
    reference reseeds from wall-clock on every resize,
    RayTracing.cpp:219);
  * the same pixel gets the same stream regardless of how the image is
    sharded over a device mesh -> sharded rendering is bitwise equal to
    single-chip rendering (the property the dist tests assert).

Stream layout per pixel-sample:
  jitter:  2 uniforms             (main_raytracing.cu:190)
  bounce b: specular pick, sphere-z, sphere-angle, roulette
            (main_raytracing.cu:124,129,142 via Random.h:26-27)

Parity with the reference is distribution-level, not bitwise (SURVEY §7
"RNG parity"): tests validate moments and uniformity, not sequences.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_key(base_key: jax.Array, frame_index) -> jax.Array:
    """Key for one progressive frame."""
    return jax.random.fold_in(base_key, frame_index)


def sample_key(fkey: jax.Array, sample_index) -> jax.Array:
    """Key for one sample-per-pixel pass within a frame."""
    return jax.random.fold_in(fkey, sample_index)


try:
    from jax._src.prng import threefry_2x32 as _threefry_2x32
except ImportError:  # pragma: no cover - jax internals moved
    _threefry_2x32 = None


def _per_pixel_uniforms(key: jax.Array, pixel_ids: jax.Array,
                        n: int) -> jax.Array:
    """n iid U[0,1) draws per pixel id -> (*pixel_ids.shape, n).
    Pure counter construction: counter = pixel_id * n + draw fed to one
    fused threefry block (layout-invariant AND ~20x faster than a
    vmap'd fold_in chain, which dominated frame time on TPU)."""
    if _threefry_2x32 is not None:
        kd = jax.random.key_data(key).astype(jnp.uint32).reshape(2)
        flat = pixel_ids.reshape(-1).astype(jnp.uint32)
        counters = (flat[:, None] * jnp.uint32(n)
                    + jnp.arange(n, dtype=jnp.uint32)[None, :]).reshape(-1)
        # threefry_2x32 splits its count argument in half positionally,
        # which would make values depend on the array shape; feed
        # explicit (hi=0, lo=counter) blocks so each output depends only
        # on its own counter value (layout/sharding invariant).
        m = counters.shape[0]
        blocks = jnp.concatenate([jnp.zeros_like(counters), counters])
        bits = _threefry_2x32(kd, blocks)[:m]
        u = (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2 ** -24)
        return u.reshape(pixel_ids.shape + (n,))
    flat = pixel_ids.reshape(-1)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, flat)
    u = jax.vmap(lambda k: jax.random.uniform(k, (n,), jnp.float32))(keys)
    return u.reshape(pixel_ids.shape + (n,))


def sample_jitter(skey: jax.Array, pixel_ids: jax.Array) -> jax.Array:
    """Sub-pixel jitter in [0,1)^2, shape (*ids, 2)
    (reference: uv = (pixel + (u1, u2)) / resolution)."""
    return _per_pixel_uniforms(jax.random.fold_in(skey, 0xA11CE),
                               pixel_ids, 2)


def bounce_uniforms(skey: jax.Array, bounce, pixel_ids: jax.Array) -> jax.Array:
    """Four iid U[0,1) draws per pixel for one bounce:
    [..., 0] specular pick, [..., 1] sphere z, [..., 2] sphere angle,
    [..., 3] russian roulette."""
    return _per_pixel_uniforms(jax.random.fold_in(skey, bounce),
                               pixel_ids, 4)


def refraction_uniform(skey: jax.Array, bounce,
                       pixel_ids: jax.Array) -> jax.Array:
    """One extra U[0,1) per pixel per bounce: the dielectric
    fresnel reflect/transmit pick (cfg.enable_refraction only). Drawn
    from a separately-folded key so the base 4-draw bounce stream —
    and therefore every reference-parity render — is unchanged."""
    return _per_pixel_uniforms(
        jax.random.fold_in(jax.random.fold_in(skey, 0x5EF7AC7), bounce),
        pixel_ids, 1)[..., 0]


def random_point_on_sphere(u_z: jax.Array, u_a: jax.Array) -> jax.Array:
    """Uniform point on the unit sphere from two uniforms, exactly the
    reference's z/angle construction (Random.h:26-31):
      z = 2*u1 - 1; a = 2*pi*u2; r = sqrt(1 - z^2); (r cos a, r sin a, z).
    Batched: returns (..., 3)."""
    z = u_z * 2.0 - 1.0
    a = u_a * (2.0 * jnp.pi)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a), z], axis=-1)
