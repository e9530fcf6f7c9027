"""Cost of wavefront reorder primitives at R=1M on the TPU:
argsort vs cumsum-rank bucket partition, payload gather, result scatter.
Decides whether per-bounce ray sorting pays for itself."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

R = 1024 * 1024
key = jax.random.key(0)
k8 = jax.random.randint(key, (R,), 0, 16, jnp.int32)
payload = jax.random.normal(key, (R, 8), jnp.float32)


def timeit(name, f, *a):
    out = jax.block_until_ready(f(*a))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(f(*a))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f}ms", flush=True)
    return out


@jax.jit
def argsort_perm(k):
    return jnp.argsort(k)


@jax.jit
def bucket_perm(k):
    # stable 16-bucket partition via one-hot cumsum ranks
    onehot = (k[:, None] == jnp.arange(16)[None, :]).astype(jnp.int32)
    ranks = jnp.cumsum(onehot, axis=0) - onehot          # rank within bucket
    counts = jnp.sum(onehot, axis=0)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1]])
    dest = offs[k] + jnp.take_along_axis(ranks, k[:, None], 1)[:, 0]
    return dest


@jax.jit
def gather_rows(p, idx):
    return p[idx]


@jax.jit
def scatter_rows(p, dest):
    return jnp.zeros_like(p).at[dest].set(p)


@jax.jit
def inv_perm(order):
    return jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))


order = timeit("argsort 1M i32", argsort_perm, k8)
dest = timeit("bucket-rank 1M (16 buckets)", bucket_perm, k8)
timeit("gather 1M x 8f32", gather_rows, payload, order)
timeit("scatter 1M x 8f32", scatter_rows, payload, dest)
timeit("inverse perm (scatter iota)", inv_perm, order)
