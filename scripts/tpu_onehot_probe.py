"""Calibrated probe: dispatch overhead, gather-unit rate, one-hot MXU
gather rate (in-loop + straight-line), long chains for precision."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

R = 1 << 20
NSMALL = 256
NBIG = 1 << 17
W = 16

ksplit = jax.random.split(jax.random.key(0), 8)
small = jax.random.normal(ksplit[0], (NSMALL, W), jnp.float32)
small_next = jax.random.randint(ksplit[1], (NSMALL,), 0, NSMALL, jnp.int32)
small = small.at[:, 13].set(
    jax.lax.bitcast_convert_type(small_next, jnp.float32))
big = jax.random.normal(ksplit[2], (NBIG, W), jnp.float32)
big_next = jax.random.randint(ksplit[3], (NBIG,), 0, NBIG, jnp.int32)
big = big.at[:, 13].set(
    jax.lax.bitcast_convert_type(big_next, jnp.float32))
idx_s = jax.random.randint(ksplit[4], (R,), 0, NSMALL, jnp.int32)
idx_b = jax.random.randint(ksplit[5], (R,), 0, NBIG, jnp.int32)


def timeit(name, f, *args, reps=5, work_rows=None):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    dt = min(ts)
    extra = ""
    if work_rows:
        extra = f"  ({work_rows/dt/1e9:.2f} Grows/s raw)"
    print(f"{name}: {dt*1000:.2f}ms{extra}", flush=True)
    return dt


# 0) dispatch overhead
d0 = timeit("dispatch x+1 (tiny)", jax.jit(lambda x: x + 1.0),
            jnp.zeros((8, 128)))

K = 64


# 1) gather-unit chain, K=64 (big table)
def g_chain(i):
    out = jnp.zeros((R,), jnp.float32)
    def body(_, s):
        i, out = s
        r = big[i]
        return (jax.lax.bitcast_convert_type(r[:, 13], jnp.int32),
                out + r[:, 0])
    i, out = jax.lax.fori_loop(0, K, body, (i, out))
    return out


dt = timeit(f"gather chain K={K} (131k table)", jax.jit(g_chain), idx_b,
            work_rows=R * K)
print(f"   per-step {1000*(dt-d0)/K:.2f}ms -> "
      f"{R*K/max(dt-d0,1e-9)/1e9:.2f} Grows/s net", flush=True)


# 2) one-hot MXU chain in fori_loop (256-row table)
def oh_chain(i):
    sm_bf = small.astype(jnp.bfloat16)
    out = jnp.zeros((R,), jnp.float32)
    def body(_, s):
        i, out = s
        oh = jax.nn.one_hot(i, NSMALL, dtype=jnp.bfloat16)
        r = jnp.dot(oh, sm_bf, preferred_element_type=jnp.float32)
        nxt = jnp.round(r[:, 13] * 0).astype(jnp.int32) + (
            jax.lax.bitcast_convert_type(small[i, 13], jnp.int32))
        return nxt, out + r[:, 0]
    i, out = jax.lax.fori_loop(0, K, body, (i, out))
    return out


# NOTE: bf16 matmul can't round-trip bitcast links exactly; keep the
# index chain on the gather unit (small [i,13] gather of 1 column) and
# use the matmul only for payload. Measures payload-fetch cost.
dt = timeit(f"one-hot MXU chain K={K} (256 table)", jax.jit(oh_chain),
            idx_s, work_rows=R * K)
print(f"   per-step {1000*(dt-d0)/K:.2f}ms -> "
      f"{R*K/max(dt-d0,1e-9)/1e9:.2f} Grows/s net", flush=True)


# 3) one-hot via f32 matmul (exact, pricier)
def oh_chain_f32(i):
    out = jnp.zeros((R,), jnp.float32)
    def body(_, s):
        i, out = s
        oh = jax.nn.one_hot(i, NSMALL, dtype=jnp.float32)
        r = jnp.dot(oh, small, preferred_element_type=jnp.float32)
        nxt = jax.lax.bitcast_convert_type(r[:, 13], jnp.int32)
        return nxt, out + r[:, 0]
    i, out = jax.lax.fori_loop(0, K, body, (i, out))
    return out


dt = timeit(f"one-hot f32 chain K={K}", jax.jit(oh_chain_f32), idx_s,
            work_rows=R * K)
print(f"   per-step {1000*(dt-d0)/K:.2f}ms -> "
      f"{R*K/max(dt-d0,1e-9)/1e9:.2f} Grows/s net", flush=True)


# 4) wider one-hot payload: 512-row, 64-wide table (cluster-block scale)
N2, W2 = 512, 64
tab2 = jax.random.normal(ksplit[6], (N2, W2), jnp.float32)
idx2 = jax.random.randint(ksplit[7], (R,), 0, N2, jnp.int32)


def oh_wide(i):
    t_bf = tab2.astype(jnp.bfloat16)
    out = jnp.zeros((R,), jnp.float32)
    def body(k, s):
        i, out = s
        oh = jax.nn.one_hot((i + k) % N2, N2, dtype=jnp.bfloat16)
        r = jnp.dot(oh, t_bf, preferred_element_type=jnp.float32)
        return i, out + r[:, 0]
    i, out = jax.lax.fori_loop(0, 16, body, (i, out))
    return out


dt = timeit("one-hot 512x64 K=16", jax.jit(oh_wide), idx2,
            work_rows=R * 16)
print(f"   per-step {1000*(dt-d0)/16:.2f}ms", flush=True)

# 5) gather-unit on SMALL table for comparison (256 rows)
def g_small(i):
    out = jnp.zeros((R,), jnp.float32)
    def body(_, s):
        i, out = s
        r = small[i]
        return (jax.lax.bitcast_convert_type(r[:, 13], jnp.int32),
                out + r[:, 0])
    i, out = jax.lax.fori_loop(0, K, body, (i, out))
    return out


dt = timeit(f"gather chain K={K} (256 table)", jax.jit(g_small), idx_s,
            work_rows=R * K)
print(f"   per-step {1000*(dt-d0)/K:.2f}ms", flush=True)
