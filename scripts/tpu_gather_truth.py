"""Ground-truth gather rates: materialized outputs, dependence chains,
loop vs straight-line. Table = bunny-scale (139k, 16) f32."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

N, W, R = 1 << 17, 16, 1 << 20
table = jax.random.normal(jax.random.key(0), (N, W), jnp.float32)
# embed a next-pointer in column 13 (like the packed layout)
nxt = jax.random.randint(jax.random.key(1), (N,), 0, N, jnp.int32)
table = table.at[:, 13].set(
    jax.lax.bitcast_convert_type(nxt, jnp.float32))
idx0 = jax.random.randint(jax.random.key(2), (R,), 0, N, jnp.int32)


def timeit(name, f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.2f}ms", flush=True)
    return min(ts)


# A: one gather, materialized output
dt = timeit("A one gather (materialized)",
            jax.jit(lambda i: table[i]), idx0)
print(f"   {R/dt/1e9:.2f} Grows/s", flush=True)

# B: one gather + reduce (the original suspicious probe)
dt = timeit("B one gather + sum", jax.jit(lambda i: table[i].sum()), idx0)
print(f"   {R/dt/1e9:.2f} Grows/s", flush=True)


# C: K dependent gathers straight-line (chase col-13 pointer)
def chase_straight(i, K):
    out = jnp.zeros((R,), jnp.float32)
    for _ in range(K):
        r = table[i]
        out = out + r[:, 0]
        i = jax.lax.bitcast_convert_type(r[:, 13], jnp.int32)
    return out, i


for K in (8,):
    dt = timeit(f"C {K} dependent straight-line",
                jax.jit(lambda i, K=K: chase_straight(i, K)), idx0)
    print(f"   {R*K/dt/1e9:.2f} Grows/s", flush=True)


# D: same chase in a fori_loop
def chase_loop(i, K):
    def body(_, s):
        i, out = s
        r = table[i]
        return jax.lax.bitcast_convert_type(r[:, 13], jnp.int32), out + r[:, 0]
    i, out = jax.lax.fori_loop(0, K, body, (i, jnp.zeros((R,))))
    return out, i


for K in (8,):
    dt = timeit(f"D {K} dependent fori_loop",
                jax.jit(lambda i, K=K: chase_loop(i, K)), idx0)
    print(f"   {R*K/dt/1e9:.2f} Grows/s", flush=True)

# E: 8 INDEPENDENT gathers straight-line (no dependence)
def indep(i):
    outs = []
    for k in range(8):
        outs.append(table[(i + k * 1000003) % N][:, 0])
    return sum(outs)


dt = timeit("E 8 independent straight-line", jax.jit(indep), idx0)
print(f"   {R*8/dt/1e9:.2f} Grows/s", flush=True)

# F: smaller wavefront dependent straight-line (64k)
i64 = idx0[: 1 << 16]


def chase64(i):
    out = jnp.zeros((1 << 16,), jnp.float32)
    for _ in range(8):
        r = table[i]
        out = out + r[:, 0]
        i = jax.lax.bitcast_convert_type(r[:, 13], jnp.int32)
    return out, i


dt = timeit("F 8 dep straight-line R=64k", jax.jit(chase64), i64)
print(f"   {(1<<16)*8/dt/1e9:.2f} Grows/s", flush=True)
