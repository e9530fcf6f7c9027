import time, jax, jax.numpy as jnp, numpy as np

# 1) while-loop overhead: N iterations of a gather+flops body at width W
table = jax.random.normal(jax.random.key(0), (147456, 16), jnp.float32)
for W in (4096, 16384, 1048576):
    idx0 = jax.random.randint(jax.random.key(1), (W,), 0, 147456)
    @jax.jit
    def loop(n, idx):
        def body(s):
            i, idx, acc = s
            r = table[idx]
            acc = acc + r[:, 0]
            idx = (idx * 1103515245 + 12345) % 147456
            return i+1, idx, acc
        def cond(s): return s[0] < n
        return jax.lax.while_loop(cond, body, (jnp.int32(0), idx, jnp.zeros((W,))))[2].sum()
    v = loop(100, idx0); jax.block_until_ready(v)
    for N in (100, 1000):
        v = loop(N, idx0); jax.block_until_ready(v)
        t0=time.time(); v = loop(N, idx0); jax.block_until_ready(v); dt=time.time()-t0
        print(f"W={W} N={N}: {dt*1000:.1f}ms -> {dt/N*1e6:.1f}us/iter", flush=True)
