import time, jax, jax.numpy as jnp

for W,N,R in ((8,32768,1024),(16,32768,1024),(32,32768,1024),(64,32768,1024),(16,32768,512),(16,4096,1024)):
    table = jax.random.normal(jax.random.key(0), (N, W), jnp.float32)
    idx0 = jax.random.randint(jax.random.key(1), (R,), 0, N, jnp.int32)
    @jax.jit
    def loop(n, idx):
        def body(s):
            i, idx, acc = s
            r = table[idx]
            acc = acc + r[:, 0]
            idx = (idx + 1315423911) % N
            return i+1, idx, acc
        return jax.lax.while_loop(lambda s: s[0] < n, body,
                                  (jnp.int32(0), idx, jnp.zeros((R,))))[2].sum()
    v = loop(2000, idx0); jax.block_until_ready(v)
    t0=time.time(); v = loop(2000, idx0); jax.block_until_ready(v); dt=(time.time()-t0)/2000
    print(f"W={W} N={N} R={R}: {dt*1e6:.1f}us/iter -> {R/dt/1e6:.0f}M rows/s, {R*W*4/dt/1e9:.1f} GB/s", flush=True)
