import time, jax, jax.numpy as jnp, numpy as np

key = jax.random.key(0)
table = jax.random.normal(key, (147456, 16), jnp.float32)
for R in (1<<20,):
    idx = jax.random.randint(jax.random.key(1), (R,), 0, 147456)
    @jax.jit
    def g(t, i):
        return t[i].sum()
    v = g(table, idx); jax.block_until_ready(v)
    ts=[]
    for _ in range(5):
        t0=time.time(); v = g(table, idx); jax.block_until_ready(v); ts.append(time.time()-t0)
    dt=min(ts)
    print(f"gather {R} rows x16 f32: {dt*1000:.2f}ms -> {R/dt/1e6:.1f} Mrows/s, {R*64/dt/1e9:.1f} GB/s", flush=True)
    # narrower
    idxs = idx
    @jax.jit
    def g1(t, i):
        return t[i, 0].sum()
    v = g1(table, idxs); jax.block_until_ready(v)
    ts=[]
    for _ in range(5):
        t0=time.time(); v = g1(table, idxs); jax.block_until_ready(v); ts.append(time.time()-t0)
    dt=min(ts)
    print(f"gather {R} rows x1 f32: {dt*1000:.2f}ms -> {R/dt/1e6:.1f} Mrows/s", flush=True)
    # small table (fits VMEM easily)
    small = table[:8192]
    idxsm = jax.random.randint(jax.random.key(2), (R,), 0, 8192)
    v = g(small, idxsm); jax.block_until_ready(v)
    ts=[]
    for _ in range(5):
        t0=time.time(); v = g(small, idxsm); jax.block_until_ready(v); ts.append(time.time()-t0)
    dt=min(ts)
    print(f"gather small-table {R} x16: {dt*1000:.2f}ms -> {R/dt/1e6:.1f} Mrows/s", flush=True)
    # one-hot matmul gather from small table (256 rows)
    tiny = table[:256]
    idxt = jax.random.randint(jax.random.key(3), (R,), 0, 256)
    @jax.jit
    def gm(t, i):
        oh = jax.nn.one_hot(i, 256, dtype=jnp.bfloat16)
        return (oh @ t.astype(jnp.bfloat16)).sum()
    v = gm(tiny, idxt); jax.block_until_ready(v)
    ts=[]
    for _ in range(5):
        t0=time.time(); v = gm(tiny, idxt); jax.block_until_ready(v); ts.append(time.time()-t0)
    dt=min(ts)
    print(f"onehot-matmul {R} x256x16: {dt*1000:.2f}ms -> {R/dt/1e6:.1f} Mrows/s", flush=True)
