import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, W = 32768, 16   # table rows x width
R = 1024           # rays per tile

table = jax.random.normal(jax.random.key(0), (N, W), jnp.float32)
idx = jax.random.randint(jax.random.key(1), (R,), 0, N, jnp.int32)

def kern(tab_ref, idx_ref, out_ref):
    i = idx_ref[:]                      # (R,)
    out_ref[:] = tab_ref[i]             # per-lane gather rows

@jax.jit
def run(tab, idx):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)

try:
    out = run(table, idx)
    jax.block_until_ready(out)
    ref = table[idx]
    print("gather kernel works, correct:", np.allclose(np.asarray(out), np.asarray(ref)))
    ts = []
    for _ in range(5):
        t0 = time.time(); out = run(table, idx); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{min(ts)*1e6:.0f}us for {R} rows")
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:500])
