import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, W, R = 32768, 16, 1024
table = jax.random.normal(jax.random.key(0), (N, W), jnp.float32)
idx = jax.random.randint(jax.random.key(1), (R,), 0, N, jnp.int32)
ref = table[idx]

def try_variant(name, kern):
    try:
        @jax.jit
        def run(tab, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)
        out = run(table, idx); jax.block_until_ready(out)
        ok = np.allclose(np.asarray(out), np.asarray(ref))
        ts = []
        for _ in range(5):
            t0 = time.time(); out = run(table, idx); jax.block_until_ready(out)
            ts.append(time.time()-t0)
        print(f"{name}: OK correct={ok} {min(ts)*1e6:.0f}us/{R}rows -> {R/min(ts)/1e6:.0f}M rows/s")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}")

def k_take(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
try_variant("jnp.take(loaded)", k_take)

def k_take_clip(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0, mode="clip")
try_variant("jnp.take clip", k_take_clip)

def k_loop(tab_ref, idx_ref, out_ref):
    def body(k, _):
        out_ref[k, :] = tab_ref[idx_ref[k], :]
        return 0
    jax.lax.fori_loop(0, R, body, 0)
try_variant("scalar fori", k_loop)

def k_tal(tab_ref, idx_ref, out_ref):
    i = idx_ref[:].reshape(R, 1)
    out_ref[:] = jnp.take_along_axis(tab_ref[:], jnp.broadcast_to(i % N, (R, W)) * 0 + i, axis=0)
try_variant("take_along_axis", k_tal)
