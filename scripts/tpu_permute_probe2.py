"""Permute-probe v2: anchor the compute so nothing can be elided.

v1 (tpu_permute_probe.py) timed ~0.1 ms regardless of iteration count
(implied >5 Pflop/s) — either Mosaic transformed the independent-
iteration loop or sub-ms relay timing lies. Here every iteration's
matmuls FEED the next one (x is updated with the scatter result), so
the chain must execute serially; a fixed-S control loop isolates the
raw matmul cost from the rank/select construction.
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

N = int(os.environ.get("PP_N", 8192))
PROGS = int(os.environ.get("PP_PROGS", 128))


def _lane_prefix_sum(x, n):
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], k), x.dtype), x[:, :n - k]], axis=1)
        x = x + shifted
        k *= 2
    return x


def _kernel(x_ref, out_ref, *, iters: int, n: int, fixed_s: bool):
    x = x_ref[:]                                  # (8, N) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)

    def make_s(c):
        m = ((lane * 37 + c * 131) % 199) < 5
        mi = m.astype(jnp.int32)
        rank = _lane_prefix_sum(mi, n) - mi
        sel = m & (rank < 128)
        return ((rank == slot) & sel).astype(jnp.bfloat16)

    s0 = make_s(0)

    def body(c, x):
        s = s0 if fixed_s else make_s(c)
        g = jax.lax.dot_general(
            x.astype(jnp.bfloat16), s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (8, 128)
        y = g * 1.0001 + 0.5
        z = jax.lax.dot_general(
            y.astype(jnp.bfloat16), s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (8, n)
        # CHAIN: next iteration's matmul consumes this result
        return x + z * jnp.float32(1e-6)

    out_ref[:] = jax.lax.fori_loop(0, iters, body, x)


@partial(jax.jit, static_argnames=("iters", "interpret", "fixed_s"))
def run(x, iters: int, interpret: bool = False, fixed_s: bool = False):
    return pl.pallas_call(
        partial(_kernel, iters=iters, n=N, fixed_s=fixed_s),
        grid=(PROGS,),
        in_specs=[pl.BlockSpec((8, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N * PROGS), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x)


plat = jax.devices()[0].platform
interp = plat not in ("tpu", "axon")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(8, N * PROGS)).astype(np.float32))

for fixed in (True, False):
    label = "fixed-S (matmuls only)" if fixed else "full rank+select"
    prev = None
    for iters in (16, 64):
        f = lambda: jax.block_until_ready(
            run(x, iters, interpret=interp, fixed_s=fixed))
        t0 = time.time()
        f()
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        print(f"{label} iters={iters:3d}: {min(ts)*1e3:8.2f}ms "
              f"(compile {comp:.1f}s)", flush=True)
        if prev is not None:
            per = (min(ts) - prev) / ((iters - 16) * PROGS) * 1e9
            print(f"  -> marginal per cluster-cycle: {per:.0f} ns",
                  flush=True)
        prev = min(ts)
