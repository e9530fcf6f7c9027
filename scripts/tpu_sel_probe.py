"""Probe: which selection-matrix constructions lower in Mosaic.

The expand kernel builds S (128, N) bf16 from a (1, N) rank row; the
direct jnp.where((rank==slot)&sel, 1b, 0b) hits 'Invalid relayout:
Non-singleton logical dimension is replicated...' on vector<128xNxi1>.
Try alternatives; print which compile and their timing.
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

N = int(os.environ.get("SP_N", 2048))


def make_kernel(variant: str):
    def kernel(x_ref, out_ref, *, iters: int):
        x = x_ref[:]                              # (24, N) bf16 payload
        slot = jax.lax.broadcasted_iota(jnp.int32, (128, N), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        acc0 = jnp.zeros((8, N), jnp.float32)

        def body(c, acc):
            m = (((lane * 37 + c * 131) % 199) < 5).astype(jnp.int32)
            rank = m * 0
            k = 1
            while k < N:
                rank = rank + jnp.concatenate(
                    [jnp.zeros((1, k), jnp.int32), m[:, :N - k]], axis=1)
                k *= 2
            rank = rank - m                        # exclusive
            rank_m = jnp.where(m > 0, rank, jnp.int32(-1))   # (1, N)
            if variant == "eq_bf16":
                s = (rank_m == slot).astype(jnp.bfloat16)
            elif variant == "eq_f32_bf16":
                s = (rank_m == slot).astype(jnp.float32).astype(
                    jnp.bfloat16)
            elif variant == "eq_i32_bf16":
                s = (rank_m == slot).astype(jnp.int32).astype(
                    jnp.bfloat16)
            elif variant == "bcast_first":
                rank_b = jnp.broadcast_to(rank_m, (128, N))
                s = jnp.where(rank_b == slot, jnp.bfloat16(1),
                              jnp.bfloat16(0))
            else:
                raise ValueError(variant)
            g = jax.lax.dot_general(
                x, s, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (24, 128)
            y = (g[0:6] + g[6:12] + g[12:18]).astype(jnp.bfloat16)
            z = jax.lax.dot_general(
                y, s, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (6, N)
            return acc + z[0:8] if z.shape[0] >= 8 else acc + jnp.pad(
                z, ((0, 8 - z.shape[0]), (0, 0)))

        out_ref[:] = jax.lax.fori_loop(0, iters, body, acc0)
    return kernel


@partial(jax.jit, static_argnames=("variant", "iters"))
def run(x, variant: str, iters: int):
    return pl.pallas_call(
        partial(make_kernel(variant), iters=iters),
        grid=(128,),
        in_specs=[pl.BlockSpec((24, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(24, N * 128)).astype(np.float32)).astype(
    jnp.bfloat16)

@partial(jax.jit, static_argnames=("variant", "iters"))
def run_sum(x, variant: str, iters: int):
    # scalar output: the XLA reduce consumes the kernel output, so
    # block_until_ready really waits (relay trap) and nothing big
    # crosses the tunnel
    return jnp.sum(run(x, variant, iters))


variants = sys.argv[1:] or ["eq_bf16", "eq_f32_bf16", "eq_i32_bf16",
                            "bcast_first"]
ITERS = (16, 64, 256)
for v in variants:
    try:
        t0 = time.time()
        for it in ITERS:                       # warm all iter counts
            float(run_sum(x, v, it))           # value fetch = real wait
        comp = time.time() - t0
        ts = {}
        for it in ITERS:
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                float(run_sum(x, v, it))
                best = min(best, time.time() - t0)
            ts[it] = best
        per = (ts[256] - ts[16]) / (240 * 128) * 1e9
        print(f"{v}: OK warm {comp:.1f}s  "
              + "  ".join(f"t{i}={ts[i]*1e3:.0f}ms" for i in ITERS)
              + f"  marginal {per:.0f} ns/cycle", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{v}: FAIL {msg}", flush=True)
