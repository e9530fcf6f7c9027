"""Round-5 de-risk probe: in-kernel lane regrouping cost.

The PLAN_R5 cluster-queue design hinges on two Mosaic pieces per
cluster: (a) a lane prefix-sum to rank interested rays, (b) a one-hot
SELECTION matmul that compacts those rays' data to 128 lanes (and its
transpose to scatter results back). This kernel times the full
regroup->test->scatter cycle on synthetic interest masks, isolating
the per-cluster cost the design needs to be ~<1.5 us to win.
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

N = int(os.environ.get("PP_N", 8192))        # rays per program
PROGS = int(os.environ.get("PP_PROGS", 128))


def _lane_prefix_sum(x, n):
    """Inclusive prefix sum over the lane axis via log-step shifted
    adds (Mosaic has no cumsum lowering; static lane slices work)."""
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], k), x.dtype), x[:, :n - k]], axis=1)
        x = x + shifted
        k *= 2
    return x


def _kernel(x_ref, out_ref, *, iters: int, n: int):
    x = x_ref[:]                                  # (8, N) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
    acc0 = jnp.zeros((8, n), jnp.float32)

    def body(c, acc):
        # synthetic ~2.5% interest mask, different per cluster id c
        m = ((lane * 37 + c * 131) % 199) < 5     # (1, n) bool
        mi = m.astype(jnp.int32)
        rank = _lane_prefix_sum(mi, n) - mi       # (1, n) exclusive
        sel = m & (rank < 128)
        # selection matrix S (128, n): S[j, i] = sel[i] & rank[i] == j
        s = ((rank == slot) & sel).astype(jnp.bfloat16)
        # compact: g (8, 128) = x contracted with S over lanes
        g = jax.lax.dot_general(
            x.astype(jnp.bfloat16), s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (8, 128)
        # stand-in for the dense cluster test on compacted rays
        y = g * 1.0001 + 0.5
        # scatter-back: (8, n) = y contracted with S over slots
        z = jax.lax.dot_general(
            y.astype(jnp.bfloat16), s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (8, n)
        return acc + z

    out_ref[:] = jax.lax.fori_loop(0, iters, body, acc0)


@partial(jax.jit, static_argnames=("iters", "interpret"))
def run(x, iters: int, interpret: bool = False):
    return pl.pallas_call(
        partial(_kernel, iters=iters, n=N),
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

# correctness smoke (interpret or device): compaction+scatter of a
# constant must reproduce sel * const
if interp:
    print("interpret mode; timing meaningless", flush=True)

times = {}
for iters in (8, 32, 128):
    f = lambda: jax.block_until_ready(run(x, iters, interpret=interp))
    t0 = time.time()
    f()
    comp = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    times[iters] = min(ts)
    per = min(ts) / (iters * PROGS) * 1e9
    print(f"iters={iters:4d}: {min(ts)*1e3:7.1f}ms "
          f"({per:6.0f} ns per cluster-cycle per program, "
          f"compile {comp:.1f}s)", flush=True)

ks = sorted(times)
slope = (times[ks[-1]] - times[ks[0]]) / ((ks[-1] - ks[0]) * PROGS)
print(f"marginal per-cluster regroup+test+scatter: {slope*1e9:.0f} ns "
      f"(need <~1500 ns for the PLAN_R5 design to win at bounce 1)",
      flush=True)
