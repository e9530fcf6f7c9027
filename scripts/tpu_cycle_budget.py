"""Round-5 post-batch8 budget probe: what does one expansion
cluster-cycle spend its time on at N=8192 lanes?

Variants (same loop structure, batch-8-style amortized rank excluded —
this isolates the PER-CLUSTER tail):
  full      — S build + compact matmul + dummy test + scatter matmul
  no-mm     — S build only (matmuls replaced by cheap adds)
  fixed-S   — matmuls with a loop-invariant S (build hoisted)

Cost(full) - cost(no-mm) ~ matmul share; cost(full) - cost(fixed-S) ~
S-build share. Decides whether any further per-cycle work (int8 S,
fewer payload rows) is worth landing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
  scripts/tpu_cycle_budget.py
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))
import numpy as np

N = int(os.environ.get("CB_N", 8192))
PROGS = int(os.environ.get("CB_PROGS", 128))
ITERS = int(os.environ.get("CB_ITERS", 64))


def _kernel(x_ref, out_ref, *, iters: int, n: int, mode: str):
    x = x_ref[:]                                  # (24, N) bf16-ish f32
    pay = x.astype(jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
    s_fixed = ((lane % 128) == slot).astype(jnp.bfloat16)
    acc0 = jnp.zeros((1, n), jnp.float32)

    def body(c, acc):
        # synthetic ~1.6% interest with a precomputed fake rank (the
        # real rank pass is amortized 8x by the batch-8 scan; this
        # probe isolates the per-cluster tail). BIT OPS ONLY: integer
        # modulo has no VPU divide and swamped the first probe draft.
        rank_m = jnp.where(((lane + c * 8) & 63) == 0,
                           (lane >> 6) & 127, jnp.int32(-1))
        if mode == "fixed_s":
            s = s_fixed
        else:
            s = (rank_m == slot).astype(jnp.bfloat16)      # (128, N)
        if mode == "no_mm":
            acc = acc + jnp.sum(s, axis=0, keepdims=True) * 1e-9
            return acc
        g24 = jax.lax.dot_general(
            pay, s, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (24, 128)
        y = (g24[0:6] * 1.0001 + 0.5).astype(jnp.bfloat16)  # stand-in test
        z = jax.lax.dot_general(
            y, s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (6, N)
        return acc + z[0:1]

    out_ref[:] = jax.lax.fori_loop(0, iters, body, acc0)


@partial(jax.jit, static_argnames=("iters", "mode"))
def run(x, iters: int, mode: str):
    return pl.pallas_call(
        partial(_kernel, iters=iters, n=N, mode=mode),
        grid=(PROGS,),
        in_specs=[pl.BlockSpec((24, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N * PROGS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(24, N * PROGS)).astype(np.float32))

for mode in ("full", "no_mm", "fixed_s"):
    for iters in (16, ITERS):
        f = lambda: np.asarray(run(x, iters, mode))  # force (relay lies)
        t0 = time.time(); f(); comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time(); f(); ts.append(time.time() - t0)
        per = min(ts) / (iters * PROGS) * 1e9
        print(f"{mode:8s} iters={iters:3d}: {min(ts)*1e3:7.1f} ms "
              f"({per:6.0f} ns/cycle, compile {comp:.1f}s)", flush=True)
