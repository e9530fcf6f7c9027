"""PLAN_R5 gate measurement: distinct wanted-cluster count per G-ray
program (the cluster-queue design's per-program loop bound), from the
REAL captured wavefronts. Reuses the phase-decomp capture."""
import os
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/raypt_xla_cache"))

src = open(os.path.join(os.path.dirname(__file__),
                        "tpu_phase_decomp.py")).read()
head = src.split("def timeit")[0]
exec(head)

from raypt.accel.clusters import tile_union_counts
from raypt.accel.traverse import _closest_sphere
from raypt.kernels.onehot_walk import pallas_topwalk

for i, (ro_n, rd_n, al_n) in enumerate(waves):
    ro = jnp.asarray(ro_n); rd = jnp.asarray(rd_n); al = jnp.asarray(al_n)
    ts_seed, _ = jax.jit(lambda o, d: _closest_sphere(scene, o, d))(ro, rd)
    seed = jnp.where(al, ts_seed, -1e30)
    mask = pallas_topwalk(table, ro, rd, seed, al, nw)
    line = [f"bounce {i}:"]
    for g in (2048, 4096, 8192):
        _, counts = tile_union_counts(mask, g, c_total)
        line.append(f"G={g}: mean {float(jnp.mean(counts)):.0f} "
                    f"max {int(jnp.max(counts))}")
    print("  ".join(line), flush=True)
