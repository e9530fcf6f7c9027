"""Isolate the in-loop slowdown: is it the gather, the VPU math, or the
loop? All variants: 32 fori_loop steps, R = 1M lanes.

  G_rand : gather rows[random idx] + full traversal math   (baseline)
  G_iota : same math, gather at contiguous iota indices
  G_zero : same math, gather replaced by rows[0:R] slice
  G_only : random gather alone, carry = f32 sum of row (no trav math)
  M_only : traversal math alone on a fixed (R,16) block (no gather)
  CHAIN  : serial pointer-chase: idx = next[idx] (1 gather, no math)
Prints ms per variant + HLO op summary for G_rand.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

N = 1 << 18          # table rows
R = 1 << 20          # lanes
K = 32

key = jax.random.key(0)
rows = jax.random.normal(key, (N, 16), jnp.float32)
nxt = jax.random.randint(jax.random.key(1), (N,), 0, N, jnp.int32)
idx0 = jax.random.randint(jax.random.key(2), (R,), 0, N, jnp.int32)
o = jax.random.normal(jax.random.key(3), (R, 3), jnp.float32)
d = jax.random.normal(jax.random.key(4), (R, 3), jnp.float32)
iv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)


def trav_math(r, node, t_best, face, modn):
    tn1 = (r[:, 0:3] - o) * iv
    tn2 = (r[:, 3:6] - o) * iv
    tnear = jnp.max(jnp.minimum(tn1, tn2), axis=-1)
    tfar = jnp.min(jnp.maximum(tn1, tn2), axis=-1)
    hit_box = (tfar >= tnear) & (tnear < t_best) & (tfar > 0.0)
    pvec = jnp.cross(d, r[:, 6:9])
    det = jnp.sum(r[:, 3:6] * pvec, axis=-1)
    tvec = o - r[:, 0:3]
    u = jnp.sum(tvec * pvec, axis=-1)
    t = jnp.sum(r[:, 6:9] * tvec, axis=-1)
    tri = (jnp.abs(det) > 1e-8) & (u >= 0) & (t > 0) & (t < t_best)
    t_best = jnp.where(tri, t, t_best)
    face = jnp.where(tri, node, face)
    node = jnp.where(hit_box, (node * 3 + 1) % modn, (node * 5 + 2) % modn)
    return node, t_best, face


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f}ms  "
          f"({R*K/min(ts)/1e9:.2f} Glane-steps/s)", flush=True)
    return f


def g_rand(idx):
    def body(_, s):
        node, tb, fc = s
        r = rows[node]
        return trav_math(r, node, tb, fc, N)
    return jax.lax.fori_loop(0, K, body,
                             (idx, jnp.full((R,), 1e30), idx * 0 - 1))


f_rand = bench("G_rand", g_rand, idx0)


def g_iota(idx):
    base = jnp.arange(R, dtype=jnp.int32) % N
    def body(_, s):
        node, tb, fc = s
        r = rows[(base + node % 7)]          # contiguous-ish, data-dep
        return trav_math(r, node, tb, fc, N)
    return jax.lax.fori_loop(0, K, body,
                             (idx, jnp.full((R,), 1e30), idx * 0 - 1))


bench("G_iota", g_iota, idx0)


def g_zero(idx):
    rsl = rows[:R >> 4]                      # static slice, tiled up
    rblk = jnp.tile(rsl, (16, 1))
    def body(_, s):
        node, tb, fc = s
        return trav_math(rblk, node, tb, fc, N)
    return jax.lax.fori_loop(0, K, body,
                             (idx, jnp.full((R,), 1e30), idx * 0 - 1))


bench("G_zero(no gather)", g_zero, idx0)


def g_only(idx):
    def body(_, s):
        node, acc = s
        r = rows[node]
        node = (node + jnp.int32(1)) % N     # index dep is trivial
        return node, acc + r[:, 0]
    return jax.lax.fori_loop(0, K, body, (idx, jnp.zeros((R,))))


bench("G_only(seq idx)", g_only, idx0)


def g_only_dep(idx):
    def body(_, s):
        node, acc = s
        r = rows[node]
        node = jnp.abs(r[:, 0] * 1e6).astype(jnp.int32) % N  # data-dep
        return node, acc + r[:, 0]
    return jax.lax.fori_loop(0, K, body, (idx, jnp.zeros((R,))))


bench("G_only(data-dep idx)", g_only_dep, idx0)


def chain(idx):
    def body(_, i):
        return nxt[i]
    return jax.lax.fori_loop(0, K, body, idx)


bench("CHAIN nxt[i]", chain, idx0)

# HLO summary of the baseline
txt = jax.jit(g_rand).lower(idx0).compile().as_text()
import re
ops = re.findall(r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ ([\w-]+)\(", txt,
                 re.MULTILINE)
from collections import Counter
print("HLO ops:", dict(Counter(ops).most_common(12)), flush=True)
gl = [l.strip()[:200] for l in txt.splitlines() if "gather" in l]
print("gather lines:", len(gl), flush=True)
for l in gl[:6]:
    print("  ", l, flush=True)
