"""Minimal on-TPU probe for pallas_topwalk: synthetic encoded table +
random rays — compiles ONLY the kernel (no scene build), to localize
the round-2 BENCH device fault with the fewest remote-compile round
trips. Sizes via env: WALK_NODES (top-tree rows), WALK_RAYS, WALK_WORDS,
WALK_UNROLL.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/raypt_xla_cache")

NODES = int(os.environ.get("WALK_NODES", 63))
RAYS = int(os.environ.get("WALK_RAYS", 1024))
WORDS = int(os.environ.get("WALK_WORDS", 8))
UNROLL = int(os.environ.get("WALK_UNROLL", 4))

from raypt.accel.ctree import decode_digits  # noqa: E402
from raypt.kernels.onehot_walk import pallas_topwalk  # noqa: E402


def synth_table(n: int, words: int, seed: int = 0) -> np.ndarray:
    """A valid skip-link topology: a left-spine binary tree over n
    nodes (ids in DFS preorder), every odd node a leaf with a cluster
    id, boxes nested so some rays hit and some miss."""
    rng = np.random.default_rng(seed)
    rows = np.zeros((n, 16), np.float32)
    # chain: node i internal -> left=i+1, skip=-1 at root path ends
    n_clusters = words * 32
    cl = 0
    for i in range(n):
        is_leaf = (i % 2 == 1) or i == n - 1
        lo = rng.uniform(-1, 0.0, 3)
        hi = rng.uniform(0.1, 1, 3)
        rows[i, 0:3] = lo
        rows[i, 3:6] = hi
        left = i + 1 if not is_leaf and i + 1 < n else -1
        skip = i + 1 if is_leaf and i + 1 < n else -1
        cluster = (cl % n_clusters) if is_leaf else -1
        if is_leaf:
            cl += 1
        for base, v in ((6, left), (8, skip), (10, cluster)):
            rows[i, base] = (v + 1) // 128
            rows[i, base + 1] = (v + 1) % 128
        rows[i, 12] = 1.0 if is_leaf else 0.0
        rows[i, 13] = 1.0
    return rows


def walk_numpy(tab, ro, rd, t0, words):
    """Host-side oracle (no second TPU compile): same walk semantics as
    walk_topwalk_jnp over the f32 view of the encoded table."""
    r = ro.shape[0]
    inv = 1.0 / np.where(np.abs(rd) > 1e-12, rd,
                         np.where(rd >= 0, 1e-12, -1e-12))
    node = np.zeros(r, np.int64)
    mask = np.zeros((r, words), np.int64)

    def dec(hi, lo):
        return (np.round(hi) * 128 + np.round(lo)).astype(np.int64) - 1

    live = node >= 0
    while live.any():
        rr = tab[np.clip(node, 0, None)]
        ok_row = (rr[:, 13] > 0.5) & live
        tn1 = (rr[:, 0:3] - ro) * inv
        tn2 = (rr[:, 3:6] - ro) * inv
        tnear = np.max(np.minimum(tn1, tn2), axis=-1)
        tfar = np.min(np.maximum(tn1, tn2), axis=-1)
        nonempty = np.all(rr[:, 0:3] <= rr[:, 3:6], axis=-1)
        hit = (tfar >= tnear) & (tnear < t0) & (tfar > 0) & nonempty & ok_row
        is_leaf = rr[:, 12] > 0.5
        cid = dec(rr[:, 10], rr[:, 11])
        want = hit & is_leaf & (cid >= 0)
        w = np.where(want, cid >> 5, 0)
        bit = np.where(want, 1 << (cid & 31), 0)
        mask[np.arange(r), w] |= bit
        nxt = np.where(hit & ~is_leaf, dec(rr[:, 6], rr[:, 7]),
                       dec(rr[:, 8], rr[:, 9]))
        node = np.where(live, nxt, node)
        live = node >= 0
    return mask.astype(np.int32)


def run_one(nodes: int, rays: int, words: int, unroll: int,
            check_parity: bool = True):
    tab = jnp.asarray(synth_table(nodes, words), jnp.bfloat16)
    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.uniform(-2, 2, (rays, 3)), jnp.float32)
    rd = rng.normal(size=(rays, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd, jnp.float32)
    t0 = jnp.full((rays,), 1e30)
    act = jnp.ones((rays,), bool)

    t = time.time()
    mask = pallas_topwalk(tab, ro, rd, t0, act, words, unroll=unroll)
    jax.block_until_ready(mask)
    print(f"[n={nodes} r={rays} w={words} u={unroll}] "
          f"compiled+ran in {time.time()-t:.1f}s", flush=True)

    if check_parity:
        ref = walk_numpy(np.asarray(tab, np.float32), np.asarray(ro),
                         np.asarray(rd), np.asarray(t0), words)
        ok = bool(np.array_equal(np.asarray(mask), ref))
        pm = float(jnp.mean(jnp.sum(jnp.unpackbits(
            mask.view(jnp.uint8), axis=-1), axis=-1)))
        print(f"  parity={'OK' if ok else 'FAIL'} popmean={pm:.2f}",
              flush=True)

    times = []
    for _ in range(3):
        t = time.time()
        jax.block_until_ready(
            pallas_topwalk(tab, ro, rd, t0, act, words, unroll=unroll))
        times.append(time.time() - t)
    print(f"  steady {min(times)*1e3:.2f} ms "
          f"({rays/min(times)/1e6:.1f} Mray/s walk)", flush=True)


def main():
    print(f"devices={jax.devices()}", flush=True)
    ladder = os.environ.get(
        "WALK_LADDER",
        f"{NODES}:{RAYS}:{WORDS}:{UNROLL}")
    for item in ladder.split(","):
        n, r, w, u = (int(x) for x in item.split(":"))
        run_one(n, r, w, u, check_parity=r <= 1 << 17)
    print("done", flush=True)


if __name__ == "__main__":
    main()
