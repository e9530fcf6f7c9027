"""Checkpoint / resume for progressive rendering and inverse-rendering
jobs.

The reference has nothing here (SURVEY §5.3-5.4: the accumulation
buffer dies on resize/exit and there is no retry/restart). The north
star requires multi-host inverse-rendering jobs to be resumable, so we
persist: accumulated radiance + frame index + RNG key, and for
optimization runs the parameter pytree + optimizer state. Plain npz
keeps this dependency-free; pytrees are flattened with their treedef
paths as keys.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree):
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_render_state(path: str, accum, frame_index: int, key) -> None:
    np.savez_compressed(path, accum=np.asarray(accum),
                        frame_index=np.int64(frame_index),
                        key=np.asarray(jax.random.key_data(key)))


def load_render_state(path: str):
    z = np.load(path)
    key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
    return jnp.asarray(z["accum"]), int(z["frame_index"]), key


def save_pytree(path: str, tree, step: int = 0, meta: dict | None = None) -> None:
    """Save any pytree (params, optimizer state) with structure metadata."""
    flat = _flatten(tree)
    flat["__step__"] = np.int64(step)
    if meta:
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **flat)


def load_pytree(path: str, like):
    """Restore into the structure of `like` (same treedef)."""
    z = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    paths = jax.tree_util.tree_leaves_with_path(like)
    new_leaves = []
    for (p, leaf) in paths:
        key = "/".join(str(x) for x in p)
        if key in z:
            new_leaves.append(jnp.asarray(z[key]))
        else:
            raise KeyError(f"checkpoint missing leaf {key}")
    step = int(z["__step__"]) if "__step__" in z else 0
    return jax.tree_util.tree_unflatten(treedef, new_leaves), step


# ---------------------------------------------------------------------------
# Orbax backend (optional): async-capable, multi-host-aware checkpointing
# for long inverse-rendering jobs. Same pytree contract as
# save_pytree/load_pytree; orbax handles sharded arrays per host so a
# pod-slice job can checkpoint without gathering to host 0.
# ---------------------------------------------------------------------------


def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except Exception:
        return False


def save_pytree_orbax(path: str, tree, step: int = 0) -> None:
    """Save a pytree via orbax (directory-based; absolute path)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, str(step)), tree, force=True)


def load_pytree_orbax(path: str, like, step: int = 0):
    """Restore a pytree saved by save_pytree_orbax into `like`'s
    structure (and shardings, when `like` holds sharded jax.Arrays)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, str(step)), item=like)
    return restored, step
