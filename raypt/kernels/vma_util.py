"""Varying-mesh-axes plumbing for Pallas kernels under shard_map.

With jax's check_vma=True (the default for jax.shard_map), a
pallas_call inside a shard_map body must declare which mesh axes its
outputs vary over. The kernels here are purely per-ray, so the outputs
vary exactly over whatever axes the ray inputs vary over — mirror it.
Outside shard_map the set is empty and vma-tagged out_shapes behave
exactly like plain ones.
"""
from __future__ import annotations

import jax


def vma_of(*arrays) -> frozenset:
    """Union of the varying-axes sets of the given arrays/tracers."""
    out: frozenset = frozenset()
    for a in arrays:
        try:
            out = out | jax.typeof(a).vma
        except (AttributeError, TypeError):
            pass
    return out


def pvary_to(vma: frozenset, *arrays):
    """Lift every array to vary over (at least) the axes in `vma` with
    jax.lax.pvary — a pure type cast, no data movement. Needed because
    a kernel mixing replicated operands (accel tables) with varying
    ones (rays) would otherwise fail interpret-mode while_loop carry
    type checks under shard_map's check_vma."""
    if not vma:
        return arrays
    out = []
    for a in arrays:
        have = vma_of(a)
        need = vma - have
        out.append(jax.lax.pvary(a, tuple(sorted(need))) if need else a)
    return tuple(out)
