"""Parameter-space priors for inverse rendering.

The detach-topology gradient estimator (SURVEY §7 M4) only yields
geometry signal through smooth channels (hit depth, shading normals),
so per-vertex gradients are sparse and noisy at low spp. A mesh
smoothness prior spreads that signal across the surface — the standard
inverse-rendering regularizer (e.g. "Large Steps in Inverse Rendering
of Geometry", Nicolet et al. 2021, whose preconditioner is the same
uniform Laplacian used here as a penalty).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def mesh_edges(faces: np.ndarray, num_vertices: int):
    """Unique undirected edges (E, 2) + per-vertex degree (V,) from an
    (F, 3) int face array (invalid/padded faces should be pre-filtered
    by the caller)."""
    f = np.asarray(faces, np.int64)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    e = np.unique(e, axis=0)
    deg = np.zeros(num_vertices, np.int64)
    np.add.at(deg, e[:, 0], 1)
    np.add.at(deg, e[:, 1], 1)
    return e, deg


def make_laplacian_reg(faces, face_valid, num_vertices: int,
                       weight: float, field: str = "vertex_offsets"):
    """`params -> scalar`: uniform-Laplacian smoothness penalty
    weight * mean(||x_i - mean_{j~i} x_j||^2) over vertices with
    neighbors, applied to `params.<field>` (V, 3). Edge structure is
    built once on the host; the returned closure is jit-safe."""
    f = np.asarray(faces)
    v = np.asarray(face_valid)
    edges, deg = mesh_edges(f[v.astype(bool)], num_vertices)
    e0 = jnp.asarray(edges[:, 0])
    e1 = jnp.asarray(edges[:, 1])
    degree = jnp.asarray(np.maximum(deg, 1), jnp.float32)[:, None]
    has_nbrs = jnp.asarray(deg > 0)[:, None]
    n_active = max(int((deg > 0).sum()), 1)

    def reg(params):
        x = getattr(params, field)
        nb_sum = (jnp.zeros_like(x).at[e0].add(x[e1]).at[e1].add(x[e0]))
        lap = jnp.where(has_nbrs, x - nb_sum / degree, 0.0)
        return weight * jnp.sum(lap * lap) / n_active

    return reg


def make_vertex_preconditioner(faces, face_valid, num_vertices: int,
                               k: int = 10, alpha: float = 0.7,
                               field: str = "vertex_offsets"):
    """Laplacian-preconditioned per-vertex parameterization ("Large
    Steps in Inverse Rendering of Geometry", Nicolet et al. 2021): the
    optimizer's variable u is mapped to vertex offsets through k Jacobi
    diffusion steps x <- (1-alpha) x + alpha * neighbor_mean(x) — a
    polynomial approximation of the (I + lambda L)^-1 solve the paper
    performs with sparse Cholesky. Gradients flow through the smoothing
    (the transpose spreads each pixel's sparse vertex gradient over a
    k-ring), so plain Adam on u takes the paper's "large steps" while
    the realized offsets stay per-vertex (full resolution, unlike the
    frequency-limited displacement lattice).

    Returns `params -> params` for make_fit_step(param_map=...); the
    stored params then live in u-space — realize the final offsets by
    applying the returned map once."""
    f = np.asarray(faces)
    v = np.asarray(face_valid)
    edges, deg = mesh_edges(f[v.astype(bool)], num_vertices)
    e0 = jnp.asarray(edges[:, 0])
    e1 = jnp.asarray(edges[:, 1])
    degree = jnp.asarray(np.maximum(deg, 1), jnp.float32)[:, None]
    has_nbrs = jnp.asarray(deg > 0)[:, None]

    def smooth(x):
        def body(_, x):
            nb = jnp.zeros_like(x).at[e0].add(x[e1]).at[e1].add(x[e0])
            return jnp.where(has_nbrs,
                             (1.0 - alpha) * x + alpha * nb / degree, x)
        return jax.lax.fori_loop(0, k, body, x)

    def pmap(params):
        return params.replace(**{field: smooth(getattr(params, field))})

    return pmap
