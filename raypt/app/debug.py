"""Debug-mode numerical checks (SURVEY §5.2).

The reference's only memory/numerics safety net is CUDA_CHECK-style
fail-fast (utils/CUDAHelper.h:7-22) plus race-freedom by construction.
JAX gives the same race-freedom through purity; what it does NOT give
by default is NaN/Inf detection inside a jitted render. This module
adds it: `checked_render_frame` runs one progressive frame under
`jax.experimental.checkify` with float (NaN/Inf), index out-of-bounds,
and divide-by-zero checks threaded through every scan/while-loop of the
integrator, and returns a structured error alongside the image.

Use for debugging only — the error plumbing adds arrays to every loop
carry, so it costs real throughput. The production path stays
check-free (fail-fast like the reference).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.experimental import checkify

from ..core.types import RenderConfig, Scene

DEFAULT_CHECKS = (checkify.float_checks | checkify.index_checks
                  | checkify.div_checks | checkify.user_checks)


@partial(jax.jit, static_argnames=("cfg",))
def _checked_impl(scene, cfg, key, frame_index, bvh):
    from ..render.integrator import make_finder, render_sample
    from ..rng import frame_key, sample_key
    import jax.numpy as jnp

    def run(scene, key, frame_index, bvh):
        finder = make_finder(scene, cfg, bvh)
        fkey = frame_key(key, frame_index)

        def one(s, acc):
            return acc + render_sample(scene, cfg, sample_key(fkey, s),
                                       finder)

        acc = jax.lax.fori_loop(
            0, cfg.samples_per_pixel, one,
            jnp.zeros((cfg.height, cfg.width, 3), jnp.float32))
        return acc / cfg.samples_per_pixel

    checked = checkify.checkify(run, errors=DEFAULT_CHECKS)
    return checked(scene, key, frame_index, bvh)


def checked_render_frame(scene: Scene, cfg: RenderConfig, key: jax.Array,
                         frame_index=0, bvh=None,
                         throw: bool = True):
    """render_frame with NaN/Inf/OOB/div0 checks. Returns (err, image);
    with throw=True (default) raises checkify.JaxRuntimeError on the
    first detected fault instead.

    Known limits: the Pallas backends ("dense" small-scene auto path,
    "cluster") are opaque to checkify — use backend="bvh" or
    "bruteforce" when debugging numerics."""
    import jax.numpy as jnp
    err, img = _checked_impl(scene, cfg, key, jnp.asarray(frame_index), bvh)
    if throw:
        checkify.check_error(err)
    return err, img
