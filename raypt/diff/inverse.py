"""Inverse rendering: recover scene parameters from target images by
gradient descent (BASELINE config #5: "recover bunny vertex offsets +
albedo from 16 target views ... sharded across a multi-host pod slice").

New capability vs the reference (which renders forward only). The
optimizer is optax; the render inside the loss is the same integrator
the forward path uses — only `recompute_hit` carries tangents, the BVH
walk stays detached (SURVEY §7 M4).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..accel import lbvh as lbvh_mod
from ..core.types import CameraRays, RenderConfig, Scene
from ..render.integrator import make_finder, render_frame
from .params import SceneParams, apply_params, freeze_except


def stack_views(views: Sequence[CameraRays]) -> CameraRays:
    """Stack per-view camera frames into one pytree with leading axis K."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *views)


def view_at(views: CameraRays, k) -> CameraRays:
    return jax.tree_util.tree_map(lambda x: x[k], views)


def l2_image_loss(img, target, mask=None):
    d = (img - target) ** 2
    if mask is not None:
        d = d * mask[..., None] if mask.ndim == d.ndim - 1 else d * mask
    return jnp.mean(d)


def make_fit_step(scene: Scene, cfg: RenderConfig, optimizer,
                  trainable: Sequence[str],
                  bvh: Optional[lbvh_mod.LBVH] = None,
                  loss_fn: Callable = l2_image_loss,
                  refit: bool = True,
                  render_fn: Callable = None,
                  param_reg: Callable = None,
                  param_map: Callable = None):
    """Build a jitted optimization step over K target views.

    step(params, opt_state, views(K-stacked), targets (K,H,W,3), key)
      -> (params, opt_state, loss)

    When `refit` and a BVH is given, its AABBs are recomputed from the
    *current* vertex offsets each step (topology fixed — the LBVH refit
    path, accel.lbvh.refit), keeping traversal correct while vertices
    move without a full rebuild.

    param_reg: optional `params -> scalar` prior added to the loss
    (e.g. a mesh-Laplacian smoothness penalty on vertex_offsets).
    param_map: optional `params -> params` reparameterization applied
    inside the loss (so gradients flow through it) — e.g. the
    Laplacian-smoothing preconditioner of priors.make_vertex_preconditioner
    (Nicolet et al. 2021 'large steps'). The stored params then live in
    u-space; realize the final scene with apply_params(scene,
    param_map(params)).
    """
    trainable = tuple(trainable)
    render_fn = render_fn or _render

    @jax.jit
    def step_fn(params: SceneParams, opt_state, views: CameraRays,
                targets: jax.Array, key: jax.Array):
        def loss_over_views(p):
            if param_map is not None:
                p = param_map(p)
            s = apply_params(scene, p)
            the_bvh = bvh
            if the_bvh is not None and refit:
                the_bvh = lbvh_mod.refit(the_bvh, s.mesh.positions,
                                         s.mesh.faces, s.mesh.face_valid)
            finder = make_finder(s, cfg, the_bvh)
            k = targets.shape[0]

            def one_view(i, acc):
                sv = s.replace(camera=view_at(views, i))
                img = render_fn(sv, cfg, jax.random.fold_in(key, i),
                                finder)
                return acc + loss_fn(img, targets[i])
            total = jax.lax.fori_loop(0, k, one_view, jnp.float32(0.0))
            return total / k

        loss, grads = jax.value_and_grad(loss_over_views)(params)
        if param_reg is not None:
            reg, reg_grads = jax.value_and_grad(param_reg)(params)
            loss = loss + reg
            grads = jax.tree_util.tree_map(jnp.add, grads, reg_grads)
        grads = freeze_except(grads, trainable)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    return step_fn


def _render(scene, cfg, key, finder):
    from ..render.integrator import render_sample
    from ..rng import frame_key, sample_key
    fkey = frame_key(key, 0)

    def one(s, acc):
        return acc + render_sample(scene, cfg, sample_key(fkey, s), finder)
    # accumulator derived from the camera so its sharding "varying" type
    # matches the loop body when rendering view-sharded under shard_map
    zero = jnp.sum(scene.camera.origin) * 0.0
    acc = jax.lax.fori_loop(0, cfg.samples_per_pixel, one,
                            jnp.zeros((cfg.height, cfg.width, 3)) + zero)
    return acc / cfg.samples_per_pixel


def render_rgbd(scene: Scene, cfg: RenderConfig, key, finder):
    """(H, W, 4) radiance + primary-hit depth. Depth carries smooth
    gradients w.r.t. vertex offsets through the differentiable hit
    recompute — the well-posed supervision channel for geometry
    recovery (RGB-only losses see geometry mainly through visibility,
    which the detach-topology estimator deliberately does not
    differentiate, SURVEY §7 'Hard parts')."""
    import jax.numpy as jnp

    from ..accel.traverse import recompute_hit
    from ..core.math3d import normalize
    from ..render.integrator import camera_rays_for_ids, pixel_id_grid

    rgb = _render(scene, cfg, key, finder)
    ids_grid = pixel_id_grid(cfg)
    jitter = jnp.full((cfg.height, cfg.width, 2), 0.5)
    ro, rd = camera_rays_for_ids(scene, cfg, ids_grid, jitter)
    rd = normalize(rd)
    # active mask derived from the rays so its sharding "varying" type
    # matches the traversal loop carries under shard_map
    act = rd[..., 0] * 0.0 < 1.0
    hids = finder(scene, ro, rd, active=act)
    hit = recompute_hit(scene, ro, rd, hids)
    depth = jnp.where(hit.valid, hit.t, 0.0)
    return jnp.concatenate([rgb, depth[..., None]], axis=-1)


def make_fit_step_sharded(scene: Scene, cfg: RenderConfig, optimizer,
                          trainable: Sequence[str], mesh,
                          bvh: Optional[lbvh_mod.LBVH] = None,
                          loss_fn: Callable = l2_image_loss,
                          refit: bool = True,
                          render_fn: Callable = None,
                          param_reg: Callable = None,
                          param_map: Callable = None):
    """View-sharded fit step (BASELINE config #5: 16 target views,
    gradient descent sharded over the pod slice).

    param_reg: optional `params -> scalar` prior added to the loss —
    applied OUTSIDE shard_map on the replicated params, so its
    gradient is not multiplied by the mesh size by the replicated-input
    transpose psum.

    Views are the data axis: each device renders + differentiates its
    own K/n view slice against its target slice under `shard_map`; the
    per-view losses psum over the 'views' mesh axis and the parameter
    cotangents all-reduce automatically (params enter replicated, so
    AD's transpose of the implicit broadcast IS the cross-chip grad
    reduction, overlappable with backward compute by XLA).

    step(params, opt_state, views(K-stacked), targets (K,H,W,3), key)
      -> (params, opt_state, loss); K must divide by the mesh size.
    """
    from jax.sharding import PartitionSpec as P
    trainable = tuple(trainable)
    n = mesh.devices.size
    render_fn = render_fn or _render

    @jax.jit
    def step_fn(params: SceneParams, opt_state, views: CameraRays,
                targets: jax.Array, key: jax.Array):
        k_total = targets.shape[0]
        assert k_total % n == 0, (k_total, n)

        # check_vma=False (round 5): the flagship onehot finder's
        # interpret-mode Pallas kernels don't propagate varying-axes
        # tags through their kernel-trace ops, so the vma audit false-
        # positives on in-kernel while_loop carries. With the audit
        # off, AD no longer inserts the replicated-param cotangent
        # psum — the explicit psum on grads below replaces it
        # (oracle-checked in tests/test_dist.py sharded-fit parity).
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P("views"), P("views")),
                 out_specs=(P(), P()), check_vma=False)
        def shard_loss_grad(p, views_l, targets_l):
            def local_loss(p):
                if param_map is not None:
                    p = param_map(p)
                s = apply_params(scene, p)
                the_bvh = bvh
                if the_bvh is not None and refit:
                    the_bvh = lbvh_mod.refit(the_bvh, s.mesh.positions,
                                             s.mesh.faces, s.mesh.face_valid)
                finder = make_finder(s, cfg, the_bvh)
                k_local = targets_l.shape[0]
                base = jax.lax.axis_index("views") * k_local

                def one_view(i, acc):
                    sv = s.replace(camera=view_at(views_l, i))
                    img = render_fn(sv, cfg,
                                    jax.random.fold_in(key, base + i),
                                    finder)
                    return acc + loss_fn(img, targets_l[i])

                # init derived from the sharded targets so its sharding
                # "varying" type matches the loop body under shard_map
                total = jax.lax.fori_loop(0, k_local, one_view,
                                          jnp.sum(targets_l) * 0.0)
                # psum happens OUTSIDE the differentiated function:
                # under check_vma=False an in-loss psum transposes to
                # psum (not the identity pbroadcast), multiplying every
                # shard's cotangent by the mesh size (caught as exactly
                # 8x grads by test_view_sharded_vertex_offset_recovery)
                return total / k_total

            l, g = jax.value_and_grad(local_loss)(p)
            return jax.lax.psum(l, "views"), jax.lax.psum(g, "views")

        loss, grads = shard_loss_grad(params, views, targets)
        if param_reg is not None:
            reg, reg_grads = jax.value_and_grad(param_reg)(params)
            loss = loss + reg
            grads = jax.tree_util.tree_map(jnp.add, grads, reg_grads)
        grads = freeze_except(grads, trainable)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    return step_fn


def fit(scene: Scene, cfg: RenderConfig, views: Sequence[CameraRays],
        targets: jax.Array, trainable: Sequence[str],
        steps: int = 100, learning_rate: float = 1e-2,
        bvh: Optional[lbvh_mod.LBVH] = None, key: Optional[jax.Array] = None,
        resample_noise: bool = False, callback=None, mesh=None):
    """Run inverse rendering; returns (params, losses).

    resample_noise=False keeps the RNG streams fixed across steps (zero
    loss floor when targets were rendered with the same key — the usual
    'correlated samples' trick for low-spp inverse rendering);
    True redraws every step for unbiased stochastic gradients.
    mesh: a jax.sharding.Mesh with a 'views' axis shards the target
    views over devices (BASELINE config #5)."""
    key = key if key is not None else jax.random.key(0)
    params = SceneParams.init(scene)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    stacked = stack_views(list(views))
    if mesh is not None:
        step_fn = make_fit_step_sharded(scene, cfg, optimizer, trainable,
                                        mesh, bvh=bvh)
    else:
        step_fn = make_fit_step(scene, cfg, optimizer, trainable, bvh=bvh)
    losses = []
    for i in range(steps):
        k = jax.random.fold_in(key, i) if resample_noise else key
        params, opt_state, loss = step_fn(params, opt_state, stacked,
                                          targets, k)
        losses.append(float(loss))
        if callback is not None:
            callback(i, params, float(loss))
    return params, losses
