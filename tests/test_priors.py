"""Tests for raypt.diff.priors (mesh-Laplacian smoothness prior) and
the param_reg hook on the fit steps."""
import numpy as np
import jax
import jax.numpy as jnp

from raypt.diff.priors import make_laplacian_reg, mesh_edges


def test_mesh_edges_unique_and_degree():
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    e, deg = mesh_edges(faces, 5)
    # edges: 01 02 12 13 23 (12 shared, counted once)
    assert len(e) == 5
    np.testing.assert_array_equal(deg, [2, 3, 3, 2, 0])


def test_laplacian_zero_for_linear_field():
    """A field x -> A x + b has zero umbrella Laplacian only on a
    symmetric neighborhood; use a constant field, which is always
    lap-free."""
    faces = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]])
    valid = np.ones(3, bool)
    reg = make_laplacian_reg(faces, valid, 6, weight=10.0)

    class P:
        vertex_offsets = jnp.ones((6, 3)) * 3.14
    assert float(reg(P())) < 1e-12


def test_laplacian_penalizes_spike():
    faces = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]])
    valid = np.ones(3, bool)
    reg = make_laplacian_reg(faces, valid, 6, weight=1.0)

    class P:
        vertex_offsets = jnp.zeros((6, 3)).at[2, 0].set(1.0)
    assert float(reg(P())) > 0.01
    # padded / isolated vertex (5) contributes nothing

    class Q:
        vertex_offsets = jnp.zeros((6, 3)).at[5, 0].set(100.0)
    assert float(reg(Q())) == 0.0


def test_laplacian_grad_finite_and_jittable():
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    valid = np.ones(2, bool)
    reg = make_laplacian_reg(faces, valid, 4, weight=2.0)

    class P:
        vertex_offsets = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)

    def f(x):
        class Q:
            vertex_offsets = x
        return reg(Q())

    g = jax.jit(jax.grad(f))(P.vertex_offsets)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0


def test_param_reg_hook_changes_updates():
    """make_fit_step(param_reg=...) adds the prior's gradient."""
    import optax
    from raypt import RenderConfig
    from raypt.core.scene import MaterialDef, SceneBuilder
    from raypt.diff.inverse import make_fit_step, stack_views
    from raypt.diff.params import SceneParams

    b = SceneBuilder()
    m = b.add_material(MaterialDef(albedo=(0.5, 0.5, 0.5)))
    tris = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(tris, np.tile([[0, 0, 1]], (3, 1)).astype(np.float32),
               np.array([[0, 1, 2]]), material=m)
    b.camera.viewport_width = b.camera.viewport_height = 8
    b.camera.position = (0.3, 0.3, 2.0)
    scene = b.freeze()
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1,
                       num_bounces=1, backend="bruteforce",
                       russian_roulette=False)
    key = jax.random.key(0)
    views = stack_views([scene.camera])
    targets = jnp.zeros((1, 8, 8, 3))

    def reg(p):
        return 1e3 * jnp.sum(p.vertex_offsets ** 2)

    opt = optax.sgd(1e-3)
    params0 = SceneParams.init(scene)
    # seed a nonzero offset so the reg gradient is nonzero
    params0 = params0.replace(
        vertex_offsets=params0.vertex_offsets.at[0, 0].set(0.5))
    state0 = opt.init(params0)

    step_plain = make_fit_step(scene, cfg, opt, ("vertex_offsets",))
    step_reg = make_fit_step(scene, cfg, opt, ("vertex_offsets",),
                             param_reg=reg)
    p1, _, l1 = step_plain(params0, state0, views, targets, key)
    p2, _, l2 = step_reg(params0, state0, views, targets, key)
    assert float(l2) > float(l1)          # loss includes the prior
    assert not np.allclose(np.asarray(p1.vertex_offsets),
                           np.asarray(p2.vertex_offsets))


def test_vertex_preconditioner_constant_and_spread():
    """The Jacobi-diffusion preconditioner (Nicolet 2021 approximation)
    must (a) preserve constant fields exactly and (b) spread a
    single-vertex cotangent over the neighborhood in u-space."""
    import jax
    import jax.numpy as jnp
    from raypt.diff.params import SceneParams
    from raypt.diff.priors import make_vertex_preconditioner
    from raypt.core.scene import MaterialDef, SceneBuilder

    b = SceneBuilder()
    m0 = b.add_material(MaterialDef(albedo=(0.5, 0.5, 0.5)))
    # small grid mesh
    import numpy as np
    n = 5
    xs = np.linspace(0, 1, n)
    X, Y = np.meshgrid(xs, xs)
    P = np.stack([X, Y, np.zeros_like(X)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [(a, a + 1, a + n), (a + 1, a + n + 1, a + n)]
    b.add_mesh(P, np.tile([0, 0, 1.0], (len(P), 1)), np.asarray(faces),
               material=m0)
    scene = b.freeze(pad=False)

    pmap = make_vertex_preconditioner(scene.mesh.faces,
                                      scene.mesh.face_valid,
                                      scene.mesh.num_vertices, k=6)
    params = SceneParams.init(scene)
    const = params.replace(
        vertex_offsets=jnp.ones_like(params.vertex_offsets) * 0.3)
    out = pmap(const)
    assert np.allclose(np.asarray(out.vertex_offsets), 0.3, atol=1e-6)

    def loss(p):
        # touches only vertex 12 of the REALIZED offsets
        return pmap(p).vertex_offsets[12, 2]

    g = jax.grad(loss)(params).vertex_offsets[:, 2]
    g = np.asarray(g)
    assert (np.abs(g) > 1e-6).sum() > 8, "cotangent did not spread"
    assert abs(g.sum() - 1.0) < 1e-5   # diffusion is mass-preserving
