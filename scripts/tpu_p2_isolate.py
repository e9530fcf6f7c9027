import time, jax, jax.numpy as jnp
from raypt.scenes import stanford_bunny
from raypt.accel import build
from raypt.accel.packed import pack_cherries, traverse_wavefront2
b = stanford_bunny()
scene = b.freeze()
bvh = jax.jit(build)(scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
jax.block_until_ready(bvh.bmin)
print("lbvh ok", flush=True)
p2 = jax.jit(pack_cherries)(bvh, scene.mesh.positions, scene.mesh.faces, scene.mesh.face_valid)
jax.block_until_ready(p2.rows)
print("pack_cherries ok", p2.rows.shape, flush=True)
ni = scene.mesh.num_faces - 1
print("cherries:", float(jnp.sum(p2.rows[:ni, 21])), flush=True)
ro = jnp.zeros((4096, 3)) + jnp.array([0., 1., 3.])
import numpy as np
rng = np.random.default_rng(0)
rd = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
t0 = jnp.full((4096,), 1e30)
a = jnp.ones((4096,), bool)
f = jax.jit(lambda *args: traverse_wavefront2(p2, *args))
t, face = f(ro, rd, t0, a)
jax.block_until_ready(t)
print("traverse ok, hits:", int(jnp.sum(face >= 0)), flush=True)
