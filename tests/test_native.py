"""Native C++ host runtime vs the Python implementations."""
import os

import numpy as np
import pytest

from raypt.io.native import (available, build_midpoint_bvh, load_obj_native,
                             morton_order, smooth_normals_native)
from raypt.io.obj import load_obj, smooth_normals

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library not built")

REF_OBJ = "/root/reference/data/stanford-bunny.obj"


def test_native_obj_matches_python(tmp_path):
    p = tmp_path / "mesh.obj"
    p.write_text("""v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
f 1 2 3 4
f 1 2 5
f -1 -2 -3
""")
    a = load_obj_native(str(p))
    b = load_obj(str(p), use_native=False)
    assert np.allclose(a["positions"], b["positions"])
    assert np.array_equal(a["faces"], b["faces"])
    assert np.allclose(a["normals"], b["normals"], atol=1e-5)


def test_native_declines_split_corners(tmp_path):
    """Files with v/vt/vn corners need Python corner-splitting."""
    p = tmp_path / "split.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
                 "f 1/1 2/2 3/3\n")
    assert load_obj_native(str(p)) is None
    m = load_obj(str(p))  # falls back transparently
    assert m["faces"].shape == (1, 3)
    assert m["uvs"].max() == 1.0


@pytest.mark.skipif(not os.path.exists(REF_OBJ), reason="bunny absent")
def test_native_bunny():
    m = load_obj_native(REF_OBJ)
    assert m["positions"].shape == (35947, 3)
    assert m["faces"].shape == (69451, 3)
    m2 = load_obj(REF_OBJ, use_native=False)
    assert np.allclose(m["positions"], m2["positions"])
    assert np.array_equal(m["faces"], m2["faces"])


def test_native_smooth_normals():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    faces = rng.integers(0, 30, (40, 3))
    a = smooth_normals_native(pos, faces)
    b = smooth_normals(pos, faces)
    assert np.allclose(a, b, atol=1e-5)


def test_native_midpoint_bvh_invariants():
    rng = np.random.default_rng(1)
    ntri = 500
    pos = rng.uniform(-10, 10, (ntri * 3, 3)).astype(np.float32)
    faces = np.arange(ntri * 3).reshape(ntri, 3)
    bvh = build_midpoint_bvh(pos, faces)
    n = bvh["nodes_used"]
    meta = bvh["meta"][:n]
    # leaf counts partition the triangles (reference audit, BVH.cpp:37-42)
    leaf = meta[:, 1] > 0
    assert meta[leaf, 1].sum() == ntri
    assert sorted(bvh["order"].tolist()) == list(range(ntri))
    # parent bounds contain child bounds
    bounds = bvh["bounds"][:n]
    for i in np.nonzero(~leaf)[0]:
        l = meta[i, 0]
        for ch in (l, l + 1):
            assert np.all(bounds[i, :3] <= bounds[ch, :3] + 1e-4)
            assert np.all(bounds[i, 3:] >= bounds[ch, 3:] - 1e-4)


def test_native_morton_order():
    rng = np.random.default_rng(2)
    c = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    mo = morton_order(c)
    codes = mo["codes"][mo["order"]]
    assert np.all(np.diff(codes.astype(np.int64)) >= 0)
    assert sorted(mo["order"].tolist()) == list(range(1000))


def test_sah_bvh_parity(rng):
    """Native SAH tree converted to the device layout matches the
    brute-force oracle through the packed traversal."""
    import jax.numpy as jnp
    from raypt.accel import build_sah, pack, find_closest_packed, \
        find_closest_bruteforce
    from raypt.core.scene import MaterialDef, SceneBuilder
    from raypt.core.math3d import normalize
    b = SceneBuilder()
    m0 = b.add_material(MaterialDef())
    for _ in range(200):
        base = rng.uniform(-5, 5, 3)
        b.add_triangle(base, base + rng.uniform(-1, 1, 3),
                       base + rng.uniform(-1, 1, 3), m0)
    scene = b.freeze()
    sah = build_sah(scene.mesh)
    assert sah is not None
    pb = pack(sah, scene.mesh.positions, scene.mesh.faces,
              scene.mesh.face_valid)
    ro = jnp.asarray(rng.uniform(-6, 6, (1024, 3)).astype(np.float32))
    rd = normalize(jnp.asarray(rng.normal(size=(1024, 3)).astype(np.float32)))
    a = find_closest_bruteforce(scene, ro, rd)
    c = find_closest_packed(scene, pb, ro, rd, tile=256)
    assert np.allclose(np.asarray(a.t), np.asarray(c.t),
                       rtol=1e-4, atol=1e-4)


def test_sah_skip_links_cover_all_leaves(rng):
    from raypt.accel import build_sah
    from raypt.core.scene import MaterialDef, SceneBuilder
    b = SceneBuilder()
    m0 = b.add_material(MaterialDef())
    for _ in range(50):
        base = rng.uniform(-5, 5, 3)
        b.add_triangle(base, base + rng.uniform(-1, 1, 3),
                       base + rng.uniform(-1, 1, 3), m0)
    scene = b.freeze()
    sah = build_sah(scene.mesh)
    n = sah.num_leaves
    left = np.asarray(sah.left)
    skip = np.asarray(sah.skip)
    node, steps, visits = 0, 0, []
    while node >= 0 and steps <= 10 * n:
        steps += 1
        if node >= n - 1:
            visits.append(node - (n - 1))
            node = skip[node]
        else:
            node = left[node]
    # the walk covers every REAL face exactly once (padded leaf slots
    # are unreachable by construction)
    n_real = int(np.asarray(scene.mesh.face_valid).sum())
    assert len(visits) == n_real
    lf = np.asarray(sah.leaf_face)
    assert sorted(lf[visits].tolist()) == list(range(n_real))
