"""Built-in scene content — parity with the reference's hardcoded
scenes (SetupCornellBox RayTracing.cpp:79-203, SetupStanfordBunny
RayTracing.cpp:33-69) plus the minimal test scene of BASELINE config #1.

Asset resolution: the Stanford bunny OBJ and the sunset cubemap are
looked up in RAYPT_DATA_DIR, ./data, then the read-only reference data
mount; when neither exists we fall back to procedural stand-ins (an
icosphere "bunny" and a sky-gradient envmap) so tests never depend on
external files.
"""
from __future__ import annotations

import math
import os
from functools import lru_cache

import numpy as np

from ..core.scene import MaterialDef, SceneBuilder
from ..core.types import EnvMap
from ..io.dds import load_env_cubemap
from ..io.obj import load_obj, smooth_normals

_DATA_CANDIDATES = (
    os.environ.get("RAYPT_DATA_DIR", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "data"),
    "/root/reference/data",
)


def _find_asset(name: str):
    for d in _DATA_CANDIDATES:
        if not d:
            continue
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


# ---------------------------------------------------------------------------
# environment
# ---------------------------------------------------------------------------

def _procedural_sky(h: int = 64) -> EnvMap:
    """Simple gradient cubemap used when the sunset DDS is unavailable."""
    import jax.numpy as jnp
    w = h
    ys = np.linspace(1.0, -1.0, h, dtype=np.float32)
    faces = []
    for f in range(6):
        if f == 2:   # +y: sky top
            img = np.full((h, w, 3), (0.45, 0.65, 1.0), np.float32)
        elif f == 3:  # -y: ground
            img = np.full((h, w, 3), (0.15, 0.12, 0.1), np.float32)
        else:
            t = (ys[:, None, None] * 0.5 + 0.5)
            img = (t * np.array([0.45, 0.65, 1.0], np.float32)
                   + (1 - t) * np.array([0.9, 0.85, 0.8], np.float32))
            img = np.broadcast_to(img, (h, w, 3)).astype(np.float32)
        faces.append(img)
    return EnvMap(data=jnp.asarray(np.stack(faces)), is_cube=True)


@lru_cache(maxsize=1)
def load_reference_envmap() -> EnvMap:
    """The sunset cubemap the reference loads at Scene.cpp:40, or a
    procedural sky."""
    import jax.numpy as jnp
    p = _find_asset("sunset_uncompressed.dds")
    if p is None:
        return _procedural_sky()
    return EnvMap(data=jnp.asarray(load_env_cubemap(p)), is_cube=True)


# ---------------------------------------------------------------------------
# meshes
# ---------------------------------------------------------------------------

def _icosphere(subdiv: int = 4):
    """Procedural smooth mesh (~5k tris at subdiv 4) standing in for the
    bunny when the OBJ is absent."""
    t = (1.0 + math.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = [tuple(v) for v in verts]
    cache = {}

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key in cache:
            return cache[key]
        m = np.array(verts[a]) + np.array(verts[b])
        m /= np.linalg.norm(m)
        verts.append(tuple(m))
        cache[key] = len(verts) - 1
        return cache[key]

    for _ in range(subdiv):
        nf = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = nf
    pos = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    return {"positions": pos, "normals": pos.copy(), "faces": f,
            "uvs": np.zeros((len(pos), 2), np.float32)}


@lru_cache(maxsize=1)
def bunny_mesh():
    """Stanford bunny (35,947 verts / 69,451 tris — BASELINE.md) with
    smooth normals, or the icosphere stand-in."""
    p = _find_asset("stanford-bunny.obj")
    if p is None:
        return _icosphere(4)
    mesh = load_obj(p)
    if np.allclose(mesh["normals"], 0):
        mesh["normals"] = smooth_normals(mesh["positions"], mesh["faces"])
    return mesh


# ---------------------------------------------------------------------------
# scenes
# ---------------------------------------------------------------------------

def triangle_ground() -> SceneBuilder:
    """BASELINE config #1: single triangle + ground plane. Minimal
    differentiable end-to-end scene."""
    b = SceneBuilder(env=_procedural_sky(16))
    ground = b.add_material(MaterialDef(albedo=(0.7, 0.7, 0.7)))
    red = b.add_material(MaterialDef(albedo=(0.9, 0.2, 0.2)))
    b.add_quad((-5, -1, 5), (5, -1, 5), (5, -1, -5), (-5, -1, -5), ground)
    b.add_triangle((-1, 0, -3), (1, 0, -3), (0, 1.5, -3), red)
    b.camera.position = (0, 0.5, 2)
    return b


def cornell_box(env: EnvMap | None = None) -> SceneBuilder:
    """Reference SetupCornellBox parity (RayTracing.cpp:79-203):
    6 quads (back/floor/ceiling/left green/right red/area light),
    3 colored specular spheres, 5 roughness-series green-specular
    spheres; camera yaw 180 (RayTracing.cpp:159)."""
    b = SceneBuilder(env=env if env is not None else load_reference_envmap())
    grey = dict(albedo=(0.7, 0.7, 0.7))
    b.add_quad((-12.6, -12.6, 25), (12.6, -12.6, 25), (12.6, 12.6, 25),
               (-12.6, 12.6, 25), b.add_material(MaterialDef(**grey)))   # back
    b.add_quad((-12.6, -12.45, 25), (12.6, -12.45, 25), (12.6, -12.45, 15),
               (-12.6, -12.45, 15), b.add_material(MaterialDef(**grey)))  # floor
    b.add_quad((-12.6, 12.5, 25), (12.6, 12.5, 25), (12.6, 12.5, 15),
               (-12.6, 12.5, 15), b.add_material(MaterialDef(**grey)))    # ceiling
    b.add_quad((-12.5, -12.6, 25), (-12.5, -12.6, 15), (-12.5, 12.6, 15),
               (-12.5, 12.6, 25),
               b.add_material(MaterialDef(albedo=(0.1, 0.7, 0.1))))       # left
    b.add_quad((12.5, -12.6, 25), (12.5, -12.6, 15), (12.5, 12.6, 15),
               (12.5, 12.6, 25),
               b.add_material(MaterialDef(albedo=(0.7, 0.1, 0.1))))       # right
    b.add_quad((-5, 12.4, 22.5), (5, 12.4, 22.5), (5, 12.4, 17.5),
               (-5, 12.4, 17.5),
               b.add_material(MaterialDef(albedo=(0, 0, 0),
                                          emissive=(20.0, 18.0, 14.0))))  # light

    b.add_sphere((-9, -9.5, 20), 3, b.add_material(MaterialDef(
        albedo=(0.9, 0.9, 0.5), specular=(0.9, 0.9, 0.9),
        specular_percent=0.5, roughness=0.2)))
    b.add_sphere((0, -9.5, 20), 3, b.add_material(MaterialDef(
        albedo=(0.9, 0.5, 0.9), specular=(0.9, 0.9, 0.9),
        specular_percent=0.3, roughness=0.2)))
    b.add_sphere((9, -9.5, 20), 3, b.add_material(MaterialDef(
        albedo=(0, 0, 1), specular=(1, 0, 0),
        specular_percent=0.5, roughness=0.4)))
    for i, rough in enumerate((0.0, 0.25, 0.5, 0.75, 0.97)):
        b.add_sphere((-10.0 + 5.0 * i, 0, 23), 1.75, b.add_material(
            MaterialDef(albedo=(1, 1, 1), specular=(0.3, 1.0, 0.3),
                        specular_percent=1.0, roughness=rough)))
    b.camera.angle_y = 180.0
    return b


def _bunny_transform() -> np.ndarray:
    """SetupStanfordBunny transform (RayTracing.cpp:42-46):
    translate(30,-18,20) * rotY(-pi) * rotX(pi/2) * scale(150) —
    COMPOSED with the Assimp importer's global -90 degree X root
    rotation (AssimpLoader.cpp:46-48), which the scene transform's
    rotX(+90) exactly cancels (uniform scale commutes). Net effect:
    translate * rotY(-pi) * scale. Round 1 missed the importer
    rotation, leaving the bunny buried below the ground quad."""
    def ry(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    r = ry(-math.pi) * 150.0
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    m[:3, 3] = (30, -18, 20)
    return m


def stanford_bunny(builder: SceneBuilder | None = None) -> SceneBuilder:
    """Reference SetupStanfordBunny parity (RayTracing.cpp:33-69):
    bunny mesh (specular green, rough 0.8), 100x ground quad at
    y=-12.45, emissive teal sphere light."""
    b = builder if builder is not None else SceneBuilder(env=load_reference_envmap())
    mesh = bunny_mesh()
    mat = b.add_material(MaterialDef(
        albedo=(1, 1, 1), specular=(0.3, 1.0, 0.3),
        specular_percent=0.5, roughness=0.8))
    b.add_mesh(mesh["positions"], mesh["normals"], mesh["faces"],
               uvs=mesh["uvs"], transform=_bunny_transform(), material=mat)

    off = np.array([20, 0, 0], np.float32)
    sc = np.array([50, 1, 50], np.float32)
    ground = b.add_material(MaterialDef(albedo=(0.7, 0.7, 0.7)))
    b.add_quad(sc * (-1, -12.45, 1) + off, sc * (1, -12.45, 1) + off,
               sc * (1, -12.45, -1) + off, sc * (-1, -12.45, -1) + off,
               ground)
    light = b.add_material(MaterialDef(albedo=(0, 0, 0),
                                       emissive=(3.0, 9.0, 7.0)))
    b.add_sphere((30, 10, 40), 8, light)
    if builder is None:
        # standalone bunny workload (the bench scene): frame the bunny.
        # The reference's INITIAL camera (origin, yaw 180) has the bunny
        # outside its frustum — its screenshot is taken after flying the
        # camera (README bunny01.jpg); the north-star metric is "bunny
        # 1024^2", so the default view must actually contain the bunny
        # (world bbox ~[21,44]x[-13,10]x[11,29] after the transform fix).
        b.camera.position = (32.5, -2.0, 0.0)
        b.camera.angle_y = 180.0
    return b


def cornell_box_with_bunny() -> SceneBuilder:
    """The reference's full default scene: Cornell box + bunny
    (CUDARayTracer ctor, RayTracing.cpp:24-25)."""
    b = cornell_box()
    return stanford_bunny(b)


def textured_demo(checker_res: int = 64) -> SceneBuilder:
    """BASELINE config #4 scene: multiple meshes + albedo textures +
    (equirect-capable) HDR environment light. Procedural content so it
    needs no external assets."""
    import jax.numpy as jnp
    # HDR gradient sky as an equirect panorama
    h, w = 64, 128
    ys = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    sky = ((1 - ys) * np.array([2.5, 3.0, 4.0], np.float32)
           + ys * np.array([0.4, 0.3, 0.25], np.float32))
    env = EnvMap(data=jnp.asarray(np.broadcast_to(sky, (h, w, 3)).copy()),
                 is_cube=False)
    b = SceneBuilder(env=env)

    check = (np.indices((checker_res, checker_res)).sum(0) // 8 % 2
             ).astype(np.float32)
    tex_checker = np.stack([check, check * 0.6 + 0.2, 1.0 - check], -1)
    tid = b.add_texture(tex_checker)
    floor_mat = b.add_material(MaterialDef(albedo=(0.9, 0.9, 0.9),
                                           texture=tid))
    # textured ground (uv-mapped via add_mesh)
    g = 12.0
    pos = np.array([[-g, -1, g], [g, -1, g], [g, -1, -g], [-g, -1, -g]],
                   np.float32)
    nrm = np.tile([[0, 1, 0]], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32)
    b.add_mesh(pos, nrm, np.array([[0, 1, 2], [0, 2, 3]]), uvs=uv,
               material=floor_mat)

    # mesh 2: icosphere, glossy
    ico = _icosphere(2)
    m2 = b.add_material(MaterialDef(albedo=(0.9, 0.6, 0.3),
                                    specular=(0.9, 0.9, 0.9),
                                    specular_percent=0.4, roughness=0.15))
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = (-1.5, 0.2, -5)
    b.add_mesh(ico["positions"], ico["normals"], ico["faces"], transform=t,
               material=m2)

    # mesh 3: second icosphere, diffuse
    m3 = b.add_material(MaterialDef(albedo=(0.3, 0.5, 0.9)))
    t2 = np.eye(4, dtype=np.float32) * 0.7
    t2[3, 3] = 1.0
    t2[:3, 3] = (1.6, -0.3, -4.2)
    b.add_mesh(ico["positions"], ico["normals"], ico["faces"], transform=t2,
               material=m3)

    # emissive sphere light
    light = b.add_material(MaterialDef(albedo=(0, 0, 0),
                                       emissive=(12.0, 11.0, 9.0)))
    b.add_sphere((0, 4.0, -4), 0.8, light)
    b.camera.position = (0, 0.6, 1.5)
    return b
