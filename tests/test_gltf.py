"""glTF 2.0 loader tests (io/gltf.py): JSON + data URI, GLB container,
node transforms, strips/fans, sparse accessors, interleaved views,
materials, and load_mesh dispatch."""
import base64
import json
import struct

import numpy as np
import pytest

from raypt.io.gltf import GLTFError, load_gltf
from raypt.io.ply import load_mesh

TRI_POS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)


def _data_uri(buf: bytes) -> str:
    return ("data:application/octet-stream;base64,"
            + base64.b64encode(buf).decode())


def _simple_gltf(extra_root=None, node=None, primitive=None,
                 indices=True):
    """One-triangle glTF dict with a data-URI buffer."""
    pos = TRI_POS.tobytes()
    idx = np.array([0, 1, 2], np.uint16).tobytes()
    buf = pos + idx
    prim = {"attributes": {"POSITION": 0}}
    if indices:
        prim["indices"] = 1
    if primitive:
        prim.update(primitive)
    g = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [dict({"mesh": 0}, **(node or {}))],
        "meshes": [{"primitives": [prim]}],
        "buffers": [{"uri": _data_uri(buf), "byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos)},
            {"buffer": 0, "byteOffset": len(pos), "byteLength": len(idx)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
    }
    if extra_root:
        g.update(extra_root)
    return g


def _glb_bytes(gltf: dict, bin_chunk: bytes = b"") -> bytes:
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    chunks = struct.pack("<II", len(js), 0x4E4F534A) + js
    if bin_chunk:
        bin_pad = bin_chunk + b"\0" * ((-len(bin_chunk)) % 4)
        chunks += struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad
    total = 12 + len(chunks)
    return b"glTF" + struct.pack("<II", 2, total) + chunks


def test_json_data_uri_triangle(tmp_path):
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(_simple_gltf()))
    m = load_gltf(str(p))
    np.testing.assert_allclose(m["positions"], TRI_POS)
    np.testing.assert_array_equal(m["faces"], [[0, 1, 2]])
    # generated smooth normal: +z for this winding
    np.testing.assert_allclose(m["normals"], [[0, 0, 1]] * 3, atol=1e-6)
    assert m["uvs"].shape == (3, 2)


def test_glb_container(tmp_path):
    g = _simple_gltf()
    pos = TRI_POS.tobytes()
    idx = np.array([0, 1, 2], np.uint16).tobytes()
    g["buffers"] = [{"byteLength": len(pos) + len(idx)}]   # BIN chunk
    p = tmp_path / "tri.glb"
    p.write_bytes(_glb_bytes(g, pos + idx))
    m = load_gltf(str(p))
    np.testing.assert_allclose(m["positions"], TRI_POS)
    # dispatcher routes by signature even with a weird extension
    q = tmp_path / "tri.bin_mesh"
    q.write_bytes(_glb_bytes(g, pos + idx))
    m2 = load_mesh(str(q))
    np.testing.assert_allclose(m2["positions"], TRI_POS)


def test_node_trs_transform(tmp_path):
    # scale 2, then translate (1,0,0); glTF order T*R*S
    g = _simple_gltf(node={"translation": [1, 0, 0], "scale": [2, 2, 2]})
    p = tmp_path / "t.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    np.testing.assert_allclose(
        m["positions"], TRI_POS * 2 + np.array([1, 0, 0], np.float32))


def test_node_rotation_quaternion(tmp_path):
    # 90 deg about z: (x,y,z) -> (-y,x,z);  q = (0,0,sin45,cos45)
    s = np.sin(np.pi / 4)
    g = _simple_gltf(node={"rotation": [0.0, 0.0, float(s), float(s)]})
    p = tmp_path / "r.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    expect = TRI_POS[:, [1, 0, 2]] * np.array([-1, 1, 1], np.float32)
    np.testing.assert_allclose(m["positions"], expect, atol=1e-6)


def test_negative_scale_flips_winding(tmp_path):
    g = _simple_gltf(node={"scale": [-1, 1, 1]})
    p = tmp_path / "neg.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    np.testing.assert_array_equal(m["faces"], [[0, 2, 1]])


def test_triangle_strip_and_fan(tmp_path):
    quad = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                    np.float32)
    for mode, want in [
        (5, [[0, 1, 2], [1, 3, 2]]),               # strip, alternating
        (6, [[0, 1, 2], [0, 2, 3]]),               # fan
    ]:
        buf = quad.tobytes() + np.array([0, 1, 2, 3],
                                        np.uint16).tobytes()
        g = _simple_gltf(primitive={"mode": mode})
        g["buffers"] = [{"uri": _data_uri(buf), "byteLength": len(buf)}]
        g["bufferViews"] = [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 8}]
        g["accessors"][0]["count"] = 4
        g["accessors"][1]["count"] = 4
        p = tmp_path / f"m{mode}.gltf"
        p.write_text(json.dumps(g))
        m = load_gltf(str(p))
        np.testing.assert_array_equal(m["faces"], want)


def test_non_indexed(tmp_path):
    g = _simple_gltf(indices=False)
    p = tmp_path / "ni.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    np.testing.assert_array_equal(m["faces"], [[0, 1, 2]])


def test_interleaved_and_normals(tmp_path):
    # interleaved P/N: stride 24
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    inter = np.concatenate([TRI_POS, nrm], axis=1).astype(np.float32)
    buf = inter.tobytes() + np.array([0, 1, 2], np.uint16).tobytes()
    g = _simple_gltf()
    g["meshes"][0]["primitives"][0]["attributes"]["NORMAL"] = 2
    g["buffers"] = [{"uri": _data_uri(buf), "byteLength": len(buf)}]
    g["bufferViews"] = [
        {"buffer": 0, "byteOffset": 0, "byteLength": 72, "byteStride": 24},
        {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        {"buffer": 0, "byteOffset": 0, "byteLength": 72, "byteStride": 24},
    ]
    g["accessors"] = [
        {"bufferView": 0, "componentType": 5126, "count": 3,
         "type": "VEC3"},
        {"bufferView": 1, "componentType": 5123, "count": 3,
         "type": "SCALAR"},
        {"bufferView": 2, "byteOffset": 12, "componentType": 5126,
         "count": 3, "type": "VEC3"},
    ]
    p = tmp_path / "inter.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    np.testing.assert_allclose(m["positions"], TRI_POS)
    np.testing.assert_allclose(m["normals"], nrm)


def test_sparse_accessor(tmp_path):
    # base positions all zero; sparse patches vertex 1 and 2
    base = np.zeros((3, 3), np.float32)
    sp_idx = np.array([1, 2], np.uint16)
    sp_val = TRI_POS[1:3]
    idx = np.array([0, 1, 2], np.uint16)
    buf = (base.tobytes() + sp_idx.tobytes() + sp_val.tobytes()
           + idx.tobytes())
    g = _simple_gltf()
    g["buffers"] = [{"uri": _data_uri(buf), "byteLength": len(buf)}]
    g["bufferViews"] = [
        {"buffer": 0, "byteOffset": 0, "byteLength": 36},
        {"buffer": 0, "byteOffset": 36, "byteLength": 4},
        {"buffer": 0, "byteOffset": 40, "byteLength": 24},
        {"buffer": 0, "byteOffset": 64, "byteLength": 6},
    ]
    g["accessors"] = [
        {"bufferView": 0, "componentType": 5126, "count": 3,
         "type": "VEC3",
         "sparse": {"count": 2,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2}}},
        {"bufferView": 3, "componentType": 5123, "count": 3,
         "type": "SCALAR"},
    ]
    p = tmp_path / "sp.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    np.testing.assert_allclose(m["positions"], TRI_POS)


def test_materials(tmp_path):
    g = _simple_gltf(extra_root={"materials": [{
        "name": "red",
        "pbrMetallicRoughness": {"baseColorFactor": [1, 0, 0, 1],
                                 "roughnessFactor": 0.25},
        "emissiveFactor": [0, 1, 0],
    }]}, primitive={"material": 0})
    p = tmp_path / "mat.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    assert m["materials"][0]["albedo"] == (1.0, 0.0, 0.0)
    assert m["materials"][0]["roughness"] == 0.25
    assert m["materials"][0]["emissive"] == (0.0, 1.0, 0.0)
    np.testing.assert_array_equal(m["face_materials"], [0])


def test_node_hierarchy_accumulates(tmp_path):
    g = _simple_gltf()
    g["nodes"] = [
        {"translation": [1, 0, 0], "children": [1]},
        {"scale": [2, 2, 2], "mesh": 0},
    ]
    g["scenes"] = [{"nodes": [0]}]
    p = tmp_path / "h.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    np.testing.assert_allclose(
        m["positions"], TRI_POS * 2 + np.array([1, 0, 0], np.float32))


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.glb"
    p.write_bytes(b"glTF" + b"\0" * 20)
    with pytest.raises(GLTFError):
        load_gltf(str(p))


def test_scene_builder_roundtrip(tmp_path):
    """glTF feeds the same add_mesh path as OBJ/PLY (render-ready)."""
    from raypt.core.scene import MaterialDef, SceneBuilder
    g = _simple_gltf()
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(g))
    m = load_gltf(str(p))
    b = SceneBuilder()
    mat = b.add_material(MaterialDef(albedo=(0.5, 0.5, 0.5)))
    b.add_mesh(m["positions"], m["normals"], m["faces"], uvs=m["uvs"],
               material=mat)
    scene = b.freeze()
    assert int(np.sum(np.asarray(scene.mesh.face_valid))) == 1


def test_config4_glb_authoring_roundtrip():
    """The config-#4 multi-mesh GLB (scenes/config4.py) must round-trip
    through the glTF loader: 4 materials, per-face material groups for
    all of them, accessor-sharing sphere instances, world transforms
    applied."""
    import numpy as np
    from raypt.scenes.config4 import author_config4_glb
    glb = author_config4_glb()
    m = load_gltf(glb)
    assert len(m["materials"]) == 4
    names = {mm["name"] for mm in m["materials"]}
    assert names == {"bunny_marble", "chrome", "glass", "ground_checker"}
    fm = np.asarray(m["face_materials"])
    assert set(np.unique(fm)) == {0, 1, 2, 3}
    # the two sphere instances share accessors but carry different
    # materials and node transforms: same face count, disjoint ids,
    # different world-space centroids
    pos = np.asarray(m["positions"])
    f = np.asarray(m["faces"])
    c1 = pos[np.unique(f[fm == 1])].mean(0)
    c2 = pos[np.unique(f[fm == 2])].mean(0)
    assert (fm == 1).sum() == (fm == 2).sum()
    assert np.linalg.norm(c1 - c2) > 1.0
    assert m["uvs"].shape[0] == pos.shape[0]
