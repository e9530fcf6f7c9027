"""IO round trips: OBJ, PNG, PPM, HDR, DDS, checkpoints."""
import os
import zlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raypt.io import (load_dds, load_hdr, load_obj, load_pytree,
                      load_render_state, read_ppm, save_pytree,
                      save_render_state, smooth_normals, write_hdr,
                      write_png, write_ppm)

REF_DDS = "/root/reference/data/sunset_uncompressed.dds"
REF_OBJ = "/root/reference/data/stanford-bunny.obj"


pytestmark = pytest.mark.smoke

def test_obj_parse(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("""
# comment
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
f 1/1 2/2 3/3
f 2 4 3
""")
    mesh = load_obj(str(p))
    assert mesh["faces"].shape == (2, 3)
    assert mesh["positions"].shape[1] == 3
    # generated normals are unit +z for this planar mesh
    assert np.allclose(np.abs(mesh["normals"][:, 2]), 1.0, atol=1e-6)


def test_obj_quad_triangulation_and_negative_indices(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    mesh = load_obj(str(p))
    assert mesh["faces"].shape == (3 - 1, 3) or mesh["faces"].shape == (2, 3)


@pytest.mark.skipif(not os.path.exists(REF_OBJ), reason="bunny not present")
def test_bunny_counts():
    mesh = load_obj(REF_OBJ)
    assert mesh["positions"].shape == (35947, 3)  # BASELINE.md counts
    assert mesh["faces"].shape == (69451, 3)
    # referenced vertices must have unit normals (the bunny has ~1.1k
    # unreferenced vertices whose normals stay zero)
    ref = np.unique(mesh["faces"])
    assert np.allclose(np.linalg.norm(mesh["normals"][ref], axis=1), 1.0,
                       atol=1e-4)


def test_png_roundtrippable(tmp_path):
    img = (np.random.default_rng(0).uniform(0, 1, (17, 23, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    write_png(str(p), img)
    raw = p.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # decode IDAT and compare after unfiltering (filter byte is 0)
    idat_start = raw.index(b"IDAT") + 4
    idat_len = int.from_bytes(raw[idat_start - 8:idat_start - 4], "big")
    data = zlib.decompress(raw[idat_start:idat_start + idat_len])
    rows = np.frombuffer(data, np.uint8).reshape(17, 1 + 23 * 3)
    assert (rows[:, 0] == 0).all()
    assert np.array_equal(rows[:, 1:].reshape(17, 23, 3), img)


def test_ppm_roundtrip(tmp_path):
    img = (np.random.default_rng(1).uniform(0, 1, (8, 9, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.ppm"
    write_ppm(str(p), img)
    back = read_ppm(str(p))
    assert np.array_equal(back, img)


def test_hdr_roundtrip(tmp_path):
    img = np.random.default_rng(2).uniform(0, 8, (16, 32, 3)).astype(np.float32)
    p = tmp_path / "x.hdr"
    write_hdr(str(p), img)
    back = load_hdr(str(p))
    assert back.shape == img.shape
    # RGBE has ~1% mantissa precision
    assert np.allclose(back, img, rtol=0.01, atol=0.05)  # RGBE shared-exponent step


@pytest.mark.skipif(not os.path.exists(REF_DDS), reason="dds not present")
def test_reference_dds_cubemap():
    d = load_dds(REF_DDS)
    assert d["is_cube"] and d["mips"] == 8
    assert d["data"].shape == (6, 128, 128, 4)
    assert np.isfinite(d["data"]).all()
    assert d["data"][..., :3].max() > 1.0  # HDR content


@pytest.mark.skipif(not os.path.exists(REF_DDS), reason="dds not present")
def test_reference_dds_mip_chain_retained():
    """The full stored mip chain is decoded (reference uploads every
    level, CUDATexture.cpp:112-172), sizes halving down to 1x1, and
    each stored level roughly matches a box-filter of the one above
    (the shipped chain was built by a standard downsampler)."""
    d = load_dds(REF_DDS)
    chain = d["mip_data"]
    assert len(chain) == 8
    w = 128
    for lvl in chain:
        assert lvl.shape == (6, w, w, 4)
        assert np.isfinite(lvl).all()
        w = max(w // 2, 1)
    m0 = d["mip_data"][0][..., :3]
    m1 = d["mip_data"][1][..., :3]
    box = m0.reshape(6, 64, 2, 64, 2, 3).mean(axis=(2, 4))
    # stored mips come from an unknown filter and the HDR sun (max
    # ~1.4e4) swamps linear comparison — require energy preservation
    # and strong log-space correlation with a box downsample instead
    assert abs(m1.mean() - m0.mean()) < 0.05 * m0.mean()
    corr = np.corrcoef(np.log1p(box).ravel(), np.log1p(m1).ravel())[0, 1]
    assert corr > 0.9


def test_dds_srgb_decode():
    """DXGI *_SRGB formats decode to linear automatically (the
    reference sets the sRGB flag on those textures, CUDATexture.cpp:137);
    plain UNORM stays linear-scaled; srgb=True forces decode."""
    from raypt.io.dds import srgb_to_linear
    raw = np.full((8, 8, 4), 128, np.uint8)
    raw[..., 3] = 255
    enc = 128 / 255.0
    lin = float(srgb_to_linear(np.float32(enc)))
    # 28 = R8G8B8A8_UNORM: no decode
    d = load_dds(_dds_dx10(28, 8, 8, raw.tobytes()))
    assert not d["srgb"]
    assert np.allclose(d["data"][..., 0], enc, atol=1e-6)
    # 29 = R8G8B8A8_UNORM_SRGB: auto decode, alpha untouched
    d = load_dds(_dds_dx10(29, 8, 8, raw.tobytes()))
    assert d["srgb"]
    assert np.allclose(d["data"][..., 0], lin, atol=1e-6)
    assert np.allclose(d["data"][..., 3], 1.0)
    # force on a non-sRGB format
    d = load_dds(_dds_dx10(28, 8, 8, raw.tobytes()), srgb=True)
    assert np.allclose(d["data"][..., 0], lin, atol=1e-6)
    # force OFF an sRGB format
    d = load_dds(_dds_dx10(29, 8, 8, raw.tobytes()), srgb=False)
    assert np.allclose(d["data"][..., 0], enc, atol=1e-6)


def _ply_ascii(with_normals=True, polys=False):
    lines = ["ply", "format ascii 1.0", "element vertex 4",
             "property float x", "property float y", "property float z"]
    if with_normals:
        lines += ["property float nx", "property float ny",
                  "property float nz"]
    nf = 1 if polys else 2
    lines += [f"element face {nf}",
              "property list uchar int vertex_indices", "end_header"]
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    for v in verts:
        row = f"{v[0]} {v[1]} {v[2]}"
        if with_normals:
            row += " 0 0 1"
        lines.append(row)
    if polys:
        lines.append("4 0 1 2 3")
    else:
        lines += ["3 0 1 2", "3 0 2 3"]
    return ("\n".join(lines) + "\n").encode()


def test_ply_ascii_quad_fan():
    from raypt.io import load_ply
    m = load_ply(_ply_ascii(polys=True))
    assert m["positions"].shape == (4, 3)
    assert m["faces"].shape == (2, 3)           # quad fan-triangulated
    assert np.allclose(m["normals"], [0, 0, 1])
    m2 = load_ply(_ply_ascii(with_normals=False))
    assert np.allclose(np.abs(m2["normals"][:, 2]), 1.0, atol=1e-5)


def test_ply_binary_roundtrip():
    """Binary little-endian PLY == ascii PLY, and both endians agree."""
    import struct
    from raypt.io import load_ply

    def binary(endian):
        tag = ("binary_little_endian" if endian == "<"
               else "binary_big_endian")
        hdr = ("ply\nformat %s 1.0\nelement vertex 4\n"
               "property float x\nproperty float y\nproperty float z\n"
               "element face 2\n"
               "property list uchar int vertex_indices\nend_header\n"
               % tag).encode()
        body = b""
        for v in [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]:
            body += struct.pack(endian + "3f", *v)
        for f in [(0, 1, 2), (0, 2, 3)]:
            body += struct.pack(endian + "B3i", 3, *f)
        return hdr + body

    a = load_ply(_ply_ascii(with_normals=False))
    for e in ("<", ">"):
        b = load_ply(binary(e))
        assert np.allclose(a["positions"], b["positions"])
        assert np.array_equal(a["faces"], b["faces"])


def test_ply_renders_like_obj():
    """A mesh loaded via PLY renders identically to the same mesh via
    the builder-direct path (the AddLoadedScene-parity check)."""
    import jax
    from raypt.core.scene import MaterialDef, SceneBuilder
    from raypt.core.types import EnvMap, RenderConfig
    from raypt.io import load_ply
    from raypt.render import render_frame
    m = load_ply(_ply_ascii())
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = (-0.5, -0.5, -2.0)

    def build(mesh):
        b = SceneBuilder(env=EnvMap.constant((0.4, 0.5, 0.6)))
        mat = b.add_material(MaterialDef(albedo=(0.7, 0.6, 0.5)))
        b.add_mesh(mesh["positions"], mesh["normals"], mesh["faces"],
                   uvs=mesh["uvs"], transform=t, material=mat)
        b.camera.viewport_width = b.camera.viewport_height = 12
        return b.freeze()

    cfg = RenderConfig(width=12, height=12, samples_per_pixel=1,
                       num_bounces=2, backend="bruteforce")
    ia = render_frame(build(m), cfg, jax.random.key(0))
    assert np.isfinite(np.asarray(ia)).all()
    assert float(np.asarray(ia).mean()) > 0


def test_env_cubemap_stored_mips_sampled():
    """load_env_cubemap(with_mips=True) feeds sample_env_lod with the
    STORED pyramid."""
    if not os.path.exists(REF_DDS):
        pytest.skip("dds not present")
    import jax.numpy as jnp
    from raypt.core.types import EnvMap
    from raypt.io.dds import load_env_cubemap
    from raypt.render.envmap import sample_env_lod
    mip0, chain = load_env_cubemap(REF_DDS, with_mips=True)
    env = EnvMap(data=jnp.asarray(mip0), is_cube=True)
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    jchain = [jnp.asarray(c) for c in chain]
    lo = sample_env_lod(env, jchain, d, 0.0)
    hi = sample_env_lod(env, jchain, d, float(len(chain) - 1))
    assert np.isfinite(np.asarray(lo)).all()
    # top mip is the 1x1 average: both directions converge to it
    assert np.allclose(np.asarray(hi)[0], np.asarray(hi)[1], atol=1e-4)


def test_render_state_checkpoint(tmp_path):
    accum = jnp.ones((4, 4, 3)) * 2.5
    key = jax.random.key(42)
    p = str(tmp_path / "state.npz")
    save_render_state(p, accum, 7, key)
    a2, fi, k2 = load_render_state(p)
    assert np.allclose(np.asarray(a2), 2.5) and fi == 7
    assert np.array_equal(np.asarray(jax.random.key_data(key)),
                          np.asarray(jax.random.key_data(k2)))


def test_pytree_checkpoint(tmp_path):
    tree = {"a": jnp.arange(3.0), "b": {"c": jnp.ones((2, 2))}}
    p = str(tmp_path / "tree.npz")
    save_pytree(p, tree, step=11)
    like = {"a": jnp.zeros(3), "b": {"c": jnp.zeros((2, 2))}}
    back, step = load_pytree(p, like)
    assert step == 11
    assert np.allclose(np.asarray(back["a"]), [0, 1, 2])
    assert np.allclose(np.asarray(back["b"]["c"]), 1.0)


def _dds_header(w, h, fourcc):
    import struct
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    struct.pack_into("<I", hdr, 4, 124)
    struct.pack_into("<I", hdr, 8, 0x1007)
    struct.pack_into("<I", hdr, 12, h)
    struct.pack_into("<I", hdr, 16, w)
    struct.pack_into("<I", hdr, 28, 1)
    struct.pack_into("<I", hdr, 76, 32)
    struct.pack_into("<I", hdr, 80, 0x4)
    hdr[84:88] = fourcc
    return bytes(hdr)


def test_dds_bc1_decode():
    import struct
    blk = struct.pack("<HHI", 0xF800, 0x001F, 0xAAAAAAAA)  # idx2: 2/3 c0
    d = load_dds(_dds_header(4, 4, b"DXT1") + blk)
    img = d["data"]
    assert img.shape == (4, 4, 4)
    assert np.allclose(img[..., 0], 2 / 3, atol=0.02)
    assert np.allclose(img[..., 2], 1 / 3, atol=0.02)


def test_dds_bc3_alpha():
    import struct
    # color: solid red; alpha: a0=255 a1=0, all indices 0 -> alpha 1
    ablock = bytes([255, 0, 0, 0, 0, 0, 0, 0])
    cblock = struct.pack("<HHI", 0xF800, 0xF800, 0)
    d = load_dds(_dds_header(4, 4, b"DXT5") + ablock + cblock)
    img = d["data"]
    assert np.allclose(img[..., 3], 1.0)
    assert np.allclose(img[..., 0], 1.0, atol=0.02)
    # alpha indices all 1 -> a1 = 0
    ablock = bytes([255, 0, 0b01001001, 0b10010010, 0b00100100, 0, 0, 0])
    d = load_dds(_dds_header(4, 4, b"DXT5") + ablock + cblock)
    a = d["data"][..., 3].ravel()
    assert np.allclose(a[:8], 0.0, atol=1e-6)  # first 8 texels index 1


# ---------------------------------------------------------------------------
# BC4-7 (raypt.io.bcn) — validated against Pillow's independent decoder
# on random block data (covers every mode/partition), plus crafted
# spec vectors for BC6H signed (where Pillow's SF16 path is unreliable)
# ---------------------------------------------------------------------------

def _dds_dx10(dxgi, w, h, payload):
    import struct
    hdr = bytearray(148)
    hdr[0:4] = b"DDS "
    struct.pack_into("<I", hdr, 4, 124)
    struct.pack_into("<I", hdr, 8, 0x1007)
    struct.pack_into("<I", hdr, 12, h)
    struct.pack_into("<I", hdr, 16, w)
    struct.pack_into("<I", hdr, 76, 32)
    struct.pack_into("<I", hdr, 80, 0x4)
    hdr[84:88] = b"DX10"
    struct.pack_into("<I", hdr, 108, 0x1000)
    struct.pack_into("<5I", hdr, 128, dxgi, 3, 0, 1, 0)
    return bytes(hdr) + payload


def _pillow_rgba(dxgi, w, h, payload):
    import io as _io
    PIL = pytest.importorskip("PIL.Image")
    im = PIL.open(_io.BytesIO(_dds_dx10(dxgi, w, h, payload)))
    return np.asarray(im.convert("RGBA"), np.float32) / 255.0


def test_bc4_bc5_vs_pillow():
    rng = np.random.default_rng(5)
    w = h = 64
    nb = (w // 4) * (h // 4)
    from raypt.io.bcn import decode_bc4, decode_bc5
    pay = rng.integers(0, 256, nb * 8, dtype=np.uint8).tobytes()
    ref = _pillow_rgba(80, w, h, pay)
    assert np.abs(decode_bc4(pay, w, h)[..., 0] - ref[..., 0]).max() < 1.5 / 255
    pay = rng.integers(0, 256, nb * 16, dtype=np.uint8).tobytes()
    ref = _pillow_rgba(83, w, h, pay)
    assert np.abs(decode_bc5(pay, w, h) - ref[..., :2]).max() < 1.5 / 255


def test_bc7_vs_pillow_random_blocks():
    rng = np.random.default_rng(6)
    w = h = 128
    nb = (w // 4) * (h // 4)
    raw = rng.integers(0, 256, (nb, 16), dtype=np.uint8)
    raw[:, 0] |= 1  # avoid reserved (mode-less) blocks: Pillow and the
    #                 D3D spec disagree on their alpha (255 vs 0)
    pay = raw.tobytes()
    from raypt.io.bcn import decode_bc7
    ref = _pillow_rgba(98, w, h, pay)
    d = np.abs(decode_bc7(pay, w, h) - ref)
    assert d.max() < 1.5 / 255


def test_bc7_reserved_block_decodes_to_zero():
    from raypt.io.bcn import decode_bc7
    img = decode_bc7(b"\x00" * 16, 4, 4)
    assert np.all(img == 0.0)


def test_bc6h_unsigned_vs_pillow_random_blocks():
    rng = np.random.default_rng(8)
    w = h = 128
    nb = (w // 4) * (h // 4)
    pay = rng.integers(0, 256, nb * 16, dtype=np.uint8).tobytes()
    from raypt.io.bcn import decode_bc6h
    ref = np.asarray(_pillow_rgba(95, w, h, pay))[..., :3] * 255.0
    mine = np.clip(decode_bc6h(pay, w, h) * 255.0 + 0.5, 0, 255).astype(int)
    # Pillow truncates instead of rounding on the half->u8 conversion;
    # allow 1 LSB
    assert np.abs(mine - ref).max() <= 1.01


def test_bc6h_signed_spec_vectors():
    """Crafted SF16 blocks checked against hand-evaluated spec math
    (D3D11 19.5): mode 0x03 (10-bit raw) and 0x07 (11-bit, 9-bit delta).
    """
    from raypt.io.bcn import decode_bc6h

    def bits(fields):
        v, pos = 0, 0
        for val, n in fields:
            v |= (val & ((1 << n) - 1)) << pos
            pos += n
        return v.to_bytes(16, "little")

    def unq(x, b):
        s, ax = x < 0, abs(x)
        if ax == 0:
            q = 0
        elif ax >= (1 << (b - 1)) - 1:
            q = 0x7FFF
        else:
            q = ((ax << 15) + 0x4000) >> (b - 1)
        return -q if s else q

    def half(q):
        hb = ((abs(q) * 31) >> 5) | (0x8000 if q < 0 else 0)
        return float(np.array([hb], np.uint16).view(np.float16)[0])

    # mode 0x03, raw endpoints: rw=-200, rx=-100 (all indices 0 -> e0)
    blk = bits([(0x03, 5), (-200, 10), (-200, 10), (-200, 10),
                (-100, 10), (-100, 10), (-100, 10)])
    img = decode_bc6h(blk, 4, 4, signed=True)
    expect = half(((64 - 0) * unq(-200, 10) + 32) >> 6)
    assert np.allclose(img[0, 0], expect, rtol=1e-6)

    # mode 0x07 (delta): rw=462, delta=-20 -> e1=442; index bits 0
    blk = bits([(0x07, 5), (462, 10), (462, 10), (462, 10),
                (-20, 9), (0, 1), (-20, 9), (0, 1), (-20, 9), (0, 1)])
    img = decode_bc6h(blk, 4, 4, signed=True)
    expect = half(((64 - 0) * unq(462, 11) + 32) >> 6)
    assert np.allclose(img[0, 0], expect, rtol=1e-6)


def test_dds_loader_bc7_dx10_path():
    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, (4, 16), dtype=np.uint8)
    raw[:, 0] |= 1
    d = load_dds(_dds_dx10(98, 8, 8, raw.tobytes()))
    assert d["data"].shape == (8, 8, 4)


def test_dds_loader_bc5_fourcc_path():
    blk = bytes(16)
    d = load_dds(_dds_header(4, 4, b"ATI2") + blk)
    assert d["data"].shape == (4, 4, 4)
    assert np.allclose(d["data"][..., 3], 1.0)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from raypt.io.checkpoint import (have_orbax, load_pytree_orbax,
                                     save_pytree_orbax)
    if not have_orbax():
        import pytest
        pytest.skip("orbax not installed")
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    save_pytree_orbax(str(tmp_path / "ck"), tree, step=7)
    restored, step = load_pytree_orbax(str(tmp_path / "ck"), tree, step=7)
    assert step == 7
    assert np.allclose(np.asarray(restored["a"]), np.asarray(tree["a"]))
    assert np.allclose(np.asarray(restored["b"]["c"]),
                       np.asarray(tree["b"]["c"]))
