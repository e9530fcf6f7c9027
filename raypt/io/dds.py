"""DDS image/cubemap loader in pure Python.

Behavioural port of the reference's DDS subsystem (utils/image/
DDSLoader.{h,cpp} + utils/CUDATexture.cpp:9-75 format mapping +
242-249 file entry point): parses the legacy DDS header and the DX10
extension, walks face-major mip chains, and returns float32 RGBA data.

Supported formats cover everything the reference ships or hardware-
decodes that we can reasonably need on TPU:
  * D3DFMT 116 (A32B32G32R32F) — the shipped sunset env map
  * D3DFMT 113 (A16B16G16R16F)
  * 32-bit RGBA/BGRA uint8 (with sRGB option left to the caller)
  * DX10 DXGI float/unorm variants of the above
Block-compressed (BC1-7) textures are rejected with a clear error —
the reference decodes those in texture hardware (CUDATexture.cpp:30-66);
on TPU we require uncompressed sources.
"""
from __future__ import annotations

import struct

import numpy as np

DDS_MAGIC = b"DDS "
DDSCAPS2_CUBEMAP = 0x200
DDPF_FOURCC = 0x4
DDPF_RGB = 0x40

_FOURCC_D3D = {113: ("f2", 4), 116: ("f4", 4)}  # D3DFMT -> (numpy kind, channels)
_DXGI = {
    2: ("f4", 4),    # R32G32B32A32_FLOAT
    10: ("f2", 4),   # R16G16B16A16_FLOAT
    28: ("u1", 4),   # R8G8B8A8_UNORM
    29: ("u1", 4),   # R8G8B8A8_UNORM_SRGB
    87: ("u1b", 4),  # B8G8R8A8_UNORM
    91: ("u1b", 4),  # B8G8R8A8_UNORM_SRGB
}


class DDSError(ValueError):
    pass


def load_dds(path_or_bytes):
    """Load a DDS file -> dict:
      data: float32 array, (6, H, W, 4) for cubemaps else (H, W, 4)
            (mip 0 only; mips are trivially derivable on TPU)
      is_cube: bool, mips: int
    uint8 sources are returned linearly scaled to [0,1] (no sRGB
    transform — caller decides, as the reference does via the sRGB
    texture flag, CUDATexture.cpp:137)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    if raw[:4] != DDS_MAGIC or len(raw) < 128:
        raise DDSError("not a DDS file")
    hdr = struct.unpack("<31I", raw[4:128])
    size, flags, height, width = hdr[0], hdr[1], hdr[2], hdr[3]
    mips = max(hdr[6], 1)
    pf_flags = hdr[19]
    fourcc = raw[84:88]
    caps2 = hdr[27]
    is_cube = bool(caps2 & DDSCAPS2_CUBEMAP)
    offset = 128

    if pf_flags & DDPF_FOURCC and fourcc == b"DX10":
        dxgi, dim, misc, array_size, _ = struct.unpack("<5I", raw[128:148])
        offset = 148
        is_cube = is_cube or bool(misc & 0x4)
        if dxgi not in _DXGI:
            raise DDSError(f"unsupported DXGI format {dxgi} (BC* needs CPU decode)")
        kind, ch = _DXGI[dxgi]
    elif pf_flags & DDPF_FOURCC:
        code = struct.unpack("<I", fourcc)[0]
        if code not in _FOURCC_D3D:
            raise DDSError(f"unsupported FourCC {fourcc!r}/{code}")
        kind, ch = _FOURCC_D3D[code]
    elif pf_flags & DDPF_RGB:
        bitcount = hdr[21]
        if bitcount != 32:
            raise DDSError(f"unsupported RGB bitcount {bitcount}")
        rmask = hdr[22]
        kind = "u1" if rmask == 0x000000FF else "u1b"
        ch = 4
    else:
        raise DDSError("unsupported pixel format")

    bswap = kind == "u1b"
    npdtype = {"f4": np.float32, "f2": np.float16,
               "u1": np.uint8, "u1b": np.uint8}[kind]
    bpp = np.dtype(npdtype).itemsize * ch

    def mip_bytes(w, h):
        return w * h * bpp

    faces = 6 if is_cube else 1
    out = []
    for _face in range(faces):
        w, h = width, height
        face_img = None
        for m in range(mips):
            nbytes = mip_bytes(w, h)
            if m == 0:
                buf = raw[offset:offset + nbytes]
                img = np.frombuffer(buf, npdtype).reshape(h, w, ch)
                face_img = img
            offset += nbytes
            w = max(w // 2, 1)
            h = max(h // 2, 1)
        out.append(face_img)

    arr = np.stack(out) if is_cube else out[0]
    arr = arr.astype(np.float32)
    if npdtype == np.uint8:
        arr = arr / 255.0
        if bswap:
            arr = arr[..., [2, 1, 0, 3]]
    return {"data": arr, "is_cube": is_cube, "mips": mips,
            "width": width, "height": height}


def load_env_cubemap(path) -> "jnp-ready array":
    """Convenience: DDS -> (6, H, W, 3) float32 RGB cubemap (mip 0),
    matching what the reference binds as environment_cubemap_tex
    (Scene.cpp:40,187)."""
    d = load_dds(path)
    data = d["data"]
    if not d["is_cube"]:
        raise DDSError("expected a cubemap DDS")
    return np.ascontiguousarray(data[..., :3])
