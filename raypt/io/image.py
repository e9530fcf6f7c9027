"""Framebuffer export: PNG / PPM / NPY.

The reference has *no* image export at all (SURVEY §5.4 — frames die in
the swapchain); the north star replaces D3D presentation with saved
device-array framebuffers, so this module is the presentation layer.
PNG is written with the stdlib only (zlib deflate + manual chunk CRCs).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def write_png(path: str, img) -> None:
    """img: (H, W, 3|4) uint8 or float in [0,1]."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.asarray(a, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if a.ndim == 2:
        a = a[..., None].repeat(3, axis=-1)
    h, w, c = a.shape
    assert c in (3, 4), f"PNG needs 3 or 4 channels, got {c}"
    color_type = 2 if c == 3 else 6
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(raw, 6))
           + _chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_ppm(path: str, img) -> None:
    """Binary P6 PPM (the format of the reference's vestigial golden
    image data/ref_simpleD3D11Texture.ppm)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.asarray(a, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w = a.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(a[..., :3].tobytes())


def read_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    parts = data.split(maxsplit=4)
    assert parts[0] == b"P6"
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    img = np.frombuffer(parts[4][: w * h * 3], np.uint8).reshape(h, w, 3)
    return img


def write_npy(path: str, img) -> None:
    np.save(path, np.asarray(img))
