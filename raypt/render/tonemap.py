"""Output transform: exposure + ACES filmic, reference present-path
parity (HLSL PS at main.cpp:78-93: `ACESFilm(color.rgb * 0.5)` with
alpha forced to 1). Replaces the D3D11 fullscreen-quad blit with a pure
array op (SURVEY §7: presentation layer dropped for device framebuffers).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math3d import aces_film, tonemap as _tonemap


def to_display(hdr, exposure: float = 0.5):
    """Linear HDR (H, W, 3) -> display-referred [0,1] (H, W, 3)."""
    return _tonemap(jnp.asarray(hdr), exposure)


def to_u8(img01):
    """[0,1] float -> uint8 with rounding."""
    return jnp.clip(jnp.asarray(img01) * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
