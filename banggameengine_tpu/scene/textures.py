"""Texture loading: PNG/JPG -> RGBA8 NumPy arrays.

Replaces the reference's stb_image path (``src/render/Texture.cpp:10-40``:
force RGBA8, no mips).  Also provides the procedural 2x2 checker fallback
(``src/resource/ResourceManager.cpp:523-539``).
"""

from __future__ import annotations

import numpy as np


def load_texture_rgba8(path: str) -> np.ndarray:
    """Decode an image file to uint8[H, W, 4] (RGBA), like stb's forced
    4-channel load."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGBA")
        return np.asarray(im, np.uint8).copy()


def make_checker_rgba8(size: int = 2) -> np.ndarray:
    """Magenta/black checker fallback texture (ResourceManager.cpp:523-539
    uses a 2x2 bright pattern so missing textures are obvious)."""
    y, x = np.mgrid[0:size, 0:size]
    on = ((x + y) % 2 == 0)
    tex = np.zeros((size, size, 4), np.uint8)
    tex[..., 0] = np.where(on, 255, 30)
    tex[..., 1] = np.where(on, 0, 30)
    tex[..., 2] = np.where(on, 255, 30)
    tex[..., 3] = 255
    return tex


def make_white_rgba8() -> np.ndarray:
    """1x1 white texture (Renderer.cpp:208-218 creates one for untextured
    draws)."""
    return np.full((1, 1, 4), 255, np.uint8)


def approx_bytes(tex: np.ndarray) -> int:
    """Parity with TextureLoader.cpp:20-21: W*H*4."""
    return int(tex.shape[0]) * int(tex.shape[1]) * 4
