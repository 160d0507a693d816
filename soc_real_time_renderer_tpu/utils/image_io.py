"""Image IO: PNG/JPG dump of rendered frames (the swapchain-present
analog for headless operation) and EXR for HDR dumps."""
from __future__ import annotations

import numpy as np


def to_srgb_u8(color) -> np.ndarray:
    """(3, H, W) linear [0,1] -> (H, W, 3) u8 sRGB-encoded.

    The reference's swapchain is an sRGB format, so the hardware applies
    this encode on write; we do it at dump time.
    """
    from ..models.texture import linear_to_srgb
    c = np.asarray(color, np.float32)
    c = np.clip(c, 0.0, 1.0).transpose(1, 2, 0)
    return (linear_to_srgb(c) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, color, already_u8: bool = False) -> None:
    from PIL import Image
    arr = np.asarray(color) if already_u8 else to_srgb_u8(color)
    Image.fromarray(arr).save(path)


def save_exr(path: str, color) -> None:
    """(C, H, W) float -> scanline float32 EXR (uncompressed)."""
    from . import exr
    c = np.asarray(color, np.float32)
    exr.write_exr(path, c)
