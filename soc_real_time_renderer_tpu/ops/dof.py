"""Depth of field (disabled by default, like the reference).

Port of ``depth_of_field.inl:159-202``: physically-motivated circle of
confusion from aperture/focal_length/plane_in_focus, sampled as four
axis-offset ``textureGrad`` taps from a mip chain of the colour image
(the reference's BlitImageToImage + MipMapping tasks,
``depth_of_field.inl:16-88``, become :func:`build_mips_device`).  The
whole subgraph is commented out of the reference frame
(``renderer.cpp:1119-1153``) — here it's ``enable_depth_of_field``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import sampling


def build_mips_device(color):
    """Device-side mip chain of (3, H, W) by 2x2 mean (MipMapping task)."""
    levels = [color]
    while min(levels[-1].shape[1:]) > 1:
        c, h, w = levels[-1].shape
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        x = levels[-1][:, :h2 * 2, :w2 * 2]
        levels.append(x.reshape(c, h2, 2, w2, 2).mean(axis=(2, 4)))
    return levels


def _sample_mip(levels, uv, lod):
    """Trilinear sample across the device mip list; uv planar (2, H, W)."""
    n = len(levels)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0.astype(jnp.float32))[None]
    out0 = jnp.zeros((3,) + uv.shape[1:], jnp.float32)
    out1 = jnp.zeros_like(out0)
    for k in range(n):
        s = sampling.sample_screen(levels[k], uv)
        out0 = jnp.where((l0 == k)[None], s, out0)
        out1 = jnp.where((jnp.minimum(l0 + 1, n - 1) == k)[None], s, out1)
    return out0 * (1 - f) + out1 * f


def depth_of_field(color, depth, g):
    """color: (3, H, W); depth: (H, W). Returns (3, H, W)."""
    H, W = depth.shape
    uv = sampling.grid_uv(H, W)

    far, near = g.camera_far_clip, g.camera_near_clip
    obj = -far * near / (depth * (far - near) - far)
    num = g.focal_length * (obj - g.plane_in_focus)
    den = obj * (g.plane_in_focus - g.focal_length)
    coc = jnp.abs(g.aperture * num / jnp.where(den != 0, den, 1e-6))
    max_num = g.focal_length * (far - g.plane_in_focus)
    max_coc = jnp.abs(g.aperture * max_num / jnp.where(den != 0, den, 1e-6))
    coc = coc / jnp.maximum(max_coc, 1e-6)

    # textureGrad with gradient ddx = ddy = (coc, coc) in uv units
    # (depth_of_field.inl:191-194): the Vulkan LOD rule scales to texel
    # space and takes rho = sqrt((du)^2 + (dv)^2) = coc * sqrt(W^2+H^2)
    # (both gradient vectors are equal here), lambda = log2(rho)
    lod = jnp.log2(jnp.maximum(coc * float(np.hypot(W, H)), 1e-6))
    levels = build_mips_device(color)

    def offs(dx, dy):
        return uv + jnp.array([dx, dy], jnp.float32)[:, None, None]

    acc = (_sample_mip(levels, offs(1.0 / W, 0.0), lod)
           + _sample_mip(levels, offs(-1.0 / W, 0.0), lod)
           + _sample_mip(levels, offs(0.0, 1.0 / H), lod)
           + _sample_mip(levels, offs(0.0, -1.0 / H), lod)) * 0.25
    # the sky branch samples color at the pixel centre (texture(...,
    # in_uv), :197) — bilinear at exact centres is the identity, so no
    # resample gather is spent
    return jnp.where((depth < 1.0)[None], acc, color)


def display_attachment(image, out_h, out_w):
    """Debug pass (display_attachment.inl:67-91): nearest-blit any
    intermediate to the output size."""
    if image.ndim == 2:
        image = image[None]
    uv = sampling.grid_uv(out_h, out_w)
    return sampling.sample_screen(image, uv, method="nearest")
