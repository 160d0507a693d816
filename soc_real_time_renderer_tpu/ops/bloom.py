"""Bloom: CoD:AW 13-tap downsample + 3x3 tent additive upsample chain.

Port of ``bloom_downsample.inl:71-144`` / ``bloom_upsample.inl:80-130``
with the reference's graph wiring (``renderer.cpp:1024-1062``): the
chain runs on the **emissive** G-buffer target — emissive -> mip0 ->
... -> mip3, then mip3 upsampled additively (ONE+ONE blending,
``bloom_upsample.inl:31-44``) back up the chain into emissive.

Mip i has resolution (W >> i, H >> i) — mip0 is FULL resolution, so the
first "downsample" is a same-size 13-tap blur (renderer.cpp:862-881
mip_size starts at window size; chain wiring renderer.cpp:1024-1062).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import sampling


def _grid_uv(h, w):
    ux = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    uy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    return jnp.stack(jnp.meshgrid(ux, uy, indexing="xy"), -1)  # (h, w, 2)


def downsample_13tap(src, dst_h, dst_w):
    """src: (3, H, W) -> (3, dst_h, dst_w)."""
    H, W = src.shape[1:]
    x = 1.0 / W
    y = 1.0 / H
    uv = _grid_uv(dst_h, dst_w)

    def tap(dx, dy):
        return sampling.sample_screen(
            src, uv + jnp.array([dx, dy], jnp.float32))  # (h, w, 3)

    a = tap(-2 * x, 2 * y); b = tap(0, 2 * y); c = tap(2 * x, 2 * y)
    d = tap(-2 * x, 0);     e = tap(0, 0);     f = tap(2 * x, 0)
    g = tap(-2 * x, -2 * y); h_ = tap(0, -2 * y); i = tap(2 * x, -2 * y)
    j = tap(-x, y); k = tap(x, y); l = tap(-x, -y); m = tap(x, -y)
    out = (e * 0.125 + (a + c + g + i) * 0.03125 + (b + d + f + h_) * 0.0625
           + (j + k + l + m) * 0.125)
    return out.transpose(2, 0, 1)


def upsample_tent(src, dst_h, dst_w):
    """src: (3, h, w) lower mip -> (3, dst_h, dst_w) tent-filtered."""
    H, W = src.shape[1:]
    x = 1.0 / W          # offsets in SOURCE texel units (upsample.inl:99-100)
    y = 1.0 / H
    uv = _grid_uv(dst_h, dst_w)

    def tap(dx, dy):
        return sampling.sample_screen(
            src, uv + jnp.array([dx, dy], jnp.float32))

    a = tap(-x, y); b = tap(0, y); c = tap(x, y)
    d = tap(-x, 0); e = tap(0, 0); f = tap(x, 0)
    g = tap(-x, -y); h_ = tap(0, -y); i = tap(x, -y)
    out = (e * 4.0 + (b + d + f + h_) * 2.0 + (a + c + g + i)) / 16.0
    return out.transpose(2, 0, 1)


def bloom(emissive, mip_count: int = 4):
    """Full chain on the emissive target; returns the blurred emissive
    (additive upsample back into each level, ONE+ONE)."""
    H, W = emissive.shape[1:]
    mips = []
    cur = emissive
    for i in range(mip_count):
        h, w = max(H >> i, 1), max(W >> i, 1)
        cur = downsample_13tap(cur, h, w)
        mips.append(cur)
    # upsample: mip3 -> mip2 -> ... -> emissive, additive into each dst
    cur = mips[-1]
    for i in range(mip_count - 2, -1, -1):
        h, w = mips[i].shape[1:]
        cur = mips[i] + upsample_tent(cur, h, w)
    return emissive + upsample_tent(cur, H, W)
