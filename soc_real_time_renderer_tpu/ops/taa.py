"""Temporal anti-aliasing.

Port of ``temporal_antialiasing.inl:120-199``: 3x3 neighbourhood with
Gaussian-blurred colour and min/max colour AABB, closest-depth velocity
dilation, history reprojection at ``uv - velocity`` with AABB clamping,
blend ``accum = min(0.1, frame_counter)`` (1.0 when reprojected uv is
off-screen), and velocity-disocclusion fallback to the blurred colour.

The copy-image tasks T19 (``renderer.cpp:1182-1198``) become the
returned (color, velocity) carried in RenderHistory.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import sampling

GAUSS = [1 / 16, 1 / 8, 1 / 16,
         1 / 8, 1 / 4, 1 / 8,
         1 / 16, 1 / 8, 1 / 16]


def taa(color, depth, velocity, prev_color, prev_velocity, frame_counter,
        resolution_hw):
    """color/prev_color: (3, H, W); depth: (H, W); velocity/prev_velocity:
    (2, H, W); frame_counter: () int32.  Returns resolved (3, H, W)."""
    H, W = depth.shape
    ux = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    uy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uv = jnp.stack(jnp.meshgrid(ux, uy, indexing="xy"), -1)  # (H, W, 2)
    px = jnp.array([1.0 / W, 1.0 / H], jnp.float32)

    blurred = jnp.zeros((H, W, 3), jnp.float32)
    min_c = jnp.full((H, W, 3), 1e6, jnp.float32)
    max_c = jnp.full((H, W, 3), -1e6, jnp.float32)
    closest_depth = jnp.ones((H, W), jnp.float32)
    depth_uv = uv
    center = None
    # loop order matches the shader (y: 1..-1, x: 1..-1) so the
    # "closest == depth" update ties resolve identically
    for y in (1, 0, -1):
        for x in (1, 0, -1):
            index = (y + 1) * 3 + (x + 1)
            o = uv + jnp.array([x, y], jnp.float32) * px
            c = sampling.sample_screen(color, o)          # (H, W, 3)
            d = sampling.sample_screen(depth, o)
            upd = d <= closest_depth  # min() keeps first-seen on ties;
            # the shader compares equality after min so <= reproduces it
            closest_depth = jnp.minimum(closest_depth, d)
            depth_uv = jnp.where(upd[..., None], o, depth_uv)
            min_c = jnp.minimum(min_c, c)
            max_c = jnp.maximum(max_c, c)
            blurred = blurred + GAUSS[index] * c
            if index == 5:
                # The shader's "color = neighbors[5]" (:173) is the
                # (x=+1, y=0) texel, NOT the centre (index 4) — a
                # reference off-by-one reproduced here for pixel parity.
                center = c

    velocity_s = sampling.sample_screen(velocity, depth_uv)  # dilated
    accum = jnp.minimum(0.1, frame_counter.astype(jnp.float32))
    shift_uv = uv - velocity_s
    off = ((shift_uv[..., 0] < 0) | (shift_uv[..., 1] < 0)
           | (shift_uv[..., 0] > 1) | (shift_uv[..., 1] > 1))
    accum = jnp.where(off, 1.0, accum)

    acc_color = sampling.sample_screen(prev_color, shift_uv)
    acc_color = jnp.clip(acc_color, min_c, max_c)
    out = center * accum[..., None] + acc_color * (1.0 - accum[..., None])

    pv = sampling.sample_screen(prev_velocity, shift_uv)
    vel_len = jnp.linalg.norm(pv - velocity_s, axis=-1)
    disocc = jnp.clip((vel_len - 0.001) * 10.0, 0.0, 1.0)
    out = out + (blurred - out) * disocc[..., None]
    return out.transpose(2, 0, 1)
