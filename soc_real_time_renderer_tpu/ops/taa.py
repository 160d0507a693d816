"""Temporal anti-aliasing (planar, gather-minimal).

Port of ``temporal_antialiasing.inl:120-199``: 3x3 neighbourhood with
Gaussian-blurred colour and min/max colour AABB, closest-depth velocity
dilation, history reprojection at ``uv - velocity`` with AABB clamping,
blend ``accum = min(0.1, frame_counter)`` (1.0 when reprojected uv is
off-screen), and velocity-disocclusion fallback to the blurred colour.

The copy-image tasks T19 (``renderer.cpp:1182-1198``) become the
returned (color, velocity) carried in RenderHistory.

TPU shaping: the 3x3 neighbourhood taps are constant-offset shifts
(pad+slice — zero gathers); the reprojected history fetch packs
prev_color+prev_velocity into ONE (5, H, W) bilinear gather set.

Reference off-by-one kept: the shader's "color = neighbors[5]" (:173)
is the (x=+1, y=0) texel, not the centre.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import sampling

GAUSS = [1 / 16, 1 / 8, 1 / 16,
         1 / 8, 1 / 4, 1 / 8,
         1 / 16, 1 / 8, 1 / 16]


def taa(color, depth, velocity, prev_color, prev_velocity, frame_counter,
        impl: str = "xla", interpret: bool | None = None, shard=None):
    """color/prev_color: (3, H, W); depth: (H, W); velocity/prev_velocity:
    (2, H, W); frame_counter: () int32.  Returns resolved (3, H, W).

    impl="pallas" uses the windowed VMEM reprojection kernel
    (ops/taa_pallas.py, ~6x cheaper history fetch; taps beyond the
    window margins take the reference's off-screen path).

    shard=(mesh, axis): run the Pallas reprojection under SPMD as row
    bands with halo exchange (parallel/halo.py); the surrounding 3x3
    shift/AABB math stays global-view XLA (it shards natively)."""
    H, W = depth.shape
    uv = sampling.grid_uv(H, W)                    # (2, H, W)

    blurred = jnp.zeros_like(color)
    min_c = jnp.full_like(color, 1e6)
    max_c = jnp.full_like(color, -1e6)
    closest_depth = jnp.ones_like(depth)
    dilate_dx = jnp.zeros_like(depth)
    dilate_dy = jnp.zeros_like(depth)
    center = None
    # loop order matches the shader (y: 1..-1, x: 1..-1): "closest ==
    # depth" favours the latest minimum
    for y in (1, 0, -1):
        for x in (1, 0, -1):
            index = (y + 1) * 3 + (x + 1)
            c = sampling.shift(color, x, y)
            d = sampling.shift(depth, x, y)
            upd = d <= closest_depth
            closest_depth = jnp.minimum(closest_depth, d)
            dilate_dx = jnp.where(upd, float(x), dilate_dx)
            dilate_dy = jnp.where(upd, float(y), dilate_dy)
            min_c = jnp.minimum(min_c, c)
            max_c = jnp.maximum(max_c, c)
            blurred = blurred + GAUSS[index] * c
            if index == 5:
                center = c   # reference quirk (see module docstring)

    # velocity at the dilated (closest-depth) neighbour: the offsets are
    # one of 9 constants, so select among shifted velocity fields
    velocity_s = jnp.zeros_like(velocity)
    for y in (1, 0, -1):
        for x in (1, 0, -1):
            m = (dilate_dx == float(x)) & (dilate_dy == float(y))
            velocity_s = jnp.where(m[None], sampling.shift(velocity, x, y),
                                   velocity_s)

    accum = jnp.minimum(0.1, frame_counter.astype(jnp.float32))
    shift_u = uv[0] - velocity_s[0]
    shift_v = uv[1] - velocity_s[1]
    off = (shift_u < 0) | (shift_v < 0) | (shift_u > 1) | (shift_v > 1)
    accum = jnp.where(off, 1.0, accum)

    # one packed history fetch: prev_color (3) + prev_velocity (2)
    packed = jnp.concatenate([prev_color, prev_velocity], axis=0)
    oow = None
    sharded = shard is not None and shard[0] is not None
    if sharded and (H % shard[0].shape[shard[1]] != 0
                    or H // shard[0].shape[shard[1]] < 32):
        # bands too small for the 32-row halos: the XLA reprojection
        # shards natively instead
        impl = "xla"
    if impl == "pallas":
        from . import taa_pallas
        if sharded:
            from ..parallel import halo as halo_mod
            mesh, axis = shard

            def _band(imgs, row0):
                pk, vs = imgs
                return taa_pallas.reproject_history_pallas(
                    pk, vs, interpret=interpret, row0=row0, full_h=H)

            hist, oow = halo_mod.row_band_call(
                mesh, axis, _band, (packed, velocity_s), (),
                halo_top=32, halo_bot=32, full_h=H)
        else:
            hist, oow = taa_pallas.reproject_history_pallas(
                packed, velocity_s, interpret=interpret)
        accum = jnp.where(oow > 0.5, 1.0, accum)
    else:
        hist = sampling.sample_screen(packed,
                                      jnp.stack([shift_u, shift_v]))
    acc_color = jnp.clip(hist[:3], min_c, max_c)
    out = center * accum[None] + acc_color * (1.0 - accum[None])

    pv = hist[3:5]
    dv = pv - velocity_s
    vel_len = jnp.sqrt(dv[0] * dv[0] + dv[1] * dv[1])
    disocc = jnp.clip((vel_len - 0.001) * 10.0, 0.0, 1.0)
    if oow is not None:
        # Out-of-window taps return a WINDOW-edge-clamped prev velocity
        # (not the reference's screen-edge clamp), so the disocclusion
        # term would blend toward blurred differently than the
        # reference.  Those pixels already take the accum=1 off-screen
        # path (history contribution gone), so zero disocclusion there
        # instead of feeding it a wrong velocity (ADVICE round 2).
        disocc = jnp.where(oow > 0.5, 0.0, disocc)
    return out + (blurred - out) * disocc[None]
