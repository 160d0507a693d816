"""Pallas windowed TAA history reprojection.

The TAA history fetch — bilinear (prev_color, prev_velocity) at
``uv - velocity`` — is the pass's entire cost in XLA: 2.1M indices
into the 84 MB 4-corner-prestacked history table sit on the
latency-bound plateau (~22 ms at 1080p, PERF.md round 2).  But TAA
velocities are small by construction (sub-pixel jitter + slow camera
motion), so the access is LOCAL: per (8, 128) output tile, DMA a
(WR, WL) window of the packed (5, H, W) bf16 history into VMEM and
resolve the bilinear tap with the soft-one-hot MXU gather (x-weights
ride the lane one-hot, y-weights the row mask — same scheme as
ops/sky_pallas.py).

Taps whose footprint leaves the window (|velocity| beyond the margins,
~±24 rows / ±128 lanes at the defaults; lane margins are
128-aligned, so window_lanes must be ≥384 for any left margin) return ``oow = 1`` and the XLA
side treats them exactly like the reference's off-screen case
(``accum = 1`` -> current frame, temporal_antialiasing.inl:178-184) —
a documented deviation only for >margin/frame motion, where the
reference would reproject (and ghost).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _taa_kernel(params_ref, vel_ref, hist_ref, out_ref, oow_ref, win,
                sem, *, C, WR, WL, MY, MX, Hp, Wp, H, W, h_glob):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    oy = pl.multiple_of(jnp.clip(ty * 8 - MY, 0, Hp - WR), 8)
    ox = pl.multiple_of(jnp.clip(tx * 128 - MX, 0, Wp - WL), 128)

    dma = pltpu.make_async_copy(
        hist_ref.at[:, pl.ds(oy, WR), pl.ds(ox, WL)], win, sem)
    dma.start()

    # row0 = global row of the band's first row (0 single-chip; SPMD
    # row bands pass their offset so uv/velocity scale by the FULL
    # screen height, parallel/halo.py)
    row0 = params_ref[0]
    iy = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
          + ty * 8)
    ix = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
          + tx * 128)
    u = (ix.astype(jnp.float32) + 0.5) / W - vel_ref[0]
    v = (iy.astype(jnp.float32) + row0 + 0.5) / h_glob - vel_ref[1]
    # sample_screen convention: x = u*W - 0.5, clamp-to-edge corners
    # (screen-edge clamp uses GLOBAL rows, then shifts into the band)
    x = u * W - 0.5
    y = v * h_glob - 0.5 - row0
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    # screen-edge clamp in band-local coords ([-row0, h_glob-1-row0];
    # row0 = 0 single-chip makes this exactly clip(., 0, H-1))
    r0i = row0.astype(jnp.int32)
    y0 = jnp.clip(y0f.astype(jnp.int32), -r0i, h_glob - 1 - r0i)
    y1 = jnp.clip(y0 + 1, -r0i, h_glob - 1 - r0i)
    # fractions vs the CLIPPED base, clamped to [0, 1] — matches
    # sample_screen's clamp-to-edge emulation: just below the low edge
    # both corners are texel 0 (fx = 0), not a blend toward texel 1
    fx = jnp.clip(x - x0.astype(jnp.float32), 0.0, 1.0)
    fy = jnp.clip(y - y0.astype(jnp.float32), 0.0, 1.0)

    # out-of-window: any corner outside the DMA'd window
    oow = ((x0 < ox) | (x1 > ox + WL - 1)
           | (y0 < oy) | (y1 > oy + WR - 1))
    oow_ref[:] = oow.astype(jnp.float32)
    wx0 = jnp.clip(x0 - ox, 0, WL - 1)
    wx1 = jnp.clip(x1 - ox, 0, WL - 1)
    wy0 = jnp.clip(y0 - oy, 0, WR - 1)
    wy1 = jnp.clip(y1 - oy, 0, WR - 1)

    dma.wait()
    wf = win[:].reshape(C * WR, WL)                # (C*WR, WL) bf16

    iL = jax.lax.broadcasted_iota(jnp.int32, (WL, 128), 0)
    iR = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 0)
    rows = []
    for s in range(8):
        fxs = fx[s:s + 1]
        fys = fy[s:s + 1]
        ohL = (jnp.where(iL == wx0[s:s + 1], 1.0 - fxs, 0.0)
               + jnp.where(iL == wx1[s:s + 1], fxs, 0.0)
               ).astype(jnp.bfloat16)
        col = jax.lax.dot_general(
            wf, ohL, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (C*WR, 128)
        colc = col.reshape(C, WR, 128)
        wy = (jnp.where(iR == wy0[s:s + 1], 1.0 - fys, 0.0)
              + jnp.where(iR == wy1[s:s + 1], fys, 0.0))   # (WR, 128)
        rows.append(jnp.sum(colc * wy[None], axis=1))      # (C, 128)
    out = jnp.stack(rows, axis=1)                   # (C, 8, 128)
    out_ref[:] = out


def reproject_history_pallas(history, velocity, *, window_rows: int = 56,
                             window_lanes: int = 384,
                             interpret: bool | None = None,
                             row0=None, full_h: int | None = None):
    """Bilinear-sample packed history (C, H, W) bf16 at uv - velocity.

    velocity: (2, H, W) f32.  Returns (hist (C, H, W) f32,
    oow (H, W) f32 — 1.0 where the tap left the VMEM window and the
    caller must take the off-screen path).

    row0 / full_h: SPMD row-band mode (parallel/halo.py) — `history`
    is a halo-padded band whose first row is global row `row0` of a
    `full_h`-row screen; velocity stays in full-screen uv units.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    C, H, W = history.shape
    h_glob = H if full_h is None else full_h
    params = jnp.stack([jnp.float32(0.0) if row0 is None
                        else row0.astype(jnp.float32)])
    hp = -(-H // 8) * 8
    wp = -(-W // 128) * 128
    WL = min(window_lanes, wp)
    WR = min(window_rows, hp)
    MY = (WR - 8) // 2 // 8 * 8
    MX = (WL - 128) // 2 // 128 * 128

    hist = jnp.pad(history.astype(jnp.bfloat16),
                   ((0, 0), (0, hp - H), (0, wp - W)))
    vel = jnp.pad(velocity.astype(jnp.float32),
                  ((0, 0), (0, hp - H), (0, wp - W)))

    kernel = functools.partial(_taa_kernel, C=C, WR=WR, WL=WL, MY=MY,
                               MX=MX, Hp=hp, Wp=wp, H=H, W=W,
                               h_glob=h_glob)
    out, oow = pl.pallas_call(
        kernel,
        grid=(hp // 8, wp // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params (1,)
            pl.BlockSpec((2, 8, 128), lambda ty, tx: (0, ty, tx)),
            pl.BlockSpec(memory_space=pl.ANY),      # history (HBM)
        ],
        out_specs=[
            pl.BlockSpec((C, 8, 128), lambda ty, tx: (0, ty, tx)),
            pl.BlockSpec((8, 128), lambda ty, tx: (ty, tx)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, WR, WL), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(params, vel, hist)
    return out[:, :H, :W], oow[:H, :W]
