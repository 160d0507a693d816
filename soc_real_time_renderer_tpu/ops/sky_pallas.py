"""Pallas sky-LUT kernel: atmosphere + volumetric clouds with the REAL
``assets/Clouds/noise.png`` resident in VMEM.

The XLA LUT path (ops/clouds.render_sky_lut) replaces the reference's
tiled noise texture (``cloud_rendering.inl:219-233``) with procedural
value noise because XLA's global gather costs ~6.3 ns/index and the
march samples noise ~2112 times per LUT texel (~434 ms/frame at the
256x128 LUT — PERF.md).  This kernel makes the lookup LOCAL: the 64x64
noise tile lives in VMEM and every bilinear-repeat sample is ONE
(64,64) @ (64,128) soft-one-hot matmul on the MXU (the one-hot carries
the bilinear x-weights; the y-weights ride the row mask-reduce), so a
tap costs ~0.5 MMAC instead of 128 serialized HBM fetches.

Same march structure as ops/clouds.py (cloud_rendering.inl:307-350):
24-step shell march, 10-step sun-visibility march per sample, 4-octave
fBm, two-lobe HG phase, powder/Beer, scatter integral, atmosphere
16x8 single scattering — all planar (8, 128)-tile math.

Deviations (documented, shared with the XLA LUT path): the LUT
replaces per-pixel marching, so the bayer16 dither becomes the
constant 0.5 and parallax inside a frame comes from the direction
lookup only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .clouds import (CLOUD_DENSITY, CLOUD_MAX, CLOUD_MIN, CLOUD_SPEED,
                     CLOUD_THICKNESS, EARTH_RADIUS, R_LOG2, SUN_BRIGHTNESS,
                     _atmospheric_scattering_top)

# atmosphere constants (clouds._atmosphere defaults)
K_RLH = (5.5e-6, 13.0e-6, 22.4e-6)
K_MIE = 21e-6
I_SUN = 22.0
R_PLANET = 6371e3
R_ATMOS = 6471e3
SH_RLH = 8e3
SH_MIE = 1.2e3
G_MIE = 0.758
NOISE_N = 64


def _rsi_planar(px, py, pz, dx, dy, dz, radius):
    """clouds._rsi on planar components; returns (near, far), -1 miss."""
    pod = px * dx + py * dy + pz * dz
    delta = pod * pod + radius * radius - (px * px + py * py + pz * pz)
    ok = delta >= 0
    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
    return (jnp.where(ok, -pod - sq, -1.0), jnp.where(ok, -pod + sq, -1.0))


def _hg(x, g):
    g2 = g * g
    return 0.25 * (1.0 - g2) * (1.0 + g2 - 2.0 * g * x) ** -1.5


def _sample_noise_mxu(noise, cu, cv):
    """Bilinear-repeat sample of the (64, 64) VMEM noise tile at uv
    (cu, cv) — both (8, 128) — via ONE soft-one-hot MXU matmul for the
    whole tile (clouds._sample_repeat semantics: x = u*N - 0.5).

    The 8 sublane rows are flattened into the lane dim: weights are
    built per sublane as (64, 128) blocks and concatenated to
    (64, 1024), so the 8 small (64,64)@(64,128) matmuls of the naive
    form become one (64,64)@(64,1024) — same MACs, 8x fewer MXU
    dispatches (the march issues 2112 taps per tile, so dispatch
    overhead is a first-order cost).  The bilinear weight itself is the
    closed form max(0, 1 - wrap_dist(iN, x)) — cheaper on the VPU than
    two one-hot compares + selects, and exactly equal for fx in [0,1):
    lane x0 gets 1-fx, lane x1 gets fx, every other lane 0."""
    N = NOISE_N
    x = cu * N - 0.5
    y = cv * N - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    # wrapped fractional coordinate in [0, N)
    xw = jnp.remainder(x0f, N) + fx
    yw = jnp.remainder(y0f, N) + fy

    # integer iota + convert: Mosaic's tpu.iota is int-only
    iN = jax.lax.broadcasted_iota(
        jnp.int32, (N, 128), 0).astype(jnp.float32)

    def weights(cw):
        """(8,128) wrapped coord -> (64, 1024) bilinear lane weights."""
        cols = []
        for s in range(8):
            d = jnp.abs(iN - cw[s:s + 1])
            d = jnp.minimum(d, N - d)                # repeat wrap
            cols.append(jnp.maximum(0.0, 1.0 - d))
        return jnp.concatenate(cols, axis=1)         # (64, 1024)

    WX = weights(xw).astype(jnp.bfloat16)
    col = jax.lax.dot_general(
        noise, WX, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (64y, 1024)
    WY = weights(yw)
    summed = jnp.sum(col * WY, axis=0, keepdims=True)    # (1, 1024)
    return jnp.concatenate(
        [summed[:, s * 128:(s + 1) * 128] for s in range(8)], axis=0)


def _noise3(noise, px, py, pz):
    """clouds._get_3d_noise: fake 3D from z-slice pairs."""
    zp = jnp.floor(pz)
    f = pz - zp
    inv_res = 1.0 / 64.0
    z_stretch = 17.0 * inv_res
    cu = px * inv_res + zp * z_stretch
    cv = py * inv_res + zp * z_stretch
    n0 = _sample_noise_mxu(noise, cu, cv)
    n1 = _sample_noise_mxu(noise, cu + z_stretch, cv + z_stretch)
    return n0 + (n1 - n0) * f


def _get_clouds(noise, px, py, pz, cam_x, cam_z, elapsed_time):
    """clouds._get_clouds planar: density at ray-relative position p."""
    upy = EARTH_RADIUS
    h = jnp.sqrt(px * px + (py + upy) * (py + upy) + pz * pz) - EARTH_RADIUS
    wx = px + cam_x
    wz = pz + cam_z
    inside = (h >= CLOUD_MIN) & (h <= CLOUD_MAX)

    t = -CLOUD_SPEED * elapsed_time
    # coord = (wx, h, wz) * 0.001 + (t, 0, t); octave offsets likewise
    cx = wx * 0.001 + t
    cy = h * 0.001
    cz = wz * 0.001 + t

    n = _noise3(noise, cx, cy, cz) * 0.5
    n += _noise3(noise, cx * 2.0 + t, cy * 2.0, cz * 2.0 + t) * 0.25
    n += _noise3(noise, cx * 7.0 - t, cy * 7.0, cz * 7.0 - t) * 0.125
    n += _noise3(noise, (cx + t) * 16.0, cy * 16.0, (cz + t) * 16.0) * 0.0625

    hh = h - CLOUD_MIN
    thresh = (1.0 - jnp.exp(-0.01 * hh)) * jnp.exp(-0.004 * hh)
    tt = jnp.clip((n - 0.55) / 0.05, 0.0, 1.0)
    clouds = (tt * tt * (3.0 - 2.0 * tt)) * thresh
    return jnp.where(inside, clouds * CLOUD_DENSITY, 0.0)


def _sky_kernel(params_ref, noise_ref, out_ref, *, lut_w, lut_h,
                march_steps, sun_steps, i_steps, j_steps):
    from jax.experimental import pallas as pl

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    p = [params_ref[i] for i in range(16)]
    sun_x, sun_y, sun_z = p[0], p[1], p[2]
    cam_x, cam_y, cam_z = p[3], p[4], p[5]
    elapsed = p[6]
    sky_r, sky_g, sky_b = p[7], p[8], p[9]
    sun_cr, sun_cg, sun_cb = p[10], p[11], p[12]

    noise = noise_ref[:].astype(jnp.bfloat16)            # (64, 64)

    # ---- ray directions of this (8, 128) LUT tile (lat-long)
    iy = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
          .astype(jnp.float32) + ty.astype(jnp.float32) * 8.0)
    ix = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
          .astype(jnp.float32) + tx.astype(jnp.float32) * 128.0)
    az = (ix + 0.5) / lut_w * (2.0 * np.pi) - np.pi
    el = (iy + 0.5) / lut_h * np.pi - np.pi / 2
    ce = jnp.cos(el)
    rx = ce * jnp.cos(az)
    ry = jnp.sin(el)
    rz = ce * jnp.sin(az)

    # ---- atmosphere (clouds._atmosphere, 16 x 8)
    ox = jnp.zeros_like(rx) + cam_x
    oy = jnp.zeros_like(rx) + (6372e3 + cam_y)
    oz = jnp.zeros_like(rx) + cam_z
    p_near, p_far = _rsi_planar(ox, oy, oz, rx, ry, rz, R_ATMOS)
    miss = p_near > p_far
    g_near, _ = _rsi_planar(ox, oy, oz, rx, ry, rz, R_PLANET)
    p_far = jnp.minimum(p_far, g_near)
    i_step = (p_far - p_near) / i_steps

    mu = rx * sun_x + ry * sun_y + rz * sun_z
    mumu = mu * mu
    gg = G_MIE * G_MIE
    p_rlh = 3.0 / (16.0 * np.pi) * (1.0 + mumu)
    p_mie = (3.0 / (8.0 * np.pi) * ((1.0 - gg) * (mumu + 1.0))
             / ((1.0 + gg - 2.0 * mu * G_MIE) ** 1.5 * (2.0 + gg)))

    def atmo_body(ii, carry):
        i_time, tot, iod_r, iod_m = carry
        tr, tg, tb = tot
        tmid = i_time + i_step * 0.5
        ipx = ox + rx * tmid
        ipy = oy + ry * tmid
        ipz = oz + rz * tmid
        i_h = jnp.sqrt(ipx * ipx + ipy * ipy + ipz * ipz) - R_PLANET
        od_r = jnp.exp(-i_h / SH_RLH) * i_step
        od_m = jnp.exp(-i_h / SH_MIE) * i_step
        iod_r = iod_r + od_r
        iod_m = iod_m + od_m

        _, j_far = _rsi_planar(ipx, ipy, ipz, sun_x * jnp.ones_like(ipx),
                               sun_y * jnp.ones_like(ipx),
                               sun_z * jnp.ones_like(ipx), R_ATMOS)
        j_step = j_far / j_steps

        def j_body(jj, jc):
            jod_r, jod_m = jc
            j_t = j_step * jj.astype(jnp.float32) + j_step * 0.5
            jpx = ipx + sun_x * j_t
            jpy = ipy + sun_y * j_t
            jpz = ipz + sun_z * j_t
            j_h = jnp.sqrt(jpx * jpx + jpy * jpy + jpz * jpz) - R_PLANET
            return (jod_r + jnp.exp(-j_h / SH_RLH) * j_step,
                    jod_m + jnp.exp(-j_h / SH_MIE) * j_step)

        jod_r, jod_m = jax.lax.fori_loop(
            0, j_steps, j_body, (jnp.zeros_like(i_step),
                                 jnp.zeros_like(i_step)))

        outs = []
        for c, k_r in enumerate(K_RLH):
            attn = jnp.exp(-(K_MIE * (iod_m + jod_m)
                             + k_r * (iod_r + jod_r)))
            outs.append(attn)
        # total_rlh/mie accumulate od * attn per channel; fold the
        # phase/K weights at the end.  Store as 6 running sums packed in
        # 3 channels each.
        tr = (tr[0] + od_r * outs[0], tr[1] + od_r * outs[1],
              tr[2] + od_r * outs[2])
        tg = (tg[0] + od_m * outs[0], tg[1] + od_m * outs[1],
              tg[2] + od_m * outs[2])
        return (i_time + i_step, (tr, tg, tb), iod_r, iod_m)

    zero = jnp.zeros_like(rx)
    i_time0 = jnp.zeros_like(rx) + elapsed      # the :368 iTime quirk
    (_, (tot_r, tot_m, _), _, _) = jax.lax.fori_loop(
        0, i_steps, atmo_body,
        (i_time0, ((zero, zero, zero), (zero, zero, zero),
                   (zero, zero, zero)), zero, zero))

    atmos = []
    for c, k_r in enumerate(K_RLH):
        a = I_SUN * (p_rlh * k_r * tot_r[c] + p_mie * K_MIE * tot_m[c])
        atmos.append(jnp.where(miss, 0.0, a))

    # ---- volumetric clouds (clouds._volumetric_clouds)
    upy = EARTH_RADIUS
    _, bottom = _rsi_planar(zero, zero + upy, zero, rx, ry, rz,
                            EARTH_RADIUS + CLOUD_MIN)
    _, top = _rsi_planar(zero, zero + upy, zero, rx, ry, rz,
                         EARTH_RADIUS + CLOUD_MAX)
    sx = rx * bottom
    sy = ry * bottom
    sz = rz * bottom
    incx = (rx * top - sx) / march_steps
    incy = (ry * top - sy) / march_steps
    incz = (rz * top - sz) / march_steps
    dither = 0.5
    px0 = sx + incx * dither
    py0 = sy + incy * dither
    pz0 = sz + incz * dither
    step_len = jnp.sqrt(incx * incx + incy * incy + incz * incz)

    ldotw = rx * sun_x + ry * sun_y + rz * sun_z
    m, gm = 0.5, 0.8
    phase = _hg(ldotw, -0.5 * gm) + (_hg(ldotw, 0.8 * gm)
                                     - _hg(ldotw, -0.5 * gm)) * m

    sun_r_steps = CLOUD_THICKNESS / sun_steps
    sincx = sun_x * sun_r_steps
    sincy = sun_y * sun_r_steps
    sincz = sun_z * sun_r_steps

    def march_body(i, carry):
        (sc_r, sc_g, sc_b, trans) = carry
        fi = i.astype(jnp.float32)
        cpx = px0 + incx * fi
        cpy = py0 + incy * fi
        cpz = pz0 + incz * fi
        od = _get_clouds(noise, cpx, cpy, cpz, cam_x, cam_z,
                         elapsed) * step_len

        def sun_body(k, acc):
            fk = k.astype(jnp.float32)
            qx = cpx + sincx * 0.5 + sincx * fk
            qy = cpy + sincy * 0.5 + sincy * fk
            qz = cpz + sincz * 0.5 + sincz * fk
            return acc + _get_clouds(noise, qx, qy, qz, cam_x, cam_z,
                                     elapsed)

        # The reference skips sun shading for zero-density samples
        # (cloud_rendering.inl:335 `if (opticalDepth <= 0.0) continue`);
        # the SPMD analog is per-TILE: when no pixel of the tile has
        # density at this step, every contribution below is masked by
        # tr_h == 0 anyway, so skipping the 10-step sun march (80 of
        # the 88 noise taps of this step) is output-exact.
        svis = jax.lax.cond(
            jnp.any(od > 0.0),
            lambda: jax.lax.fori_loop(0, sun_steps, sun_body,
                                      jnp.zeros_like(od)),
            lambda: jnp.zeros_like(od))
        sunv = jnp.exp(-svis * sun_r_steps)

        integral = (jnp.exp(-1.11 * R_LOG2 * od) * (-1.0 / 1.11)
                    + 1.0 / 1.11)
        beers_powder = 1.0 - jnp.exp(-od * np.log(2.0) * 2.0)
        sun_f = sunv * beers_powder * phase * (0.5 * np.pi) * SUN_BRIGHTNESS
        ipi = integral * np.pi
        hit = od > 0.0
        tr_h = jnp.where(hit, trans, 0.0)
        sc_r = sc_r + (sun_cr * sun_f + sky_r * (0.25 / np.pi)) * ipi * tr_h
        sc_g = sc_g + (sun_cg * sun_f + sky_g * (0.25 / np.pi)) * ipi * tr_h
        sc_b = sc_b + (sun_cb * sun_f + sky_b * (0.25 / np.pi)) * ipi * tr_h
        trans = jnp.where(hit, trans * jnp.exp(-od), trans)
        return (sc_r, sc_g, sc_b, trans)

    # Downward tiles skip the march entirely: the final composite
    # outputs pure atmosphere wherever ry < 0 (the reference's
    # below-horizon branch), and a lat-long tile whose LAST row is
    # still below the equator has ry < 0 everywhere — its march result
    # is provably discarded.  For the production 256x128 LUT that is
    # exactly half the tiles (and half the 2112-taps-per-texel march
    # cost), with bit-identical output.
    march_init = (zero, zero, zero, jnp.ones_like(rx))
    tile_any_up = (ty + 1) * 8 > lut_h // 2

    sc_r, sc_g, sc_b, trans = jax.lax.cond(
        tile_any_up,
        lambda: jax.lax.fori_loop(0, march_steps, march_body,
                                  march_init),
        lambda: march_init)

    fade = jnp.clip(jnp.sqrt(sx * sx + sy * sy + sz * sz)
                    * 0.00001 * 2.5, 0.0, 1.0)
    down = ry < 0.0
    outs = []
    for c, (a, s) in enumerate(zip(atmos, (sc_r, sc_g, sc_b))):
        mixed = a * trans + s
        o = mixed + (a - mixed) * fade
        outs.append(jnp.where(down, a, o))
    out_ref[0] = outs[0]
    out_ref[1] = outs[1]
    out_ref[2] = outs[2]


def render_sky_lut_pallas(g, noise_tex, lut_w: int = 256, lut_h: int = 128,
                          march_steps: int = 24, sun_steps: int = 10,
                          interpret: bool | None = None):
    """Drop-in for clouds.render_sky_lut with the REAL noise texture.

    noise_tex: (64, 64) float32 (assets/Clouds/noise.png R channel).
    Returns (3, lut_h, lut_w) sky colour (horizon factor applied, like
    render_sky_lut).
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    assert lut_h % 8 == 0 and lut_w % 128 == 0, (lut_h, lut_w)
    assert noise_tex.shape == (NOISE_N, NOISE_N), noise_tex.shape

    sun_dir = -g.sun.direction
    sky_light = _atmospheric_scattering_top(sun_dir)
    params = jnp.concatenate([
        sun_dir, g.camera.position,
        jnp.stack([g.elapsed_time]), sky_light,
        jnp.array([0.8, 0.8, 0.8], jnp.float32),
        jnp.zeros((3,), jnp.float32)]).astype(jnp.float32)

    kernel = functools.partial(
        _sky_kernel, lut_w=float(lut_w), lut_h=float(lut_h),
        march_steps=march_steps, sun_steps=sun_steps, i_steps=16, j_steps=8)
    from jax.experimental.pallas import tpu as pltpu
    sky = pl.pallas_call(
        kernel,
        grid=(lut_h // 8, lut_w // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # params (16,)
            pl.BlockSpec((NOISE_N, NOISE_N), lambda ty, tx: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 8, 128), lambda ty, tx: (0, ty, tx)),
        out_shape=jax.ShapeDtypeStruct((3, lut_h, lut_w), jnp.float32),
        interpret=interpret,
    )(params, noise_tex)

    horizon = jnp.maximum(
        jnp.minimum(jnp.abs(sun_dir[0]), jnp.abs(sun_dir[2])) + sun_dir[1],
        0.0)
    return sky * horizon
