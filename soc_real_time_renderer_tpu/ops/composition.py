"""Deferred lighting composition pass.

Pure-function port of the reference's composition fragment shader
(``/root/reference/src/graphics/tasks/composition.inl:82-228``),
including its quirks (kept for pixel comparability):

* sun term is ``max(0, n·-sun_dir) * shadow`` with **no** intensity or
  albedo factor (``:203``); point/spot lights multiply albedo *inside*
  the light function (``:125,160``) and the total is multiplied by
  albedo again (``:213``) — i.e. albedo² for local lights;
* exponential shadow factor
  ``clamp(exp(k (z - d))^darkening, 0, 1)`` with the shadow map read
  through a *linear* (not comparison) sampler (``:169-173``);
* the 2-step dithered volumetric march is computed then force-zeroed
  (``:176-196``) — we implement it behind ``enable_volumetric`` and
  default it off like the reference;
* SSR mix is commented out (``:213-216``) — same flag treatment;
* sky pixels (depth == 1) take the clouds image (``:220-222``).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import sampling
from ..config import ShaderGlobals

DITHER_PATTERN = jnp.array([  # composition.inl:104-108 (row = x%4, col = y%4)
    [0.0, 0.5, 0.125, 0.625],
    [0.75, 0.22, 0.875, 0.375],
    [0.1875, 0.6875, 0.0625, 0.5625],
    [0.9375, 0.4375, 0.8125, 0.3125]], jnp.float32)

HG_G = 0.7  # composition.inl:102


def world_from_depth(uv, depth, inv_projection, inv_view):
    """composition.inl:114-122: clip=(uv*2-1, depth, 1) -> world."""
    ndc = uv * 2.0 - 1.0
    clip = jnp.stack([ndc[..., 0], ndc[..., 1], depth,
                      jnp.ones_like(depth)], axis=-1)
    view = clip @ inv_projection.T
    view = view / jnp.where(view[..., 3:4] != 0, view[..., 3:4], 1.0)
    world = view @ inv_view.T
    return world[..., :3]


def _henyey_greenstein(cos_theta, g=HG_G):
    return (1.0 - g * g) / (4.0 * jnp.pi
                            * (1.0 + g * g - 2.0 * g * cos_theta) ** 1.5)


def _point_lights(g: ShaderGlobals, albedo, normal, position):
    """composition.inl:124-140 for all 128 slots, masked by count."""
    lp = g.lights.point_position                  # (L, 3)
    L = lp.shape[0]
    to_l = lp[None, :, :] - position[:, None, :]  # (P, L, 3)
    dist2 = jnp.sum(to_l * to_l, -1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    ldir = to_l / dist[..., None]
    atten = 1.0 / jnp.maximum(dist2, 1e-12)
    vdir = g.camera.position[None, :] - position
    vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=-1, keepdims=True),
                              1e-8)
    half = ldir + vdir[:, None, :]
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1, keepdims=True),
                              1e-8)
    diffuse = jnp.maximum(jnp.einsum("plc,pc->pl", ldir, normal), 0.0)
    nh = jnp.arccos(jnp.clip(jnp.einsum("plc,pc->pl", half, normal),
                             -1.0, 1.0))
    spec = jnp.exp(-(nh * nh))
    mask = (jnp.arange(L) < g.lights.point_count).astype(jnp.float32)
    contrib = (albedo[:, None, :] * g.lights.point_color[None]
               * (diffuse + spec)[..., None] * atten[..., None]
               * g.lights.point_intensity[None, :, None]
               * mask[None, :, None])
    return jnp.sum(contrib, axis=1)


def _spot_lights(g: ShaderGlobals, albedo, normal, position):
    """composition.inl:142-160."""
    lp = g.lights.spot_position
    L = lp.shape[0]
    to_l = lp[None, :, :] - position[:, None, :]
    dist2 = jnp.sum(to_l * to_l, -1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    ldir = to_l / dist[..., None]
    sdir = g.lights.spot_direction
    sdir = sdir / jnp.maximum(jnp.linalg.norm(sdir, axis=-1, keepdims=True), 1e-8)
    theta = jnp.einsum("plc,lc->pl", ldir, -sdir)
    eps = g.lights.spot_cut_off - g.lights.spot_outer_cut_off
    eps = jnp.where(eps != 0, eps, 1e-6)
    cone = jnp.clip((theta - g.lights.spot_outer_cut_off[None]) / eps[None],
                    0.0, 1.0)
    atten = 1.0 / jnp.maximum(dist2, 1e-12)
    vdir = g.camera.position[None, :] - position
    vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=-1, keepdims=True), 1e-8)
    half = ldir + vdir[:, None, :]
    half = half / jnp.maximum(jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-8)
    diffuse = jnp.maximum(jnp.einsum("plc,pc->pl", ldir, normal), 0.0)
    nh = jnp.arccos(jnp.clip(jnp.einsum("plc,pc->pl", half, normal),
                             -1.0, 1.0))
    spec = jnp.exp(-(nh * nh))
    mask = (jnp.arange(L) < g.lights.spot_count).astype(jnp.float32)
    contrib = (albedo[:, None, :] * g.lights.spot_color[None]
               * (diffuse + spec)[..., None] * atten[..., None]
               * g.lights.spot_intensity[None, :, None]
               * cone[..., None] * mask[None, :, None])
    return jnp.sum(contrib, axis=1)


def compose(g: ShaderGlobals, depth, albedo, emissive, normal, ssao,
            shadow_map, clouds, *, enable_volumetric: bool = False,
            enable_shadow: bool = True):
    """Full composition pass.

    depth: (H, W); albedo/emissive/normal: (3, H, W); ssao: (H, W) (pass
    ones to disable); shadow_map: (S, S) or None; clouds: (3, H, W) or
    None.  Returns (3, H, W) HDR colour.
    """
    H, W = depth.shape
    uvx = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    uvy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uv = jnp.stack(jnp.meshgrid(uvx, uvy, indexing="xy"), -1).reshape(-1, 2)

    d = depth.reshape(-1)
    position = world_from_depth(uv, d, g.camera.inv_projection,
                                g.camera.inv_view)
    alb = albedo.reshape(3, -1).T
    emi = emissive.reshape(3, -1).T * g.emissive_bloom_strength
    nrm = normal.reshape(3, -1).T
    occ = jnp.power(jnp.maximum(ssao.reshape(-1), 0.0),
                    g.ambient_occlussion_strength)

    # --- sun shadow (composition.inl:164-173)
    if enable_shadow and shadow_map is not None:
        spv = g.sun.projection_view
        sp = position @ spv[:3, :3].T + spv[:3, 3]
        sw = position @ spv[3, :3].T + spv[3, 3]
        proj = sp / jnp.where(sw[:, None] != 0, sw[:, None], 1.0)
        suv = proj[:, :2] * 0.5 + 0.5
        sdepth = sampling.sample_screen(shadow_map, suv)
        sun_shadow = jnp.clip(
            jnp.exp(g.sun.exponential_factor * (proj[:, 2] - sdepth))
            ** g.sun.darkening_factor, 0.0, 1.0)
    else:
        sun_shadow = jnp.ones_like(d)

    direct_scalar = (jnp.maximum(0.0, nrm @ (-g.sun.direction))
                     * sun_shadow)
    direct = jnp.broadcast_to(direct_scalar[:, None], alb.shape)

    direct = direct + _point_lights(g, alb, nrm, position)
    direct = direct + _spot_lights(g, alb, nrm, position)

    # --- volumetric light (computed-then-zeroed in the reference)
    if enable_volumetric and shadow_map is not None:
        spv = g.sun.projection_view
        cam4 = jnp.concatenate([g.camera.position, jnp.ones(1)], 0)
        scp = spv @ cam4
        scp = scp[:3] / jnp.where(scp[3] != 0, scp[3], 1.0)
        V = proj - scp[None, :]
        step_len = jnp.linalg.norm(V, axis=-1, keepdims=True) / 2.0
        Vn = V / jnp.maximum(jnp.linalg.norm(V, axis=-1, keepdims=True), 1e-8)
        step = Vn * step_len
        xi = (uv[:, 0] * W).astype(jnp.int32) % 4
        yi = (uv[:, 1] * H).astype(jnp.int32) % 4
        dither = DITHER_PATTERN[xi, yi]
        accum = jnp.zeros_like(d)
        for i in range(2):  # NUM_STEPS_INT = 2
            pstep = scp[None, :] + step * float(i) + dither[:, None] * step
            accum += sampling.sample_shadow_cmp(
                shadow_map, pstep[:, :2] * 0.5 + 0.5, pstep[:, 2])
        vdir = position - g.camera.position[None, :]
        vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=-1, keepdims=True),
                                  1e-8)
        vol = (accum / 2.0) * _henyey_greenstein(vdir @ (-g.sun.direction))
        volumetric = vol[:, None]
    else:
        volumetric = jnp.zeros((1, 1), jnp.float32)

    color = ((direct + g.ambient[None, :]) * alb * occ[:, None]
             + volumetric + emi)

    if clouds is not None:
        sky = clouds.reshape(3, -1).T
        color = jnp.where((d == 1.0)[:, None], sky, color)

    return color.T.reshape(3, H, W)
