"""Screen-space reflections.

Port of ``screen_space_reflection.inl:74-186``: view-space ray march
(50 iterations, exponential step x1.05, adaptive direction) followed by
binary-search refinement using the *remaining* iteration budget; hit
when |delta| < 0.05.  Non-metallic pixels (metallic < 0.01) and misses
pass the albedo through (``:169-174, 180-183``).

Reference quirks: the march uses |view z| comparisons; the declared
min/max HiZ inputs are never read by the shader (``:17-18``) — same
here (see ops/hiz.py for the pyramids themselves); the result is
computed but NOT composited (composition.inl:213-216), controlled by
RenderConfig.composite_ssr.

The divergent loop (early return / break / phase switch) becomes a
masked lax.fori_loop state machine; the hit colour is fetched once
after the loop at the recorded hit uv.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import sampling

RAY_STEP = 0.5
ITERATIONS = 50
DISTANCE_BIAS = 0.05


def _view_from_depth(uv, depth, inv_projection):
    ndc = uv * 2.0 - 1.0
    clip = jnp.stack([ndc[..., 0], ndc[..., 1], depth,
                      jnp.ones_like(depth)], -1)
    view = clip @ inv_projection.T
    return view[..., :3] / jnp.where(view[..., 3:4] != 0, view[..., 3:4], 1.0)


def ssr(depth, albedo, normal, metallic_roughness, g):
    """depth: (H, W); albedo/normal: (3, H, W); metallic_roughness:
    (2, H, W) (R=rough, G=metal).  Returns (3, H, W)."""
    H, W = depth.shape
    ux = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    uy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uv = jnp.stack(jnp.meshgrid(ux, uy, indexing="xy"), -1)   # (H, W, 2)

    d = depth
    pos = _view_from_depth(uv, d, g.camera.inv_projection)    # (H, W, 3)
    n_world = normal.transpose(1, 2, 0)
    n_view = n_world @ g.camera.view[:3, :3].T
    n_view = n_view / jnp.maximum(
        jnp.linalg.norm(n_view, axis=-1, keepdims=True), 1e-8)
    # reflect(I, N) with I = view position (:178)
    i_dir = pos
    refl = i_dir - 2.0 * jnp.sum(i_dir * n_view, -1, keepdims=True) * n_view
    refl = refl / jnp.maximum(jnp.linalg.norm(refl, axis=-1, keepdims=True),
                              1e-8)

    proj = g.camera.projection
    inv_p = g.camera.inv_projection

    def project(p):
        c = p @ proj[:3, :3].T + proj[:3, 3]
        w = p @ proj[3, :3].T + proj[3, 3]
        return (c[..., :2] / jnp.where(w[..., None] != 0, w[..., None], 1.0)
                * 0.5 + 0.5)

    def probe(p):
        spos = project(p)
        sd = sampling.sample_screen(depth, spos)
        vz = _view_from_depth(spos, sd, inv_p)[..., 2]
        delta = jnp.abs(p[..., 2]) - jnp.abs(vz)
        return spos, delta

    step0 = refl * RAY_STEP
    march0 = pos + step0

    def body(i, st):
        step, mpos, delta_prev, phase, found, hit_uv = st
        spos, delta = probe(mpos)
        hit = (jnp.abs(delta) < DISTANCE_BIAS) & ~found
        found_n = found | hit
        hit_uv = jnp.where(hit[..., None], spos, hit_uv)

        # marching phase (phase == 0)
        marching = (phase == 0) & ~found_n
        to_binary = marching & (delta > 0)
        phase_n = jnp.where(to_binary, 1, phase)
        dsign = jnp.sign(delta)
        m_step = step * (1.0 - RAY_STEP * jnp.maximum(dsign, 0.0))[..., None]
        m_pos = mpos + m_step * (-dsign)[..., None]
        m_step = m_step * 1.05

        # binary phase (phase == 1)
        b_step = step * 0.5
        b_pos = mpos - b_step * jnp.sign(delta)[..., None]

        binary = (phase_n == 1) & ~found_n
        advance = marching & ~to_binary
        step_n = jnp.where(advance[..., None], m_step,
                           jnp.where(binary[..., None], b_step, step))
        mpos_n = jnp.where(advance[..., None], m_pos,
                           jnp.where(binary[..., None], b_pos, mpos))
        return (step_n, mpos_n, delta, phase_n, found_n, hit_uv)

    init = (step0, march0, jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.int32), jnp.zeros((H, W), bool),
            jnp.zeros((H, W, 2), jnp.float32))
    _, _, _, _, found, hit_uv = lax.fori_loop(0, ITERATIONS, body, init)

    hit_color = sampling.sample_screen(albedo, hit_uv)        # (H, W, 3)
    alb_hw = albedo.transpose(1, 2, 0)
    metallic = metallic_roughness[1]
    out = jnp.where(found[..., None], hit_color, alb_hw)      # miss -> albedo
    out = jnp.where((metallic < 0.01)[..., None], alb_hw, out)
    return out.transpose(2, 0, 1)
