"""Screen-space reflections (planar).

Port of ``screen_space_reflection.inl:74-186``: view-space ray march
(50 iterations, exponential step x1.05, adaptive direction) followed by
binary-search refinement using the *remaining* iteration budget; hit
when |delta| < 0.05.  Non-metallic pixels (metallic < 0.01) pass the
albedo through (``:175-178``); MISSES output black — the shader's
albedo fallback at ``:184-186`` is dead code, since ``out_ssr``'s alpha
is written 1.0 at ``:183`` and ``out_ssr == vec4(0.0)`` can never hold.

Reference quirks: the march compares |view z|; the declared min/max HiZ
inputs are never read by the shader (``:17-18``) — same here (the
pyramids themselves live in ops/hiz.py); the result is computed but NOT
composited by default (composition.inl:213-216 commented out) —
RenderConfig.composite_ssr.

The divergent loop (early return / break / phase switch) becomes a
masked lax.fori_loop state machine in planar (3, H, W) layout; the hit
colour is fetched once after the loop at the recorded hit uv.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import sampling
from .composition import view_from_depth
from ..utils.vec import dot3, normalize3

RAY_STEP = 0.5
ITERATIONS = 50
DISTANCE_BIAS = 0.05


def ssr(depth, albedo, normal, metallic_roughness, g):
    """depth: (H, W); albedo/normal: (3, H, W); metallic_roughness:
    (2, H, W) (R=rough, G=metal).  Returns (3, H, W)."""
    H, W = depth.shape
    uv = sampling.grid_uv(H, W)

    pos = view_from_depth(uv, depth, g.camera.inv_projection)  # (3, H, W)
    vm = g.camera.view[:3, :3]
    n_view = normalize3(jnp.stack([
        vm[0, 0] * normal[0] + vm[0, 1] * normal[1] + vm[0, 2] * normal[2],
        vm[1, 0] * normal[0] + vm[1, 1] * normal[1] + vm[1, 2] * normal[2],
        vm[2, 0] * normal[0] + vm[2, 1] * normal[1] + vm[2, 2] * normal[2]]))
    refl = normalize3(pos - 2.0 * dot3(pos, n_view)[None] * n_view)

    proj = g.camera.projection
    inv_p = g.camera.inv_projection

    def project_uv(p):
        x = proj[0, 0] * p[0] + proj[0, 1] * p[1] + proj[0, 2] * p[2] + proj[0, 3]
        y = proj[1, 0] * p[0] + proj[1, 1] * p[1] + proj[1, 2] * p[2] + proj[1, 3]
        w = proj[3, 0] * p[0] + proj[3, 1] * p[1] + proj[3, 2] * p[2] + proj[3, 3]
        ws = jnp.where(w != 0, w, 1.0)
        return jnp.stack([x / ws * 0.5 + 0.5, y / ws * 0.5 + 0.5])

    def probe(p):
        spos = project_uv(p)
        sd = sampling.sample_screen(depth, spos)
        vz = view_from_depth(spos, sd, inv_p)[2]
        delta = jnp.abs(p[2]) - jnp.abs(vz)
        return spos, delta

    step0 = refl * RAY_STEP
    march0 = pos + step0

    def body(i, st):
        step, mpos, phase, found, hit_uv = st
        spos, delta = probe(mpos)
        hit = (jnp.abs(delta) < DISTANCE_BIAS) & ~found
        found_n = found | hit
        hit_uv = jnp.where(hit[None], spos, hit_uv)

        marching = (phase == 0) & ~found_n
        to_binary = marching & (delta > 0)
        phase_n = jnp.where(to_binary, 1, phase)
        dsign = jnp.sign(delta)
        m_step = step * (1.0 - RAY_STEP * jnp.maximum(dsign, 0.0))[None]
        m_pos = mpos + m_step * (-dsign)[None]
        m_step = m_step * 1.05

        b_step = step * 0.5
        b_pos = mpos - b_step * jnp.sign(delta)[None]

        binary = (phase_n == 1) & ~found_n
        advance = marching & ~to_binary
        step_n = jnp.where(advance[None], m_step,
                           jnp.where(binary[None], b_step, step))
        mpos_n = jnp.where(advance[None], m_pos,
                           jnp.where(binary[None], b_pos, mpos))
        return (step_n, mpos_n, phase_n, found_n, hit_uv)

    init = (step0, march0,
            jnp.zeros((H, W), jnp.int32), jnp.zeros((H, W), bool),
            jnp.zeros((2, H, W), jnp.float32))
    _, _, _, found, hit_uv = lax.fori_loop(0, ITERATIONS, body, init)

    hit_color = sampling.sample_screen(albedo, hit_uv)        # (3, H, W)
    metallic = metallic_roughness[1]
    # miss -> BLACK: the reference's albedo fallback at
    # screen_space_reflection.inl:184-186 is dead code — out_ssr's
    # alpha is written 1.0 at :183, so `out_ssr == vec4(0.0)` never
    # holds and a missed march outputs vec4(0,0,0,1).  Only the
    # non-reflective early-out (:175-178, metallic < 0.01) gets albedo.
    out = jnp.where(found[None], hit_color, 0.0)
    out = jnp.where((metallic < 0.01)[None], albedo, out)
    return out
