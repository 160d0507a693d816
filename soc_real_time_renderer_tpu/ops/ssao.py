"""SSAO: 26-sample hemisphere occlusion + 4x4 box blur, half resolution.

Port of ``ssao_generation.inl:71-217`` and ``ssao_blur.inl:73-109``:
the exact hardcoded kernel, the procedural value-noise random vector
(``:184-192``), view-space depth comparison with smoothstep range check
and bias (``:194-211``), ``occlusion = 1 - sum/kernel_size``; the blur
averages the 4x4 neighbourhood with offsets in [-2, 1] (``:91-105``).
Rendered at half resolution like the reference (renderer.cpp:827-831).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import sampling

KERNEL = jnp.array([  # ssao_generation.inl:76-103 (26 samples)
    [0.2196607, 0.9032637, 0.2254677],
    [0.05916681, 0.2201506, 0.1430302],
    [-0.4152246, 0.1320857, 0.7036734],
    [-0.3790807, 0.1454145, 0.100605],
    [0.3149606, -0.1294581, 0.7044517],
    [-0.1108412, 0.2162839, 0.1336278],
    [0.658012, -0.4395972, 0.2919373],
    [0.5377914, 0.3112189, 0.426864],
    [-0.2752537, 0.07625949, 0.1273409],
    [-0.1915639, -0.4973421, 0.3129629],
    [-0.2634767, 0.5277923, 0.1107446],
    [0.8242752, 0.02434147, 0.06049098],
    [0.06262707, -0.2128643, 0.03671562],
    [-0.1795662, -0.3543862, 0.07924347],
    [0.06039629, 0.24629, 0.4501176],
    [-0.7786345, -0.3814852, 0.2391262],
    [0.2792919, 0.2487278, 0.05185341],
    [0.1841383, 0.1696993, 0.8936281],
    [-0.3479781, 0.4725766, 0.719685],
    [-0.1365018, -0.2513416, 0.470937],
    [0.1280388, -0.563242, 0.3419276],
    [-0.4800232, -0.1899473, 0.2398808],
    [0.6389147, 0.1191014, 0.5271206],
    [0.1932822, -0.3692099, 0.6060588],
    [-0.3465451, -0.1654651, 0.6746758],
    [0.2448421, -0.1610962, 0.1289366]], jnp.float32)


def _rand(c):
    """ssao_generation.inl:139-141."""
    return jnp.mod(jnp.sin(c[..., 0] * 12.9898 + c[..., 1] * 78.233)
                   * 43758.5453, 1.0)


def _noise(p, freq):
    """Value noise, ssao_generation.inl:143-156."""
    unit = 2560.0 / freq
    ij = jnp.floor(p / unit)
    xy = jnp.mod(p, unit) / unit
    xy = 0.5 * (1.0 - jnp.cos(jnp.pi * xy))
    a = _rand(ij)
    b = _rand(ij + jnp.array([1.0, 0.0]))
    c = _rand(ij + jnp.array([0.0, 1.0]))
    d = _rand(ij + jnp.array([1.0, 1.0]))
    x1 = a + (b - a) * xy[..., 0]
    x2 = c + (d - c) * xy[..., 0]
    return x1 + (x2 - x1) * xy[..., 1]


def _view_from_depth(uv, depth, inv_projection):
    ndc = uv * 2.0 - 1.0
    clip = jnp.stack([ndc[..., 0], ndc[..., 1], depth,
                      jnp.ones_like(depth)], -1)
    view = clip @ inv_projection.T
    return view[..., :3] / jnp.where(view[..., 3:4] != 0, view[..., 3:4], 1.0)


def ssao_generate(depth, normal, g, kernel_size: int = 26):
    """depth: (H, W) full-res; normal: (3, H, W) full-res world normals;
    output: (H/2, W/2) occlusion, sampled like the reference's half-res
    pass over full-res inputs."""
    H, W = depth.shape
    h, w = H // 2, W // 2
    ux = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    uy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(jnp.meshgrid(ux, uy, indexing="xy"), -1)  # (h, w, 2)

    d = sampling.sample_screen(depth, uv)
    frag_pos = _view_from_depth(uv, d, g.camera.inv_projection)  # (h, w, 3)
    n_world = sampling.sample_screen(normal, uv)
    n_world = n_world / jnp.maximum(
        jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-8)
    vm = g.camera.view[:3, :3]
    normal_v = n_world @ vm.T

    # random vector, ssao_generation.inl:184-192 (noise_dim = normal
    # image size = full resolution width)
    rx = _noise(uv, W * 2.0)
    ry = _noise(uv ** 1.1, jnp.power(W * 4.2, 1.5 + uv[..., 0] / 10.0))
    rv = jnp.stack([rx, ry, jnp.zeros_like(rx)], -1)
    rv = rv / jnp.maximum(jnp.linalg.norm(rv, axis=-1, keepdims=True), 1e-8)

    tangent = rv - normal_v * jnp.sum(rv * normal_v, -1, keepdims=True)
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-8)
    bitangent = jnp.cross(tangent, normal_v)

    proj = g.camera.projection
    occlusion = jnp.zeros((h, w), jnp.float32)
    for i in range(kernel_size):
        k = KERNEL[i]
        sp = (tangent * k[0] + bitangent * k[1] + normal_v * k[2])
        sample_pos = frag_pos + sp * g.ssao_radius           # view space
        off = sample_pos @ proj[:3, :3].T + proj[:3, 3]
        ow = sample_pos @ proj[3, :3].T + proj[3, 3]
        oxy = off[..., :2] / jnp.where(ow[..., None] != 0, ow[..., None], 1.0)
        ouv = oxy * 0.5 + 0.5
        sd = sampling.sample_screen(depth, ouv)
        sdv = _view_from_depth(ouv, sd, g.camera.inv_projection)
        sample_depth = sdv[..., 2]
        denom = jnp.maximum(jnp.abs(frag_pos[..., 2] - sample_depth), 1e-8)
        t = jnp.clip(g.ssao_radius / denom, 0.0, 1.0)
        range_check = t * t * (3.0 - 2.0 * t)                # smoothstep
        hit = (sample_depth >= sample_pos[..., 2] + g.ssao_bias)
        occlusion = occlusion + hit.astype(jnp.float32) * range_check
    return 1.0 - occlusion / float(kernel_size)


def ssao_blur(ssao):
    """4x4 box blur, offsets [-2, 1] (ssao_blur.inl:91-105)."""
    h, w = ssao.shape
    ux = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    uy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(jnp.meshgrid(ux, uy, indexing="xy"), -1)
    tx, ty = 1.0 / w, 1.0 / h
    acc = jnp.zeros_like(ssao)
    for x in range(-2, 2):
        for y in range(-2, 2):
            acc = acc + sampling.sample_screen(
                ssao, uv + jnp.array([x * tx, y * ty], jnp.float32))
    return acc / 16.0
