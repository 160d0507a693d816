"""Deferred G-buffer resolve from the visibility buffer.

Implements the fragment-shader half of the reference's G-buffer pass
(``/root/reference/src/graphics/tasks/g_buffer_generation.inl:152-233``)
as a deferred full-screen op over the visibility buffer, built for the
measured TPU cost model (PERF.md): each pixel performs exactly ONE fat
record gather (everything its triangle carries) plus 1/4/8 packed
texture-tap gathers depending on the filter mode.

Reference semantics preserved:

* perspective-correct interpolation of uv/normal/world position;
* albedo = albedo_tex.rgb **+ emissive** (``:194``), emissive separate;
* normal mapping with TBN from position/uv derivatives (``:198-213``)
  — exact analytic per-triangle derivatives instead of 2x2-quad
  finite differences;
* metallic-roughness from texture G/B stored as R=rough, G=metal
  (``:219-224``);
* velocity = current NDC uv - previous NDC uv, previous camera x
  current transform (``:226-229``);
* sky clear colour (0.2, 0.4, 1.0) on no-hit pixels (``:80``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .raster import TriangleSetup, VisibilityBuffer

SKY_CLEAR = (0.2, 0.4, 1.0)  # g_buffer_generation.inl:80


def _pytree(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in dataclasses.fields(cls)],
        meta_fields=[])
    return cls


@_pytree
@dataclass(frozen=True)
class GBuffer:
    """The reference's 5 MRT targets (renderer.cpp:348-470), planar."""
    albedo: jax.Array               # (3, H, W)
    emissive: jax.Array             # (3, H, W)
    normal: jax.Array               # (3, H, W)
    metallic_roughness: jax.Array   # (2, H, W): R=roughness, G=metallic
    velocity: jax.Array             # (2, H, W) uv-space
    depth: jax.Array                # (H, W)


def build_shading_records(setup: TriangleSetup, world_pos, world_nrm,
                          tri_uv, static_rows):
    """(40, T+1) per-triangle shading records (one gather per pixel).

    rows: [adj 9 | wpos 9 | wnrm 9 | uv 6 | material_id, has_normal,
    has_mr, has_emissive, is_terrain | 2 pad].  Column T = sentinel.
    """
    T = setup.coeffs.shape[0]
    rec = jnp.concatenate([
        setup.coeffs.reshape(T, 9).T,
        world_pos.reshape(T, 9).T,
        world_nrm.reshape(T, 9).T,
        tri_uv.reshape(T, 6).T,
        static_rows,
        jnp.zeros((2, T), jnp.float32),
    ], axis=0)
    return jnp.concatenate([rec, jnp.zeros((40, 1), jnp.float32)], axis=1)


def _srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92,
                     ((x + 0.055) / 1.055) ** 2.4)


def sample_packed_atlas(atlas, mid, uv, lod, *, size: int,
                        layer_stride: int, n_levels: int,
                        filter_mode: str = "bilinear"):
    """Sample all 4 material textures at once from the packed atlas.

    atlas: (16, N) uint8; mid: (P,) int32; uv: (P, 2); lod: (P,).
    Returns (P, 16) float32 in [0, 1] (rows as pack_material_atlas).
    level_off(l) = (4S² - 4(S>>l)²)/3 — arithmetic, no table gathers.
    """
    uvw = uv - jnp.floor(uv)
    base_m = mid * layer_stride

    def level_fetch(l, bilinear):
        s = jnp.right_shift(jnp.int32(size), l)
        off = (4 * size * size - 4 * s * s) // 3
        x = uvw[:, 0] * s.astype(jnp.float32) - 0.5
        y = uvw[:, 1] * s.astype(jnp.float32) - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def tap(xi, yi):
            xw = jnp.remainder(xi, s)
            yw = jnp.remainder(yi, s)
            idx = base_m + off + yw * s + xw
            return atlas[:, idx].T.astype(jnp.float32) / 255.0  # (P, 16)

        if not bilinear:
            return tap(jnp.round(x).astype(jnp.int32),
                       jnp.round(y).astype(jnp.int32))
        c00 = tap(x0i, y0i)
        c10 = tap(x0i + 1, y0i)
        c01 = tap(x0i, y0i + 1)
        c11 = tap(x0i + 1, y0i + 1)
        return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                + (c01 * (1 - fx) + c11 * fx) * fy)

    lod = jnp.clip(lod, 0.0, float(n_levels - 1))
    if filter_mode == "nearest":
        return level_fetch(jnp.round(lod).astype(jnp.int32), bilinear=False)
    if filter_mode == "bilinear":
        return level_fetch(jnp.round(lod).astype(jnp.int32), bilinear=True)
    # trilinear
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_levels - 1)
    f = (lod - l0.astype(jnp.float32))[:, None]
    return level_fetch(l0, True) * (1 - f) + level_fetch(l1, True) * f


def resolve_gbuffer(vis: VisibilityBuffer, shading_records, atlas,
                    prev_view_proj, *, atlas_size: int, layer_stride: int,
                    n_levels: int, filter_mode: str = "bilinear") -> GBuffer:
    """Shade the visibility buffer into the 5-target G-buffer."""
    H, W = vis.depth.shape
    T = shading_records.shape[1] - 1

    tri = vis.tri_id.reshape(-1)
    miss = tri < 0
    t = jnp.where(miss, T, tri)

    rec = shading_records[:, t]                       # (40, P)

    px = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]
    px = jnp.broadcast_to(px, (H, W)).reshape(-1)
    py = jnp.broadcast_to(py, (H, W)).reshape(-1)

    # edge values + derivatives (de/dx = adj col 0, de/dy = col 1)
    e = jnp.stack([rec[0] * px + rec[1] * py + rec[2],
                   rec[3] * px + rec[4] * py + rec[5],
                   rec[6] * px + rec[7] * py + rec[8]], axis=0)  # (3, P)
    ex = jnp.stack([rec[0], rec[3], rec[6]], axis=0)
    ey = jnp.stack([rec[1], rec[4], rec[7]], axis=0)
    D = jnp.sum(e, 0)
    Dx = jnp.sum(ex, 0)
    Dy = jnp.sum(ey, 0)
    invD = 1.0 / jnp.where(D != 0, D, 1.0)

    def interp(rows):  # rows: (3, P) per-vertex attr -> value + d/dx,d/dy
        N = jnp.sum(e * rows, 0)
        Nx = jnp.sum(ex * rows, 0)
        Ny = jnp.sum(ey * rows, 0)
        val = N * invD
        return val, (Nx - val * Dx) * invD, (Ny - val * Dy) * invD

    wpos = rec[9:18].reshape(3, 3, -1)    # (vertex, xyz, P)
    wnrm = rec[18:27].reshape(3, 3, -1)
    uvs = rec[27:33].reshape(3, 2, -1)

    pos = jnp.stack([interp(wpos[:, c])[0] for c in range(3)], -1)  # (P,3)
    pos_dx = jnp.stack([interp(wpos[:, c])[1] for c in range(3)], -1)
    pos_dy = jnp.stack([interp(wpos[:, c])[2] for c in range(3)], -1)
    nrm = jnp.stack([interp(wnrm[:, c])[0] for c in range(3)], -1)
    uv_v, uv_dx, uv_dy = zip(*(interp(uvs[:, c]) for c in range(2)))
    uv = jnp.stack(uv_v, -1)
    duv_dx = jnp.stack(uv_dx, -1)
    duv_dy = jnp.stack(uv_dy, -1)

    mid = rec[33].astype(jnp.int32)
    has_n = rec[34][:, None]
    has_mr = rec[35][:, None]
    has_e = rec[36][:, None]
    is_ter = rec[37][:, None]

    lod_sq = jnp.maximum(jnp.sum(duv_dx ** 2, -1),
                         jnp.sum(duv_dy ** 2, -1)) * (atlas_size ** 2)
    lod = 0.5 * jnp.log2(jnp.maximum(lod_sq, 1e-12))

    tex = sample_packed_atlas(atlas, mid, uv, lod, size=atlas_size,
                              layer_stride=layer_stride, n_levels=n_levels,
                              filter_mode=filter_mode)     # (P, 16)
    albedo_t = _srgb_to_linear(tex[:, 0:3])
    normal_t = tex[:, 4:7]
    mr_t = tex[:, 8:12]
    emissive_t = _srgb_to_linear(tex[:, 12:15])

    emissive = emissive_t * has_e
    albedo = albedo_t + emissive                       # inl:194
    mr = jnp.stack([mr_t[:, 1], mr_t[:, 2]], -1) * has_mr

    # normal mapping (inl:198-213)
    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
    tn = normal_t * 2.0 - 1.0
    tvec = pos_dx * duv_dy[:, 1:2] - pos_dy * duv_dx[:, 1:2]
    tvec = tvec / jnp.maximum(jnp.linalg.norm(tvec, axis=-1, keepdims=True),
                              1e-8)
    bvec = jnp.cross(n, tvec)
    bvec = bvec / jnp.maximum(jnp.linalg.norm(bvec, axis=-1, keepdims=True),
                              1e-8)
    mapped = tvec * tn[:, 0:1] + bvec * tn[:, 1:2] + n * tn[:, 2:3]
    mapped = mapped / jnp.maximum(
        jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-8)
    normal = mapped * has_n + n * (1.0 - has_n)
    # terrain path (draw_terrain.inl:203-221): the normal map IS the
    # world normal (decoded), no TBN
    ter_n = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True),
                             1e-8)
    normal = ter_n * is_ter + normal * (1.0 - is_ter)

    # velocity (inl:226-229)
    cur_uv = jnp.stack([px / W, py / H], -1)
    pc = pos @ prev_view_proj[:3, :3].T + prev_view_proj[:3, 3]
    pw = pos @ prev_view_proj[3, :3].T + prev_view_proj[3, 3]
    prev_ndc = pc[:, :2] / jnp.where(pw[:, None] != 0, pw[:, None], 1.0)
    prev_uv = prev_ndc * 0.5 + 0.5
    velocity = cur_uv - prev_uv
    velocity = velocity * (1.0 - is_ter)   # terrain velocity = 0 (:220)

    sky = jnp.array(SKY_CLEAR, jnp.float32)
    albedo = jnp.where(miss[:, None], sky, albedo)
    emissive = jnp.where(miss[:, None], 0.0, emissive)
    normal = jnp.where(miss[:, None], 0.0, normal)
    mr = jnp.where(miss[:, None], 0.0, mr)
    velocity = jnp.where(miss[:, None], 0.0, velocity)

    def plane(x, ch):
        return x.T.reshape(ch, H, W)

    return GBuffer(albedo=plane(albedo, 3), emissive=plane(emissive, 3),
                   normal=plane(normal, 3),
                   metallic_roughness=plane(mr, 2),
                   velocity=plane(velocity, 2), depth=vis.depth)
