"""Deferred G-buffer resolve from the visibility buffer.

Implements the fragment-shader half of the reference's G-buffer pass
(``/root/reference/src/graphics/tasks/g_buffer_generation.inl:152-233``)
as a deferred full-screen op: the rasterizer only produced (depth,
triangle id); here each pixel gathers its winning triangle's attributes
and shades them.  Matches the reference semantics:

* perspective-correct interpolation of uv/normal/world position;
* albedo = albedo_tex.rgb **+ emissive** (``:194``), emissive separate
  (``:191-192``);
* normal mapping with TBN built from position/uv derivatives
  (``:198-213``) — we use exact analytic per-triangle derivatives
  instead of the hardware's 2x2-quad finite differences;
* metallic-roughness from the texture's G/B channels stored as R=rough,
  G=metal (``:219-224``);
* velocity = current NDC uv - previous NDC uv, previous from the
  *previous camera* but the *current* model transform (``:226-229`` —
  the reference has no per-entity previous transforms);
* sky clear colour (0.2, 0.4, 1.0) on no-hit pixels (``:80``).

Mip LOD for material fetches comes from the analytic uv derivatives
(replacing the hardware sampler's implicit LOD).
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
class MaterialTable:
    """SoA material array (shared.inl:158-170 Material[] analog).

    Layer indices point into the scene atlas; missing slots point at the
    white fallback layer with has_* = 0 (model.cpp:188-247)."""
    albedo_layer: jax.Array            # (M,) int32
    metallic_roughness_layer: jax.Array
    normal_layer: jax.Array
    occlusion_layer: jax.Array
    emissive_layer: jax.Array
    has_albedo: jax.Array              # (M,) float32 0/1
    has_metallic_roughness: jax.Array
    has_normal: jax.Array
    has_occlusion: jax.Array
    has_emissive: jax.Array


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


def _interp_with_derivs(e, de_dx, de_dy, attr):
    """Perspective-correct interpolation N/D with analytic x/y derivatives.

    e: (P, 3) edge values; de_dx/de_dy: (P, 3); attr: (P, 3, A).
    Returns (value (P, A), d/dx (P, A), d/dy (P, A)).
    """
    D = jnp.sum(e, -1, keepdims=True)                       # (P, 1)
    Dx = jnp.sum(de_dx, -1, keepdims=True)
    Dy = jnp.sum(de_dy, -1, keepdims=True)
    N = jnp.einsum("pv,pva->pa", e, attr)
    Nx = jnp.einsum("pv,pva->pa", de_dx, attr)
    Ny = jnp.einsum("pv,pva->pa", de_dy, attr)
    invD = 1.0 / jnp.where(D != 0, D, 1.0)
    val = N * invD
    ddx = (Nx - val * Dx) * invD
    ddy = (Ny - val * Dy) * invD
    return val, ddx, ddy


def resolve_gbuffer(vis: VisibilityBuffer, setup: TriangleSetup,
                    indices, world_pos, world_nrm, uvs, tri_material,
                    mats: MaterialTable, atlas_flat, atlas_sampler,
                    atlas_size: int, prev_view_proj,
                    row_block: int = 64) -> GBuffer:
    """Shade the visibility buffer into the 5-target G-buffer.

    indices: (T, 3) int32; world_pos/world_nrm: (V, 3); uvs: (V, 2);
    tri_material: (T,) int32; prev_view_proj: (4, 4).
    """
    H, W = vis.depth.shape
    assert H % row_block == 0, (H, row_block)

    def shade_rows(args):
        tri_rows, y0 = args                      # (R, W) int32, () int32
        R = tri_rows.shape[0]
        tri = tri_rows.reshape(-1)               # (P,)
        miss = tri < 0
        t = jnp.maximum(tri, 0)

        px = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
        py = (jnp.arange(R, dtype=jnp.float32)[:, None]
              + y0.astype(jnp.float32) + 0.5)
        px = jnp.broadcast_to(px, (R, W)).reshape(-1)
        py = jnp.broadcast_to(py, (R, W)).reshape(-1)

        c = setup.coeffs[t]                      # (P, 3, 3)
        e = c[..., 0] * px[:, None] + c[..., 1] * py[:, None] + c[..., 2]
        de_dx = c[..., 0]
        de_dy = c[..., 1]

        vid = indices[t]                         # (P, 3)
        attr = jnp.concatenate([world_pos[vid], world_nrm[vid], uvs[vid]],
                               axis=-1)          # (P, 3, 8)
        val, ddx, ddy = _interp_with_derivs(e, de_dx, de_dy, attr)
        pos, nrm, uv = val[:, 0:3], val[:, 3:6], val[:, 6:8]
        dpos_dx, duv_dx = ddx[:, 0:3], ddx[:, 6:8]
        dpos_dy, duv_dy = ddy[:, 0:3], ddy[:, 6:8]

        # --- material fetches
        mid = tri_material[t]
        lod_sq = jnp.maximum(jnp.sum(duv_dx ** 2, -1),
                             jnp.sum(duv_dy ** 2, -1)) * (atlas_size ** 2)
        lod = 0.5 * jnp.log2(jnp.maximum(lod_sq, 1e-12))

        albedo_s = atlas_sampler(atlas_flat, mats.albedo_layer[mid], uv, lod)
        emissive_s = atlas_sampler(atlas_flat, mats.emissive_layer[mid], uv,
                                   lod)
        mr_s = atlas_sampler(atlas_flat, mats.metallic_roughness_layer[mid],
                             uv, lod)
        nrm_s = atlas_sampler(atlas_flat, mats.normal_layer[mid], uv, lod)

        emissive = emissive_s[:, :3] * mats.has_emissive[mid][:, None]
        albedo = albedo_s[:, :3] + emissive      # inl:194
        # glTF: G=roughness, B=metallic -> stored as (R=rough, G=metal)
        mr = jnp.stack([mr_s[:, 1], mr_s[:, 2]], -1)
        mr = mr * mats.has_metallic_roughness[mid][:, None]

        # --- normal mapping (inl:198-213)
        n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                              1e-8)
        tangent_normal = nrm_s[:, :3] * 2.0 - 1.0
        tvec = (dpos_dx * duv_dy[:, 1:2] - dpos_dy * duv_dx[:, 1:2])
        tvec = tvec / jnp.maximum(jnp.linalg.norm(tvec, axis=-1, keepdims=True),
                                  1e-8)
        bvec = jnp.cross(n, tvec)
        bvec = bvec / jnp.maximum(jnp.linalg.norm(bvec, axis=-1, keepdims=True),
                                  1e-8)
        mapped = (tvec * tangent_normal[:, 0:1]
                  + bvec * tangent_normal[:, 1:2]
                  + n * tangent_normal[:, 2:3])
        mapped = mapped / jnp.maximum(
            jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-8)
        has_n = mats.has_normal[mid][:, None]
        normal = mapped * has_n + n * (1.0 - has_n)

        # --- velocity (inl:226-229): current uv is the pixel centre by
        # construction; previous reprojects interpolated world position.
        cur_uv = jnp.stack([px / W, py / H], -1)
        pc = pos @ prev_view_proj[:3, :3].T + prev_view_proj[:3, 3]
        pw = pos @ prev_view_proj[3, :3].T + prev_view_proj[3, 3]
        prev_ndc = pc[:, :2] / jnp.where(pw[:, None] != 0, pw[:, None], 1.0)
        prev_uv = prev_ndc * 0.5 + 0.5
        velocity = cur_uv - prev_uv

        # --- no-hit clears
        sky = jnp.array(SKY_CLEAR, jnp.float32)
        albedo = jnp.where(miss[:, None], sky, albedo)
        emissive = jnp.where(miss[:, None], 0.0, emissive)
        normal = jnp.where(miss[:, None], 0.0, normal)
        mr = jnp.where(miss[:, None], 0.0, mr)
        velocity = jnp.where(miss[:, None], 0.0, velocity)

        def plane(x, ch):
            return x.reshape(R, W, ch).transpose(2, 0, 1)

        return (plane(albedo, 3), plane(emissive, 3), plane(normal, 3),
                plane(mr, 2), plane(velocity, 2))

    n_blocks = H // row_block
    tri_blocks = vis.tri_id.reshape(n_blocks, row_block, W)
    y0s = jnp.arange(n_blocks, dtype=jnp.int32) * row_block
    alb, emi, nor, mr, vel = jax.lax.map(shade_rows, (tri_blocks, y0s),
                                         batch_size=1)

    def merge(x):
        # (B, C, R, W) -> (C, H, W)
        return x.transpose(1, 0, 2, 3).reshape(x.shape[1], H, W)

    return GBuffer(albedo=merge(alb), emissive=merge(emi), normal=merge(nor),
                   metallic_roughness=merge(mr), velocity=merge(vel),
                   depth=vis.depth)
