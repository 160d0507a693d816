"""The frame graph: one pure jitted function per frame.

Replaces the reference's Daxa TaskGraph (``renderer.cpp:929-1235``) —
~25 tasks with inferred barriers — with plain data flow inside a single
``render_frame(batch, globals, history) -> (frame, history')`` function.
Pass order matches the reference graph (SURVEY.md §3.2):

  DepthPrepass/G-buffer raster -> HiZ -> SunShadow -> Terrain ->
  Bloom -> SSAO(+blur) -> SSR -> Clouds -> Composition ->
  Histogram/Exposure -> TAA -> ToneMapping

Cross-frame state (previous colour/velocity for TAA, auto-exposure) is
threaded explicitly as the ``RenderHistory`` carry, replacing the
copy-image tasks (``renderer.cpp:1182-1198``) and the exposure buffer
(``renderer.cpp:292-308``).

Pass toggles live in the static :class:`~..config.RenderConfig` so XLA
compiles exactly the enabled pipeline (the analog of commenting tasks
in/out of the reference graph).
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..config import RenderConfig, ShaderGlobals
from ..models.scene_batch import SceneBatch
from ..models.texture import TextureAtlas
from ..ops import bloom as bloom_ops
from ..ops import composition as comp_ops
from ..ops import exposure as exposure_ops
from ..ops import gbuffer as gbuf_ops
from ..ops import raster as raster_ops
from ..ops import sampling
from ..ops import ssao as ssao_ops
from ..ops import taa as taa_ops
from ..ops import tonemap as tonemap_ops


def _pytree(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in dataclasses.fields(cls)],
        meta_fields=[])
    return cls


@_pytree
@dataclass(frozen=True)
class RenderHistory:
    """Cross-frame carry (SURVEY.md §5 checkpoint/resume analysis)."""
    previous_color: jax.Array      # (3, H, W) resolved colour pre-tonemap
    previous_velocity: jax.Array   # (2, H, W)
    exposure: jax.Array            # () f32 auto-exposure state

    @staticmethod
    def create(config: RenderConfig):
        import numpy as np
        h, w = config.height, config.width
        return RenderHistory(
            previous_color=np.zeros((3, h, w), np.float32),
            previous_velocity=np.zeros((2, h, w), np.float32),
            exposure=np.float32(0.0),
        )


@dataclass(frozen=True)
class FramePlan:
    """Static per-scene/per-config raster grids + atlas metadata."""
    config: RenderConfig
    main_grid: raster_ops.RasterGrid
    shadow_grid: raster_ops.RasterGrid
    atlas_size: int
    atlas_level_offsets: tuple
    atlas_layer_stride: int

    @staticmethod
    def create(config: RenderConfig, atlas: TextureAtlas,
               cap_coarse=8192, cap_fine=1024,
               shadow_cap_coarse=8192, shadow_cap_fine=1024):
        main = raster_ops.RasterGrid(
            width=config.width, height=config.height,
            coarse_px=config.coarse_tile_px,
            fine_h=config.fine_tile_h, fine_w=config.fine_tile_w,
            cap_coarse=cap_coarse, cap_fine=cap_fine)
        shadow = raster_ops.RasterGrid(
            width=config.shadow_resolution, height=config.shadow_resolution,
            coarse_px=256, fine_h=64, fine_w=64,
            cap_coarse=shadow_cap_coarse, cap_fine=shadow_cap_fine)
        return FramePlan(config=config, main_grid=main, shadow_grid=shadow,
                         atlas_size=atlas.size,
                         atlas_level_offsets=atlas.level_offsets,
                         atlas_layer_stride=atlas.layer_stride)


@_pytree
@dataclass(frozen=True)
class FrameOutputs:
    """All intermediate targets (the debug-dump analog of
    DisplayAttachmentTask, display_attachment.inl:23-64)."""
    color: jax.Array               # (3, H, W) final tonemapped [0,1]
    hdr: jax.Array                 # (3, H, W) pre-tonemap
    gbuffer: gbuf_ops.GBuffer
    shadow_map: jax.Array | None
    ssao: jax.Array | None
    clouds: jax.Array | None
    bloom: jax.Array | None


def vertex_stage(batch: SceneBatch, model_mats, normal_mats, view_proj):
    """World + clip transform for the merged scene (the per-entity
    vertex shaders of T1/T4/T6 batched into matmuls)."""
    mats = model_mats[batch.vertex_entity]             # (V, 4, 4)
    world = (jnp.einsum("vij,vj->vi", mats[:, :3, :3], batch.positions)
             + mats[:, :3, 3])
    nmats = normal_mats[batch.vertex_entity]
    wnrm = jnp.einsum("vij,vj->vi", nmats[:, :3, :3], batch.normals)
    clip = world @ view_proj[:, :3].T + view_proj[:, 3]
    return world, wnrm, clip


def render_frame(plan: FramePlan, batch: SceneBatch, g: ShaderGlobals,
                 history: RenderHistory,
                 model_mats, normal_mats) -> tuple[FrameOutputs, RenderHistory]:
    """One frame. All array args are traced; `plan` is static."""
    cfg = plan.config
    atlas_sampler = sampling.make_atlas_sampler(
        plan.atlas_size, plan.atlas_level_offsets, plan.atlas_layer_stride)

    # ---- vertex + main-view raster (T1 depth prepass + T6 G-buffer
    # collapse into one visibility pass: with a visibility buffer the
    # prepass IS the final depth).
    world, wnrm, clip = vertex_stage(batch, model_mats, normal_mats,
                                     g.camera.projection_view)
    vis, setup = raster_ops.rasterize(clip, batch.indices, plan.main_grid,
                                      cull="front")

    # ---- sun shadow raster (T4, sun_shadow_draw.inl: back-face cull)
    shadow_map = None
    if cfg.enable_shadows:
        sclip = world @ g.sun.projection_view[:, :3].T + g.sun.projection_view[:, 3]
        svis, _ = raster_ops.rasterize(sclip, batch.indices,
                                       plan.shadow_grid, cull="back")
        shadow_map = svis.depth

    # ---- deferred G-buffer resolve (T6 fragment semantics)
    gbuf = gbuf_ops.resolve_gbuffer(
        vis, setup, batch.indices, world, wnrm, batch.uvs,
        batch.tri_material, batch.materials, batch.atlas_flat,
        atlas_sampler, plan.atlas_size, g.camera_prev.projection_view)

    # ---- bloom (T14/T15) runs on the emissive target before composition
    emissive = gbuf.emissive
    bloom = None
    if cfg.enable_bloom:
        emissive = bloom_ops.bloom(emissive, cfg.bloom_mip_count)
        bloom = emissive

    # ---- SSAO + blur (T9/T10), half resolution
    ssao = None
    if cfg.enable_ssao:
        ssao_half = ssao_ops.ssao_generate(vis.depth, gbuf.normal, g,
                                           cfg.ssao_kernel_size)
        ssao = ssao_ops.ssao_blur(ssao_half)
        # composition samples the half-res target bilinearly at full res
        H, W = vis.depth.shape
        uvx = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
        uvy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
        uvg = jnp.stack(jnp.meshgrid(uvx, uvy, indexing="xy"), -1)
        ssao_full = sampling.sample_screen(ssao, uvg)
    else:
        ssao_full = jnp.ones_like(vis.depth)

    # ---- clouds + atmosphere (T12): lands with ops/clouds.py
    clouds = None

    # ---- composition (T13)
    hdr = comp_ops.compose(
        g, vis.depth, gbuf.albedo, emissive, gbuf.normal, ssao_full,
        shadow_map, clouds,
        enable_volumetric=cfg.enable_volumetric_light,
        enable_shadow=cfg.enable_shadows)

    # ---- auto exposure (T16/T17)
    if cfg.enable_auto_exposure:
        exposure = exposure_ops.auto_exposure(hdr, history.exposure, g)
    else:
        exposure = history.exposure

    # ---- TAA (T18) + history copy (T19 -> carry)
    velocity = gbuf.velocity
    if cfg.enable_taa:
        resolved = taa_ops.taa(hdr, vis.depth, velocity,
                               history.previous_color,
                               history.previous_velocity,
                               g.frame_counter, (cfg.height, cfg.width))
    else:
        resolved = hdr

    # ---- tone mapping (T20)
    color = tonemap_ops.tone_map(resolved, exposure, g)

    new_history = RenderHistory(
        previous_color=resolved,
        previous_velocity=velocity,
        exposure=exposure,
    )
    outputs = FrameOutputs(color=color, hdr=hdr, gbuffer=gbuf,
                           shadow_map=shadow_map, ssao=ssao, clouds=clouds,
                           bloom=bloom)
    return outputs, new_history


def make_render_fn(plan: FramePlan):
    """Jitted frame function with history donated (the frames-in-flight
    ring buffer analog: TAA/exposure state updates in place)."""
    f = functools.partial(render_frame, plan)
    return jax.jit(f, donate_argnames=("history",))
