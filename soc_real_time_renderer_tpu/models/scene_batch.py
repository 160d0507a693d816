"""Scene flattening: ECS scene -> device-resident batched arrays.

The reference draws per-entity, per-primitive with push constants
(``g_buffer_generation.inl:111-144``); the TPU build instead merges the
whole scene into one struct-of-arrays batch (positions/normals/uvs/
indices/material-ids/entity-ids) so a single rasterizer invocation
covers everything, and per-entity transforms become a gathered matrix
array — the uniform-ring-buffer replacement (``scene.cpp:55-82``).

Static leaves (geometry, atlas, material table) are ``device_put`` once;
dynamic leaves (model/normal matrices, lights) are rebuilt each frame on
host and passed as arguments of the jitted frame function.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np

from ..ops.gbuffer import MaterialTable
from .gltf import ModelData
from .texture import TextureAtlas, build_scene_atlas


def _pytree(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in dataclasses.fields(cls)],
        meta_fields=[])
    return cls


@_pytree
@dataclass(frozen=True)
class SceneBatch:
    """Merged scene geometry (static across frames)."""
    positions: jax.Array       # (V, 3) f32 object space
    normals: jax.Array         # (V, 3) f32 object space
    uvs: jax.Array             # (V, 2) f32
    tangents: jax.Array        # (V, 4) f32 (loaded; unused like the ref)
    indices: jax.Array         # (T, 3) i32 into the merged pool
    tri_material: jax.Array    # (T,) i32 into the merged material table
    vertex_entity: jax.Array   # (V, ) i32 mesh-entity index
    materials: MaterialTable
    atlas_flat: jax.Array      # (N, 4) packed mip atlas texels

    @property
    def num_vertices(self):
        return self.positions.shape[0]

    @property
    def num_triangles(self):
        return self.indices.shape[0]


def build_material_table(models: list[ModelData], image_offsets: list[int],
                         white_layer: int) -> MaterialTable:
    """Merge per-model material lists; missing slots -> white layer with
    has=0 (model.cpp:188-247)."""
    fields = {k: [] for k in ("albedo", "metallic_roughness", "normal",
                              "occlusion", "emissive")}
    has = {k: [] for k in fields}
    for model, off in zip(models, image_offsets):
        for m in model.materials:
            for key, idx in (("albedo", m.albedo_image),
                             ("metallic_roughness", m.metallic_roughness_image),
                             ("normal", m.normal_image),
                             ("occlusion", m.occlusion_image),
                             ("emissive", m.emissive_image)):
                if idx >= 0:
                    fields[key].append(off + idx)
                    has[key].append(1.0)
                else:
                    fields[key].append(white_layer)
                    has[key].append(0.0)

    def arr(k, dt=np.int32):
        return np.asarray(fields[k], dt)

    def harr(k):
        return np.asarray(has[k], np.float32)

    return MaterialTable(
        albedo_layer=arr("albedo"),
        metallic_roughness_layer=arr("metallic_roughness"),
        normal_layer=arr("normal"),
        occlusion_layer=arr("occlusion"),
        emissive_layer=arr("emissive"),
        has_albedo=harr("albedo"),
        has_metallic_roughness=harr("metallic_roughness"),
        has_normal=harr("normal"),
        has_occlusion=harr("occlusion"),
        has_emissive=harr("emissive"),
    )


def build_scene_batch(models: list[ModelData], atlas_size: int = 1024,
                      workers: int = 8) -> tuple[SceneBatch, TextureAtlas]:
    """models[i] belongs to mesh-entity i (creation order)."""
    image_refs, image_offsets, material_offsets = [], [], []
    nmat = 0
    for m in models:
        image_offsets.append(len(image_refs))
        image_refs.extend(m.images)
        material_offsets.append(nmat)
        nmat += len(m.materials)

    atlas, white_layer = build_scene_atlas(image_refs, size=atlas_size,
                                           workers=workers)
    table = build_material_table(models, image_offsets, white_layer)

    pos, nrm, uv, tan, idx, tmat, vent = [], [], [], [], [], [], []
    voff = 0
    for ei, (m, moff) in enumerate(zip(models, material_offsets)):
        pos.append(m.positions)
        nrm.append(m.normals)
        uv.append(m.uvs)
        tan.append(m.tangents)
        idx.append(m.triangles.astype(np.int64) + voff)
        tmat.append(m.tri_material + moff)
        vent.append(np.full(len(m.positions), ei, np.int32))
        voff += len(m.positions)

    batch = SceneBatch(
        positions=np.concatenate(pos).astype(np.float32),
        normals=np.concatenate(nrm).astype(np.float32),
        uvs=np.concatenate(uv).astype(np.float32),
        tangents=np.concatenate(tan).astype(np.float32),
        indices=np.concatenate(idx).astype(np.int32),
        tri_material=np.concatenate(tmat).astype(np.int32),
        vertex_entity=np.concatenate(vent).astype(np.int32),
        materials=table,
        atlas_flat=atlas.flat,
    )
    return batch, atlas
