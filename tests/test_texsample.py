"""Tile-resident Pallas texture sampler vs the exact XLA gather.

The kernel path (ops/texsample.py) must reproduce
ops/gbuffer.sample_packed_atlas — same nearest-mip bilinear math
(g_buffer_generation.inl:186-224 semantics) — up to bf16 blend
rounding on clean tiles and exactly on dirty (fallback) tiles.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from soc_real_time_renderer_tpu.models.texture import (
    PackedMaterialAtlas, expand_atlas_bilinear)
from soc_real_time_renderer_tpu.ops import gbuffer, texsample


def _toy_atlas(M=3, size=64, seed=0):
    rng = np.random.default_rng(seed)
    n_levels = int(np.log2(size)) + 1
    stride = sum((size >> k) ** 2 for k in range(n_levels))
    packed = rng.integers(0, 256, (16, M * stride), dtype=np.uint8)
    return PackedMaterialAtlas(packed=packed, size=size, num_materials=M,
                               layer_stride=stride, n_levels=n_levels)


def _page_dev(atlas):
    page = texsample.build_atlas_page(atlas)
    return texsample.AtlasPageDevice(page=jnp.asarray(page.page),
                                     row0=jnp.asarray(page.row0),
                                     col0=jnp.asarray(page.col0))


def _smooth_fields(H, W, M, seed=1):
    """Surface-like fields: per-tile-coherent material, smooth uv with
    ~1 texel/px density at the chosen lod, mild lod gradient."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    lod = 1.0 + 1.5 * xx / W + 0.3 * yy / H          # in [1, 2.8]
    # uv scaled so texel density matches lod at a 64-base texture:
    # deriv = 2^lod / 64 per px
    u = np.cumsum(2.0 ** lod[:, 0][:, None] * 0 + 2.0 ** lod / 64.0,
                  axis=1) / 1.0
    v = np.cumsum(2.0 ** lod / 64.0, axis=0)
    u = u + 3.0          # exercise wrap (unwrapped uv > 1)
    # blocky materials (64px blocks -> tiles see 1-2 materials)
    mid = ((yy // 64).astype(int) * 2 + (xx // 64).astype(int)) % M
    live = rng.random((H, W)) > 0.05
    return (jnp.asarray(mid.reshape(-1), jnp.int32),
            jnp.stack([jnp.asarray(u.reshape(-1)),
                       jnp.asarray(v.reshape(-1))]),
            jnp.asarray(lod.reshape(-1)),
            jnp.asarray(live.reshape(-1)))


@pytest.mark.parametrize("filter_mode", ["bilinear", "trilinear"])
def test_clean_tiles_match_xla(filter_mode):
    atlas = _toy_atlas()
    dev = expand_atlas_bilinear(atlas)
    page = _page_dev(atlas)
    H = W = 64
    mid, uv, lod, live = _smooth_fields(H, W, atlas.num_materials)

    got, overflow, n_dirty = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), size=atlas.size,
        n_levels=atlas.n_levels, num_materials=atlas.num_materials,
        layer_stride=atlas.layer_stride, filter_mode=filter_mode,
        interpret=True, H=H, W=W)
    want = gbuffer.sample_packed_atlas(
        jnp.asarray(dev), mid, uv,
        jnp.clip(lod, 0, atlas.n_levels - 1), size=atlas.size,
        layer_stride=atlas.layer_stride, n_levels=atlas.n_levels,
        filter_mode=filter_mode)

    assert int(overflow) == 0
    assert int(n_dirty) == 0        # smooth fields: no dirty tiles
    m = np.asarray(live)
    err = np.abs(np.asarray(got) - np.asarray(want))[:, m]
    assert err.max() < 3.5 / 255.0, err.max()   # bf16 blend rounding
    assert err.mean() < 0.6 / 255.0


def test_incoherent_tiles_fall_back_exactly():
    """Random uv per pixel -> every tile dirty -> fallback path must be
    the exact XLA gather up to one bf16 quantization (the fallback
    values ride the kernel's bf16 tile buffer, <= 0.5 u8 lsb)."""
    atlas = _toy_atlas(seed=2)
    dev = expand_atlas_bilinear(atlas)
    page = _page_dev(atlas)
    H = W = 32
    rng = np.random.default_rng(3)
    Pn = H * W
    mid = jnp.asarray(rng.integers(0, atlas.num_materials, Pn), jnp.int32)
    uv = jnp.asarray(rng.random((2, Pn), dtype=np.float32) * 4 - 1)
    lod = jnp.asarray(rng.random(Pn, dtype=np.float32) * 4)
    live = jnp.ones((Pn,), bool)

    got, overflow, n_dirty = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), size=atlas.size,
        n_levels=atlas.n_levels, num_materials=atlas.num_materials,
        layer_stride=atlas.layer_stride, filter_mode="bilinear",
        interpret=True, H=H, W=W)
    want = gbuffer.sample_packed_atlas(
        jnp.asarray(dev), mid, uv, jnp.clip(lod, 0, atlas.n_levels - 1),
        size=atlas.size, layer_stride=atlas.layer_stride,
        n_levels=atlas.n_levels, filter_mode="bilinear")
    assert int(overflow) == 0
    assert int(n_dirty) == (H // 16) * (W // 16)   # all tiles dirty
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.6 / 255.0)


def test_px_fallback_matches_oracle_on_incoherent_tiles():
    """Per-pixel fallback compaction (FramePlan.tex_px_fallback): on an
    incoherent scene the planner windows cover few pixels, so most ride
    the compacted per-pixel XLA gather — the combined result must match
    the oracle like the tile fallback does (kernel-covered pixels within
    bf16 blend rounding, uncovered pixels exactly)."""
    atlas = _toy_atlas(seed=2)
    dev = expand_atlas_bilinear(atlas)
    page = _page_dev(atlas)
    H = W = 32
    rng = np.random.default_rng(3)
    Pn = H * W
    mid = jnp.asarray(rng.integers(0, atlas.num_materials, Pn), jnp.int32)
    uv = jnp.asarray(rng.random((2, Pn), dtype=np.float32) * 4 - 1)
    lod = jnp.asarray(rng.random(Pn, dtype=np.float32) * 4)
    live = jnp.ones((Pn,), bool)

    got, overflow, n_dirty = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), size=atlas.size,
        n_levels=atlas.n_levels, num_materials=atlas.num_materials,
        layer_stride=atlas.layer_stride, filter_mode="bilinear",
        interpret=True, H=H, W=W, px_fallback=True, px_cap=Pn)
    want = gbuffer.sample_packed_atlas(
        jnp.asarray(dev), mid, uv, jnp.clip(lod, 0, atlas.n_levels - 1),
        size=atlas.size, layer_stride=atlas.layer_stride,
        n_levels=atlas.n_levels, filter_mode="bilinear")
    assert int(overflow) == 0
    assert 0 < int(n_dirty) <= Pn       # n_dirty now counts PIXELS
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.max() < 3.5 / 255.0, err.max()
    assert err.mean() < 0.6 / 255.0


def test_px_fallback_clean_scene_matches_tile_mode():
    """On a smooth scene (no dirty tiles) px mode must be identical to
    the default tile mode — both are the pure kernel result."""
    atlas = _toy_atlas()
    dev = expand_atlas_bilinear(atlas)
    page = _page_dev(atlas)
    H = W = 64
    mid, uv, lod, live = _smooth_fields(H, W, atlas.num_materials)
    kw = dict(size=atlas.size, n_levels=atlas.n_levels,
              num_materials=atlas.num_materials,
              layer_stride=atlas.layer_stride, filter_mode="bilinear",
              interpret=True, H=H, W=W)
    got_t, _, _ = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), **kw)
    got_p, overflow, n_dirty = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), px_fallback=True,
        **kw)
    assert int(overflow) == 0
    assert int(n_dirty) == 0
    m = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(got_t)[:, m],
                                  np.asarray(got_p)[:, m])


def test_px_fallback_cap_overflow_flag():
    atlas = _toy_atlas(seed=4)
    dev = expand_atlas_bilinear(atlas)
    page = _page_dev(atlas)
    H = W = 32
    rng = np.random.default_rng(5)
    Pn = H * W
    mid = jnp.asarray(rng.integers(0, atlas.num_materials, Pn), jnp.int32)
    uv = jnp.asarray(rng.random((2, Pn), dtype=np.float32) * 8)
    lod = jnp.asarray(rng.random(Pn, dtype=np.float32) * 3)
    live = jnp.ones((Pn,), bool)
    _, overflow, n_dirty = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), size=atlas.size,
        n_levels=atlas.n_levels, num_materials=atlas.num_materials,
        layer_stride=atlas.layer_stride, interpret=True, H=H, W=W,
        px_fallback=True, px_cap=16)
    assert int(overflow) == texsample.OVERFLOW_TEX_DIRTY
    assert int(n_dirty) > 16        # the pixel cap was genuinely exceeded


def test_dirty_cap_overflow_flag():
    atlas = _toy_atlas(seed=4)
    dev = expand_atlas_bilinear(atlas)
    page = _page_dev(atlas)
    H = W = 64  # 4 tiles
    rng = np.random.default_rng(5)
    Pn = H * W
    mid = jnp.asarray(rng.integers(0, atlas.num_materials, Pn), jnp.int32)
    uv = jnp.asarray(rng.random((2, Pn), dtype=np.float32) * 8)
    lod = jnp.asarray(rng.random(Pn, dtype=np.float32) * 3)
    live = jnp.ones((Pn,), bool)
    _, overflow, n_dirty = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), size=atlas.size,
        n_levels=atlas.n_levels, num_materials=atlas.num_materials,
        layer_stride=atlas.layer_stride, dirty_cap=1,
        interpret=True, H=H, W=W)
    assert int(overflow) == texsample.OVERFLOW_TEX_DIRTY
    assert int(n_dirty) > 1         # the cap (1) was genuinely exceeded


def test_frame_integration_pallas_vs_xla():
    """Full helmet frame: texture_impl='pallas' must match 'xla'."""
    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as fm

    cfg = RenderConfig(width=128, height=128, shadow_resolution=128,
                       enable_clouds=False, enable_bloom=False,
                       enable_taa=False, enable_auto_exposure=False,
                       enable_hiz=False)
    built = scenes.build("helmet", cfg, build_page=True)
    g, mm, nm = built.frame_globals(1)
    hist = fm.RenderHistory.create(cfg)
    plan_p = dataclasses.replace(built.plan, interpret=True,
                                 texture_impl="pallas")
    plan_x = dataclasses.replace(built.plan, interpret=True,
                                 texture_impl="xla")
    out_p, _ = fm.render_frame(plan_p, built.batch, g, hist, mm, nm)
    out_x, _ = fm.render_frame(plan_x, built.batch, g, hist, mm, nm)
    a = np.asarray(out_p.color)
    b = np.asarray(out_x.color)
    assert np.abs(a - b).max() < 0.03, np.abs(a - b).max()
    assert np.abs(a - b).mean() < 0.002


def test_planner_single_combo_tile_uses_one_slot():
    """Efficiency tripwire for the run-length top-K: a tile whose every
    pixel shares one (material, level) must plan exactly ONE window
    slot and stay clean.  A planner regression here is value-invisible
    (the fallback keeps outputs exact) but cost-visible: the duplicate
    top-K bug measured dirty 440 -> 1295 / avg_slots 3.1 -> 6.6 on the
    sponza 736p fields before this assertion existed."""
    atlas = _toy_atlas(M=2, size=64)
    page = _page_dev(atlas)
    H = W = 32                               # 4 tiles, all single-combo
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    u = (xx + 0.5) / 64.0 * 2.0              # ~1 texel/px at level 1
    v = (yy + 0.5) / 64.0 * 2.0
    mid_t = texsample._tileize(jnp.zeros((H, W), jnp.int32), H, W)
    u_t = texsample._tileize(jnp.asarray(u), H, W)
    v_t = texsample._tileize(jnp.asarray(v), H, W)
    lvl_t = texsample._tileize(jnp.ones((H, W), jnp.int32), H, W)
    live_t = texsample._tileize(jnp.ones((H, W), bool), H, W)
    perpx, dma, n_used, dirty, _ = texsample._plan_tiles_impl(
        mid_t, u_t, v_t, lvl_t, live_t, page.row0, page.col0,
        size=atlas.size, n_levels=atlas.n_levels,
        num_materials=atlas.num_materials)
    assert not bool(np.asarray(dirty).any()), np.asarray(dirty)
    np.testing.assert_array_equal(np.asarray(n_used), 1)

    # regression: (material 0, mip 0) — combo id 0 — must ALSO plan one
    # slot.  The exhausted-top-K sentinel used to be 0, which collides
    # with this real combo: every exhausted iteration re-planned its
    # window (duplicate DMA slots; n_used 6 instead of 1, and spurious
    # dirty fallback whenever the bbox split pushed n_used > NBLK).
    u0_t = texsample._tileize(jnp.asarray((xx + 0.5) / 64.0), H, W)
    v0_t = texsample._tileize(jnp.asarray((yy + 0.5) / 64.0), H, W)
    lvl0_t = texsample._tileize(jnp.zeros((H, W), jnp.int32), H, W)
    _, _, n_used0, dirty0, _ = texsample._plan_tiles_impl(
        mid_t, u0_t, v0_t, lvl0_t, live_t, page.row0, page.col0,
        size=atlas.size, n_levels=atlas.n_levels,
        num_materials=atlas.num_materials)
    assert not bool(np.asarray(dirty0).any()), np.asarray(dirty0)
    np.testing.assert_array_equal(np.asarray(n_used0), 1)

def test_geometry_override_matches_default():
    """Non-default (k_top, nblk, tps) planner/kernel geometry must
    sample the same VALUES (different tiles may plan differently, but
    every covered pixel's window holds the same texels; dirty tiles
    fall back to the exact gather either way)."""
    atlas = _toy_atlas()
    dev = expand_atlas_bilinear(atlas)
    page = _page_dev(atlas)
    H = W = 64
    mid, uv, lod, live = _smooth_fields(H, W, atlas.num_materials)

    base, ov0, _ = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), size=atlas.size,
        n_levels=atlas.n_levels, num_materials=atlas.num_materials,
        layer_stride=atlas.layer_stride, interpret=True, H=H, W=W)
    alt, ov1, _ = texsample.sample_atlas_tiled(
        page, mid, uv, lod, live, jnp.asarray(dev), size=atlas.size,
        n_levels=atlas.n_levels, num_materials=atlas.num_materials,
        layer_stride=atlas.layer_stride, interpret=True, H=H, W=W,
        k_top=8, nblk=8, tps=4)
    assert int(ov0) == 0 and int(ov1) == 0
    m = np.asarray(live)
    err = np.abs(np.asarray(base) - np.asarray(alt))[:, m]
    # identical up to bf16 blend rounding between kernel/fallback paths
    assert err.max() < 3.5 / 255.0, err.max()
