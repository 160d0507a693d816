"""Tile-resident Pallas texture sampler — the G-buffer atlas tap.

Replaces the per-pixel XLA atlas gather (ops/gbuffer.sample_packed_atlas)
on the production TPU path.  The reference samples material textures
through hardware samplers with full mip chains and linear filtering
(``/root/reference/src/graphics/texture.cpp:100-117``, sampled by
``g_buffer_generation.inl:186-224``); the XLA equivalent is a random
HBM gather that is LATENCY-bound at ~22-30 ns/index over the 470 MB
expanded atlas (PERF.md round-2 cost curve) — the single largest cost
of the frame at 1080p (VERDICT r2 item 1).

This module exploits what a hardware texture cache exploits: screen
locality.  Within a 16x16 pixel tile, the taps of one material at one
mip level land in a small texel neighbourhood (mipmapping exists
precisely to make texel:pixel density ~1).  So:

PHASE 1 (XLA, `_plan_tiles_impl`): per 16x16 screen tile
  * histogram the (material, level) pairs of its pixels and keep the
    top K_TOP=6 pairs,
  * window each pair by the texel bbox of its pixels; pairs whose bbox
    exceeds 31 texels (disjoint surfaces — e.g. two columns sharing a
    material) are SPLIT by a depth-2 median quadtree into up to 4
    sub-windows (measured on the full 1080p scene: splitting drops the
    uncovered-tile rate from 50% to ~4%),
  * pack the resulting windows into NBLK=8 slots,
  * emit per-pixel in-window coordinates + a slot row index,
  * tiles needing more slots fall back: their pixels are resolved by
    the exact XLA gather on a tile-compacted list, so fallback cost is
    proportional to uncovered pixels.

PHASE 2 (Pallas, `_tile_kernel`): per tile
  * DMA the used (48 rows x 64 texels x 12 lanes) bf16 windows from
    the atlas *page* (build_atlas_page) into one (384, 768) VMEM stack
    W (double-buffered across grid steps; unused slots skip their DMA),
  * bilinear tap = soft-one-hot ROW matmul on the MXU:
        U (P=256, 384) bf16 @ W (384, 768) bf16  ->  rowsel
    where U carries the two v-weighted rows of each pixel's slot.
    Pixels of different slots coexist in one matmul: a pixel's U
    selects only its slot's rows, so its column coordinates are
    interpreted within that slot — no cross terms,
  * column select: rowsel * u-weight mask, then a (768 -> 12)
    channel-selector matmul -> (12, P) channels.

The page stores RAW u8 byte values as bf16 (integers <= 255 are exact
in bf16), so the kernel's bilinear arithmetic matches the XLA path to
bf16 blend rounding (~0.5 u8 lsb); sRGB decode stays in f32 downstream
exactly as before.  Wrap (GL_REPEAT) is handled by the page apron:
every (material, level) region carries wrapped margin texels, and
levels <= 32 texels use origin 0 with pre-wrapped per-pixel coords, so
windows never wrap in-kernel.

Cost model (v5e): U-matmul = 256*384*768 bf16 MACs = 75M per tile,
8160 tiles at 1920x1088 -> 0.62 Tmac ~ 6 ms — ~8x under the XLA gather
it replaces, and a second mip tap (trilinear) doubles the matmul
instead of doubling a 50 ms gather.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# tile / window geometry (all static)
TH = 16          # tile height (px)
TW = 16          # tile width (px)
P = TH * TW      # pixels per tile
K_TOP = 6        # (material, level) pairs considered per tile
NBLK = 6         # window slots per tile: sized from CHIP-captured slot
#                  distributions (tools/study_texplanner.py on
#                  tools/capture_texfields.py output — sponza 736p:
#                  NBLK 8 -> 6 moves dirty 440 -> 539 of 3680 tiles
#                  (~+0.4 ms fallback) while cutting the U-matmul
#                  contraction dim and per-tile window DMA by 25%
#                  (~-1.3 ms); CPU-captured fields under-count dirty
#                  ~20x, always study chip captures)
WIN_R = 48       # window rows (32 bbox + 16 row-align slack)
WIN_C = 64       # window cols in texels (32 bbox + 32 col-align slack)
CH = 12          # bf16 lanes per texel in the page (11 channels + pad)
WIN_LANES = WIN_C * CH          # 768
R_TOTAL = NBLK * WIN_R          # 384
BBOX_MAX = 31    # max (max - min) texel extent of one window's pixels
SMALL_S = 32     # levels <= SMALL_S texels live fully resident (wrap
#                  by mod coords); levels >= 64 are windowed
ROW_AL = 16      # bf16 sublane alignment for window row offsets
COL_AL = 32      # texel col alignment (32 * 12 lanes = 3 * 128)
# page aprons (build_atlas_page): must cover a window placed at
# origin <= s-COL_AL/..., i.e. >= WIN_R rows / WIN_C cols
AP_R = 80
AP_C = 96

OVERFLOW_TEX_DIRTY = 8  # FrameOutputs.overflow bit: dirty tiles > cap


@dataclass(frozen=True)
class AtlasPage:
    """Host-built bf16 page of all (material, level) wrap-padded images.

    Region for (mat, level): rows [row0, row0 + s + AP_R), cols
    [col0, col0 + (s + AP_C) * CH) holding raw u8 values as bf16,
    channel-interleaved per texel (texture.SAMPLED_ROWS order, lane 11
    pad).  Texel (y, x) of a region stores image[y % s, x % s].
    """
    page: np.ndarray            # (rows, cols) bf16
    row0: np.ndarray            # (M, L) int32 region row origin
    col0: np.ndarray            # (M, L) int32 region col origin (lanes)
    size: int                   # base level resolution
    n_levels: int
    num_materials: int


@dataclass(frozen=True)
class AtlasPageDevice:
    """Device-side page pytree (page array + origin tables)."""
    page: jax.Array
    row0: jax.Array
    col0: jax.Array


jax.tree_util.register_dataclass(
    AtlasPageDevice, data_fields=["page", "row0", "col0"], meta_fields=[])


def build_atlas_page(atlas) -> AtlasPage:
    """texture.PackedMaterialAtlas (16, M*stride) u8 -> AtlasPage.

    Levels are laid out per material top-down; levels small enough to
    share the page width sit side by side to bound page memory
    (~60 MB/material at S=1024).
    """
    from ..models.texture import SAMPLED_ROWS
    size, n_levels, M = atlas.size, atlas.n_levels, atlas.num_materials
    stride = atlas.layer_stride
    level_off = []
    off = 0
    for k in range(n_levels):
        level_off.append(off)
        off += (size >> k) * (size >> k)

    page_cols = -(-((size + AP_C) * CH) // 128) * 128

    # assign (row0, col0): side-by-side packing of small levels
    row0 = np.zeros((M, n_levels), np.int32)
    col0 = np.zeros((M, n_levels), np.int32)
    cur_row = 0
    for m in range(M):
        cur_col = 0
        row_height = 0
        for lv in range(n_levels):
            s = size >> lv
            need_c = -(-((s + AP_C) * CH) // 128) * 128
            need_r = -(-(s + AP_R) // ROW_AL) * ROW_AL
            if cur_col + need_c > page_cols:
                cur_row += row_height
                cur_col = 0
                row_height = 0
            row0[m, lv] = cur_row
            col0[m, lv] = cur_col
            cur_col += need_c
            row_height = max(row_height, need_r)
        cur_row += row_height
    total_rows = -(-cur_row // ROW_AL) * ROW_AL

    try:
        import ml_dtypes
        bf16 = np.dtype(ml_dtypes.bfloat16)
    except ImportError:  # pragma: no cover
        bf16 = np.dtype(np.float32)
    page = np.zeros((total_rows, page_cols), bf16)

    chans = atlas.packed[list(SAMPLED_ROWS)]     # (11, M*stride) u8
    for m in range(M):
        for lv in range(n_levels):
            s = size >> lv
            base = m * stride + level_off[lv]
            img = chans[:, base:base + s * s].reshape(11, s, s)
            ys = np.arange(s + AP_R) % s
            xs = np.arange(s + AP_C) % s
            wrapped = img[:, ys][:, :, xs]       # (11, s+AP_R, s+AP_C)
            block = np.zeros((s + AP_R, (s + AP_C) * CH), np.float32)
            for c in range(11):
                block[:, c::CH] = wrapped[c]
            r, co = int(row0[m, lv]), int(col0[m, lv])
            page[r:r + s + AP_R, co:co + block.shape[1]] = \
                block.astype(bf16)
    return AtlasPage(page=page, row0=row0, col0=col0, size=size,
                     n_levels=n_levels, num_materials=M)


# ---------------------------------------------------------------------------
# Phase 1: per-tile window planning (XLA)
# ---------------------------------------------------------------------------


def _tileize(x, H, W):
    """(H, W) -> (NT, TH*TW)."""
    return (x.reshape(H // TH, TH, W // TW, TW)
            .transpose(0, 2, 1, 3).reshape(-1, P))


def _untileize_pc(x, H, W):
    """(NT, TH*TW, C) -> (C, H, W) — pixel-major kernel output layout,
    single fused transpose."""
    NTY, NTX = H // TH, W // TW
    C = x.shape[2]
    return (x.reshape(NTY, NTX, TH, TW, C)
            .transpose(4, 0, 2, 1, 3).reshape(C, H, W))


def _masked_bbox(m, x0, y0):
    """m: (NT, K, P) bool; x0/y0: (NT, P) -> min/max per (NT, K)."""
    big = jnp.int32(1 << 24)
    xmn = jnp.min(jnp.where(m, x0[:, None, :], big), axis=2)
    ymn = jnp.min(jnp.where(m, y0[:, None, :], big), axis=2)
    xmx = jnp.max(jnp.where(m, x0[:, None, :], -big), axis=2)
    ymx = jnp.max(jnp.where(m, y0[:, None, :], -big), axis=2)
    return xmn, ymn, xmx, ymx


def _plan_tiles_impl(mid_t, u_t, v_t, level_t, live_t, row0, col0, *,
                     size: int, n_levels: int, num_materials: int,
                     k_top: int = K_TOP, nblk: int = NBLK,
                     px_fallback: bool = False):
    """Per-tile window planning on tiled (NT, P) arrays.

    level_t: (NT, P) int32 mip level per pixel (round(lod) for
    nearest-mip bilinear; floor / floor+1 for the trilinear passes).

    k_top / nblk: default the production constants; overridable both
    for offline planner studies (tools/study_texplanner.py) and for
    rendering — sample_atlas_page compiles its kernel geometry against
    the same nblk (FramePlan.tex_k_top/tex_nblk thread them through
    for chip A/Bs).

    px_fallback: per-PIXEL fallback mode (VERDICT r4 item 1b).  In the
    default (tile) mode a dirty tile discards ALL its windows (n_used
    is zeroed by the caller) and the whole tile re-gathers through the
    XLA path — a fixed dirty_cap*256-pixel tax.  In px mode, windows
    stay live on dirty tiles (only genuinely over-slot windows are
    dropped), pixels they cover keep the kernel result, and ONLY the
    uncovered pixels go to a compacted XLA gather — fallback cost
    tracks actual uncovered pixels, and unfit/over-slot tiles degrade
    per-pixel instead of per-tile.

    Returns (perpx (NT, 4, P) f32 [row_idx0, fv, u0, fu],
    dma (NT, nblk, 2) i32 window origins,
    used (NT,) i32 slot count, dirty (NT,) bool,
    covered (NT, P) bool — pixels the kernel samples exactly).
    """
    K_TOP = k_top
    NBLK = nblk
    M, L = num_materials, n_levels
    NT = mid_t.shape[0]

    combo = mid_t * L + level_t                       # (NT, P)
    combo = jnp.where(live_t, combo, -1)

    s_of_level = jnp.right_shift(
        jnp.int32(size), jnp.arange(L, dtype=jnp.int32))
    s_t = s_of_level[jnp.clip(level_t, 0, L - 1)].astype(jnp.float32)
    # texel coords (unwrapped): same math as sample_packed_atlas; the
    # mod-s page origin absorbs the frac-vs-unwrapped difference
    xf = u_t * s_t - 0.5
    yf = v_t * s_t - 0.5
    x0f = jnp.floor(xf)
    y0f = jnp.floor(yf)
    fu = xf - x0f
    fv = yf - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # --- top-K_TOP combos per tile by pixel count.
    # Run-length top-K on the per-tile SORTED combo row instead of a
    # dense (NT, M*L, P) one-hot histogram: the dense form materializes
    # 643 MB of int32 at 1080p/full (M=7, L=11) and is HBM-bound, while
    # the sorted row is (NT, P) and each combo becomes one contiguous
    # run whose length is its count.  Tie-breaking matches the dense
    # argmax (leftmost run = smallest combo id); exhausted tiles pick
    # combo 0 with count 0, exactly like the dense form's argmax over
    # all-zero counts.
    idxP = jnp.arange(P, dtype=jnp.int32)[None, :]
    sorted_c = jnp.sort(combo, axis=1)                # (NT, P)
    is_start = jnp.concatenate(
        [jnp.ones((NT, 1), bool), sorted_c[:, 1:] != sorted_c[:, :-1]],
        axis=1)
    # suffix-min of start positions -> index of the next run start
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_start, idxP, P)[:, ::-1],
        axis=1)[:, ::-1]
    nxt_excl = jnp.concatenate(
        [nxt[:, 1:], jnp.full((NT, 1), P, jnp.int32)], axis=1)
    run_len = jnp.where(is_start & (sorted_c >= 0), nxt_excl - idxP, 0)
    top_combo = []
    cts = run_len
    for _ in range(K_TOP):
        j = jnp.argmax(cts, axis=1).astype(jnp.int32)        # (NT,)
        ln = jnp.take_along_axis(cts, j[:, None], axis=1)[:, 0]
        # exhausted tiles (all remaining runs empty) pick the
        # OUT-OF-RANGE sentinel M*L, which no pixel's combo can equal,
        # so exhausted rows get empty candidate masks and consume no
        # slots.  (Two wrong sentinels tried before: re-picking the
        # tile's first combo duplicated windows — dirty 440 -> 1295,
        # avg_slots 3.1 -> 6.6 on sponza 736p; and sentinel 0 collides
        # with the REAL combo (material 0, mip 0), duplicating its
        # window per exhausted row on any tile that samples it.)
        top_combo.append(jnp.where(
            ln > 0,
            jnp.take_along_axis(sorted_c, j[:, None], axis=1)[:, 0],
            M * L))
        cts = cts * (1 - (idxP == j[:, None]))
    top_combo = jnp.stack(top_combo, axis=1)          # (NT, K_TOP)

    is_c = combo[:, None, :] == top_combo[:, :, None]   # (NT, K, P)
    in_any = jnp.any(is_c, axis=1)
    crank = jnp.where(in_any & live_t,
                      jnp.argmax(is_c, axis=1).astype(jnp.int32),
                      jnp.where(live_t, -1, -2))      # (NT, P)

    blk_level = top_combo % L                         # (NT, K)
    blk_mat = jnp.clip(top_combo // L, 0, M - 1)
    s_blk = s_of_level[blk_level]
    small = s_blk <= SMALL_S                          # fully resident

    # --- depth-2 quadtree split of each combo's bbox
    # level 0: whole combo
    xmn0, ymn0, xmx0, ymx0 = _masked_bbox(is_c, x0, y0)
    has0 = jnp.any(is_c, axis=2)
    fit0 = ((xmx0 - xmn0 <= BBOX_MAX) & (ymx0 - ymn0 <= BBOX_MAX)
            ) | small | ~has0
    ax0 = (xmx0 - xmn0) >= (ymx0 - ymn0)              # split axis: True=u
    t0 = jnp.where(ax0, (xmx0 + xmn0) // 2, (ymx0 + ymn0) // 2)
    # half membership per pixel (below threshold = half A)
    px_half = jnp.where(ax0[:, :, None], x0[:, None, :],
                        y0[:, None, :]) <= t0[:, :, None]   # (NT, K, P)
    mA = is_c & px_half
    mB = is_c & ~px_half
    # level 1: halves
    outs = []
    for mH in (mA, mB):
        xmn, ymn, xmx, ymx = _masked_bbox(mH, x0, y0)
        has = jnp.any(mH, axis=2)
        fit = ((xmx - xmn <= BBOX_MAX) & (ymx - ymn <= BBOX_MAX)) | ~has
        ax = (xmx - xmn) >= (ymx - ymn)
        t = jnp.where(ax, (xmx + xmn) // 2, (ymx + ymn) // 2)
        qh = jnp.where(ax[:, :, None], x0[:, None, :],
                       y0[:, None, :]) <= t[:, :, None]
        mQ0 = mH & qh
        mQ1 = mH & ~qh
        outs.append((mH, has, fit, mQ0, mQ1))

    # window candidates per combo, in canonical order:
    #   unsplit -> [whole]
    #   split   -> per half: fits -> [half]; else -> [q0, q1]
    # realized as 4 candidate masks with used flags
    (mA_, hasA, fitA, mA0, mA1) = outs[0]
    (mB_, hasB, fitB, mB0, mB1) = outs[1]
    split0 = ~fit0                 # False for small / fitting combos
    s3 = split0[:, :, None]
    # candidate 0: whole (unsplit) or half A (if it fits) or quarter A0
    c0_mask = jnp.where(s3, jnp.where(fitA[:, :, None], mA_, mA0), is_c)
    # candidate 1: half A's second quarter (split & A doesn't fit)
    c1_mask = mA1 & s3 & ~fitA[:, :, None]
    # candidate 2: half B (if it fits) or quarter B0 (split only)
    c2_mask = jnp.where(fitB[:, :, None], mB_, mB0) & s3
    # candidate 3: half B's second quarter
    c3_mask = mB1 & s3 & ~fitB[:, :, None]
    cand_masks = [c0_mask, c1_mask, c2_mask, c3_mask]
    cand_used = [jnp.any(cm, axis=2) for cm in cand_masks]

    # a combo is cleanly coverable iff every used candidate's bbox fits
    # (small levels are always coverable at origin 0)
    cand_fit = []
    cand_bbox = []
    for cm in cand_masks:
        xmn, ymn, xmx, ymx = _masked_bbox(cm, x0, y0)
        cand_bbox.append((xmn, ymn))
        cand_fit.append(((xmx - xmn <= BBOX_MAX)
                         & (ymx - ymn <= BBOX_MAX)))
    used_kc = jnp.stack(cand_used, axis=2)            # (NT, K, 4)
    fit_kc = jnp.stack(cand_fit, axis=2)
    combo_ok = jnp.all(fit_kc | ~used_kc, axis=2) | small

    # --- slot assignment: flatten (K, 4) candidates, prefix-sum used
    used_flat = used_kc.reshape(NT, K_TOP * 4)
    slot_of = (jnp.cumsum(used_flat.astype(jnp.int32), axis=1)
               - used_flat.astype(jnp.int32))         # exclusive prefix
    n_used = jnp.sum(used_flat.astype(jnp.int32), axis=1)

    # tile dirty: any live pixel outside top-K combos, any used combo
    # not cleanly coverable, or more windows than slots
    dirty = (jnp.any(crank == -1, axis=1)
             | jnp.any(has0 & ~combo_ok, axis=1)
             | (n_used > NBLK))

    # --- window origins per candidate
    # small levels: origin 0 (mod-s coords); windowed: aligned bbox min
    dma_r = jnp.zeros((NT, NBLK), jnp.int32)
    dma_c = jnp.zeros((NT, NBLK), jnp.int32)
    # per-pixel slot + in-window coords
    px_slot = jnp.full((NT, P), 0, jnp.int32)
    px_u = jnp.zeros((NT, P), jnp.int32)
    px_v = jnp.zeros((NT, P), jnp.int32)
    covered = jnp.zeros((NT, P), bool)

    r0_kc = row0[blk_mat, blk_level]                  # (NT, K)
    c0_kc = col0[blk_mat, blk_level]
    s_kc = s_blk
    s_safe = jnp.maximum(s_kc, 1)

    slot_ids = jnp.arange(NBLK, dtype=jnp.int32)
    # px mode: keep windows live on dirty tiles; only over-slot windows
    # (slot_raw >= NBLK) are invalid.  Tile mode: kill the whole tile
    # (slot_raw < NBLK is then vacuous — dirty covers n_used > NBLK).
    kill = jnp.zeros_like(dirty) if px_fallback else dirty
    for ci, (cm, (xmn, ymn)) in enumerate(zip(cand_masks, cand_bbox)):
        used = used_kc[:, :, ci]                      # (NT, K)
        ox = jnp.where(small, 0, (xmn // COL_AL) * COL_AL)
        oy = jnp.where(small, 0, (ymn // ROW_AL) * ROW_AL)
        pr = r0_kc + jnp.remainder(oy, s_safe)
        pc = c0_kc + jnp.remainder(ox, s_safe) * CH
        slot_raw = slot_of.reshape(NT, K_TOP, 4)[:, :, ci]
        slot = jnp.clip(slot_raw, 0, NBLK - 1)        # (NT, K)
        sel = used & ~kill[:, None] & (slot_raw < NBLK)
        onehot = (slot[:, :, None] == slot_ids[None, None, :]) \
            & sel[:, :, None]                         # (NT, K, NBLK)
        dma_r = dma_r + jnp.sum(jnp.where(onehot, pr[:, :, None], 0),
                                axis=1)
        dma_c = dma_c + jnp.sum(jnp.where(onehot, pc[:, :, None], 0),
                                axis=1)
        # pixels of this candidate
        pm = cm & (used & sel)[:, :, None]            # (NT, K, P)
        px_in = jnp.any(pm, axis=1)
        kof = jnp.argmax(pm, axis=1)                  # (NT, P) combo idx

        def pick(a):  # (NT, K) -> (NT, P) via kof, masked by px_in
            return jnp.sum(
                a[:, :, None] * (kof[:, None, :]
                                 == jnp.arange(K_TOP)[None, :, None]),
                axis=1)

        ox_p = pick(ox)
        oy_p = pick(oy)
        s_p = jnp.maximum(pick(s_kc), 1)
        small_p = pick(small.astype(jnp.int32)) > 0
        u_in = jnp.where(small_p, jnp.remainder(x0, s_p), x0 - ox_p)
        v_in = jnp.where(small_p, jnp.remainder(y0, s_p), y0 - oy_p)
        sl_p = pick(slot)
        good = px_in & (u_in >= 0) & (u_in < WIN_C - 1) \
            & (v_in >= 0) & (v_in < WIN_R - 1)
        px_slot = jnp.where(good, sl_p, px_slot)
        px_u = jnp.where(good, u_in, px_u)
        px_v = jnp.where(good, v_in, px_v)
        covered = covered | good

    dirty = dirty | jnp.any(live_t & ~covered, axis=1)

    row_idx0 = (px_slot * WIN_R + px_v).astype(jnp.float32)
    z = jnp.float32(0.0)
    perpx = jnp.stack([
        jnp.where(covered, row_idx0, z),
        jnp.where(covered, fv, z),
        jnp.where(covered, px_u.astype(jnp.float32), z),
        jnp.where(covered, fu, z),
    ], axis=1)                                        # (NT, 4, P)

    dma = jnp.stack([dma_r, dma_c], axis=2).astype(jnp.int32)
    return perpx, dma, jnp.minimum(n_used, NBLK), dirty, covered


# ---------------------------------------------------------------------------
# Phase 2: the Pallas kernel
# ---------------------------------------------------------------------------


TPS = 8          # tiles per grid step: the measured kernel floor is
#                  STRUCTURAL, not compute — an empty kernel with the
#                  per-tile grid + (P, 128) block writes costs 5.5 ms
#                  of the 10.2 ms total at 3680 tiles (bench_texkernel
#                  _parts.py: "nothing" variant).  Batching tiles per
#                  step cuts grid steps and HBM writes; 8 tiles/step
#                  fits VMEM once NBLK=6 (w_buf 2 x 8*288 x 768 bf16 =
#                  7.1 MB) and halves the round-3 step count again.
OUT_SUB = 32     # output lanes per tile (channels 0..CH-1 + zero pad)
OUT_PAD = TPS * OUT_SUB          # = 256: two vreg-wide output block


def _tile_kernel(meta_ref, perpx_ref, sel_ref, page_ref, out_ref, w_buf,
                 sem, *, NBLK=NBLK, TPS=None):
    """One grid step = TPS screen tiles (module docstring has the math).

    meta_ref: FLAT (NT * (1 + NBLK*2),) i32 scalar-prefetch —
    per tile [n_used, (row, col) x NBLK]; unused slots skip their DMA
    (their W rows keep the previous group's finite values, and no
    pixel's one-hot selects them).

    NBLK / TPS keyword-only overrides: the kernel geometry (window-
    stack height, meta stride, tiles per step) is compiled per value —
    FramePlan.tex_nblk/tex_k_top/tex_tps expose them for chip A/Bs
    (planner-coverage vs kernel-cost trade, VERDICT r4 item 1b).

    Stage 2 runs in bf16: window values are u8-valued (<= 255, exact in
    bf16) and each blend adds <= 0.5 ulp ~ 0.5 u8 lsb — within the
    documented bf16-blend-rounding envelope of the page itself.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if TPS is None:
        TPS = globals()["TPS"]
    R_TOTAL = NBLK * WIN_R
    STRIDE = 1 + NBLK * 2
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    slot = jax.lax.rem(g, 2)

    def block_dma(tile, buf_slot, ti, b):
        base = tile * STRIDE + 1 + b * 2
        r = pl.multiple_of(meta_ref[base], ROW_AL)
        c = pl.multiple_of(meta_ref[base + 1], 128)
        return pltpu.make_async_copy(
            page_ref.at[pl.ds(r, WIN_R), pl.ds(c, WIN_LANES)],
            w_buf.at[buf_slot, pl.ds(ti * R_TOTAL + b * WIN_R, WIN_R),
                     :],
            sem.at[buf_slot, ti * NBLK + b])

    def start_group(grp, buf_slot):
        for ti in range(TPS):
            n = meta_ref[(grp * TPS + ti) * STRIDE]
            for b in range(NBLK):
                @pl.when(b < n)
                def _():
                    block_dma(grp * TPS + ti, buf_slot, ti, b).start()

    @pl.when(g == 0)
    def _():
        # NaN-safety: VMEM scratch starts uninitialized; rows of slots
        # never DMA'd must still be FINITE for the masked matmul
        w_buf[...] = jnp.zeros_like(w_buf)
        start_group(0, 0)

    @pl.when(g + 1 < ng)
    def _():
        start_group(g + 1, 1 - slot)

    outs = []
    for ti in range(TPS):
        n_cur = meta_ref[(g * TPS + ti) * STRIDE]
        for b in range(NBLK):
            @pl.when(b < n_cur)
            def _():
                block_dma(g * TPS + ti, slot, ti, b).wait()

        W = w_buf[slot, ti * R_TOTAL:(ti + 1) * R_TOTAL, :]
        rI0 = perpx_ref[0, ti * 4 + 0, :][:, None]   # (P, 1) f32
        fv = perpx_ref[0, ti * 4 + 1, :][:, None]
        u0 = perpx_ref[0, ti * 4 + 2, :][:, None]
        fu = perpx_ref[0, ti * 4 + 3, :][:, None]

        # Closed-form bilinear row/column weights:
        # max(0, 1 - |iota - cf|) puts 1-frac on the floor index and
        # frac on floor+1 (exact for frac in [0,1), no wrap — windows
        # never wrap in-kernel), at half the VPU ops of the
        # two-one-hot form.
        iR = jax.lax.broadcasted_iota(
            jnp.int32, (1, R_TOTAL), 1).astype(jnp.float32)
        U = jnp.maximum(0.0, 1.0 - jnp.abs(iR - (rI0 + fv)))
        rowsel = jax.lax.dot_general(
            U.astype(jnp.bfloat16), W, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,      # Mosaic: acc must
            ).astype(jnp.bfloat16)                   # be 32-bit
        #                                              (P, WIN_LANES)

        texel = (jax.lax.broadcasted_iota(jnp.int32, (1, WIN_LANES), 1)
                 // CH).astype(jnp.float32)
        Vw = jnp.maximum(0.0, 1.0 - jnp.abs(texel - (u0 + fu))
                         ).astype(jnp.bfloat16)
        tmp = rowsel * Vw                            # (P, WIN_LANES) bf16

        outs.append(jax.lax.dot_general(
            tmp, sel_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))     # (P, OUT_SUB)
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)


def _channel_sel():
    """(WIN_LANES, OUT_SUB) bf16 constant: lane l -> channel l % CH."""
    lane = np.arange(WIN_LANES)[:, None]
    chan = np.arange(OUT_SUB)[None, :]
    return ((lane % CH == chan) & (chan < CH)).astype(np.float32)


def sample_atlas_page(page_arr, meta, perpx, *, interpret: bool = False,
                      nblk: int = NBLK, tps: int = TPS):
    """Run the tile kernel.  page_arr (rows, cols) bf16; meta
    (NT*(1+nblk*2),) i32; perpx (NT, 4, P) f32 -> (NT, P, OUT_SUB) bf16
    raw u8-valued channels on lanes 0..CH-1 (rest zero).

    NT is padded up to a multiple of tps internally (padded tiles have
    n_used=0 and all-zero per-pixel rows); the pad is sliced off the
    return value."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NT = perpx.shape[0]
    pad = (-NT) % tps
    if pad:
        STRIDE = 1 + nblk * 2
        meta = jnp.concatenate(
            [meta, jnp.zeros((pad * STRIDE,), jnp.int32)])
        perpx = jnp.concatenate(
            [perpx, jnp.zeros((pad, 4, P), perpx.dtype)])
    ntp = NT + pad
    r_total = nblk * WIN_R
    out_pad = tps * OUT_SUB
    sel = jnp.asarray(_channel_sel(), jnp.bfloat16)
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntp // tps,),
        in_specs=[
            pl.BlockSpec((1, tps * 4, P), lambda t, meta: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant block: fetched once, resident across steps
            pl.BlockSpec((WIN_LANES, OUT_SUB), lambda t, meta: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # page (HBM)
        ],
        out_specs=pl.BlockSpec((1, P, out_pad), lambda t, meta: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tps * r_total, WIN_LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, tps * nblk)),
        ],
    )
    packed = pl.pallas_call(
        functools.partial(_tile_kernel, NBLK=nblk, TPS=tps),
        grid_spec=gspec,
        out_shape=jax.ShapeDtypeStruct((ntp // tps, P, out_pad),
                                       jnp.bfloat16),
        interpret=interpret,
    )(meta, perpx.reshape(ntp // tps, tps * 4, P), sel, page_arr)
    # unpack the per-tile 32-lane stripes -> (NT, P, OUT_SUB)
    out = packed.reshape(ntp // tps, P, tps, OUT_SUB).transpose(
        0, 2, 1, 3).reshape(ntp, P, OUT_SUB)
    return out[:NT]


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


def sample_atlas_tiled(page: AtlasPageDevice, mid, uv, lod, live,
                       atlas_fallback, *, size: int, n_levels: int,
                       num_materials: int, layer_stride: int,
                       filter_mode: str = "bilinear",
                       dirty_cap: int = 768,
                       interpret: bool = False, H: int = 0, W: int = 0,
                       k_top: int = K_TOP, nblk: int = NBLK,
                       tps: int = TPS, px_fallback: bool = False,
                       px_cap: int = 0):
    """Tiled sampling of the 11 material channels.

    mid/lod/live: (H*W,); uv: (2, H*W); H, W multiples of 16.
    filter_mode: "bilinear" (nearest mip, one kernel pass) or
    "trilinear" (two passes, lod-frac lerp).
    Returns ((11, H*W) f32 in [0,1], overflow () int32 —
    OVERFLOW_TEX_DIRTY when dirty tiles exceeded dirty_cap,
    n_dirty () int32 — the actual dirty-tile count this frame, exported
    so dirty rates are measurable per config and tex_dirty_cap can be
    sized from data instead of a guess, VERDICT r3 item 6).

    atlas_fallback: the (N, 12) i32 expanded atlas for dirty tiles
    (exact XLA path, ops/gbuffer.sample_packed_atlas with the same
    filter_mode — bit-comparable up to bf16 blend rounding).

    px_fallback / px_cap (VERDICT r4 item 1b): per-PIXEL fallback.
    Dirty tiles keep their kernel windows; only pixels no window covers
    compact (jnp.nonzero, the SSR-march pattern) into a px_cap-slot XLA
    gather + scatter-back.  Cost tracks ACTUAL uncovered pixels (the
    tile mode re-gathers dirty_cap*256 px regardless), and the failure
    mode shrinks from garbage TILES to dropped uncovered PIXELS past
    the cap.  n_dirty then reports uncovered PIXELS, and overflow fires
    on the pixel cap.  px_cap = 0 sizes it at ~6% of the screen.
    """
    from . import gbuffer as gbuf_ops

    mid_t = _tileize(mid.reshape(H, W), H, W)
    u_t = _tileize(uv[0].reshape(H, W), H, W)
    v_t = _tileize(uv[1].reshape(H, W), H, W)
    lod_c = jnp.clip(lod, 0.0, float(n_levels - 1))
    lod_t = _tileize(lod_c.reshape(H, W), H, W)
    live_t = _tileize(live.reshape(H, W), H, W)
    NT = mid_t.shape[0]

    if filter_mode == "trilinear":
        l0 = jnp.floor(lod_t).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, n_levels - 1)
        lf = lod_t - l0.astype(jnp.float32)
        passes = [(l0, 1.0 - lf), (l1, lf)]
    else:
        passes = [(jnp.clip(jnp.round(lod_t).astype(jnp.int32), 0,
                            n_levels - 1), None)]

    out_t = None
    dirty_any = jnp.zeros((NT,), bool)
    covered_all = None
    for level_t, weight in passes:
        perpx, dma, n_used, dirty, covered = _plan_tiles_impl(
            mid_t, u_t, v_t, level_t, live_t, page.row0, page.col0,
            size=size, n_levels=n_levels, num_materials=num_materials,
            k_top=k_top, nblk=nblk, px_fallback=px_fallback)
        if not px_fallback:
            n_used = jnp.where(dirty, 0, n_used)
        meta = jnp.concatenate(
            [n_used[:, None], dma.reshape(NT, nblk * 2)],
            axis=1).reshape(-1).astype(jnp.int32)
        res = sample_atlas_page(
            page.page, meta, perpx, interpret=interpret,
            nblk=nblk, tps=tps)[:, :, :CH]             # (NT, P, CH) bf16
        dirty_any = dirty_any | dirty
        covered_all = covered if covered_all is None \
            else covered_all & covered
        if weight is None:
            out_t = res
        else:
            w3 = weight[:, :, None].astype(jnp.bfloat16)
            out_t = res * w3 if out_t is None else out_t + res * w3

    if px_fallback:
        # ---- per-pixel fallback: exact gather on compacted uncovered
        # pixels (docstring; trilinear needs BOTH passes covered)
        NPIX = NT * P
        cap = px_cap if px_cap > 0 else -(-int(0.06 * NPIX) // 1024) * 1024
        unc = (live_t & ~covered_all).reshape(-1)
        n_dirty = jnp.sum(unc.astype(jnp.int32))      # uncovered PIXELS
        overflow = jnp.where(n_dirty > cap,
                             OVERFLOW_TEX_DIRTY, 0).astype(jnp.int32)
        q = jnp.nonzero(unc, size=cap, fill_value=NPIX)[0]
        fill = q >= NPIX
        # fill slots gather DISTINCT addresses (results dropped on the
        # scatter): identical-address lanes serialize — an all-one-index
        # gather measured 88.6 ms where random costs 47.1 (PERF.md)
        qg = jax.lax.optimization_barrier(
            jnp.where(fill, jnp.arange(cap, dtype=q.dtype) % NPIX, q))
        fields = jnp.stack([
            mid_t.reshape(-1).astype(jnp.float32), u_t.reshape(-1),
            v_t.reshape(-1), lod_t.reshape(-1)])      # one fat gather
        f = fields[:, qg]
        tex_f = gbuf_ops.sample_packed_atlas(
            atlas_fallback, jnp.round(f[0]).astype(jnp.int32), f[1:3],
            f[3], size=size, layer_stride=layer_stride,
            n_levels=n_levels, filter_mode=filter_mode)   # (11, cap)
        texp = jnp.concatenate(
            [(tex_f.T * 255.0).astype(jnp.bfloat16),
             jnp.zeros((cap, 1), jnp.bfloat16)], axis=1)  # (cap, CH)
        qs = jnp.where(fill, NPIX, q)                 # NPIX: dropped
        out_t = (out_t.reshape(NPIX, CH).at[qs]
                 .set(texp, mode="drop").reshape(NT, P, CH))
    else:
        # ---- dirty-tile fallback: exact gather on compacted tiles
        dirty_ids = jnp.nonzero(dirty_any, size=dirty_cap,
                                fill_value=NT)[0]
        n_dirty = jnp.sum(dirty_any.astype(jnp.int32))
        overflow = jnp.where(n_dirty > dirty_cap,
                             OVERFLOW_TEX_DIRTY, 0).astype(jnp.int32)
        dsafe = jnp.minimum(dirty_ids, NT - 1)
        # NOTE: unused fallback slots (dirty_ids == NT fill) re-gather
        # tile NT-1's pixels.  Clamping them to a degenerate constant
        # index was MEASURED SLOWER (config 1: 9.4 -> 11.1 ms/frame;
        # isolated: an all-zero-index (N,12) gather costs 88.6 ms where
        # random costs 47.1 — same-address lanes serialize).  Fallback
        # cost is therefore ~dirty_cap * P regardless of index content:
        # the cap is sized per scene (FramePlan.tex_dirty_cap), not
        # masked per frame.
        f_mid = mid_t[dsafe].reshape(-1)
        f_uv = jnp.stack([u_t[dsafe].reshape(-1),
                          v_t[dsafe].reshape(-1)])
        f_lod = lod_t[dsafe].reshape(-1)
        tex_f = gbuf_ops.sample_packed_atlas(
            atlas_fallback, f_mid, f_uv, f_lod, size=size,
            layer_stride=layer_stride, n_levels=n_levels,
            filter_mode=filter_mode)                      # (11, D*P)
        tex_f = (tex_f.reshape(11, dirty_cap, P).transpose(1, 2, 0)
                 * 255.0).astype(jnp.bfloat16)
        pad_row = jnp.zeros((dirty_cap, P, 1), jnp.bfloat16)
        tex_f = jnp.concatenate([tex_f, pad_row], axis=2)  # (D, P, CH)
        out_t = out_t.at[dirty_ids].set(tex_f, mode="drop")

    out = _untileize_pc(out_t, H, W)[:11].astype(jnp.float32) / 255.0
    return out.reshape(11, H * W), overflow, n_dirty
