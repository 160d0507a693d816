"""TPU-native rasterizer v2: sort-binned pair streams + Pallas resolve.

Replaces the reference's hardware raster passes (depth prepass
``depth_prepass.inl``, shadow ``sun_shadow_draw.inl``, G-buffer
``g_buffer_generation.inl`` — the latter's fragment work lives in
ops/gbuffer.py) with a design built around the measured TPU cost model
(PERF.md):

1. **Setup** (XLA, ops/raster.triangle_setup): homogeneous adjugate
   coverage — no clipping, static shapes.
2. **Binning** (XLA): each triangle emits (bin, tri) pairs for the
   screen bins its bbox covers — 4 inline slots for the common case and
   a compacted "medium" expansion for larger triangles — then ONE
   `lax.sort` by bin id groups pairs into per-bin contiguous ranges
   (`searchsorted` boundaries).  No atomics, no per-bin caps, no
   cumsum/searchsorted compaction.
3. **Record gather** (XLA): one minor-axis gather packs each sorted
   pair's full resolve record into a (16, PAIR_CAP) stream:
   rows = [adjugate 3x3 | z0..z2 | w0..w2 | tri_id bits].
4. **Resolve** (Pallas): grid over bin groups; each bin DMAs its record
   chunks from HBM at its dynamic offset and evaluates
   (pixels × triangles) coverage/depth on the VPU, carrying per-pixel
   (min z, winner id).  Per-bin triangle counts come from scalar-
   prefetched offsets, so work is proportional to actual pairs.

Very large triangles (bbox covering more than ``med_slots`` bins) are
truncated to their first ``med_slots`` bins — scenes should pre-split
giant world-space triangles (models/proc.py does; glTF content rarely
needs it).
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_EPS = 1e-6

# Pair-stream z ordering: the sort key is bin_id * ZQ + quantized
# conservative min NDC z of the triangle, so each bin's records arrive
# NEAR-TO-FAR and the resolve kernel can stop as soon as the next
# chunk's min z is provably behind every pixel's current winner — the
# in-pass, single-frame form of the HiZ coarse reject (VERDICT r2 item
# 3; the reference builds HiZ pyramids and never uses them,
# generate_hiz.glsl:17-99 — a current-frame HiZ reject would be
# circular here since HiZ is derived from this very pass's output).
ZQ = 16384


def _cdiv(a, b):
    return -(-a // b)


@dataclass(frozen=True)
class VisibilityBuffer:
    """Per-pixel raster output (visibility-buffer style): attribute
    interpolation is deferred to ops/gbuffer.py, keeping the raster
    inner loop at 5 linear functionals per triangle."""
    depth: jax.Array    # (H, W) float32 in [0, 1]; 1.0 where no hit
    tri_id: jax.Array | None   # (H, W) int32 triangle index; -1 where
    #                       no hit; None for depth-only views (shadow)
    overflow: jax.Array  # () int32 bitmask: OVERFLOW_* bits set when any
    #                       static cap truncated fragments this frame.
    #                       The reference (hardware raster) never drops
    #                       fragments; this flag makes our cap-based
    #                       binning loud instead of silently holey.


# overflow bitmask bits (VisibilityBuffer.overflow)
OVERFLOW_PAIRS = 1       # sorted pair stream exceeded BinGrid.pair_cap
OVERFLOW_MED_CAP = 2     # more medium triangles than BinGrid.med_cap
OVERFLOW_MED_SLOTS = 4   # a medium triangle covered > med_slots bins


jax.tree_util.register_dataclass(
    VisibilityBuffer, data_fields=["depth", "tri_id", "overflow"],
    meta_fields=[])


@dataclass(frozen=True)
class PlanarSetup:
    """Planar per-triangle raster data — everything (rows, T) so T rides
    the TPU lane dimension (PERF.md layout rule)."""
    adj: jax.Array     # (9, T) adjugate rows * facing sign
    zs: jax.Array      # (3, T) per-vertex clip z
    ws: jax.Array      # (3, T) per-vertex clip w
    bbox: jax.Array    # (4, T): x0, y0, x1, y1 (px, x1/y1 exclusive)
    valid: jax.Array   # (T,)


jax.tree_util.register_dataclass(
    PlanarSetup, data_fields=["adj", "zs", "ws", "bbox", "valid"],
    meta_fields=[])


def triangle_setup_planar(clip, width, height, cull: str = "front"
                          ) -> PlanarSetup:
    """clip: (3 verts, 4 comps, T) planar clip positions.

    Same math as ops/raster.triangle_setup (homogeneous adjugate
    coverage; docstring there) in the lane-friendly layout.
    """
    w = clip[:, 3]                                     # (3, T)
    X = (clip[:, 0] * 0.5 + 0.5 * w) * width
    Y = (clip[:, 1] * 0.5 + 0.5 * w) * height
    z = clip[:, 2]
    a, b, c = X[0], X[1], X[2]
    d, e, f = Y[0], Y[1], Y[2]
    g, h, i = w[0], w[1], w[2]
    r0 = (e * i - f * h, c * h - b * i, b * f - c * e)
    r1 = (f * g - d * i, a * i - c * g, c * d - a * f)
    r2 = (d * h - e * g, b * g - a * h, a * e - b * d)
    det = a * r0[0] + b * r1[0] + c * r2[0]

    if cull == "front":
        keep = det < 0
        s = jnp.where(keep, -1.0, 0.0)
    elif cull == "back":
        keep = det > 0
        s = jnp.where(keep, 1.0, 0.0)
    else:
        keep = det != 0
        s = jnp.sign(det)
    adj = jnp.stack(r0 + r1 + r2) * s[None, :]         # (9, T)

    # Exact screen bbox even across the near plane: candidates are the
    # projected vertices with w > eps plus the projections of edge
    # intersections with the w = eps plane (a full-screen fallback here
    # explodes pair counts — one camera-plane-crossing floor can emit
    # hundreds of bins per triangle).
    big = jnp.float32(1e9)
    cand_x, cand_y, cand_ok = [], [], []
    for i in range(3):
        ok = w[i] > W_EPS
        wi = jnp.where(ok, w[i], 1.0)
        cand_x.append(X[i] / wi)
        cand_y.append(Y[i] / wi)
        cand_ok.append(ok)
    for i, j in ((0, 1), (1, 2), (2, 0)):
        crosses = (w[i] > W_EPS) != (w[j] > W_EPS)
        dw = jnp.where(jnp.abs(w[j] - w[i]) > 1e-12, w[j] - w[i], 1.0)
        t = (W_EPS - w[i]) / dw
        xc = X[i] + t * (X[j] - X[i])
        yc = Y[i] + t * (Y[j] - Y[i])
        cand_x.append(xc / W_EPS)
        cand_y.append(yc / W_EPS)
        cand_ok.append(crosses)
    cx = jnp.stack(cand_x)                              # (6, T)
    cy = jnp.stack(cand_y)
    ok6 = jnp.stack(cand_ok)
    x0 = jnp.min(jnp.where(ok6, cx, big), axis=0)
    x1 = jnp.max(jnp.where(ok6, cx, -big), axis=0)
    y0 = jnp.min(jnp.where(ok6, cy, big), axis=0)
    y1 = jnp.max(jnp.where(ok6, cy, -big), axis=0)
    any_ok = jnp.any(ok6, axis=0)
    x0 = jnp.clip(jnp.floor(jnp.where(any_ok, x0, 0.0)), 0, width)
    y0 = jnp.clip(jnp.floor(jnp.where(any_ok, y0, 0.0)), 0, height)
    x1 = jnp.clip(jnp.ceil(jnp.where(any_ok, x1, 0.0)) + 1.0, 0, width)
    y1 = jnp.clip(jnp.ceil(jnp.where(any_ok, y1, 0.0)) + 1.0, 0, height)
    bbox = jnp.stack([x0, y0, x1, y1])
    w_ok = jnp.all(w > W_EPS, axis=0)
    wsafe = jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)

    zndc = z / wsafe
    z_ok = jnp.where(w_ok,
                     ~(jnp.all(zndc < 0.0, 0) | jnp.all(zndc > 1.0, 0)),
                     True)
    valid = keep & (x1 > x0) & (y1 > y0) & z_ok & (det != 0)
    return PlanarSetup(adj=adj, zs=z, ws=w, bbox=bbox, valid=valid)


@dataclass(frozen=True)
class BinGrid:
    """Static binning configuration for one render-target size.

    Bins may be rectangular (bin_w x bin_h): the resolve kernel pays
    pixels_per_bin VPU evaluations PER PAIR, so short-wide bins (e.g.
    128x32) cut resolve work ~4x vs 128x128 while keeping the 128-lane
    out-block shape; the price is more (bin, tri) pairs per triangle
    vertically (n_small bounds the small path)."""
    width: int
    height: int
    bin_size: int = 64          # square default; bin_w/bin_h override
    group: int = 2              # bins per Pallas out-block (group*bin_w = lanes)
    chunk: int = 128            # triangles per resolve chunk
    pair_cap: int = 262144      # gathered record columns (sorted prefix)
    med_cap: int = 8192         # max "medium" triangles (bbox > n_small bins)
    med_slots: int = 64         # bins covered per medium triangle
    bin_w: int | None = None    # bin width in px (default bin_size)
    bin_h: int | None = None    # bin height in px (default bin_size)
    n_small: int = 4            # inline small-path slots per triangle
    # Record-stream dtype.  "bf16": the (16, PAIR_CAP) f32 stream
    # becomes (33, PAIR_CAP) bf16 — hi/lo split of the 15 value rows
    # (same ~16-mantissa-bit trick as the shading records,
    # gbuffer.build_shading_records) + 3 base-256 id digit rows
    # (integers <= 255 are exact in bf16).  A TPU gather of a bf16
    # table is ~6x cheaper than f32 at the same byte count (PERF.md
    # round-2 dtype cliff), and the pair gather is the dominant
    # binning cost (VERDICT r4 item 3: ~8.5 of 12.48 ms at config 5).
    # The resolve kernels reconstruct f32 per chunk (hi + lo; id =
    # d0*65536 + d1*256 + d2, exact below 2^24 triangles).  Coverage
    # uses the SAME reconstructed adjugate for every pixel, so edges
    # move by <= ~2^-16 relative — the same quantization the G-buffer
    # interpolation already applies.  "f32": the legacy exact stream.
    rec_dtype: str = "bf16"
    # Diagnostic kill-switch for the in-pass z early-out (the
    # near-to-far chunk stop in _resolve_kernel): under record
    # quantization, sliver triangles' computed per-pixel z can err by
    # more than the stop margin, making an early stop drop a
    # later-chunk winner — tools/diag_bf16.py A/Bs this on chip.
    early_out: bool = True

    def __post_init__(self):
        # the resolve kernel DMAs chunk-aligned windows of the record
        # stream; a pair_cap below/unaligned to chunk would slice past
        # the end of the (16, pair_cap) records array
        assert self.pair_cap >= self.chunk
        assert self.pair_cap % self.chunk == 0

    @property
    def bw(self):
        return self.bin_w or self.bin_size

    @property
    def bh(self):
        return self.bin_h or self.bin_size

    @property
    def bx(self):
        return _cdiv(self.width, self.bw * self.group) * self.group

    @property
    def by(self):
        return _cdiv(self.height, self.bh)

    @property
    def num_bins(self):
        return self.bx * self.by

    @property
    def pixels_per_bin(self):
        return self.bw * self.bh


def default_grid(width, height, scale="scene", kind="main"):
    """Presets: 'scene' for main/shadow views of full scenes, 'small'
    for tests/tiny models.  kind='shadow' uses 128px bins (A/B: 19.9 vs
    22.1 ms on the 4096² sponza shadow view — big targets are
    sparsely covered, so fewer/larger bins win)."""
    if scale == "small":
        return BinGrid(width=width, height=height, pair_cap=16384,
                       med_cap=512)
    if kind == "shadow":
        # round-4 A/B (post empty-bin skip + chunk-outer depth kernel):
        # bin128 g1 depth-only = 5.98 ms vs bin64 g2 6.19 on the 4096²
        # helmet_lifted view (out/r4/shadowab2.log)
        return BinGrid(width=width, height=height, bin_size=128, group=1)
    # main view: SHORT-WIDE 64x32 bins (group 2 keeps the (32, 128)
    # out-block) — round-4 A/B at config-5 scale: 19.65 ms vs 21.17 for
    # 64x64, no overflow (64x16 was 19.16 but tripped OVERFLOW_MED_
    # SLOTS; out/r4/mainab.log)
    return BinGrid(width=width, height=height, bin_w=64, bin_h=32,
                   group=2)


# ---------------------------------------------------------------------------
# Binning (XLA)
# ---------------------------------------------------------------------------


REC_ROWS_BF16 = 48   # three 16-row groups (see build_records): every
#                      kernel slice is a 16-row group at a 16-aligned
#                      offset.  Lessons from the first chip window:
#                      Mosaic rejects HBM row slices not aligned to the
#                      bf16 (8,128) tiling outright (33 rows), and
#                      VMEM sublane slices at unaligned offsets
#                      (f[15:30]) SILENTLY read wrong rows — the chip
#                      parity check caught depth collapsing to
#                      bf16-only precision (4e-3) because the lo rows
#                      never landed.


def build_records(setup: PlanarSetup, dtype: str = "f32") -> jax.Array:
    """Resolve records; column T is an always-miss sentinel.

    dtype "f32": (16, T+1) f32 [adj 9 | z 3 | w 3 | id].  ids stored as
    exact float VALUES (not bitcasts: id bit patterns are denormals
    that TPU arithmetic flushes to zero).

    dtype "bf16": (48, T+1) bf16, three 16-row groups that reconstruct
    with two aligned vector adds (_load_chunk):
      group 0 rows 0-14: value hi;        row 15: id_d0 * 65536
      group 1 rows 0-14: value lo;        row 15: id_d1 * 256
      group 2 rows 0-14: value lo2;       row 15: id_d2
    so f32(g0) + f32(g1) + f32(g2) = [15 ~f32-exact three-term values
    | exact float id] — each pre-scaled base-256 digit is an 8-bit
    integer times a power of two, exact in bf16; the sum is < 2^24,
    exact in f32 (BinGrid.rec_dtype docstring has the cost rationale).
    lo2 is the second-order residual v - hi - lo: group 2's value rows
    were zero until round 5 (the chip A/B `out/r5/bf16diag.log`
    measured 3-5% tri_id flips from ~16-bit mantissas, early-out
    on/off identical) — filling the already-gathered, already-summed
    rows with lo2 restores ~24 mantissa bits at zero extra gather or
    kernel cost."""
    T = setup.adj.shape[1]
    vals = jnp.concatenate([setup.adj, setup.zs, setup.ws], axis=0)
    if dtype == "bf16":
        assert T < (1 << 24)
        ids = jnp.arange(T, dtype=jnp.int32)
        d0 = (((ids >> 16) & 255) << 16).astype(jnp.float32)
        d1 = (((ids >> 8) & 255) << 8).astype(jnp.float32)
        d2 = (ids & 255).astype(jnp.float32)
        # The residuals MUST be computed against lax.reduce_precision
        # (bf16-round while staying f32), NOT against
        # f32(bf16(vals)): XLA's allow_excess_precision pass (on by
        # default on TPU) folds the f32->bf16->f32 convert pair to
        # identity, turning `vals - f32(bf16(vals))` into exact 0 —
        # the chip A/B (out/r5/bf16diag.log, flip rate bit-identical
        # with lo2 on/off) proved the lo/lo2 rows were all zeros on
        # TPU while CPU kept them.  reduce_precision is opaque to
        # that folding; the bf16 casts of the rounded values are then
        # value-exact.
        hi_f = jax.lax.reduce_precision(vals, 8, 7)
        r1 = vals - hi_f
        lo_f = jax.lax.reduce_precision(r1, 8, 7)
        lo2_f = jax.lax.reduce_precision(r1 - lo_f, 8, 7)
        hi = hi_f.astype(jnp.bfloat16)
        lo = lo_f.astype(jnp.bfloat16)
        lo2 = lo2_f.astype(jnp.bfloat16)
        rec = jnp.concatenate(
            [hi, d0[None].astype(jnp.bfloat16),
             lo, d1[None].astype(jnp.bfloat16),
             lo2, d2[None].astype(jnp.bfloat16)], axis=0)
        sentinel = jnp.zeros((REC_ROWS_BF16, 1), jnp.bfloat16)
        return jnp.concatenate([rec, sentinel], axis=1)
    ids = jnp.arange(T, dtype=jnp.float32)[None, :]
    rec = jnp.concatenate([vals, ids], axis=0)
    sentinel = jnp.zeros((16, 1), jnp.float32)
    return jnp.concatenate([rec, sentinel], axis=1)


def _rec_shape(grid: BinGrid):
    """(rows, dtype) of one record-stream chunk for grid.rec_dtype."""
    if grid.rec_dtype == "bf16":
        return REC_ROWS_BF16, jnp.bfloat16
    return 16, jnp.float32


def _load_chunk(raw, rec_dtype: str, want_id: bool = True):
    """Scratch chunk -> (16 or 15, K) f32 resolve rows [vals | idf].

    bf16: two adds over 16-row groups at 16-ALIGNED offsets — Mosaic
    silently mis-slices bf16/converted arrays at unaligned sublane
    offsets (REC_ROWS_BF16 note), so no 15-row or offset-15 slice may
    appear here.  Row 15 of the sum is the exact float id
    (build_records docstring)."""
    if rec_dtype == "f32":
        return raw[:] if want_id else raw[0:15]
    f = raw[:].astype(jnp.float32)              # (48, K)
    rec = f[0:16] + f[16:32] + f[32:48]
    return rec if want_id else rec[0:15]


def build_pairs(setup: PlanarSetup, grid: BinGrid):
    """Returns (starts (B+1,) i32 clamped to pair_cap, sorted_tids
    (S,) i32, overflow () i32 bitmask) where S = 4T + med_cap*med_slots.

    overflow reports every silent-truncation hazard of the static caps
    (OVERFLOW_PAIRS / OVERFLOW_MED_CAP / OVERFLOW_MED_SLOTS)."""
    T = setup.adj.shape[1]
    bw, bh = grid.bw, grid.bh
    BX, BY, B = grid.bx, grid.by, grid.num_bins

    x0, y0, x1, y1 = (setup.bbox[i] for i in range(4))
    bx0 = jnp.clip((x0 // bw).astype(jnp.int32), 0, BX - 1)
    by0 = jnp.clip((y0 // bh).astype(jnp.int32), 0, BY - 1)
    bx1 = jnp.clip(((x1 - 1.0) // bw).astype(jnp.int32), 0, BX - 1)
    by1 = jnp.clip(((y1 - 1.0) // bh).astype(jnp.int32), 0, BY - 1)
    w = bx1 - bx0 + 1
    h = by1 - by0 + 1
    nb = w * h
    valid = setup.valid

    def slot_keys(bx0g, by0g, wg, hg, n_slots):
        """emits (n_slots, N) bin keys (B = invalid)."""
        s = jnp.arange(n_slots, dtype=jnp.int32)[:, None]
        dx = s % wg[None, :]
        dy = s // wg[None, :]
        ok = dy < hg[None, :]
        key = (by0g[None, :] + dy) * BX + bx0g[None, :] + dx
        return jnp.where(ok, key, B)

    assert B <= (2 ** 31 - 1) // ZQ, "bin count overflows the z-sort key"
    # conservative per-triangle min NDC z (0 when any w is clipped —
    # such triangles never allow an early stop)
    wsafe = jnp.where(jnp.abs(setup.ws) > W_EPS, setup.ws, W_EPS)
    zndc = setup.zs / wsafe
    w_ok = jnp.all(setup.ws > W_EPS, axis=0)
    zmin = jnp.where(w_ok, jnp.clip(jnp.min(zndc, axis=0), 0.0, 1.0), 0.0)
    zq = (zmin * (ZQ - 1)).astype(jnp.int32)

    ns = grid.n_small
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    small = valid & (nb <= ns)
    k_small = jnp.where(small[None, :],
                        slot_keys(bx0, by0, w, h, ns) * ZQ + zq[None, :],
                        B * ZQ)

    med = valid & (nb > ns)
    med_ids = jnp.nonzero(med, size=grid.med_cap, fill_value=T)[0]
    mi = jnp.minimum(med_ids, T - 1)
    m_ok = (med_ids < T)[None, :]
    k_med = slot_keys(bx0[mi], by0[mi], w[mi], h[mi], grid.med_slots)
    k_med = jnp.where(m_ok, k_med * ZQ + zq[mi][None, :], B * ZQ)

    keys = jnp.concatenate([k_small.reshape(-1), k_med.reshape(-1)])
    tids = jnp.concatenate([
        jnp.broadcast_to(tri_ids[None, :], (ns, T)).reshape(-1),
        jnp.broadcast_to(med_ids[None, :],
                         (grid.med_slots, grid.med_cap)).reshape(-1)])
    sk, st = jax.lax.sort((keys, tids), num_keys=1)
    starts = jnp.searchsorted(
        sk, jnp.arange(B + 1, dtype=jnp.int32) * ZQ)
    total_pairs = starts[B]
    starts = jnp.minimum(starts, grid.pair_cap).astype(jnp.int32)

    med_count = jnp.sum(med.astype(jnp.int32))
    overflow = (
        jnp.where(total_pairs > grid.pair_cap, OVERFLOW_PAIRS, 0)
        | jnp.where(med_count > grid.med_cap, OVERFLOW_MED_CAP, 0)
        | jnp.where(jnp.any(med & (nb > grid.med_slots)),
                    OVERFLOW_MED_SLOTS, 0)).astype(jnp.int32)
    return starts, st, overflow


# ---------------------------------------------------------------------------
# Pallas resolve kernel
# ---------------------------------------------------------------------------


def _resolve_depth_kernel(grid: BinGrid, starts_ref, row0_ref, recs_ref,
                          depth_ref, scratch, sem):
    """Depth-only resolve (shadow views, depth_prepass semantics): no
    winner-id tracking, half the output write-back.  The sun shadow
    pass only ever consumes depth (``sun_shadow_draw.inl:116-133``
    writes D32 only), so the tri_id plane and its per-chunk min-select
    are pure waste there — measured as part of the config-6 paid-shadow
    fix (VERDICT r3 item 3).

    Loop nest: chunks OUTER, pixel sub-blocks INNER (the full kernel
    keeps subs outer for its per-sub z early-out) — each record chunk
    is DMA'd ONCE per bin instead of once per sub-block, and the next
    chunk's DMA is double-buffered behind the current eval.  The
    whole-bin (P, 1) depth carry rides the while_loop."""
    bw, bh, G, K = grid.bw, grid.bh, grid.group, grid.chunk
    BX = grid.bx
    P = bw * bh
    PSUB = min(P, 1024)
    NSUB = P // PSUB
    rows_per_sub = PSUB // bw
    assert P % PSUB == 0 and PSUB % bw == 0, (bw, bh, P, PSUB)
    gy = pl.program_id(0) + row0_ref[0]
    gx = pl.program_id(1)

    pix = jax.lax.broadcasted_iota(jnp.int32, (PSUB, 1), 0)
    lx = (pix % bw).astype(jnp.float32)
    ly_base = (pix // bw).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    for bl in range(G):
        b = gy * BX + gx * G + bl
        start = starts_ref[b]
        end = starts_ref[b + 1]
        col0 = (start // K) * K
        ox = ((gx * G + bl) * bw).astype(jnp.float32)
        oy = (gy * bh).astype(jnp.float32)
        # empty bins run ZERO chunks: the naive ceil-div is 1 when
        # start == end but start % K != 0, and a sparse view (4096²
        # shadow map, sky bins of the main view) would pay a wasted
        # DMA + full eval for it — measured as the dominant
        # shadow-view cost (bench_shadow, round 4)
        nch = jnp.where(end > start, (end - col0 + K - 1) // K, 0)

        def col_of(ci):
            return pl.multiple_of(
                jnp.minimum(col0 + ci * K, grid.pair_cap - K), K)

        def dma_of(ci, slot):
            return pltpu.make_async_copy(
                recs_ref.at[:, pl.ds(col_of(ci), K)],
                scratch.at[slot], sem.at[slot])

        @pl.when(nch > 0)
        def _():
            dma_of(jnp.int32(0), jnp.int32(0)).start()

        def chunk_cond(carry):
            ci, zb2 = carry
            return ci < nch

        def chunk_body(carry):
            # the bin depth carry is the LANE-PACKED (bh, bw) block —
            # a (P, 1) carry pads its lane dim to 128 in VMEM (8 MB at
            # bin128) and blew the scoped-vmem limit on chip
            ci, zb2 = carry
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < nch)
            def _():
                dma_of(ci + 1, 1 - slot).start()

            dma_of(ci, slot).wait()
            rec = _load_chunk(scratch[slot], grid.rec_dtype,
                              want_id=False)
            gcol = lane + col_of(ci)
            ok = (gcol >= start) & (gcol < end)

            blocks = []
            for sub in range(NSUB):
                px = lx + ox + 0.5
                py = ly_base + (sub * rows_per_sub) + oy + 0.5
                e0 = rec[0:1] * px + rec[1:2] * py + rec[2:3]
                e1 = rec[3:4] * px + rec[4:5] * py + rec[5:6]
                e2 = rec[6:7] * px + rec[7:8] * py + rec[8:9]
                cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & ok
                ez = e0 * rec[9:10] + e1 * rec[10:11] + e2 * rec[11:12]
                ew = e0 * rec[12:13] + e1 * rec[13:14] + e2 * rec[14:15]
                cov &= ew > 0
                z = ez / jnp.where(ew != 0, ew, 1.0)
                cov &= (z >= 0.0) & (z <= 1.0)
                zc = jnp.min(jnp.where(cov, z, jnp.inf), axis=1,
                             keepdims=True)             # (PSUB, 1)
                # reshape to the lane-packed (rows, bw) block BEFORE
                # accumulating: keeps the live set at NSUB tiny blocks
                # instead of (PSUB, 1)-padded 8 MB temporaries, and the
                # concat below replaces dynamic_update_slice (which
                # Mosaic does not lower)
                blocks.append(zc.reshape(rows_per_sub, bw))
            zc_full = (blocks[0] if NSUB == 1
                       else jnp.concatenate(blocks, axis=0))  # (bh, bw)
            return ci + 1, jnp.minimum(zb2, zc_full)

        z0 = jnp.full((bh, bw), jnp.inf, jnp.float32)
        _, zb2 = jax.lax.while_loop(chunk_cond, chunk_body,
                                    (jnp.int32(0), z0))
        depth_ref[:, bl * bw:(bl + 1) * bw] = jnp.where(
            jnp.isfinite(zb2), zb2, 1.0)


def _resolve_kernel(grid: BinGrid, starts_ref, row0_ref, recs_ref,
                    depth_ref, id_ref, scratch, sem):
    bw, bh, G, K = grid.bw, grid.bh, grid.group, grid.chunk
    BX = grid.bx
    P = bw * bh
    # pixel sub-blocks bound VMEM: temps are (PSUB, K) f32
    PSUB = min(P, 1024)
    NSUB = P // PSUB
    rows_per_sub = PSUB // bw
    # every bin row must be written by exactly one sub-block: a bin
    # with P % PSUB != 0 (or bw not dividing PSUB) would silently leave
    # its last rows as uninitialized VMEM garbage
    assert P % PSUB == 0 and PSUB % bw == 0, (bw, bh, P, PSUB)
    # row0 is the GLOBAL bin row of this kernel's first grid row: 0 on a
    # single chip; band_index * rows_per_band under row-sharded SPMD
    # (resolve_row_sharded).  Offsetting gy is the whole multi-chip
    # story — b indexes the replicated global starts table and oy places
    # the band's pixels at their global screen y for the edge
    # functionals; output refs stay band-local.
    gy = pl.program_id(0) + row0_ref[0]
    gx = pl.program_id(1)

    pix = jax.lax.broadcasted_iota(jnp.int32, (PSUB, 1), 0)
    lx = (pix % bw).astype(jnp.float32)
    ly_base = (pix // bw).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    for bl in range(G):
        b = gy * BX + gx * G + bl
        start = starts_ref[b]
        end = starts_ref[b + 1]
        # chunks are K-aligned windows covering [start, end); lanes
        # outside the true range are masked (Mosaic requires aligned
        # dynamic DMA offsets).
        col0 = (start // K) * K
        ox = ((gx * G + bl) * bw).astype(jnp.float32)
        oy = (gy * bh).astype(jnp.float32)

        for sub in range(NSUB):
            px = lx + ox + 0.5
            py = ly_base + (sub * rows_per_sub) + oy + 0.5

            def chunk_cond(carry):
                ci, zb, ib, stop = carry
                return (ci < nch) & jnp.logical_not(stop)

            def chunk_body(carry):
                ci, zb, ib, _ = carry
                col = jnp.minimum(col0 + ci * K, grid.pair_cap - K)
                col = pl.multiple_of(col, K)
                dma = pltpu.make_async_copy(
                    recs_ref.at[:, pl.ds(col, K)], scratch, sem)
                dma.start()
                dma.wait()
                rec = _load_chunk(scratch[:], grid.rec_dtype)  # (16, K) f32
                gcol = lane + col                         # (1, K)
                ok = (gcol >= start) & (gcol < end)
                e0 = rec[0:1] * px + rec[1:2] * py + rec[2:3]
                e1 = rec[3:4] * px + rec[4:5] * py + rec[5:6]
                e2 = rec[6:7] * px + rec[7:8] * py + rec[8:9]
                cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & ok
                ez = e0 * rec[9:10] + e1 * rec[10:11] + e2 * rec[11:12]
                ew = e0 * rec[12:13] + e1 * rec[13:14] + e2 * rec[14:15]
                cov &= ew > 0
                z = ez / jnp.where(ew != 0, ew, 1.0)
                cov &= (z >= 0.0) & (z <= 1.0)
                z = jnp.where(cov, z, jnp.inf)
                zc = jnp.min(z, axis=1, keepdims=True)    # (PSUB, 1)
                ids = rec[15:16]                          # float id values
                win = z == zc                             # ties -> min id
                idf = jnp.min(jnp.where(win, jnp.broadcast_to(ids, (PSUB, K)),
                                        jnp.float32(2.0 ** 30)),
                              axis=1, keepdims=True)
                idc = idf.astype(jnp.int32)
                better = zc < zb
                zb = jnp.where(better, zc, zb)
                ib = jnp.where(better, idc, ib)
                # early out (records arrive near-to-far, build_pairs ZQ
                # key): every later record's conservative min z is >=
                # this chunk's min, minus one z quantum — once that
                # beats every pixel's current winner, nothing behind
                # can win.
                wmin = jnp.minimum(jnp.minimum(rec[12:13], rec[13:14]),
                                   rec[14:15])
                zv0 = rec[9:10] / jnp.where(rec[12:13] > 0, rec[12:13], 1.0)
                zv1 = rec[10:11] / jnp.where(rec[13:14] > 0, rec[13:14], 1.0)
                zv2 = rec[11:12] / jnp.where(rec[14:15] > 0, rec[14:15], 1.0)
                rec_zmin = jnp.where(
                    wmin > W_EPS,
                    jnp.clip(jnp.minimum(jnp.minimum(zv0, zv1), zv2),
                             0.0, 1.0), 0.0)             # (1, K)
                chunk_zmin = jnp.min(
                    jnp.where(ok, rec_zmin, jnp.inf))     # ()
                zworst = jnp.max(jnp.where(jnp.isfinite(zb), zb, 1.0))
                stop = (chunk_zmin - 1.0 / (ZQ - 1)) > zworst
                if not grid.early_out:
                    stop = jnp.bool_(False)
                return ci + 1, zb, ib, stop

            z0 = jnp.full((PSUB, 1), jnp.inf, jnp.float32)
            i0 = jnp.full((PSUB, 1), -1, jnp.int32)
            # zero chunks for empty bins (see _resolve_depth_kernel)
            nch = jnp.where(end > start, (end - col0 + K - 1) // K, 0)
            _, zb, ib, _ = jax.lax.while_loop(
                chunk_cond, chunk_body,
                (jnp.int32(0), z0, i0, jnp.bool_(False)))
            zb = jnp.where(jnp.isfinite(zb), zb, 1.0)
            r0 = sub * rows_per_sub
            depth_ref[r0:r0 + rows_per_sub, bl * bw:(bl + 1) * bw] = (
                zb.reshape(rows_per_sub, bw))
            id_ref[r0:r0 + rows_per_sub, bl * bw:(bl + 1) * bw] = (
                ib.reshape(rows_per_sub, bw))


def resolve(starts, recs, grid: BinGrid, interpret: bool = False,
            row0=None, depth_only: bool = False):
    """Pallas bin resolve -> (depth (H', W'), tri_id (H', W') or None),
    padded to the bin grid (caller crops to the viewport).

    `row0` (optional (1,) i32): global bin-row offset of this call's
    first bin row — used by resolve_row_sharded, where `grid` describes
    one device's band but `starts` is the global table.

    depth_only: run the id-free kernel (shadow views) — returns
    (depth, None)."""
    bw, bh, G = grid.bw, grid.bh, grid.group
    BY, BX = grid.by, grid.bx
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)

    def ospec():
        return pl.BlockSpec((bh, G * bw),
                            lambda gy, gx, starts, row0: (gy, gx),
                            memory_space=pltpu.VMEM)

    rrows, rdt = _rec_shape(grid)
    if depth_only:
        gspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BY, BX // G),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[ospec()],
            # double-buffered chunk scratch (chunk-outer loop nest)
            scratch_shapes=[pltpu.VMEM((2, rrows, grid.chunk), rdt),
                            pltpu.SemaphoreType.DMA((2,))],
        )
        depth, = pl.pallas_call(
            functools.partial(_resolve_depth_kernel, grid),
            out_shape=(jax.ShapeDtypeStruct((BY * bh, BX * bw),
                                            jnp.float32),),
            grid_spec=gspec,
            interpret=interpret,
        )(starts, row0, recs)
        return depth, None
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BY, BX // G),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ospec(), ospec()],
        scratch_shapes=[pltpu.VMEM((rrows, grid.chunk), rdt),
                        pltpu.SemaphoreType.DMA],
    )
    depth, tid = pl.pallas_call(
        functools.partial(_resolve_kernel, grid),
        out_shape=(jax.ShapeDtypeStruct((BY * bh, BX * bw), jnp.float32),
                   jax.ShapeDtypeStruct((BY * bh, BX * bw), jnp.int32)),
        grid_spec=gspec,
        interpret=interpret,
    )(starts, row0, recs)
    return depth, tid


def resolve_row_sharded(starts, recs, grid: BinGrid, mesh, axis: str,
                        interpret: bool = False,
                        depth_only: bool = False):
    """Resolve with bin ROWS split over a device mesh axis (SURVEY §2.6
    P6): each device DMAs and evaluates only its band's record chunks,
    so raster latency scales with devices instead of replicating.  The
    pair stream + starts table stay replicated — they are tiny next to
    the pixel×triangle coverage work (the resolve cost), exactly like
    the geometry "weights".  Outputs land row-band-sharded, the layout
    shade_stage pins anyway, so no resharding collective follows on the
    band boundaries.  `grid.by` must be a multiple of the axis size
    (rasterize pads the bin grid)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    assert grid.by % n == 0, (grid.by, n)
    BYs = grid.by // n
    band_grid = dataclasses.replace(grid, height=BYs * grid.bh)

    def per_shard(starts_l, recs_l):
        row0 = jnp.reshape(jax.lax.axis_index(axis) * BYs,
                           (1,)).astype(jnp.int32)
        out = resolve(starts_l, recs_l, band_grid, interpret=interpret,
                      row0=row0, depth_only=depth_only)
        return out[0] if depth_only else out

    spec = P(axis, None)
    if depth_only:
        depth = shard_map(per_shard, mesh=mesh, in_specs=(P(), P()),
                          out_specs=spec, check_vma=False)(starts, recs)
        return depth, None
    return shard_map(per_shard, mesh=mesh, in_specs=(P(), P()),
                     out_specs=(spec, spec),
                     check_vma=False)(starts, recs)


def stub_vis(vh, vw, T, keep=0.0, depth_only=False, overflow=None):
    """Fabricated visibility buffer for the attribution stubs
    (tools/bench_toggle.py): 4x4-pixel blocks of one tri_id (gather
    coherence downstream), smooth in-range depth, no misses.  `keep` is
    an epsilon term added to depth so upstream ops the stub is meant to
    keep live cannot be folded away.  NOT a rendering mode."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (vh, vw), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (vh, vw), 1)
    tid = ((yy // 4) * (vw // 4) + xx // 4) % max(T, 1)
    sdepth = (0.3 + 0.4 * xx.astype(jnp.float32) / vw
              + 0.2 * yy.astype(jnp.float32) / vh + keep)
    if overflow is None:
        overflow = jnp.int32(0)
    return VisibilityBuffer(depth=sdepth,
                            tri_id=None if depth_only else tid,
                            overflow=overflow)


def rasterize(clip, grid: BinGrid, cull: str = "front",
              interpret: bool | None = None, shard=None,
              stub: bool = False, depth_only: bool = False
              ) -> tuple[VisibilityBuffer, PlanarSetup]:
    """Full raster: clip (3 verts, 4 comps, T) planar clip positions
    (models/scene_batch.py layout) -> visibility buffer.

    shard: optional (mesh, axis_name) — resolve bin rows split over the
    mesh axis (resolve_row_sharded); setup/binning stay replicated.

    stub: attribution probe (tools/bench_toggle.py stub_resolve) — skip
    ONLY the Pallas resolve kernel; setup/binning/record-gather stay
    live (consumed through an epsilon term that cannot be folded).
    Outputs mimic the real distribution coarsely: 4x4-pixel blocks of
    one tri_id (gather coherence downstream) and a smooth in-range
    depth with no misses.  NOT a rendering mode.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    T = clip.shape[2]
    vh, vw = grid.height, grid.width
    setup = triangle_setup_planar(clip, grid.width, grid.height, cull)
    if shard is not None:
        # pad the bin grid to a shard multiple of bin rows; bboxes were
        # clamped to the true viewport above, so padded rows get no
        # pairs (their bins resolve to the 1.0/-1 clear and are cropped)
        mesh, axis = shard
        n_sh = mesh.shape[axis]
        BYp = _cdiv(grid.by, n_sh) * n_sh
        grid = dataclasses.replace(grid, height=BYp * grid.bh)
    starts, sorted_tids, overflow = build_pairs(setup, grid)
    records = build_records(setup, dtype=grid.rec_dtype)
    # effective record width: the sorted pair stream S can be shorter
    # than pair_cap for tiny scenes; the kernel DMAs chunk-aligned
    # windows, so the record array must span a chunk multiple >= any
    # start offset.
    S = sorted_tids.shape[0]
    cap = min(grid.pair_cap, _cdiv(S, grid.chunk) * grid.chunk)
    recs = records[:, jnp.minimum(sorted_tids[:min(S, cap)], T)]
    if recs.shape[1] < cap:
        recs = jnp.pad(recs, ((0, 0), (0, cap - recs.shape[1])))
    rgrid = dataclasses.replace(grid, pair_cap=cap)
    if stub:
        keep = (starts.astype(jnp.float32).sum() + recs.sum()) * 1e-30
        vis = stub_vis(vh, vw, T, keep=keep, depth_only=depth_only,
                       overflow=overflow)
        return vis, setup
    if shard is None:
        depth, tid = resolve(starts, recs, rgrid, interpret=interpret,
                             depth_only=depth_only)
    else:
        depth, tid = resolve_row_sharded(starts, recs, rgrid, mesh, axis,
                                         interpret=interpret,
                                         depth_only=depth_only)
    vis = VisibilityBuffer(depth=depth[:vh, :vw],
                           tri_id=None if tid is None else tid[:vh, :vw],
                           overflow=overflow)
    return vis, setup


rasterize_jit = jax.jit(rasterize, static_argnames=(
    "grid", "cull", "interpret", "shard", "stub", "depth_only"))
