"""TPU-native triangle rasterizer (visibility-buffer style).

Replaces the reference's hardware raster passes — depth prepass
(``/root/reference/src/graphics/tasks/depth_prepass.inl``), sun shadow
draw (``sun_shadow_draw.inl``) and G-buffer generation
(``g_buffer_generation.inl``) — with one batched, tiled kernel designed
for XLA/TPU:

* **Homogeneous rasterization** (Olano-Greer style): coverage and depth
  are evaluated from the adjugate of the 3x3 screen-homogeneous vertex
  matrix, so triangles crossing the near plane need **no clipping** and
  all control flow is static.
* **Two-level binning without atomics or sorts**: triangle -> coarse
  tile lists and coarse -> fine tile lists are built by boolean masks +
  ``cumsum`` ranks + ``searchsorted`` compaction (deterministic, pure
  data flow — the TaskGraph/atomic-free analog of a GPU binner).
* **Visibility buffer output**: per pixel ``(depth, triangle_id)`` only.
  Attribute interpolation happens in a deferred pass
  (:mod:`..ops.gbuffer`) by gathering the winning triangle's setup data
  — this keeps the hot per-tile loop tiny (5 linear functionals per
  triangle) and MXU/VPU friendly.

Face culling matches the reference's conventions: geometry passes cull
FRONT faces (``g_buffer_generation.inl:59``), the shadow pass culls BACK
(``sun_shadow_draw.inl``); Vulkan front-face is CCW in y-down
framebuffer coordinates, which maps here to the sign of the setup
determinant.

Depth convention: zero-to-one, cleared to 1.0, LESS_OR_EQUAL test
(``depth_prepass.inl:38-46``).
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(jnp.inf)
W_EPS = 1e-6


def _pytree(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in dataclasses.fields(cls)],
        meta_fields=[])
    return cls


@_pytree
@dataclass(frozen=True)
class TriangleSetup:
    """Per-triangle rasterization data (all (T, ...))."""
    coeffs: jax.Array   # (T, 3, 3) adjugate rows: e_i(p) = coeffs[i] · (px,
    #                      py, 1), pre-multiplied by the facing sign so
    #                      coverage is simply all e_i >= 0.  e_i are
    #                      proportional to perspective-correct barycentrics.
    #                      NOTE: z/w must NOT be folded into these rows —
    #                      doing the weighted sum in setup cancels
    #                      catastrophically in f32; resolve computes
    #                      z = (e·zs) / (e·ws) per pixel instead.
    zs: jax.Array       # (T, 3) per-vertex z_clip (unscaled: z/w ratios and
    #                      the sign of e·w are invariant to the facing sign)
    ws: jax.Array       # (T, 3) per-vertex w_clip (unscaled)
    bbox: jax.Array     # (T, 4) float32: x0, y0, x1, y1 in pixels (inclusive
    #                      min, exclusive max), clamped to the viewport.
    valid: jax.Array    # (T,) bool — passes cull/degenerate/offscreen tests.


@_pytree
@dataclass(frozen=True)
class VisibilityBuffer:
    depth: jax.Array    # (H, W) float32 in [0, 1]; 1.0 where no hit
    tri_id: jax.Array   # (H, W) int32 triangle index; -1 where no hit


@dataclass(frozen=True)
class RasterGrid:
    """Static tiling configuration for one render-target size."""
    width: int
    height: int
    coarse_px: int = 128        # coarse bin size in pixels (square)
    fine_h: int = 32
    fine_w: int = 32
    cap_coarse: int = 8192      # max triangles binned per coarse tile
    cap_fine: int = 1024        # max triangles per fine tile
    chunk: int = 128            # triangles per resolve inner step

    def __post_init__(self):
        assert self.coarse_px % self.fine_h == 0
        assert self.coarse_px % self.fine_w == 0

    @property
    def n_cx(self):
        return -(-self.width // self.coarse_px)

    @property
    def n_cy(self):
        return -(-self.height // self.coarse_px)

    @property
    def fines_per_coarse(self):
        return (self.coarse_px // self.fine_h) * (self.coarse_px // self.fine_w)


# ---------------------------------------------------------------------------
# Vertex transform + triangle setup
# ---------------------------------------------------------------------------


def transform_vertices(positions, model_mats, vertex_transform, view_proj):
    """World + clip transform for a mesh batch.

    positions: (V, 3); model_mats: (E, 4, 4); vertex_transform: (V,) int32
    entity index per vertex; view_proj: (4, 4).
    Returns (world (V, 3), clip (V, 4)).
    """
    mats = model_mats[vertex_transform]                # (V, 4, 4)
    world = jnp.einsum("vij,vj->vi", mats[:, :3, :3], positions) + mats[:, :3, 3]
    clip = world @ view_proj[:, :3].T + view_proj[:, 3]
    return world, clip


def _adjugate3(m):
    """Adjugate of (..., 3, 3): adj @ m = det(m) * I."""
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]
    d = m[..., 1, 0]; e = m[..., 1, 1]; f = m[..., 1, 2]
    g = m[..., 2, 0]; h = m[..., 2, 1]; i = m[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1)
    row1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1)
    row2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1)
    return jnp.stack([row0, row1, row2], -2)


def triangle_setup(clip, indices, width, height, cull: str = "front"
                   ) -> TriangleSetup:
    """Build per-triangle edge/depth functionals from clip coordinates.

    clip: (V, 4) camera clip-space positions; indices: (T, 3) int32 —
    OR clip already expanded to (T, 3, 4) with indices=None (the
    gather-free load-time-expanded layout, see PERF.md).
    cull: 'front' keeps faces the reference's FRONT_BIT culling keeps
    (i.e. glTF-visible faces), 'back' the opposite, 'none' keeps both.
    """
    v = clip if indices is None else clip[indices]     # (T, 3, 4)
    w = v[..., 3]                                      # (T, 3)
    # Screen-homogeneous coords: at w>0, X/W = pixel x.
    X = (v[..., 0] * 0.5 + 0.5 * w) * width
    Y = (v[..., 1] * 0.5 + 0.5 * w) * height
    m = jnp.stack([X, Y, w], axis=-2)                  # (T, 3rows, 3verts)
    det = (m[:, 0, 0] * (m[:, 1, 1] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 1])
           - m[:, 0, 1] * (m[:, 1, 0] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 0])
           + m[:, 0, 2] * (m[:, 1, 0] * m[:, 2, 1] - m[:, 1, 1] * m[:, 2, 0]))
    adj = _adjugate3(m)                                # (T, 3, 3)
    # e(p) = adj @ p ∝ perspective-correct barycentrics * sign(det).
    z = v[..., 2]

    # Facing: glTF CCW front faces project (y-down screen) to det < 0;
    # Vulkan FRONT culling with the reference's state keeps them.
    if cull == "front":
        keep = det < 0
        s = jnp.where(keep, -1.0, 0.0)
    elif cull == "back":
        keep = det > 0
        s = jnp.where(keep, 1.0, 0.0)
    else:
        keep = det != 0
        s = jnp.sign(det)
    coeffs = adj * s[:, None, None]

    # Bounding box. Safe only when every w is comfortably positive;
    # near-plane-crossing triangles get a conservative full-screen box.
    w_ok = jnp.all(w > W_EPS, axis=-1)
    px = X / jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    py = Y / jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    x0 = jnp.where(w_ok, jnp.min(px, -1), 0.0)
    x1 = jnp.where(w_ok, jnp.max(px, -1), jnp.float32(width))
    y0 = jnp.where(w_ok, jnp.min(py, -1), 0.0)
    y1 = jnp.where(w_ok, jnp.max(py, -1), jnp.float32(height))
    x0 = jnp.clip(jnp.floor(x0), 0, width)
    y0 = jnp.clip(jnp.floor(y0), 0, height)
    x1 = jnp.clip(jnp.ceil(x1) + 1.0, 0, width)
    y1 = jnp.clip(jnp.ceil(y1) + 1.0, 0, height)
    bbox = jnp.stack([x0, y0, x1, y1], -1)

    nonempty = (x1 > x0) & (y1 > y0)
    # Depth cull when fully in front of near / behind far plane (only
    # trustworthy with all w > 0).
    zndc = z / jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    z_ok = jnp.where(w_ok,
                     jnp.logical_not(jnp.all(zndc < 0.0, -1)
                                     | jnp.all(zndc > 1.0, -1)),
                     True)
    valid = keep & nonempty & z_ok & (det != 0)
    return TriangleSetup(coeffs=coeffs, zs=z, ws=w, bbox=bbox, valid=valid)


# ---------------------------------------------------------------------------
# Binning: mask -> cumsum ranks -> searchsorted compaction
# ---------------------------------------------------------------------------


def _compact(mask, cap):
    """Indices of True entries of mask (N,), padded to cap with -1.

    Deterministic, order-preserving stream compaction from a monotonic
    rank array — the XLA-friendly replacement for the atomic-append
    binning a GPU would do.
    Returns (ids (cap,) int32, count () int32).
    """
    ranks = jnp.cumsum(mask.astype(jnp.int32))
    count = ranks[-1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    ids = jnp.searchsorted(ranks, targets, side="left").astype(jnp.int32)
    ids = jnp.where(targets <= count, ids, -1)
    return ids, jnp.minimum(count, cap)


def _overlaps(bbox, x0, y0, x1, y1):
    """bbox (..., 4) vs rect; True if intersecting."""
    return ((bbox[..., 0] < x1) & (bbox[..., 2] > x0)
            & (bbox[..., 1] < y1) & (bbox[..., 3] > y0))


def bin_coarse(setup: TriangleSetup, grid: RasterGrid):
    """Bin all triangles into coarse tiles.

    Returns ids (C, cap_coarse) int32 global tri ids (-1 pad),
    counts (C,) int32, with C = n_cy * n_cx, row-major.
    """
    ncx, ncy, cp = grid.n_cx, grid.n_cy, grid.coarse_px
    cxs = jnp.arange(ncx, dtype=jnp.float32) * cp
    cys = jnp.arange(ncy, dtype=jnp.float32) * cp
    ox = jnp.tile(cxs, ncy)          # (C,)
    oy = jnp.repeat(cys, ncx)

    bbox, valid = setup.bbox, setup.valid

    def per_tile(o):
        tx, ty = o
        mask = _overlaps(bbox, tx, ty, tx + cp, ty + cp) & valid
        return _compact(mask, grid.cap_coarse)

    ids, counts = jax.lax.map(per_tile, (ox, oy), batch_size=8)
    return ids, counts


def bin_fine(setup: TriangleSetup, coarse_ids, grid: RasterGrid):
    """Refine coarse lists into fine-tile lists.

    Returns ids (C, FPC, cap_fine) int32 global ids (-1 pad) and counts
    (C, FPC), FPC = fines per coarse, row-major (fy, fx) within tile.
    """
    cp = grid.coarse_px
    nfx = cp // grid.fine_w
    nfy = cp // grid.fine_h
    ncx = grid.n_cx
    fx = jnp.tile(jnp.arange(nfx, dtype=jnp.float32) * grid.fine_w, nfy)
    fy = jnp.repeat(jnp.arange(nfy, dtype=jnp.float32) * grid.fine_h, nfx)

    bbox = setup.bbox

    def per_coarse(args):
        ids_c, c_idx = args                          # (cap_coarse,), ()
        cy = (c_idx // ncx).astype(jnp.float32) * cp
        cx = (c_idx % ncx).astype(jnp.float32) * cp
        present = ids_c >= 0
        bb = bbox[jnp.maximum(ids_c, 0)]             # (cap_coarse, 4)

        def per_fine(f):
            ox, oy = cx + f[0], cy + f[1]
            mask = _overlaps(bb, ox, oy, ox + grid.fine_w, oy + grid.fine_h)
            mask &= present
            slot, count = _compact(mask, grid.cap_fine)
            gids = jnp.where(slot >= 0, ids_c[jnp.maximum(slot, 0)], -1)
            return gids, count

        return jax.vmap(per_fine)((fx, fy))

    c_indices = jnp.arange(coarse_ids.shape[0], dtype=jnp.int32)
    ids, counts = jax.lax.map(per_coarse, (coarse_ids, c_indices),
                              batch_size=4)
    return ids, counts


# ---------------------------------------------------------------------------
# Per-tile depth resolve
# ---------------------------------------------------------------------------


def _resolve_tile(setup: TriangleSetup, ids, count, origin_xy, th, tw, chunk):
    """Depth-resolve one fine tile.

    ids: (cap_fine,) global tri ids (-1 padded); origin_xy: (2,) float;
    returns (depth (th*tw), tri (th*tw) int32).
    """
    cap = ids.shape[0]
    px = (jnp.arange(tw, dtype=jnp.float32) + 0.5)[None, :] + origin_xy[0]
    py = (jnp.arange(th, dtype=jnp.float32) + 0.5)[:, None] + origin_xy[1]
    p = jnp.stack([jnp.broadcast_to(px, (th, tw)).reshape(-1),
                   jnp.broadcast_to(py, (th, tw)).reshape(-1),
                   jnp.ones(th * tw, jnp.float32)], axis=-1)  # (P, 3)

    nchunks = cap // chunk

    def body(i, carry):
        zbest, ibest = carry
        cid = jax.lax.dynamic_slice_in_dim(ids, i * chunk, chunk)    # (K,)
        ok = cid >= 0
        safe = jnp.maximum(cid, 0)
        c = setup.coeffs[safe]                                       # (K,3,3)
        zv = setup.zs[safe]                                          # (K,3)
        wv = setup.ws[safe]                                          # (K,3)
        e = jnp.einsum("pc,krc->pkr", p, c)                          # (P,K,3)
        cov = (e[..., 0] >= 0) & (e[..., 1] >= 0) & (e[..., 2] >= 0)
        cov &= ok[None, :]
        ew = jnp.einsum("pkv,kv->pk", e, wv)   # ∝ interpolated w
        ez = jnp.einsum("pkv,kv->pk", e, zv)
        cov &= ew > 0                          # behind-eye cut
        z = ez / jnp.where(ew != 0, ew, 1.0)
        cov &= (z >= 0.0) & (z <= 1.0)
        z = jnp.where(cov, z, INF)
        k = jnp.argmin(z, axis=-1)                                   # (P,)
        zc = jnp.take_along_axis(z, k[:, None], axis=-1)[:, 0]
        ic = cid[k]
        better = zc < zbest
        return (jnp.where(better, zc, zbest),
                jnp.where(better, ic, ibest))

    z0 = jnp.full((th * tw,), INF, jnp.float32)
    i0 = jnp.full((th * tw,), -1, jnp.int32)
    # Only loop over chunks that can contain triangles.
    needed = jnp.minimum((count + chunk - 1) // chunk, nchunks)
    zb, ib = jax.lax.fori_loop(0, needed, body, (z0, i0))
    return zb, ib


def resolve(setup: TriangleSetup, fine_ids, fine_counts, grid: RasterGrid
            ) -> VisibilityBuffer:
    """Run the per-tile resolve for every fine tile and assemble the
    full-resolution visibility buffer."""
    cp, th, tw = grid.coarse_px, grid.fine_h, grid.fine_w
    ncx, ncy = grid.n_cx, grid.n_cy
    nfx, nfy = cp // tw, cp // th
    C, FPC = fine_ids.shape[0], fine_ids.shape[1]

    ids_flat = fine_ids.reshape(C * FPC, grid.cap_fine)
    counts_flat = fine_counts.reshape(C * FPC)
    f = jnp.arange(C * FPC, dtype=jnp.int32)
    c_idx, l_idx = f // FPC, f % FPC
    ox = ((c_idx % ncx) * cp + (l_idx % nfx) * tw).astype(jnp.float32)
    oy = ((c_idx // ncx) * cp + (l_idx // nfx) * th).astype(jnp.float32)
    origins = jnp.stack([ox, oy], -1)

    def per_tile(args):
        ids, count, origin = args
        return _resolve_tile(setup, ids, count, origin, th, tw, grid.chunk)

    depth_t, tri_t = jax.lax.map(per_tile, (ids_flat, counts_flat, origins),
                                 batch_size=8)

    # (C*FPC, P) -> (ncy, ncx, nfy, nfx, th, tw) -> (H', W')
    def assemble(x):
        x = x.reshape(ncy, ncx, nfy, nfx, th, tw)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        return x.reshape(ncy * cp, ncx * cp)[:grid.height, :grid.width]

    depth = assemble(depth_t)
    tri = assemble(tri_t)
    depth = jnp.where(jnp.isfinite(depth), depth, 1.0)
    return VisibilityBuffer(depth=depth, tri_id=tri)


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


def rasterize(clip, indices, grid: RasterGrid, cull: str = "front"
              ) -> tuple[VisibilityBuffer, TriangleSetup]:
    """Full raster pipeline: setup -> coarse bin -> fine bin -> resolve.

    clip: (V, 4) clip positions; indices: (T, 3) int32.
    Returns the visibility buffer plus the triangle setup (reused by the
    deferred attribute pass).
    """
    setup = triangle_setup(clip, indices, grid.width, grid.height, cull)
    coarse_ids, _ = bin_coarse(setup, grid)
    fine_ids, fine_counts = bin_fine(setup, coarse_ids, grid)
    vis = resolve(setup, fine_ids, fine_counts, grid)
    return vis, setup


def grid_for(width, height, coarse_px=128, fine=32, cap_coarse=8192,
             cap_fine=1024, chunk=128) -> RasterGrid:
    return RasterGrid(width=width, height=height, coarse_px=coarse_px,
                      fine_h=fine, fine_w=fine, cap_coarse=cap_coarse,
                      cap_fine=cap_fine, chunk=chunk)


rasterize_jit = jax.jit(rasterize, static_argnames=("grid", "cull"))
