"""Texture/image sampling ops (the sampler-object replacement).

The reference binds Vulkan samplers per texture (linear+aniso16 repeat
for materials, ``texture.cpp:100-117``; linear clamp for screen passes;
a comparison sampler for shadows, ``renderer.cpp:54-69``).  Here each
sampler becomes a pure gather-based function:

* :func:`sample_atlas_trilinear` — bilinear + mip lerp from the packed
  scene atlas (:class:`..models.texture.TextureAtlas`), repeat
  addressing.  Anisotropy is approximated by trilinear (documented
  deviation; SURVEY.md §7 hard part (b)).
* :func:`sample_screen` — bilinear/nearest from planar (C, H, W) images
  with clamp-to-edge, uv in [0, 1]: the full-screen-pass sampler.
* :func:`sample_shadow_cmp` — 2x2 bilinear-of-comparisons with LESS op
  and opaque-white border, matching the shadow comparison sampler
  (``renderer.cpp:54-69``: linear filter, CLAMP_TO_BORDER white,
  compare LESS).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_rgba(flat, idx):
    """flat: (N, 4); idx: (...,) int32 -> (..., 4) float32."""
    return flat[idx].astype(jnp.float32)


def make_atlas_sampler(size: int, level_offsets: tuple, layer_stride: int):
    """Returns fn(flat, layer, uv, lod) -> (..., 4) linear-space RGBA.

    size/level_offsets/layer_stride are static (baked into the jitted
    graph); flat is the device-resident (N, 4) texel array.
    """
    n_levels = len(level_offsets)
    offsets_t = jnp.array(level_offsets, jnp.int32)
    sizes_t = jnp.array([size >> k for k in range(n_levels)], jnp.int32)

    def bilinear(flat, base, s, uv):
        """One level: base (...,) flat start of the level; s (...,) level
        size; uv (..., 2) in [0,1) repeat space."""
        x = uv[..., 0] * s.astype(jnp.float32) - 0.5
        y = uv[..., 1] * s.astype(jnp.float32) - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        xw0 = jnp.remainder(x0i, s)
        xw1 = jnp.remainder(x0i + 1, s)
        yw0 = jnp.remainder(y0i, s)
        yw1 = jnp.remainder(y0i + 1, s)
        i00 = base + yw0 * s + xw0
        i10 = base + yw0 * s + xw1
        i01 = base + yw1 * s + xw0
        i11 = base + yw1 * s + xw1
        c00 = _gather_rgba(flat, i00)
        c10 = _gather_rgba(flat, i10)
        c01 = _gather_rgba(flat, i01)
        c11 = _gather_rgba(flat, i11)
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    def sample(flat, layer, uv, lod):
        uv = uv - jnp.floor(uv)          # repeat addressing
        lod = jnp.clip(lod, 0.0, float(n_levels - 1))
        l0 = jnp.floor(lod).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, n_levels - 1)
        f = (lod - l0.astype(jnp.float32))[..., None]
        lay = layer.astype(jnp.int32) * layer_stride
        c0 = bilinear(flat, lay + offsets_t[l0], sizes_t[l0], uv)
        c1 = bilinear(flat, lay + offsets_t[l1], sizes_t[l1], uv)
        return c0 * (1 - f) + c1 * f

    return sample


def sample_screen(img, uv, method: str = "linear"):
    """Sample planar image at uv in [0,1] with clamp-to-edge.

    img: (C, H, W) or (H, W); uv: (..., 2).  Returns (..., C) / (...,).
    Matches a Vulkan linear-clamp sampler on a full-res target.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    C, H, W = img.shape
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    if method == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        out = img[:, yi, xi]
        out = jnp.moveaxis(out, 0, -1)
    else:
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        c00 = img[:, y0i, x0i]
        c10 = img[:, y0i, x1i]
        c01 = img[:, y1i, x0i]
        c11 = img[:, y1i, x1i]
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        out = jnp.moveaxis(top * (1 - fy) + bot * fy, 0, -1)
    if squeeze:
        out = out[..., 0]
    return out


def sample_shadow_cmp(shadow, uv, ref, border: float = 1.0):
    """Comparison-sampler shadow fetch (renderer.cpp:54-69).

    shadow: (S, S) depth map; uv: (..., 2); ref: (...,) reference depth.
    Returns (...,) in [0,1]: bilinear blend of per-texel (ref < depth)
    tests, out-of-range texels reading the opaque-white border (compare
    against `border` depth -> lit).
    """
    S = shadow.shape[-1]
    x = uv[..., 0] * S - 0.5
    y = uv[..., 1] * S - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def fetch(xi, yi):
        inside = (xi >= 0) & (xi < S) & (yi >= 0) & (yi < S)
        xs = jnp.clip(xi, 0, S - 1)
        ys = jnp.clip(yi, 0, S - 1)
        d = shadow[ys, xs]
        d = jnp.where(inside, d, border)
        return (ref < d).astype(jnp.float32)

    t00 = fetch(x0i, y0i)
    t10 = fetch(x0i + 1, y0i)
    t01 = fetch(x0i, y0i + 1)
    t11 = fetch(x0i + 1, y0i + 1)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy
