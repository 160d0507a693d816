"""Rasterizer tests: against a naive per-pixel numpy rasterizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soc_real_time_renderer_tpu.ops import raster
from soc_real_time_renderer_tpu.utils import mathutil as mu


def naive_raster(clip, indices, width, height, cull="front"):
    """Reference rasterizer: explicit perspective divide, screen-space
    barycentric coverage, affine z interpolation.  Requires all w > 0."""
    clip = np.asarray(clip, np.float64)
    depth = np.full((height, width), np.inf)
    tri = np.full((height, width), -1, np.int32)
    for t, (i0, i1, i2) in enumerate(np.asarray(indices)):
        v = clip[[i0, i1, i2]]
        w = v[:, 3]
        assert np.all(w > 0), "naive rasterizer needs w > 0"
        sx = (v[:, 0] / w * 0.5 + 0.5) * width
        sy = (v[:, 1] / w * 0.5 + 0.5) * height
        z = v[:, 2] / w
        area = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (sx[2] - sx[0])
        if cull == "front" and area >= 0:
            continue
        if cull == "back" and area <= 0:
            continue
        if area == 0:
            continue
        x0, x1 = int(max(0, np.floor(sx.min()))), int(min(width, np.ceil(sx.max()) + 1))
        y0, y1 = int(max(0, np.floor(sy.min()))), int(min(height, np.ceil(sy.max()) + 1))
        for py in range(y0, y1):
            for px in range(x0, x1):
                p = np.array([px + 0.5, py + 0.5])
                b = np.empty(3)
                for k in range(3):
                    a, bb = (k + 1) % 3, (k + 2) % 3
                    b[k] = ((sx[bb] - sx[a]) * (p[1] - sy[a])
                            - (sy[bb] - sy[a]) * (p[0] - sx[a])) / area
                if np.all(b >= 0):
                    zp = b @ z
                    if 0 <= zp <= 1 and zp < depth[py, px]:
                        depth[py, px] = zp
                        tri[py, px] = t
    depth[~np.isfinite(depth)] = 1.0
    return depth, tri


def make_clip(verts_view, fov=90.0, aspect=1.0, near=0.1, far=100.0):
    p = mu.perspective(fov, aspect, near, far)
    v = np.asarray(verts_view, np.float32)
    return (v @ p[:, :3].T + p[:, 3]).astype(np.float32)


SMALL = raster.RasterGrid(width=64, height=64, coarse_px=32, fine_h=16,
                          fine_w=16, cap_coarse=64, cap_fine=32, chunk=8)


def test_single_triangle_matches_naive():
    # CCW (y-up view space) triangle at z=-1: visible under cull='front'.
    verts = [[0.0, 0.5, -1.0], [-0.5, -0.5, -1.0], [0.5, -0.5, -1.0]]
    clip = make_clip(verts)
    idx = np.array([[0, 1, 2]], np.int32)
    vis, _ = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx), SMALL)
    nd, nt = naive_raster(clip, idx, 64, 64)
    got_cov = np.asarray(vis.tri_id) >= 0
    assert got_cov.sum() > 100
    mismatch = (got_cov != (nt >= 0)).sum()
    assert mismatch <= 12  # edge-rule differences only
    both = got_cov & (nt >= 0)
    np.testing.assert_allclose(np.asarray(vis.depth)[both], nd[both],
                               atol=1e-4)


def test_backface_culled():
    verts = [[0.0, 0.5, -1.0], [-0.5, -0.5, -1.0], [0.5, -0.5, -1.0]]
    clip = make_clip(verts)
    idx_ccw = np.array([[0, 1, 2]], np.int32)
    idx_cw = np.array([[0, 2, 1]], np.int32)
    vis_f, _ = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx_cw), SMALL,
                                cull="front")
    assert int((np.asarray(vis_f.tri_id) >= 0).sum()) == 0
    vis_b, _ = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx_cw), SMALL,
                                cull="back")
    assert int((np.asarray(vis_b.tri_id) >= 0).sum()) > 100
    vis_n, _ = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx_ccw), SMALL,
                                cull="none")
    assert int((np.asarray(vis_n.tri_id) >= 0).sum()) > 100


def test_depth_ordering():
    # Two quads (as tris), nearer one wins.
    def quad(z, s):
        return [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]]

    verts = quad(-2.0, 1.0) + quad(-1.0, 0.3)
    clip = make_clip(verts)
    # CCW order for y-up: (0,1,2),(0,2,3)
    idx = np.array([[0, 2, 1], [0, 3, 2], [4, 6, 5], [4, 7, 6]], np.int32)
    vis, _ = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx), SMALL,
                              cull="none")
    tid = np.asarray(vis.tri_id)
    center = tid[32, 32]
    assert center in (2, 3)  # near quad in the middle
    # (20, 20) is outside the near quad (pixels ~22..42) but inside the
    # far one (pixels 16..48).
    corner = tid[20, 20]
    assert corner in (0, 1)
    nd, nt = naive_raster(clip, idx, 64, 64, cull="none")
    both = (tid >= 0) & (nt >= 0)
    np.testing.assert_allclose(np.asarray(vis.depth)[both], nd[both],
                               atol=1e-4)


def test_random_soup_matches_naive():
    rng = np.random.default_rng(0)
    n = 40
    centers = rng.uniform([-1, -1, -4], [1, 1, -2], (n, 3))
    offs = rng.uniform(-0.5, 0.5, (n, 3, 3))
    verts = (centers[:, None, :] + offs).reshape(-1, 3).astype(np.float32)
    clip = make_clip(verts)
    idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    vis, _ = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx), SMALL,
                              cull="none")
    nd, nt = naive_raster(clip, idx, 64, 64, cull="none")
    got_cov = np.asarray(vis.tri_id) >= 0
    exp_cov = nt >= 0
    assert (got_cov != exp_cov).mean() < 0.01
    both = got_cov & exp_cov
    # depth identical wherever both agree on a winner
    agree = both & (np.asarray(vis.tri_id) == nt)
    assert agree.sum() > 0.95 * both.sum()
    np.testing.assert_allclose(np.asarray(vis.depth)[agree], nd[agree],
                               atol=1e-3)


def test_near_plane_crossing_no_nans():
    # Triangle spanning from in front of the camera to behind it (the
    # no-clipping path): must produce finite depth and cover only w>0 side.
    verts = [[0.0, 0.0, -5.0], [-0.3, 0.0, 1.0], [0.3, 0.0, 1.0]]
    # shift up a touch so it crosses the screen centre horizontally
    v = np.asarray(verts) + np.array([0, 0.05, 0])
    clip = make_clip(v.tolist())
    idx = np.array([[0, 1, 2]], np.int32)
    vis, _ = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx), SMALL,
                              cull="none")
    d = np.asarray(vis.depth)
    assert np.all(np.isfinite(d))
    assert (np.asarray(vis.tri_id) >= 0).sum() > 0


def test_offscreen_and_degenerate():
    verts = [[10.0, 10.0, -1.0], [10.5, 10.0, -1.0], [10.0, 10.5, -1.0],
             [0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, -1.0]]
    clip = make_clip(verts)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    vis, setup = raster.rasterize_jit(jnp.asarray(clip), jnp.asarray(idx), SMALL,
                                  cull="none")
    assert int((np.asarray(vis.tri_id) >= 0).sum()) == 0
    assert not bool(np.asarray(setup.valid).any())


def test_jit_and_no_recompile():
    verts = [[0.0, 0.5, -1.0], [-0.5, -0.5, -1.0], [0.5, -0.5, -1.0]]
    clip = jnp.asarray(make_clip(verts))
    idx = jnp.array([[0, 1, 2]], jnp.int32)
    f = jax.jit(lambda c: raster.rasterize_jit(c, idx, SMALL)[0])
    a = f(clip)
    b = f(clip * 1.0)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth))
