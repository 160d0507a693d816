"""Rasterizer v2 (sort-binned + Pallas resolve) tests, interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soc_real_time_renderer_tpu.ops import raster2
from test_raster import make_clip, naive_raster

GRID = raster2.BinGrid(width=64, height=64, bin_size=32, group=2, chunk=128,
                       pair_cap=2048, med_cap=128, med_slots=16)


def rasterize(clip, n, cull="none"):
    # planar (3 verts, 4 comps, T) layout
    tri_clip = jnp.asarray(clip.reshape(n, 3, 4).transpose(1, 2, 0))
    return raster2.rasterize_jit(tri_clip, GRID, cull, True)


def test_soup_matches_naive():
    rng = np.random.default_rng(0)
    n = 40
    centers = rng.uniform([-1, -1, -4], [1, 1, -2], (n, 3))
    offs = rng.uniform(-0.5, 0.5, (n, 3, 3))
    verts = (centers[:, None, :] + offs).reshape(-1, 3).astype(np.float32)
    clip = make_clip(verts)
    vis, _ = rasterize(clip, n)
    idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    nd, nt = naive_raster(clip, idx, 64, 64, cull="none")
    got = np.asarray(vis.tri_id) >= 0
    exp = nt >= 0
    assert (got != exp).mean() < 0.01
    agree = got & exp & (np.asarray(vis.tri_id) == nt)
    assert agree.sum() >= 0.95 * (got & exp).sum()
    np.testing.assert_allclose(np.asarray(vis.depth)[agree], nd[agree],
                               atol=1e-3)


def test_single_triangle_and_culling():
    verts = [[0.0, 0.5, -1.0], [-0.5, -0.5, -1.0], [0.5, -0.5, -1.0]]
    clip = make_clip(verts)
    vis_f, _ = rasterize(clip, 1, cull="front")
    assert (np.asarray(vis_f.tri_id) >= 0).sum() > 100
    clip_cw = make_clip([verts[0], verts[2], verts[1]])
    vis_c, _ = rasterize(clip_cw, 1, cull="front")
    assert (np.asarray(vis_c.tri_id) >= 0).sum() == 0


def test_medium_triangle_path():
    # a triangle spanning most of the screen exercises the med expansion
    verts = [[0.0, 3.0, -1.0], [-3.0, -3.0, -1.0], [3.0, -3.0, -1.0]]
    clip = make_clip(verts)
    vis, setup = rasterize(clip, 1, cull="none")
    cov = (np.asarray(vis.tri_id) >= 0).mean()
    assert cov > 0.5
    idx = np.array([[0, 1, 2]], np.int32)
    nd, nt = naive_raster(clip, idx, 64, 64, cull="none")
    got = np.asarray(vis.tri_id) >= 0
    assert (got != (nt >= 0)).mean() < 0.02


def test_near_plane_crossing():
    verts = np.asarray([[0.0, 0.05, -5.0], [-0.3, 0.05, 1.0],
                        [0.3, 0.05, 1.0]], np.float32)
    clip = make_clip(verts.tolist())
    vis, _ = rasterize(clip, 1, cull="none")
    d = np.asarray(vis.depth)
    assert np.all(np.isfinite(d))
    assert (np.asarray(vis.tri_id) >= 0).sum() > 0


def test_empty_scene():
    verts = [[10.0, 10.0, -1.0], [10.5, 10.0, -1.0], [10.0, 10.5, -1.0]]
    clip = make_clip(verts)
    vis, _ = rasterize(clip, 1, cull="none")
    assert (np.asarray(vis.tri_id) >= 0).sum() == 0
    np.testing.assert_allclose(np.asarray(vis.depth), 1.0)
