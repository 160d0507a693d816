"""Naive numpy rasterizer oracle shared by the raster tests.

Reference semantics (explicit perspective divide, screen-space
barycentric coverage, LESS depth test) matching the Vulkan raster state
of /root/reference/src/graphics/tasks/depth_prepass.inl:38-46.
"""
import numpy as np

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
