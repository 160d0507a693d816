"""Host/device matrix math for the renderer.

Conventions (documented once, used everywhere):

* Matrices are row-major ``(4, 4)`` arrays used with **column vectors**:
  ``clip = P @ V @ M @ [x, y, z, 1]^T``.  This matches the *math* of the
  reference's glm usage (glm stores column-major but composes the same
  products, see ``/root/reference/src/application.cpp:135-137``).  glm's
  ``m[c][r]`` element is our ``m[r, c]`` — e.g. the TAA jitter written to
  ``proj[3][0]/[3][1]`` in the reference (``application.cpp:130-131``)
  lands in our ``P[0, 3]/P[1, 3]``.
* Projection uses Vulkan-style **zero-to-one** clip depth with the Y flip
  the reference applies (``proj_mat[1][1] *= -1``,
  ``/root/reference/src/graphics/camera.cpp:9``).  NOTE: the reference
  misspells glm's force macro (``GLM_DEPTH_ZERO_TO_ONE``,
  ``camera.hpp:5``) so its glm actually produced [-1, 1] NDC depth that
  Vulkan then clipped to [0, w]; we implement the *intended* ZO
  convention and keep projection/reconstruction self-consistent.
* NDC y is **down** (after the Y flip), so ndc -> pixel rows need no
  extra flip.  Depth buffer is cleared to 1.0, test LESS_OR_EQUAL
  (``depth_prepass.inl:38-46``).

These helpers are dtype-polymorphic: they work on numpy or jax.numpy
arrays (host setup uses numpy; anything traced uses jnp).
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Basic constructors (host side, numpy float32)
# ---------------------------------------------------------------------------


def perspective(fov_y_deg: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Vulkan-style perspective: RH, zero-to-one depth, Y flipped.

    Equivalent to ``glm::perspective`` (RH_ZO) followed by the reference's
    ``proj_mat[1][1] *= -1`` (``camera.cpp:6-10``).
    """
    f = 1.0 / np.tan(np.radians(fov_y_deg) * 0.5)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = -f  # glm RH_ZO has +f; the reference's *=-1 flips to -f
    # (y-down NDC, matching Vulkan's y-down framebuffer rows).
    m[2, 2] = far / (near - far)
    m[2, 3] = -(far * near) / (far - near)
    m[3, 2] = -1.0
    return m


def orthographic(left: float, right: float, bottom: float, top: float,
                 near: float, far: float) -> np.ndarray:
    """``glm::ortho`` RH_ZO equivalent (used for the sun's shadow matrix,
    ``renderer.cpp:110-112``: ``glm::ortho(-16, 16, -16, 16, -16, 16)``).

    As with :func:`perspective`, the reference's glm actually ran in NO
    (depth [-1, 1]) mode due to the misspelled macro; we use ZO and keep
    shadow lookup self-consistent.
    """
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = -1.0 / (far - near)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = -near / (far - near)
    return m


def look_at(eye, center, up) -> np.ndarray:
    """``glm::lookAt`` (RH) equivalent."""
    eye = np.asarray(eye, dtype=np.float32)
    center = np.asarray(center, dtype=np.float32)
    up = np.asarray(up, dtype=np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def rotate_x(v: np.ndarray, angle_rad: float) -> np.ndarray:
    """``glm::rotateX`` equivalent (rotate vector about +X)."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    x, y, z = v
    return np.array([x, c * y - s * z, s * y + c * z], dtype=np.float32)


def rotate_y(v: np.ndarray, angle_rad: float) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    x, y, z = v
    return np.array([c * x + s * z, y, -s * x + c * z], dtype=np.float32)


def rotate_z(v: np.ndarray, angle_rad: float) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    x, y, z = v
    return np.array([c * x - s * y, s * x + c * y, z], dtype=np.float32)


def quat_to_mat3(q) -> np.ndarray:
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix.

    The reference builds entity rotations from Euler angles via
    ``glm::qua(radians(rotation))`` then ``toMat4``
    (``/root/reference/src/ecs/scene.cpp:64-67``).
    """
    w, x, y, z = (np.float32(c) for c in q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)


def euler_to_quat(euler_rad) -> np.ndarray:
    """glm's Euler -> quaternion convention (pitch=x, yaw=y, roll=z),
    matching ``glm::qua<f32>(glm::radians(rotation))``."""
    ex, ey, ez = (np.float32(a) * 0.5 for a in euler_rad)
    cx, sx = np.cos(ex), np.sin(ex)
    cy, sy = np.cos(ey), np.sin(ey)
    cz, sz = np.cos(ez), np.sin(ez)
    return np.array([
        cx * cy * cz + sx * sy * sz,
        sx * cy * cz - cx * sy * sz,
        cx * sy * cz + sx * cy * sz,
        cx * cy * sz - sx * sy * cz,
    ], dtype=np.float32)


def compose_trs(position, rotation_euler_deg, scale) -> np.ndarray:
    """TRS model matrix exactly as the reference's TransformComponent:
    ``translate(pos) * toMat4(qua(radians(rot))) * scale(s)``
    (``scene.cpp:64-67``)."""
    q = euler_to_quat(np.radians(np.asarray(rotation_euler_deg, np.float32)))
    r = quat_to_mat3(q)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r * np.asarray(scale, np.float32)[None, :]
    m[:3, 3] = np.asarray(position, np.float32)
    return m


def normal_matrix(model: np.ndarray) -> np.ndarray:
    """``transpose(inverse(model))`` as a 4x4 (``scene.cpp:69``)."""
    return np.linalg.inv(model).T.astype(model.dtype)


# ---------------------------------------------------------------------------
# dtype-polymorphic helpers (work under jit)
# ---------------------------------------------------------------------------


def transform_points(mat, pts):
    """Apply a 4x4 to (..., 3) points (w=1). Returns (..., 4)."""
    return pts @ mat[:3, :3].T + mat[:3, 3] if mat.shape == (3, 4) else _tp4(mat, pts)


def _tp4(mat, pts):
    xyz = pts @ mat[:3, :3].T + mat[:3, 3]
    w = pts @ mat[3, :3].T + mat[3, 3]
    import jax.numpy as jnp
    xp = jnp if not isinstance(xyz, np.ndarray) else np
    return xp.concatenate([xyz, w[..., None]], axis=-1)


def transform_dirs(mat, dirs):
    """Apply the upper-left 3x3 to (..., 3) directions."""
    return dirs @ mat[:3, :3].T
