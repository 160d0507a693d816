"""Boundary behavior of the windowed Pallas kernels (VERDICT r2 #8).

The production SSAO/TAA kernels deviate from the exact XLA paths
outside their VMEM windows (taps clamp / take the off-screen path).
These tests drive frames where the reference would reproject or
gather beyond the margins, pin the documented fallback semantics, and
fail if the window margins silently shrink.
"""
import jax.numpy as jnp
import numpy as np

from soc_real_time_renderer_tpu.ops import sampling, ssao as ssao_ops, \
    taa as taa_ops, taa_pallas


def _hist_vel(H, W, vy_px, seed=0):
    rng = np.random.default_rng(seed)
    packed = jnp.asarray(
        rng.random((5, H, W), dtype=np.float32)).astype(
            jnp.bfloat16).astype(jnp.float32)
    vel = jnp.zeros((2, H, W), jnp.float32).at[1].set(vy_px / H)
    return packed, vel


def test_taa_window_margin_holds():
    """16 px/frame motion stays in-window (margin is 24 rows at the
    56-row default); 32 px must trip oow.  Shrinking the window margins
    flips the first assertion."""
    H = W = 128
    packed, vel16 = _hist_vel(H, W, 16.0)
    hist, oow = taa_pallas.reproject_history_pallas(packed, vel16,
                                                    interpret=True)
    assert float(oow.max()) == 0.0, "16 px/frame must stay in-window"
    uv = sampling.grid_uv(H, W)
    exact = sampling.sample_screen(
        packed, jnp.stack([uv[0] - vel16[0], uv[1] - vel16[1]]))
    err = float(jnp.abs(hist - exact).max())
    assert err < 0.02, err  # bf16 one-hot blend vs f32 gather

    _, vel32 = _hist_vel(H, W, 32.0)
    _, oow32 = taa_pallas.reproject_history_pallas(packed, vel32,
                                                   interpret=True)
    # interior rows beyond the margin must flag out-of-window
    assert float(oow32[40:48].min()) == 1.0, \
        "32 px/frame must leave the 24-row margin"


def test_taa_fast_camera_takes_reference_offscreen_path():
    """A frame with 80 px/frame vertical motion: out-of-window pixels
    must resolve to the reference's off-screen result (accum=1 ->
    neighbors[5], zero disocclusion per the documented deviation), and
    genuinely off-screen pixels must match the XLA path exactly."""
    H = W = 128
    rng = np.random.default_rng(1)
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    depth = jnp.asarray(rng.random((H, W), dtype=np.float32))
    prev_c = jnp.asarray(rng.random((3, H, W), dtype=np.float32)).astype(
        jnp.bfloat16).astype(jnp.float32)
    prev_v = jnp.zeros((3, H, W), jnp.float32)[:2]
    # negative vy: reprojection taps 80 px DOWN the screen — on-screen
    # for the top rows (out-of-window there), off-screen past row 47
    vel = jnp.zeros((2, H, W), jnp.float32).at[1].set(-80.0 / H)
    fc = jnp.int32(30)

    out_p = taa_ops.taa(color, depth, vel, prev_c, prev_v, fc,
                        impl="pallas", interpret=True)
    out_x = taa_ops.taa(color, depth, vel, prev_c, prev_v, fc,
                        impl="xla")

    # velocity dilation picks the closest-depth neighbour's velocity;
    # with uniform velocity the dilated field is uniform, so the
    # documented out-of-window result is exactly neighbors[5]
    # (accum = 1, disocclusion zeroed)
    center = sampling.shift(color, 1, 0)
    # rows whose reprojected tap is on-screen but out-of-window: the
    # pallas path must take the off-screen semantics...
    got = np.asarray(out_p)[:, 8:40, :]
    want = np.asarray(center)[:, 8:40, :]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # ...and differ from the XLA path, which reprojects there (if these
    # were equal the test would not be exercising the boundary at all)
    assert np.abs(np.asarray(out_x)[:, 8:40, :] - want).max() > 0.05
    # bottom tiles: the screen-edge clamp lands inside the window, so
    # both impls sample the same edge texel and must agree exactly
    np.testing.assert_allclose(np.asarray(out_p)[:, 116:, :],
                               np.asarray(out_x)[:, 116:, :],
                               atol=2e-2)


def _ssao_inputs(H, W, z_plane, seed=2):
    """A flat full-screen wall at view depth z_plane facing the camera,
    with mild depth noise so occlusion terms are non-trivial."""
    from soc_real_time_renderer_tpu.camera import Camera3D, camera_matrices
    from soc_real_time_renderer_tpu.config import ShaderGlobals
    rng = np.random.default_rng(seed)
    cam = Camera3D()
    cam.resize(W, H)
    g = ShaderGlobals.create(
        camera=camera_matrices(cam, [0, 0, 0], 1, W, H))
    # depth buffer value for view z: invert the projection z row
    p = np.asarray(cam.proj_mat)
    zv = -z_plane  # view space looks down -z
    d = (p[2, 2] * zv + p[2, 3]) / (p[3, 2] * zv + p[3, 3])
    depth = jnp.full((H, W), np.float32(d)) \
        + jnp.asarray(rng.random((H, W), dtype=np.float32) - 0.5) * 1e-5
    normal = jnp.zeros((3, H, W), jnp.float32).at[2].set(1.0)
    return depth, normal, g


def test_ssao_near_wall_clamp_bounded():
    """Camera pressed against a wall: the projected hemisphere radius
    exceeds the VMEM window margins, taps clamp to the window edge.
    The post-blur image delta vs the exact path must stay bounded — if
    the margins silently shrink, the mid-distance control fails."""
    H = W = 128
    # mid-distance control: taps fit the window -> near-exact
    depth, normal, g = _ssao_inputs(H, W, z_plane=5.0)
    a = ssao_ops.ssao_blur(ssao_ops.ssao_generate_pallas(
        depth, normal, g, interpret=True))
    b = ssao_ops.ssao_blur(ssao_ops.ssao_generate(depth, normal, g))
    ctrl = float(jnp.abs(a - b).mean())
    assert ctrl < 5e-3, ctrl

    # near wall: projected radius >> window; bounded deviation only
    depth, normal, g = _ssao_inputs(H, W, z_plane=0.05)
    a = ssao_ops.ssao_blur(ssao_ops.ssao_generate_pallas(
        depth, normal, g, interpret=True))
    b = ssao_ops.ssao_blur(ssao_ops.ssao_generate(depth, normal, g))
    near = float(jnp.abs(a - b).mean())
    assert near < 0.25, near
