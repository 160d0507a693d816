"""Parity: Pallas sky-LUT kernel (VMEM noise, MXU bilinear taps) vs the
exact XLA march with the same noise texture (interpret mode, small LUT).

The kernel's only numeric deviations are bf16 noise values/weights in
the MXU taps; everything else (atmosphere 16x8, cloud march 24x10,
fBm octaves, phase/powder/integral) is the same f32 math.
"""
import numpy as np
import pytest

from soc_real_time_renderer_tpu import config as cfgm
from soc_real_time_renderer_tpu.camera import Camera3D, camera_matrices
from soc_real_time_renderer_tpu.ops import clouds, sky_pallas

LUT_W, LUT_H = 128, 16


@pytest.fixture(scope="module")
def g():
    cam = Camera3D()
    cam.resize(256, 128)
    import jax.numpy as jnp
    return cfgm.ShaderGlobals.create(
        camera=camera_matrices(cam, [0.0, 2.0, 0.0], 1, 256, 128),
        elapsed_time=jnp.float32(3.0))


@pytest.fixture(scope="module")
def noise():
    rng = np.random.default_rng(11)
    # smooth-ish tiled field, the shape class of assets/Clouds/noise.png
    base = rng.random((16, 16)).astype(np.float32)
    up = np.kron(base, np.ones((4, 4), np.float32))
    k = np.ones((3, 3), np.float32) / 9.0
    sm = up.copy()
    for _ in range(2):
        padded = np.pad(sm, 1, mode="wrap")
        sm = sum(padded[dy:dy + 64, dx:dx + 64] * k[dy, dx]
                 for dy in range(3) for dx in range(3))
    return sm.astype(np.float32)


def test_sky_pallas_matches_exact_lut(g, noise):
    import jax.numpy as jnp
    ref = np.asarray(clouds.render_sky_lut(
        g, lut_w=LUT_W, lut_h=LUT_H, noise_tex=jnp.asarray(noise)))
    got = np.asarray(sky_pallas.render_sky_lut_pallas(
        g, jnp.asarray(noise), lut_w=LUT_W, lut_h=LUT_H, interpret=True))
    assert got.shape == ref.shape == (3, LUT_H, LUT_W)
    assert np.isfinite(got).all()
    diff = np.abs(got - ref)
    scale = max(np.abs(ref).max(), 1e-3)
    assert diff.max() / scale < 0.03, (diff.max(), scale)
    assert diff.mean() / scale < 0.005, (diff.mean(), scale)


def test_sky_pallas_procedural_agreement(g, noise):
    """Sanity: with the real-noise kernel, sky stays in a plausible
    radiance range and the below-horizon half equals pure atmosphere."""
    import jax.numpy as jnp
    got = np.asarray(sky_pallas.render_sky_lut_pallas(
        g, jnp.asarray(noise), lut_w=LUT_W, lut_h=LUT_H, interpret=True))
    assert (got >= 0.0).all()
    # below-horizon rows (elevation < 0) must be cloud-free atmosphere:
    # monotone-ish small values, no NaN/garbage
    assert np.isfinite(got[:, :LUT_H // 2]).all()
