"""Parity: Pallas windowed TAA history reprojection vs the exact XLA
bilinear gather (interpret mode), and the out-of-window contract."""
import jax.numpy as jnp
import numpy as np

from soc_real_time_renderer_tpu.ops import sampling, taa, taa_pallas

H, W = 64, 512


def _data(vel_scale):
    rng = np.random.default_rng(5)
    hist = jnp.asarray(rng.random((5, H, W), dtype=np.float32))
    vel = jnp.asarray(
        (rng.random((2, H, W), dtype=np.float32) - 0.5) * vel_scale)
    return hist, vel


def test_small_velocity_matches_xla():
    hist, vel = _data(4.0 / W)  # up to ~2 px of motion
    uv = sampling.grid_uv(H, W)
    ref = sampling.sample_screen(hist.astype(jnp.bfloat16),
                                 jnp.stack([uv[0] - vel[0],
                                            uv[1] - vel[1]]))
    got, oow = taa_pallas.reproject_history_pallas(hist, vel,
                                                   interpret=True)
    assert float(oow.sum()) == 0.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2)  # bf16 table + bf16 weights


def test_large_velocity_flags_out_of_window():
    hist, _ = _data(0.0)
    vel = jnp.zeros((2, H, W), jnp.float32).at[0].set(0.9)  # ~230 px
    got, oow = taa_pallas.reproject_history_pallas(hist, vel,
                                                   interpret=True)
    # interior pixels reproject far outside any window margin
    assert float(np.asarray(oow)[:, W // 2:].mean()) > 0.9


def test_taa_pallas_path_matches_xla_when_still():
    """Zero velocity + in-range history: both impls equal (the whole
    TAA blend, not just the fetch)."""
    rng = np.random.default_rng(9)
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    depth = jnp.asarray(rng.random((H, W), dtype=np.float32))
    vel = jnp.zeros((2, H, W), jnp.float32)
    pc = jnp.asarray(rng.random((3, H, W), dtype=np.float32)
                     ).astype(jnp.bfloat16)
    pv = jnp.zeros((2, H, W), jnp.bfloat16)
    fc = jnp.int32(10)
    a = taa.taa(color, depth, vel, pc, pv, fc, impl="xla")
    b = taa.taa(color, depth, vel, pc, pv, fc, impl="pallas",
                interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
