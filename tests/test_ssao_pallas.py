"""Parity: Pallas windowed SSAO vs the exact XLA tail (interpret mode).

The Pallas path (ops/ssao.py ssao_generate_pallas) deviates from the
XLA tail in two documented ways: occluder depth comes from the half-res
view-z table instead of full-res point samples, and out-of-window taps
clamp to the window edge.  Both must stay visually negligible after the
4x4 blur the consumer applies (ssao_blur.inl:91-105) — this test pins
that tolerance on a realistic depth field.
"""
import jax.numpy as jnp
import numpy as np

from soc_real_time_renderer_tpu import config as cfgm
from soc_real_time_renderer_tpu.camera import Camera3D, camera_matrices
from soc_real_time_renderer_tpu.ops import ssao

H, W = 128, 768  # half-res 64x384: full window (WR=64, WL=384), 8x3 grid


def _scene():
    rng = np.random.default_rng(7)
    # piecewise-constant blocks + gradient: plausible depth buffer with
    # occlusion edges, in the far-skewed range a real projection gives
    base = rng.random((8, 24)).astype(np.float32)
    d = np.kron(base, np.ones((16, 32), np.float32))
    depth = jnp.asarray(np.clip(d * 0.15 + 0.82, 0.6, 0.995))
    n = rng.normal(size=(3, H, W)).astype(np.float32)
    n[2] = np.abs(n[2]) + 1.5
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    cam = Camera3D()
    cam.resize(W, H)
    g = cfgm.ShaderGlobals.create(
        camera=camera_matrices(cam, [0, 0, 0], 1, W, H))
    return depth, jnp.asarray(n), g


def test_pallas_ssao_matches_xla_post_blur():
    depth, normal, g = _scene()
    ref = ssao.ssao_blur(ssao.ssao_generate(depth, normal, g))
    got = ssao.ssao_blur(ssao.ssao_generate_pallas(
        depth, normal, g, interpret=True))
    assert got.shape == ref.shape
    diff = np.abs(np.asarray(got) - np.asarray(ref))
    assert diff.mean() < 0.01, diff.mean()
    assert np.percentile(diff, 99) < 0.06, np.percentile(diff, 99)


def test_pallas_ssao_range_and_unoccluded_sky():
    depth, normal, g = _scene()
    out = np.asarray(ssao.ssao_generate_pallas(
        depth, normal, g, interpret=True))
    assert out.shape == (H // 2, W // 2)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)
    # a flat max-depth plane has no occluders -> occlusion ~ 1
    flat = jnp.full((H, W), 0.995, jnp.float32)
    n_up = jnp.zeros((3, H, W), jnp.float32).at[2].set(1.0)
    out_flat = np.asarray(ssao.ssao_generate_pallas(
        flat, n_up, g, interpret=True))
    assert out_flat.mean() > 0.95
