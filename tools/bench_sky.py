#!/usr/bin/env python
"""A/B microbench: procedural XLA sky LUT vs the Pallas real-noise
kernel (256x128 LUT, the production size).  Timing per PERF.md:
device-side scan with carry perturbation + float() readback."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from soc_real_time_renderer_tpu import config as cfgm
from soc_real_time_renderer_tpu.camera import Camera3D, camera_matrices
from soc_real_time_renderer_tpu.models.texture import decode_image
from soc_real_time_renderer_tpu.ops import clouds, sky_pallas

REPS = int(os.environ.get("REPS", "16"))


def timed(fn, x0):
    def body(c, _):
        out = fn(x0 + c * 1e-30)
        return c + out.sum() * 1e-30, out.sum()
    runj = jax.jit(lambda a: jax.lax.scan(
        body, jnp.float32(0.0), None, length=REPS)[1])
    float(runj(jnp.float32(0)).sum())
    t0 = time.perf_counter()
    float(runj(jnp.float32(0)).sum())
    return (time.perf_counter() - t0 - 0.027) * 1e3 / REPS


def main():
    cam = Camera3D()
    cam.resize(1920, 1088)
    g = cfgm.ShaderGlobals.create(
        camera=camera_matrices(cam, [0, 2, 0], 1, 1920, 1088),
        elapsed_time=jnp.float32(5.0))
    noise_path = os.path.join(
        os.environ.get("SOC_ASSETS", "/root/reference/assets"),
        "Clouds/noise.png")
    img = decode_image(open(noise_path, "rb").read())
    noise = jnp.asarray(img[..., 0].astype(np.float32) / 255.0)

    import dataclasses
    t_proc = timed(lambda dt: clouds.render_sky_lut(
        dataclasses.replace(g, elapsed_time=g.elapsed_time + dt)),
        jnp.float32(0))
    print(f"procedural XLA LUT  {t_proc:8.2f} ms")
    t_pal = timed(lambda dt: sky_pallas.render_sky_lut_pallas(
        dataclasses.replace(g, elapsed_time=g.elapsed_time + dt), noise),
        jnp.float32(0))
    print(f"pallas noise.png    {t_pal:8.2f} ms")


if __name__ == "__main__":
    main()
