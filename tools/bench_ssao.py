#!/usr/bin/env python
"""A/B microbench: XLA vs Pallas SSAO tails at full-config resolution.

Timing methodology per PERF.md: device-side lax.scan with carry-
perturbed inputs (defeats LICM), completion forced by a float()
readback, ~27 ms dispatch floor amortized over the scan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from soc_real_time_renderer_tpu import config as cfgm
from soc_real_time_renderer_tpu.camera import Camera3D, camera_matrices
from soc_real_time_renderer_tpu.ops import ssao

H = int(os.environ.get("H", "1088"))
W = int(os.environ.get("W", "1920"))
REPS = int(os.environ.get("REPS", "8"))


def timed(fn, *args):
    def body(c, _):
        out = fn(args[0] + c * 1e-30, *args[1:])
        return c + out.sum() * 1e-30, out.sum()
    runj = jax.jit(lambda a: jax.lax.scan(
        body, jnp.float32(0.0), None, length=REPS)[1])
    r = runj(args[0])  # warm up/compile
    float(r.sum())
    t0 = time.perf_counter()
    r = runj(args[0])
    float(r.sum())
    dt = time.perf_counter() - t0
    return (dt - 0.027) * 1e3 / REPS


def main():
    rng = np.random.default_rng(0)
    base = rng.random((17, 30)).astype(np.float32)
    d = np.kron(base, np.ones((64, 64), np.float32))[:H, :W]
    depth = jnp.asarray(np.clip(d * 0.15 + 0.82, 0.6, 0.995))
    n = rng.normal(size=(3, H, W)).astype(np.float32)
    n[2] = np.abs(n[2]) + 1.5
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    normal = jnp.asarray(n)
    cam = Camera3D()
    cam.resize(W, H)
    g = cfgm.ShaderGlobals.create(
        camera=camera_matrices(cam, [0, 0, 0], 1, W, H))

    which = os.environ.get("WHICH", "xla,pallas").split(",")
    t_x = 1.0
    if "pre" in which:
        t = timed(lambda dd, nn: sum(
            x.sum() for x in ssao._preamble(dd, nn, g)), depth, normal)
        print(f"preamble {t:8.2f} ms")
    if "xla" in which:
        t_x = timed(lambda dd, nn: ssao.ssao_generate(dd, nn, g),
                    depth, normal)
        print(f"xla    {t_x:8.2f} ms")
    if "pallas" in which:
        wr = int(os.environ.get("WR", "64"))
        wl = int(os.environ.get("WL", "384"))
        t_p = timed(lambda dd, nn: ssao.ssao_generate_pallas(
            dd, nn, g, window_rows=wr, window_lanes=wl), depth, normal)
        # window-clamp error vs the exact XLA tail (smaller windows
        # clamp more far taps — a time win must come with this number)
        a = ssao.ssao_generate_pallas(depth, normal, g,
                                      window_rows=wr, window_lanes=wl)
        b = ssao.ssao_generate(depth, normal, g)
        err = float(jnp.abs(a - b).mean())
        print(f"pallas(WR={wr},WL={wl}) {t_p:8.2f} ms   ({t_x / t_p:.1f}x)"
              f"  mean err vs xla {err:.5f}")
    if "sweep" in which:
        for wr, wl in ((64, 384), (64, 256), (48, 256), (32, 256),
                       (48, 384)):
            t_p = timed(lambda dd, nn, wr=wr, wl=wl:
                        ssao.ssao_generate_pallas(
                            dd, nn, g, window_rows=wr, window_lanes=wl),
                        depth, normal)
            a = ssao.ssao_generate_pallas(depth, normal, g,
                                          window_rows=wr,
                                          window_lanes=wl)
            b = ssao.ssao_generate(depth, normal, g)
            err = float(jnp.abs(a - b).mean())
            print(f"pallas(WR={wr},WL={wl}) {t_p:8.2f} ms   "
                  f"mean err vs xla {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
