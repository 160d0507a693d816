#!/usr/bin/env python
"""On-chip A/B of the PAID sun-shadow raster (VERDICT r3 item 3).

Config 6 (helmet lifted inside the sun volume) pays ~48 ms for a
depth-only 4096² pass a GPU does in ~1 ms (sun_shadow_draw.inl:116-133).
Cost model: resolve work = pairs x pixels_per_bin VPU evaluations, and
the helmet concentrates all 16k triangles into a handful of 128-px bins
— so the lever is SMALLER BINS (less pixels per pair) plus the id-free
depth-only kernel (no winner tracking, half the write-back).

This tool times raster2.rasterize on the real shadow view across bin
grids and kernels, scan-harnessed with a carry-perturbed clip input
(PERF.md LICM rules) and float readback.  Prints the overflow mask per
variant: a fast variant that truncates fragments is not a result.

Usage: python tools/bench_shadow.py [--frames 16] [--scene helmet_lifted]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--scene", default="helmet_lifted")
    ap.add_argument("--res", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from soc_real_time_renderer_tpu.utils import compile_cache
    compile_cache.enable()
    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as fm
    from soc_real_time_renderer_tpu.ops import raster2

    R = args.res
    cfg = RenderConfig(width=1280, height=736, shadow_resolution=R,
                       enable_bloom=False, enable_clouds=False,
                       enable_taa=False, enable_auto_exposure=False,
                       enable_hiz=False)
    built = scenes.build(args.scene, cfg)
    g, mm, nm = built.frame_globals(1)
    world, _ = fm.transform_triangles(built.batch, jnp.asarray(mm),
                                      jnp.asarray(nm))
    sclip = jnp.asarray(fm._clip_of(world, g.sun.projection_view))
    print(f"scene {args.scene}: {built.batch.num_triangles} tris, "
          f"shadow {R}^2", flush=True)

    GRIDS = {
        "bin128 g1 (r3 default)": raster2.BinGrid(
            width=R, height=R, bin_size=128, group=1),
        "bin64 g2": raster2.BinGrid(width=R, height=R, bin_size=64,
                                    group=2),
        "bin32 g4": raster2.BinGrid(width=R, height=R, bin_size=32,
                                    group=4),
        "bin32 g4 ns8": raster2.BinGrid(width=R, height=R, bin_size=32,
                                        group=4, n_small=8),
    }

    for gname, grid in GRIDS.items():
        for depth_only in (False, True):
            def run(clip0, grid=grid, depth_only=depth_only):
                def step(c, _):
                    clip = clip0 * (1.0 + c * 1e-30)
                    vis, _ = raster2.rasterize(
                        clip, grid, "back", False, None, False,
                        depth_only)
                    probe = vis.depth[::64, ::64].sum()
                    return c + probe * 1e-30, (probe, vis.overflow)
                return jax.lax.scan(step, jnp.float32(0), None,
                                    length=args.frames)

            runj = jax.jit(run)
            t0 = time.perf_counter()
            _, (probes, ovf) = runj(sclip)
            float(probes.sum())
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _, (probes, ovf) = runj(sclip)
            float(probes.sum())
            ms = (time.perf_counter() - t0) * 1e3 / args.frames
            kind = "depth-only" if depth_only else "full      "
            print(f"{gname:24s} {kind}  {ms:8.2f} ms/view  "
                  f"overflow {int(np.asarray(ovf).max()):d}  "
                  f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
