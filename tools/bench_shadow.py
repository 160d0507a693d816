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
    ap.add_argument("--view", default="shadow", choices=("shadow", "main"),
                    help="'main' A/Bs the MAIN-view grid at --width/"
                         "--height with front culling + full kernel")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
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
    cfg = RenderConfig(width=args.width, height=args.height,
                       shadow_resolution=R,
                       enable_bloom=False, enable_clouds=False,
                       enable_taa=False, enable_auto_exposure=False,
                       enable_hiz=False)
    built = scenes.build(args.scene, cfg)
    g, mm, nm = built.frame_globals(1)
    world, _ = fm.transform_triangles(built.batch, jnp.asarray(mm),
                                      jnp.asarray(nm))
    if args.view == "shadow":
        sclip = jnp.asarray(fm._clip_of(world, g.sun.projection_view))
        W, H = R, R
        cull = "back"
        kinds = (False, True)
    else:
        sclip = jnp.asarray(fm._clip_of(world, g.camera.projection_view))
        W, H = args.width, args.height
        cull = "front"
        kinds = (False,)     # the main view needs tri_id
    print(f"scene {args.scene}: {built.batch.num_triangles} tris, "
          f"{args.view} view {W}x{H}", flush=True)

    GRIDS = {
        "bin128 g1": raster2.BinGrid(width=W, height=H, bin_size=128,
                                     group=1),
        "bin64 g2 (main default)": raster2.BinGrid(
            width=W, height=H, bin_size=64, group=2),
        "bin32 g4": raster2.BinGrid(width=W, height=H, bin_size=32,
                                    group=4),
        "bin 64x16 g2": raster2.BinGrid(width=W, height=H, bin_w=64,
                                        bin_h=16, group=2),
        "bin 64x32 g2": raster2.BinGrid(width=W, height=H, bin_w=64,
                                        bin_h=32, group=2),
    }
    if args.view == "shadow":
        GRIDS["bin128 g1 (shadow default)"] = GRIDS.pop("bin128 g1")

    for gname, grid in GRIDS.items():
        for depth_only in kinds:
            def run(clip0, grid=grid, depth_only=depth_only, cull=cull):
                def step(c, _):
                    clip = clip0 * (1.0 + c * 1e-30)
                    vis, _ = raster2.rasterize(
                        clip, grid, cull, False, None, False,
                        depth_only)
                    probe = vis.depth[::64, ::64].sum()
                    if vis.tri_id is not None:
                        probe = probe + vis.tri_id[::64, ::64].sum()
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
