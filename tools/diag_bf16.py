#!/usr/bin/env python
"""Root-cause the chip-vs-interpret bf16 record-stream flip gap.

First chip window measured 3.07% tri_id flips / 4.1e-3 depth err on
the adversarial sliver soup, where CPU interpret gives 0.018% /
1.0e-5 on the SAME scene and code.  Candidates:
  (a) the in-pass z early-out stopping on quantization-shifted z
      (BinGrid.early_out kill-switch A/B isolates it),
  (b) a Mosaic lowering difference in the chunk reconstruction.

Runs the sliver scene through {f32, bf16} x {early_out on, off} plus
the real helmet clip, printing flip/depth deltas for each.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests"))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="",
                    help="'cpu' pins the CPU backend (the axon "
                         "sitecustomize overrides JAX_PLATFORMS)")
    args = ap.parse_args()
    import jax
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as fm
    from soc_real_time_renderer_tpu.ops import raster2
    from soc_real_time_renderer_tpu.utils import compile_cache
    from soc_real_time_renderer_tpu.utils import mathutil as mu
    compile_cache.enable()
    interp = jax.default_backend() not in ("tpu", "axon")
    print(f"backend: {jax.default_backend()} interp={interp}", flush=True)

    rng = np.random.default_rng(7)
    Tn = 64
    verts = rng.normal(size=(Tn * 3, 3)).astype(np.float32)
    verts[:, 2] -= 4.0
    proj = mu.perspective(60.0, 1.0, 0.1, 100.0)
    clipv = (verts @ proj[:, :3].T + proj[:, 3]).astype(np.float32)
    clip_planar = jnp.asarray(np.ascontiguousarray(
        clipv.reshape(Tn, 3, 4).transpose(1, 2, 0)))
    grid = raster2.BinGrid(width=128, height=128, pair_cap=16384,
                           med_cap=512)

    def run(rec_dtype, early_out, clip, g):
        gg = dataclasses.replace(g, rec_dtype=rec_dtype,
                                 early_out=early_out)
        vis, _ = raster2.rasterize_jit(clip, gg, "front", interp)
        return np.asarray(vis.depth), np.asarray(vis.tri_id)

    def compare(name, clip, g):
        dr, tr = run("f32", True, clip, g)       # reference
        for dt, eo in (("bf16", True), ("bf16", False), ("f32", False)):
            d, t = run(dt, eo, clip, g)
            flips = (t != tr).mean()
            same = t == tr
            derr = np.abs(d - dr)[same].max() if same.any() else -1.0
            print(f"{name} {dt} early_out={eo}: flips {flips:.4%} "
                  f"depth err {derr:.2e}", flush=True)

    compare("sliver", clip_planar, grid)

    built = scenes.build("helmet", RenderConfig(
        width=256, height=256, shadow_resolution=256))
    g, mm, nm = built.frame_globals(1)
    clip_h = fm._clip_of(fm.transform_triangles(
        built.batch, jnp.asarray(mm), jnp.asarray(nm))[0],
        g.camera.projection_view)
    compare("helmet", clip_h, built.plan.main_grid)


if __name__ == "__main__":
    main()
