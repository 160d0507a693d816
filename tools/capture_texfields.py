#!/usr/bin/env python
"""Capture the per-pixel texture-tap fields (material id, uv, lod,
live) of one frame to an npz, for tools/bench_texsample.py and offline
tile-planner studies.

The fields reproduce ops/gbuffer.resolve_gbuffer's tap inputs
(gbuffer.py interp/lod derivation) on the real rasterized frame.

Usage: python tools/capture_texfields.py --scene sponza --width 1280 \
       --height 736 --out /tmp/texfields_sponza736.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="full")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--frame", type=int, default=1)
    ap.add_argument("--out", default="/tmp/texfields.npz")
    ap.add_argument("--platform", default="",
                    help="'cpu' pins the CPU backend in-process (the "
                         "axon sitecustomize overrides JAX_PLATFORMS)")
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

    built = scenes.build(
        args.scene, RenderConfig(width=args.width, height=args.height))
    plan = built.plan
    g, mm, nm = built.frame_globals(args.frame)

    def fields(batch, g, mm, nm):
        vis, records, _, _ = fm.raster_stage(plan, batch, g, mm, nm)
        H, W = vis.depth.shape
        T = records.shape[1] - 1
        tri = vis.tri_id.reshape(-1)
        miss = tri < 0
        t = jnp.where(miss, T, tri)
        rhl = records[:, t]
        rec = rhl[:40].astype(jnp.float32) + rhl[40:].astype(jnp.float32)
        px = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
        py = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]
        px = jnp.broadcast_to(px, (H, W)).reshape(-1)
        py = jnp.broadcast_to(py, (H, W)).reshape(-1)
        e = jnp.stack([rec[0] * px + rec[1] * py + rec[2],
                       rec[3] * px + rec[4] * py + rec[5],
                       rec[6] * px + rec[7] * py + rec[8]])
        ex = jnp.stack([rec[0], rec[3], rec[6]])
        ey = jnp.stack([rec[1], rec[4], rec[7]])
        D = e[0] + e[1] + e[2]
        Dx = ex[0] + ex[1] + ex[2]
        Dy = ey[0] + ey[1] + ey[2]
        invD = 1.0 / jnp.where(D != 0, D, 1.0)

        def interp(r0, r1, r2):
            N = e[0] * r0 + e[1] * r1 + e[2] * r2
            Nx = ex[0] * r0 + ex[1] * r1 + ex[2] * r2
            Ny = ey[0] * r0 + ey[1] * r1 + ey[2] * r2
            val = N * invD
            return (val, (Nx - val * Dx) * invD, (Ny - val * Dy) * invD)

        u, du_dx, du_dy = interp(rec[27], rec[29], rec[31])
        v, dv_dx, dv_dy = interp(rec[28], rec[30], rec[32])
        mid = jnp.round(rec[33]).astype(jnp.int32)
        lod_sq = jnp.maximum(du_dx ** 2 + dv_dx ** 2,
                             du_dy ** 2 + dv_dy ** 2) \
            * (plan.atlas_size ** 2)
        lod = 0.5 * jnp.log2(jnp.maximum(lod_sq, 1e-12))
        shp = (H, W)
        return (mid.reshape(shp), u.reshape(shp), v.reshape(shp),
                lod.reshape(shp), (~miss).reshape(shp))

    mid, u, v, lod, live = [np.asarray(x) for x in
                            jax.jit(fields)(built.batch, g,
                                            jnp.asarray(mm),
                                            jnp.asarray(nm))]
    np.savez(args.out, mid=mid, u=u, v=v, lod=lod, live=live)
    print(f"wrote {args.out}: live {live.mean():.1%}, "
          f"materials {np.unique(mid[live]).tolist()}, "
          f"lod p50 {np.percentile(lod[live], 50):.2f}", flush=True)


if __name__ == "__main__":
    main()
