#!/usr/bin/env python
"""Isolate the tile texture sampler's parts on the real chip:
phase-1 planning, the Pallas kernel, and the dirty fallback.

Usage: python tools/bench_texsample.py [--scene full --width 1920
       --height 1088]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, n=8, label=""):
    """Device-side scan timing with carry perturbation (PERF.md): a
    dispatch-per-rep loop was MEASURED to carry ~5 ms/rep of host/
    tunnel overhead (an empty kernel 'cost' 5.5 ms), poisoning every
    isolated number; the scan amortizes one dispatch + readback over n
    reps.  args[0] must be a float array the computation depends on."""
    import jax
    import jax.numpy as jnp

    def runner(*a):
        # a[] are jit ARGUMENTS — closing over device arrays would bake
        # them into the computation as constants (the 66 MB atlas page
        # blows the remote_compile request: HTTP 413)
        def body(c, _):
            out = fn(a[0] + c * 1e-30, *a[1:])
            s = jax.tree_util.tree_reduce(
                lambda acc, x: acc + x.sum().astype(jnp.float32), out,
                jnp.float32(0.0))
            return c + s * 1e-30, s
        return jax.lax.scan(body, jnp.float32(0.0), None, length=n)[1]

    runj = jax.jit(runner)
    float(runj(*args).sum())
    t0 = time.perf_counter()
    float(runj(*args).sum())
    ms = (time.perf_counter() - t0 - 0.027) * 1e3 / n
    print(f"{label:28s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="full")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--fields", default="/tmp/texfields.npz",
                    help="npz of per-pixel mid/u/v/lod/live captured by "
                         "tools/capture_texfields.py at the same "
                         "scene/resolution")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from soc_real_time_renderer_tpu.utils import compile_cache
    compile_cache.enable()

    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.ops import texsample as ts

    H, W = args.height, args.width
    built = scenes.build(args.scene, RenderConfig(width=W, height=H),
                         build_page=True)
    plan = built.plan
    # device-put: a host numpy page closed over by a jitted fn is baked
    # as a graph constant -> giant remote_compile request (HTTP 413)
    page = jax.device_put(built.batch.atlas_page)
    atlas_packed = jax.device_put(built.batch.atlas_packed)

    d = np.load(args.fields)  # captured by tools/capture_texfields.py
    mid = jnp.asarray(d["mid"]).reshape(-1)
    uv = jnp.stack([jnp.asarray(d["u"]).reshape(-1),
                    jnp.asarray(d["v"]).reshape(-1)])
    lod = jnp.asarray(d["lod"]).reshape(-1)
    live = jnp.asarray(d["live"]).reshape(-1)

    mid_t = ts._tileize(mid.reshape(H, W), H, W)
    u_t = ts._tileize(uv[0].reshape(H, W), H, W)
    v_t = ts._tileize(uv[1].reshape(H, W), H, W)
    lod_t = ts._tileize(jnp.clip(lod, 0, plan.atlas_n_levels - 1
                                 ).reshape(H, W), H, W)
    live_t = ts._tileize(live.reshape(H, W), H, W)
    lvl = jnp.clip(jnp.round(lod_t).astype(jnp.int32), 0,
                   plan.atlas_n_levels - 1)
    NT = mid_t.shape[0]

    # NOTE: timed() perturbs args[0] — every fn below takes a FLOAT
    # array first so the perturbation doesn't die in an int cast
    def plan_fn(u_t, mid_t, v_t, lvl, live_t):
        return ts._plan_tiles_impl(
            mid_t, u_t, v_t, lvl, live_t, page.row0, page.col0,
            size=plan.atlas_size, n_levels=plan.atlas_n_levels,
            num_materials=plan.atlas_num_materials)

    perpx, dma, n_used, dirty, _ = jax.jit(plan_fn)(
        u_t, mid_t, v_t, lvl, live_t)
    print(f"NT={NT} dirty={int(dirty.sum())} "
          f"avg_slots={float(n_used.mean()):.2f}", flush=True)
    timed(plan_fn, u_t, mid_t, v_t, lvl, live_t, label="phase1 planning")

    n_used0 = jnp.where(dirty, 0, n_used)
    meta = jnp.concatenate(
        [n_used0[:, None], dma.reshape(NT, ts.NBLK * 2)],
        axis=1).reshape(-1).astype(jnp.int32)

    def kern(perpx, page_arr, meta):
        return ts.sample_atlas_page(page_arr, meta, perpx,
                                    interpret=False)
    timed(kern, perpx, page.page, meta, label="pallas kernel")

    def full(uv, page, atlas_packed, mid, lod, live):
        return ts.sample_atlas_tiled(
            page, mid, uv, lod, live, atlas_packed,
            size=plan.atlas_size, n_levels=plan.atlas_n_levels,
            num_materials=plan.atlas_num_materials,
            layer_stride=plan.atlas_layer_stride,
            filter_mode="bilinear", dirty_cap=plan.tex_dirty_cap,
            interpret=False, H=H, W=W)
    timed(full, uv, page, atlas_packed, mid, lod, live,
          label="full sample_atlas_tiled")

    from soc_real_time_renderer_tpu.ops import gbuffer as gb

    def xla_tap(uv, atlas_packed, mid, lod):
        return gb.sample_packed_atlas(
            atlas_packed, mid, uv, lod,
            size=plan.atlas_size, layer_stride=plan.atlas_layer_stride,
            n_levels=plan.atlas_n_levels, filter_mode="bilinear")
    timed(xla_tap, uv, atlas_packed, mid,
          jnp.clip(lod, 0, plan.atlas_n_levels - 1),
          label="XLA gather tap (old path)")


if __name__ == "__main__":
    main()
