#!/usr/bin/env python
"""Record-gather layout A/B on the real chip (VERDICT r3 item 1: the
G-buffer record fetch measures 19.2 ms in-frame at config 5).

Variants:
  * (80, T) bf16, minor-axis column gather  — the shipped layout
  * (T, 80) bf16, row gather                — contiguous 160 B/idx
  * (56, T) / (T, 56) bf16                  — lo rows only for adj+uv
  * (40, T) f32 column gather               — the round-2 baseline

Indices come from a captured real frame's tri_id when --fields-tri is
given, else a synthetic 4x4-block-coherent pattern.

Usage: python tools/bench_records.py [--scene full --width 1920
       --height 1088]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="full")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from soc_real_time_renderer_tpu.utils import compile_cache
    compile_cache.enable()
    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as fm

    H, W = args.height, args.width
    built = scenes.build(args.scene, RenderConfig(width=W, height=H))
    g, mm, nm = built.frame_globals(1)

    # real per-pixel tri ids from one rasterized frame
    def tri_ids(batch, g, mm, nm):
        vis, records, _, _ = fm.raster_stage(built.plan, batch, g, mm, nm)
        return vis.tri_id, records
    tri, records = jax.jit(tri_ids)(built.batch, g, jnp.asarray(mm),
                                    jnp.asarray(nm))
    T = records.shape[1] - 1
    t_idx = jnp.where(tri.reshape(-1) < 0, T, tri.reshape(-1))
    rec80 = jax.device_put(records)                       # (80, T+1) bf16
    rec80_rows = jax.device_put(jnp.transpose(records))         # (T+1, 80)
    # 53-row variant: hi rows 0..37 + lo rows only where full precision
    # matters (adj 9 + uv 6) — wnrm/static flags are fine at bf16
    rows56 = list(range(38)) + [40 + r for r in range(9)] \
        + [40 + r for r in range(27, 33)]
    rec56 = jax.device_put(records[jnp.asarray(rows56)])
    rec56_rows = jax.device_put(jnp.transpose(records[jnp.asarray(rows56)]))
    rec40f = jax.device_put(
        (records[:40].astype(jnp.float32)
         + records[40:].astype(jnp.float32)))             # (40, T+1) f32

    print(f"{args.scene} {W}x{H}: T={T}, idx={t_idx.shape[0]}", flush=True)

    def timed(fn, *arrs, label=""):
        def run(idx0):
            def step(c, _):
                idx = jnp.minimum(idx0 + c, T)
                out = fn(idx, *arrs)
                s = out.astype(jnp.float32).sum()
                return c + (s * 1e-30).astype(jnp.int32), s
            return jax.lax.scan(step, jnp.int32(0), None,
                                length=args.frames)
        runj = jax.jit(run)
        _, probes = runj(t_idx)
        float(probes.sum())
        t0 = time.perf_counter()
        _, probes = runj(t_idx)
        float(probes.sum())
        ms = (time.perf_counter() - t0 - 0.027) * 1e3 / args.frames
        print(f"{label:32s} {ms:8.2f} ms", flush=True)

    timed(lambda i, r: r[:, i], rec80, label="(80,T) bf16 column gather")
    timed(lambda i, r: r[i], rec80_rows, label="(T,80) bf16 row gather")
    timed(lambda i, r: r[:, i], rec56, label="(56,T) bf16 column gather")
    timed(lambda i, r: r[i], rec56_rows, label="(T,56) bf16 row gather")
    timed(lambda i, r: r[:, i], rec40f, label="(40,T) f32 column gather")


if __name__ == "__main__":
    main()
