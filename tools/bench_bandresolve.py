#!/usr/bin/env python
"""Measure the multi-chip raster work split ON CHIP (VERDICT r4 item
8): time (a) the replicated part — setup + binning sort + pair-record
gather — and (b) the per-device sharded part — the resolve of ONE 1/N
bin-row band (via the same `row0` path resolve_row_sharded uses) —
against (c) the full single-device resolve.  Writes the measured rates
to docs/evidence/r5/bandres.json, which __graft_entry__'s dryrun
prints instead of the PERF.md model.

All timings use the LICM-proof scan harness: the timed op is iterated
with a carry-perturbed input (the output feeds an epsilon term of the
next iteration's input) and a float() readback (PERF.md benchmarking
pitfalls).

Usage: python tools/bench_bandresolve.py [--scene full --width 1920
       --height 1088 --bands 8 --iters 8]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="full")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "evidence", "r5",
        "bandres.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as fm
    from soc_real_time_renderer_tpu.ops import raster2 as r2
    from soc_real_time_renderer_tpu.utils import compile_cache
    compile_cache.enable()

    built = scenes.build(args.scene,
                         RenderConfig(width=args.width, height=args.height))
    grid = built.plan.main_grid
    g, mm, nm = built.frame_globals(1)
    clip = fm._clip_of(fm.transform_triangles(
        built.batch, jnp.asarray(mm), jnp.asarray(nm))[0],
        g.camera.projection_view)
    T = built.batch.num_triangles

    # pad BY to a band multiple exactly like rasterize(shard=...)
    BYp = -(-grid.by // args.bands) * args.bands
    grid_p = dataclasses.replace(grid, height=BYp * grid.bh)
    setup0 = r2.triangle_setup_planar(clip, grid_p.width, grid_p.height,
                                      "front")
    starts0, st0, _ = jax.jit(
        r2.build_pairs, static_argnames=("grid",))(setup0, grid_p)
    S = st0.shape[0]
    cap = min(grid_p.pair_cap, -(-S // grid_p.chunk) * grid_p.chunk)
    rgrid = dataclasses.replace(grid_p, pair_cap=cap)
    total_pairs = int(np.asarray(starts0)[-1])

    def timed(label, fn, *xs, iters=args.iters):
        """scan harness: carry-perturbed input, summed output, float
        readback; returns ms/iter."""
        def run(*xs):
            def step(c, _):
                out = fn(c, *xs)
                return out.astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(iters))
            return c
        f = jax.jit(run)
        float(f(*xs))                      # compile + warm
        t0 = time.perf_counter()
        float(f(*xs))
        ms = (time.perf_counter() - t0 - 0.027) * 1e3 / iters
        print(f"{label:36s} {ms:8.2f} ms", flush=True)
        return ms

    # (a) replicated work: setup + binning sort + record gather
    def binning(c, clip):
        clipp = clip + c            # carry perturbation defeats LICM
        setup = r2.triangle_setup_planar(clipp, grid_p.width,
                                         grid_p.height, "front")
        starts, st, _ = r2.build_pairs(setup, grid_p)
        records = r2.build_records(setup, dtype=grid_p.rec_dtype)
        recs = records[:, jnp.minimum(st[:min(S, cap)], T)]
        return (starts.astype(jnp.float32).sum()
                + recs.astype(jnp.float32).sum())
    binning_ms = timed("binning (setup+sort+pair gather)", binning, clip)

    # prebuilt stream for the resolve timings
    records0 = r2.build_records(setup0, dtype=grid_p.rec_dtype)
    recs0 = records0[:, jnp.minimum(st0[:min(S, cap)], T)]
    if recs0.shape[1] < cap:
        recs0 = jnp.pad(recs0, ((0, 0), (0, cap - recs0.shape[1])))

    # (b) full resolve on this one device
    def full_resolve(c, starts, recs):
        recs_p = recs + c.astype(recs.dtype)
        d, t = r2.resolve(starts, recs_p, rgrid)
        return d.sum() + t.astype(jnp.float32).sum() * 1e-9
    full_ms = timed("resolve FULL (1 device does all)",
                    full_resolve, starts0, recs0)

    # (c) ONE 1/N band via the row0 path (what each device runs under
    # resolve_row_sharded); middle band = representative occupancy
    BYs = BYp // args.bands
    band_grid = dataclasses.replace(rgrid, height=BYs * rgrid.bh)
    row0 = jnp.asarray([ (args.bands // 2) * BYs ], jnp.int32)

    def band_resolve(c, starts, recs):
        recs_p = recs + c.astype(recs.dtype)
        d, t = r2.resolve(starts, recs_p, band_grid, row0=row0)
        return d.sum() + t.astype(jnp.float32).sum() * 1e-9
    band_ms = timed(f"resolve ONE 1/{args.bands} band",
                    band_resolve, starts0, recs0)

    # also time every band separately (occupancy varies by screen row)
    band_all = []
    for b in range(args.bands):
        r0 = jnp.asarray([b * BYs], jnp.int32)

        def bres(c, starts, recs, r0=r0):
            recs_p = recs + c.astype(recs.dtype)
            d, t = r2.resolve(starts, recs_p, band_grid, row0=r0)
            return d.sum() + t.astype(jnp.float32).sum() * 1e-9
        band_all.append(timed(f"  band {b}", bres, starts0, recs0,
                              iters=max(4, args.iters // 2)))
    worst_band = max(band_all)

    evals = total_pairs * grid.pixels_per_bin
    rate = full_ms * 1e6 / max(evals, 1)
    frac = binning_ms / max(binning_ms + worst_band, 1e-9)
    speedup = (binning_ms + full_ms) / (binning_ms + worst_band)
    print(f"\npairs={total_pairs} evals={evals/1e6:.1f}M -> measured "
          f"resolve rate {rate:.3f} ns/eval")
    print(f"measured replicated fraction = binning / (binning + worst "
          f"band) = {binning_ms:.2f} / ({binning_ms:.2f} + "
          f"{worst_band:.2f}) = {frac:.1%}")
    print(f"raster stage speedup at {args.bands} devices: "
          f"{speedup:.2f}x (Amdahl on the measured split)")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "scene": args.scene, "width": args.width,
            "height": args.height, "bands": args.bands,
            "binning_ms": binning_ms, "full_resolve_ms": full_ms,
            "band_resolve_ms": worst_band,
            "band_resolve_ms_each": band_all,
            "total_pairs": total_pairs,
            "resolve_ns_per_eval": rate,
            "measured_fraction": frac,
            "raster_speedup_at_bands": speedup,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        }, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
