#!/usr/bin/env python
"""Diagnose the config-5 '-hiz is slower' anomaly (VERDICT r3 item 4).

Compiles the exact bench_toggle scan program with HiZ on and off and
prints XLA's cost analysis for both (flops, bytes accessed, output
bytes).  If hiz-off accesses MORE bytes, some shared producer is being
recomputed/duplicated per consumer when HiZ's reduction no longer
anchors it — the same class as the round-3 vis-barrier fix, on a
different tensor.

Usage: python tools/diag_hiz.py [--config 5] [--frames 16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from soc_real_time_renderer_tpu.utils import compile_cache
    compile_cache.enable()
    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as frame_mod

    PRESETS = {
        3: ("sponza", dict(width=1280, height=736)),
        5: ("full", dict(width=1920, height=1088)),
    }
    scene_name, kw = PRESETS[args.config]
    built = scenes.build(scene_name, RenderConfig(**kw))
    cfg0 = built.plan.config

    gs = []
    for i in range(args.frames):
        g, mm, nm = built.frame_globals(i + 1)
        gs.append(g)
    gb = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *gs)

    def analyze(cfg, tag):
        plan = dataclasses.replace(built.plan, config=cfg)

        def run(batch, gbb, hist, mm, nm):
            def step(h, g):
                out, h2 = frame_mod.render_frame(plan, batch, g, h, mm,
                                                 nm)
                return h2, frame_mod.bench_probe(out)
            return jax.lax.scan(step, hist, gbb)

        hist = frame_mod.RenderHistory.create(cfg)
        lowered = jax.jit(run, donate_argnames=("hist",)).lower(
            built.batch, gb, hist, mm, nm)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keys = ("flops", "bytes accessed", "transcendentals",
                "optimal_seconds")
        stats = {k: ca.get(k) for k in keys if k in ca}
        # all bytes-accessed sub-keys (per memory space)
        for k, v in sorted(ca.items()):
            if "bytes" in k:
                stats[k] = v
        mem = compiled.memory_analysis()
        print(f"[{tag}]")
        for k, v in stats.items():
            print(f"  {k:40s} {v:.4g}")
        if mem is not None:
            for a in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "generated_code_size_in_bytes"):
                v = getattr(mem, a, None)
                if v is not None:
                    print(f"  {a:40s} {v/1e6:.1f} MB")
        print(flush=True)

    analyze(cfg0, "hiz ON (baseline)")
    analyze(cfg0.replace(enable_hiz=False), "hiz OFF")


if __name__ == "__main__":
    main()
