#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Measures steady-state ms/frame of the flagship pipeline (deferred
G-buffer + shadows + SSAO + bloom + TAA + auto-exposure + AgX) on real
hardware.  ``vs_baseline`` is the north-star target (16 ms/frame at
1080p, BASELINE.json) divided by the measured time — >= 1.0 means the
target is met.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH = int(os.environ.get("BENCH_WIDTH", "1280"))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", "768"))
SCENE = os.environ.get("BENCH_SCENE", "sponza")
FRAMES = int(os.environ.get("BENCH_FRAMES", "20"))
TARGET_MS = 16.0


def main():
    import jax
    import numpy as np

    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as frame_mod

    cfg = RenderConfig(width=WIDTH, height=HEIGHT)
    try:
        built = scenes.build(SCENE, cfg)
    except Exception:
        built = scenes.build("helmet", cfg)
    render = frame_mod.make_render_fn(built.plan)
    history = frame_mod.RenderHistory.create(cfg)

    # warmup / compile
    g, mm, nm = built.frame_globals(1)
    outputs, history = render(built.batch, g, history, mm, nm)
    jax.block_until_ready(outputs.color)

    times = []
    for i in range(FRAMES):
        g, mm, nm = built.frame_globals(i + 2)
        t0 = time.perf_counter()
        outputs, history = render(built.batch, g, history, mm, nm)
        jax.block_until_ready(outputs.color)
        times.append(time.perf_counter() - t0)

    ms = float(np.median(times) * 1e3)
    print(json.dumps({
        "metric": f"ms/frame {SCENE} {WIDTH}x{HEIGHT} full deferred pipeline",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
