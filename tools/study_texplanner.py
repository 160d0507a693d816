#!/usr/bin/env python
"""Offline tile-planner study on captured texture fields (VERDICT r3
items 1/6): dirty-tile rates and slot-count distributions across
planner variants (k_top, nblk), to size NBLK / K_TOP / tex_dirty_cap
from data instead of guesses.

Pure XLA (the planner phase only) — runs on CPU against an npz from
tools/capture_texfields.py.

Usage: python tools/study_texplanner.py --fields /tmp/texfields.npz \
       --scene sponza --width 1280 --height 736
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fields", required=True)
    ap.add_argument("--scene", default="sponza")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=736)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.ops import texsample as ts

    H, W = args.height, args.width
    built = scenes.build(args.scene,
                         RenderConfig(width=W, height=H), build_page=True)
    plan = built.plan
    page = built.batch.atlas_page

    d = np.load(args.fields)
    mid_t = ts._tileize(jnp.asarray(d["mid"]).reshape(H, W), H, W)
    u_t = ts._tileize(jnp.asarray(d["u"]).reshape(H, W), H, W)
    v_t = ts._tileize(jnp.asarray(d["v"]).reshape(H, W), H, W)
    lod_t = ts._tileize(jnp.clip(jnp.asarray(d["lod"]), 0,
                                 plan.atlas_n_levels - 1).reshape(H, W),
                        H, W)
    live_t = ts._tileize(jnp.asarray(d["live"]).reshape(H, W), H, W)
    lvl = jnp.clip(jnp.round(lod_t).astype(jnp.int32), 0,
                   plan.atlas_n_levels - 1)
    NT = mid_t.shape[0]
    print(f"{args.scene} {W}x{H}: NT={NT} tiles, "
          f"M={plan.atlas_num_materials}, L={plan.atlas_n_levels}")

    for k_top in (4, 5, 6, 8):
        _, _, n_used, dirty, _ = jax.jit(
            lambda m, u, v, l, lv, kt=k_top: ts._plan_tiles_impl(
                m, u, v, l, lv, page.row0, page.col0,
                size=plan.atlas_size, n_levels=plan.atlas_n_levels,
                num_materials=plan.atlas_num_materials,
                k_top=kt, nblk=32))(mid_t, u_t, v_t, lvl, live_t)
        n_used = np.asarray(n_used)
        dirty = np.asarray(dirty)
        hist = np.bincount(np.clip(n_used, 0, 16), minlength=17)
        # dirty(nblk=k): planner-dirty OR more slots than k
        row = " ".join(
            f"nblk{k}:{int((dirty | (n_used > k)).sum())}"
            for k in (4, 6, 8, 10))
        print(f"k_top={k_top}: planner-dirty={int(dirty.sum())}"
              f" ({dirty.mean():.1%}), avg_slots={n_used.mean():.2f}, "
              f"p99_slots={int(np.percentile(n_used, 99))}")
        print(f"   dirty-if {row}")
        print(f"   slots hist {hist[:12].tolist()}")


if __name__ == "__main__":
    main()
