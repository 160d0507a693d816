#!/usr/bin/env python
"""On-chip correctness pinning (VERDICT r2 item 2).

CI runs every Pallas kernel in interpret mode (tests/conftest.py pins
CPU); Mosaic lowering differences would ship silently.  This tool runs
each production-kernel-vs-oracle parity check NATIVELY on the TPU and
exits nonzero on any mismatch:

  1. raster resolve vs the numpy oracle (small synthetic scene)
  2. Pallas windowed SSAO vs the exact XLA path (real scene fields)
  3. Pallas TAA reprojection vs the exact XLA path
  4. Pallas sky LUT (real noise texture) vs the exact per-pixel LUT
  5. tile-resident texture sampler vs the exact XLA atlas gather
  6. the five BASELINE configs' first frames vs committed goldens
     (tests/goldens_chip/*.png; --update rewrites them)

Golden tolerance: mean |diff| < 2/255 and p99 |diff| < 12/255 per
config — wide enough for cross-compiler float reassociation, tight
enough that any real lowering bug (wrong window, flushed denormal,
misaligned DMA) fails loudly.

Usage: python tools/verify_chip.py [--update] [--skip-goldens]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLD_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "goldens_chip")

FAILURES = []


def check(name, ok, detail=""):
    status = "ok " if ok else "FAIL"
    print(f"[{status}] {name}  {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="rewrite golden PNGs instead of comparing")
    ap.add_argument("--skip-goldens", action="store_true")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="debug: run the script logic on CPU in Pallas "
                         "interpret mode (validates the tool itself, "
                         "NOT the Mosaic lowering)")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.allow_cpu:
        # the axon sitecustomize pins jax_platforms to the tunneled TPU
        # past the env var; pin CPU outright — deferring to
        # JAX_PLATFORMS would re-select the axon backend (the harness
        # exports JAX_PLATFORMS=axon) and hang when the tunnel is down
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    from soc_real_time_renderer_tpu.utils import compile_cache
    compile_cache.enable()

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})", flush=True)
    interp = False
    if backend not in ("tpu", "axon"):
        if not args.allow_cpu:
            print("ERROR: verify_chip must run on the real TPU", flush=True)
            return 2
        interp = True
        print("WARNING: --allow-cpu smoke run (interpret mode; proves "
              "the tool, not the chip)", flush=True)

    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.graph import frame as fm
    from soc_real_time_renderer_tpu.ops import raster2

    # ---- a small scene reused by the kernel checks
    cfg = RenderConfig(width=256, height=256, shadow_resolution=256)
    # build_page=True: helmet is single-material, whose batch skips the
    # tile-sampler page by default — without it check 5 would compare
    # the XLA gather against itself (vacuous pass)
    built = scenes.build("helmet", cfg, build_page=True)
    g, mm, nm = built.frame_globals(1)
    plan = built.plan

    # 1. raster resolve vs numpy oracle ---------------------------------
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from raster_oracle import naive_raster
    rng = np.random.default_rng(7)
    Tn = 64
    verts = rng.normal(size=(Tn * 3, 3)).astype(np.float32)
    verts[:, 2] -= 4.0
    from soc_real_time_renderer_tpu.utils import mathutil as mu
    proj = mu.perspective(60.0, 1.0, 0.1, 100.0)
    clipv = (verts @ proj[:, :3].T + proj[:, 3]).astype(np.float32)
    idx = np.arange(Tn * 3).reshape(Tn, 3)
    od, ot = naive_raster(clipv, idx, 128, 128, cull="front")
    clip_planar = np.ascontiguousarray(
        clipv.reshape(Tn, 3, 4).transpose(1, 2, 0))
    # kernel-logic check against the exact f32 record stream (the
    # oracle computes in f32, so the bf16 stream's edge quantization
    # would conflate kernel bugs with stream precision)
    grid = raster2.BinGrid(width=128, height=128, pair_cap=16384,
                           med_cap=512, rec_dtype="f32")
    vis, _ = raster2.rasterize_jit(jnp.asarray(clip_planar), grid,
                                   "front", interp)
    kd = np.asarray(vis.depth)
    kt = np.asarray(vis.tri_id)
    same_id = (kt == ot).mean()
    derr = np.abs(kd - od).max()
    check("raster-vs-oracle", same_id > 0.999 and derr < 1e-4,
          f"id match {same_id:.4f}, depth err {derr:.2e}")

    # 1b. bf16 record stream vs f32 on the ADVERSARIAL synthetic scene
    # (random-normal verts = sliver triangles whose edge functionals
    # cancel catastrophically, amplifying the hi/lo quantization ~60x
    # — chip-measured 3.07% flips / 4.1e-3 depth err; real meshes are
    # well-conditioned, see 1c).  Bounds the worst case.
    grid_b = dataclasses.replace(grid, rec_dtype="bf16")
    vis_b, _ = raster2.rasterize_jit(jnp.asarray(clip_planar), grid_b,
                                     "front", interp)
    flips = (np.asarray(vis_b.tri_id) != kt).mean()
    same = np.asarray(vis_b.tri_id) == kt
    dberr = np.abs(np.asarray(vis_b.depth)[same] - kd[same]).max()
    check("raster-bf16-vs-f32-sliver", flips < 0.05 and dberr < 2e-2,
          f"id flips {flips:.4%}, depth err {dberr:.2e} "
          f"(adversarial sliver soup)")

    # 1c. bf16 vs f32 on REAL content (the helmet clip): the rate that
    # shipped frames actually see — must stay well under a tenth of a
    # percent of pixels
    clip_h = fm._clip_of(fm.transform_triangles(
        built.batch, jnp.asarray(mm), jnp.asarray(nm))[0],
        g.camera.projection_view)
    grid_h = plan.main_grid
    vis_hf, _ = raster2.rasterize_jit(
        clip_h, dataclasses.replace(grid_h, rec_dtype="f32"), "front",
        interp)
    vis_hb, _ = raster2.rasterize_jit(
        clip_h, dataclasses.replace(grid_h, rec_dtype="bf16"), "front",
        interp)
    rflips = (np.asarray(vis_hb.tri_id) != np.asarray(vis_hf.tri_id)
              ).mean()
    rsame = np.asarray(vis_hb.tri_id) == np.asarray(vis_hf.tri_id)
    rderr = np.abs(np.asarray(vis_hb.depth)
                   - np.asarray(vis_hf.depth))[rsame].max()
    check("raster-bf16-vs-f32-real", rflips < 0.003 and rderr < 1e-3,
          f"id flips {rflips:.4%}, depth err {rderr:.2e} (helmet)")

    # frame fields for the screen-space kernel checks
    out, _ = fm.render_frame(
        dataclasses.replace(plan, interpret=interp), built.batch, g,
        fm.RenderHistory.create(cfg), mm, nm)
    depth = out.gbuffer.depth
    normal = out.gbuffer.normal

    # 2. SSAO pallas vs xla ---------------------------------------------
    from soc_real_time_renderer_tpu.ops import ssao as ssao_ops
    a = ssao_ops.ssao_blur(ssao_ops.ssao_generate_pallas(
        depth, normal, g, interpret=interp))
    b = ssao_ops.ssao_blur(ssao_ops.ssao_generate(depth, normal, g))
    err = float(jnp.abs(a - b).mean())
    check("ssao-pallas-vs-xla", err < 0.01, f"mean err {err:.5f}")

    # 3. TAA pallas vs xla ----------------------------------------------
    from soc_real_time_renderer_tpu.ops import taa_pallas
    from soc_real_time_renderer_tpu.ops import sampling
    H, W = cfg.height, cfg.width
    rng2 = np.random.default_rng(11)
    packed = jnp.asarray(rng2.random((5, H, W), dtype=np.float32))
    vel = jnp.asarray(
        (rng2.random((2, H, W), dtype=np.float32) - 0.5) * 8.0 / W)
    hist, oow = taa_pallas.reproject_history_pallas(
        packed.astype(jnp.bfloat16).astype(jnp.float32), vel,
        interpret=interp)
    uvg = sampling.grid_uv(H, W)
    exact = sampling.sample_screen(
        packed.astype(jnp.bfloat16).astype(jnp.float32),
        jnp.stack([uvg[0] - vel[0], uvg[1] - vel[1]]))
    inw = np.asarray(oow) < 0.5
    terr = float(np.abs(np.asarray(hist) - np.asarray(exact))[:, inw].max())
    check("taa-pallas-vs-xla", terr < 0.02,
          f"in-window max err {terr:.5f} ({inw.mean():.1%} in-window)")

    # 4. sky LUT kernel vs exact ----------------------------------------
    if built.batch.cloud_noise is not None:
        from soc_real_time_renderer_tpu.ops import clouds as clouds_ops
        from soc_real_time_renderer_tpu.ops import sky_pallas
        lut_k = sky_pallas.render_sky_lut_pallas(
            g, built.batch.cloud_noise, interpret=interp)
        lut_e = clouds_ops.render_sky_lut(
            g, noise_tex=built.batch.cloud_noise)
        serr = float(jnp.abs(lut_k - lut_e).mean())
        check("sky-lut-pallas-vs-exact", serr < 0.02,
              f"mean err {serr:.5f}")
    else:
        check("sky-lut-pallas-vs-exact", True, "(no noise asset; skipped)")

    # 5. texture sampler pallas vs xla ----------------------------------
    from soc_real_time_renderer_tpu.ops import gbuffer as gbuf_ops
    vis2, setup2 = raster2.rasterize(
        fm._clip_of(fm.transform_triangles(built.batch, jnp.asarray(mm),
                                           jnp.asarray(nm))[0],
                    g.camera.projection_view), plan.main_grid, "front",
        interp)
    world, wnrm = fm.transform_triangles(built.batch, jnp.asarray(mm),
                                         jnp.asarray(nm))
    records = gbuf_ops.build_shading_records(
        setup2, world, wnrm, built.batch.tri_uv, built.batch.static_rows)
    gb_p, _, _ = gbuf_ops.resolve_gbuffer(
        vis2, records, built.batch.atlas_packed,
        g.camera_prev.projection_view, atlas_size=plan.atlas_size,
        layer_stride=plan.atlas_layer_stride,
        n_levels=plan.atlas_n_levels, filter_mode=plan.texture_filter,
        atlas_page=built.batch.atlas_page,
        num_materials=plan.atlas_num_materials, interpret=interp)
    gb_x, _, _ = gbuf_ops.resolve_gbuffer(
        vis2, records, built.batch.atlas_packed,
        g.camera_prev.projection_view, atlas_size=plan.atlas_size,
        layer_stride=plan.atlas_layer_stride,
        n_levels=plan.atlas_n_levels, filter_mode=plan.texture_filter)
    xerr = float(jnp.abs(gb_p.albedo - gb_x.albedo).mean())
    xmax = float(jnp.abs(gb_p.albedo - gb_x.albedo).max())
    check("texsample-pallas-vs-xla", xerr < 0.002 and xmax < 0.06,
          f"albedo mean err {xerr:.5f} max {xmax:.4f}")

    # 5b. u32-packed record stream vs hilo ON CHIP — the CPU test
    # (tests/test_frame_shapes.py) proves the logic; this guards the
    # TPU compiler's bitcast/convert folding (the excess-precision
    # pathology zeroed bf16 residuals on chip once already, PERF.md)
    rec_u32 = gbuf_ops.build_shading_records(
        setup2, world, wnrm, built.batch.tri_uv, built.batch.static_rows,
        pack="u32")
    gb_u, _, _ = gbuf_ops.resolve_gbuffer(
        vis2, rec_u32, built.batch.atlas_packed,
        g.camera_prev.projection_view, atlas_size=plan.atlas_size,
        layer_stride=plan.atlas_layer_stride,
        n_levels=plan.atlas_n_levels, filter_mode=plan.texture_filter)
    uerr = float(jnp.abs(gb_u.albedo - gb_x.albedo).max())
    unrm = float(jnp.abs(gb_u.normal - gb_x.normal).max())
    check("records-u32-vs-hilo", uerr <= 1e-5 and unrm <= 1e-5,
          f"albedo max {uerr:.2e} normal max {unrm:.2e}")

    # 7. SSR compacted march vs dense (ops/ssr.py): identical pixels
    # when the cap holds (the helmet IS metallic, so the march runs)
    from soc_real_time_renderer_tpu.ops import ssr as ssr_ops
    mrr = out.gbuffer.metallic_roughness
    dense, _, _ = jax.jit(ssr_ops.ssr, static_argnames=("compact_cap",))(
        depth, out.gbuffer.albedo, normal, mrr, g)
    n_act = int(jnp.sum(mrr[1] >= ssr_ops.METALLIC_MIN))
    cap_t = -(-max(n_act, 1) // 1024) * 1024 + 1024
    comp, ov7, na7 = jax.jit(
        ssr_ops.ssr, static_argnames=("compact_cap",))(
        depth, out.gbuffer.albedo, normal, mrr, g, compact_cap=cap_t)
    sdiff = float(jnp.abs(comp - dense).max())
    # <= 1e-6, not == 0: the (cap,) vs (H, W) shapes fuse/FMA-contract
    # differently (measured 6e-8 on CPU) — same math, different
    # reassociation
    check("ssr-compact-vs-dense",
          sdiff <= 1e-6 and int(ov7) == 0 and int(na7) == n_act,
          f"max diff {sdiff:.2e}, active {int(na7)}/{n_act} cap {cap_t}")

    # 6. golden frames ---------------------------------------------------
    if not args.skip_goldens:
        os.makedirs(GOLD_DIR, exist_ok=True)
        CONFIGS = [
            ("c1_helmet_min", "helmet",
             dict(width=640, height=384, shadow_resolution=1024,
                  enable_ssao=False, enable_bloom=False,
                  enable_clouds=False, enable_taa=False,
                  enable_auto_exposure=False, enable_hiz=False)),
            ("c2_helmet_shadow_ssao", "helmet",
             dict(width=1280, height=736, shadow_resolution=4096,
                  enable_bloom=False, enable_clouds=False,
                  enable_taa=False, enable_auto_exposure=False,
                  enable_hiz=False)),
            ("c3_sponza_full", "sponza",
             dict(width=1280, height=736)),
            ("c4_terrain_sky", "terrain",
             dict(width=1920, height=1088)),
            ("c5_full", "full",
             dict(width=1920, height=1088)),
            # the ONE config whose sun actually lights geometry and
            # whose 4096² shadow path pays (VERDICT r4 item 6: a
            # lighting/ESM regression must not pass the c1-c5 goldens,
            # whose reference-bug suns leave direct light dark)
            ("c6_helmet_lifted", "helmet_lifted",
             dict(width=1280, height=736, shadow_resolution=4096,
                  enable_bloom=False, enable_clouds=False,
                  enable_taa=False, enable_auto_exposure=False,
                  enable_hiz=False)),
        ]
        from soc_real_time_renderer_tpu.utils.image_io import save_png
        from PIL import Image
        import json
        import subprocess
        import datetime
        manifest_path = os.path.join(GOLD_DIR, "manifest.json")
        manifest = {}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
        # golden capture warms up WARMUP frames first: frame 1 has a
        # zero exposure state (auto-exposure's exponential smoothing
        # hasn't converged, resolve_luminance_histogram.inl:72-80
        # analog), so a frame-1 golden of an auto-exposure config is
        # near-black and barely detects lighting regressions (ADVICE r3
        # medium).  16 frames ≈ 5 smoothing time constants at the
        # reference defaults.
        WARMUP = 16
        for name, scene, kw in CONFIGS:
            b = scenes.build(scene, RenderConfig(**kw))
            render = fm.make_render_fn(b.plan)
            h = fm.RenderHistory.create(b.plan.config)
            o = None
            for i in range(WARMUP):
                gg, mm2, nm2 = b.frame_globals(i + 1)
                o, h = render(b.batch, gg, h, mm2, nm2)
            img = np.asarray(jnp.clip(o.color, 0, 1) * 255).astype(
                np.uint8).transpose(1, 2, 0)
            path = os.path.join(GOLD_DIR, f"{name}.png")
            if args.update or not os.path.exists(path):
                save_png(path, img, already_u8=True)
                try:
                    commit = subprocess.run(
                        ["git", "rev-parse", "HEAD"], cwd=GOLD_DIR,
                        capture_output=True, text=True).stdout.strip()
                except Exception:
                    commit = "unknown"
                # provenance sidecar (ADVICE r3 low): proves the PNGs
                # pin Mosaic/chip behaviour, not CPU interpret output
                manifest[name] = {
                    "backend": backend,
                    "device": str(jax.devices()[0]),
                    "interpret": bool(interp),
                    "warmup_frames": WARMUP,
                    "git_commit": commit,
                    "written_utc":
                        datetime.datetime.utcnow().isoformat() + "Z",
                }
                with open(manifest_path, "w") as f:
                    json.dump(manifest, f, indent=1, sort_keys=True)
                print(f"[gold] wrote {path}", flush=True)
                continue
            prov = manifest.get(name)
            if prov is None or prov.get("interpret") or \
                    prov.get("backend") not in ("tpu", "axon"):
                check(f"golden-{name}-provenance", False,
                      f"golden was not chip-generated ({prov}); re-run "
                      "verify_chip --update on the real TPU")
                continue
            if prov.get("warmup_frames") != WARMUP:
                check(f"golden-{name}-provenance", False,
                      f"golden captured at warmup={prov.get('warmup_frames')}"
                      f" but the tool now warms up {WARMUP}; --update")
                continue
            want = np.asarray(Image.open(path).convert("RGB"))
            d = np.abs(img.astype(np.float32) - want.astype(np.float32))
            mean, p99 = d.mean(), np.percentile(d, 99)
            # tolerance scales with the golden's own brightness so a
            # dark golden can't degenerate into a vacuous check (an
            # all-black frame must FAIL against a lit golden)
            gmean = want.astype(np.float32).mean()
            mean_tol = min(2.0, max(0.5, 0.04 * gmean))
            check(f"golden-{name}", mean < mean_tol and p99 < 12.0,
                  f"mean {mean:.3f} (tol {mean_tol:.2f}, golden mean "
                  f"{gmean:.1f}) p99 {p99:.1f} (u8)")

    print(("ALL OK" if not FAILURES else
           f"{len(FAILURES)} FAILURES: {FAILURES}"), flush=True)
    return 0 if not FAILURES else 1


if __name__ == "__main__":
    sys.exit(main())
