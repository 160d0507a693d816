#!/usr/bin/env python
"""Attribute the texsample Pallas kernel's cost (DMA vs U/Vw construct
vs matmuls vs grid overhead) with ablated kernel variants on the chip.

Uses the captured /tmp/texfields.npz fields like bench_texsample.py.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, n=8, label=""):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    s = jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum().astype("float32"), out, 0.0)
    float(s)
    ms = (time.perf_counter() - t0) * 1e3 / n
    print(f"{label:34s} {ms:8.2f} ms", flush=True)
    return ms


def make_variant(*, do_dma=True, do_u=True, do_mm1=True, do_vw=True,
                 do_mm2=True, win_r=None, mm2_mode="lhs", tps=1):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from soc_real_time_renderer_tpu.ops import texsample as ts

    WIN_R = ts.WIN_R if win_r is None else win_r
    R_TOTAL = ts.NBLK * WIN_R
    CH, P, NBLK, WIN_LANES = ts.CH, ts.P, ts.NBLK, ts.WIN_LANES
    ROW_AL = ts.ROW_AL
    out_pc = mm2_mode in ("rhs", "fold")   # (P, CH) output layout

    def kernel(meta_ref, perpx_ref, page_ref, out_ref, w_buf, sem):
        STRIDE = 1 + NBLK * 2
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        slot = jax.lax.rem(g, 2)

        def block_dma(tile, buf_slot, ti, b):
            base = tile * STRIDE + 1 + b * 2
            r = pl.multiple_of(meta_ref[base], ROW_AL)
            c = pl.multiple_of(meta_ref[base + 1], 128)
            return pltpu.make_async_copy(
                page_ref.at[pl.ds(r, WIN_R), pl.ds(c, WIN_LANES)],
                w_buf.at[buf_slot, ti, pl.ds(b * WIN_R, WIN_R), :],
                sem.at[buf_slot, ti, b])

        def start_group(grp, buf_slot):
            for ti in range(tps):
                tile = grp * tps + ti
                n = meta_ref[tile * STRIDE]
                for b in range(NBLK):
                    @pl.when(b < n)
                    def _():
                        block_dma(tile, buf_slot, ti, b).start()

        @pl.when(g == 0)
        def _():
            w_buf[...] = jnp.zeros_like(w_buf)
            if do_dma:
                start_group(0, 0)

        if do_dma:
            @pl.when(g + 1 < ng)
            def _():
                start_group(g + 1, 1 - slot)

        for ti in range(tps):
            if do_dma:
                n_cur = meta_ref[(g * tps + ti) * STRIDE]
                for b in range(NBLK):
                    @pl.when(b < n_cur)
                    def _():
                        block_dma(g * tps + ti, slot, ti, b).wait()

            W = w_buf[slot, ti]
            rI0 = perpx_ref[0, ti * 4 + 0, :][:, None]
            fv = perpx_ref[0, ti * 4 + 1, :][:, None]
            u0 = perpx_ref[0, ti * 4 + 2, :][:, None]
            fu = perpx_ref[0, ti * 4 + 3, :][:, None]

            if do_u:
                rIi = rI0.astype(jnp.int32)
                iR = jax.lax.broadcasted_iota(jnp.int32, (1, R_TOTAL), 1)
                U = ((iR == rIi).astype(jnp.float32) * (1.0 - fv)
                     + (iR == rIi + 1).astype(jnp.float32) * fv)
            else:
                U = fv * jnp.ones((P, R_TOTAL), jnp.float32)

            if do_mm1:
                rowsel = jax.lax.dot_general(
                    U.astype(jnp.bfloat16), W, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                rowsel = U[:, :WIN_LANES] if R_TOTAL >= WIN_LANES else \
                    jnp.concatenate([U] * (WIN_LANES // R_TOTAL), axis=1)

            if do_vw:
                u0i = u0.astype(jnp.int32)
                texel = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, WIN_LANES), 1) // CH)
                Vw = ((texel == u0i).astype(jnp.float32) * (1.0 - fu)
                      + (texel == u0i + 1).astype(jnp.float32) * fu)
                tmp = (rowsel * Vw).astype(jnp.bfloat16)
            else:
                tmp = (rowsel * fu).astype(jnp.bfloat16)

            if not do_mm2:
                out = tmp[:, :CH].T.astype(jnp.float32)
                out_ref[0, ti] = out[:, :CH].T if out_pc else out
            elif mm2_mode == "lhs":
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (WIN_LANES, CH), 0)
                chan = jax.lax.broadcasted_iota(
                    jnp.int32, (WIN_LANES, CH), 1)
                sel = (lane % CH == chan).astype(jnp.bfloat16)
                out_ref[0, ti] = jax.lax.dot_general(
                    sel, tmp, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mm2_mode == "rhs":
                # native MXU form: A=tmp (P, K=LANES), B=sel (K, CH)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (WIN_LANES, CH), 0)
                chan = jax.lax.broadcasted_iota(
                    jnp.int32, (WIN_LANES, CH), 1)
                sel = (lane % CH == chan).astype(jnp.bfloat16)
                out_ref[0, ti] = jax.lax.dot_general(
                    tmp, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:  # fold: binary lane-fold reduction over the texel axis
                acc = tmp.astype(jnp.float32)
                s = WIN_LANES // 2
                while s >= CH:
                    acc = acc + pltpu.roll(acc, shift=-s, axis=1)
                    s //= 2
                out_ref[0, ti] = acc[:, :CH]

    def run(page_arr, meta, perpx):
        NT = perpx.shape[0]
        # pack tps tiles' perpx rows into one block row
        perpx_g = perpx.reshape(NT // tps, tps * 4, P)
        oshape = (NT // tps, tps) + ((P, CH) if out_pc else (CH, P))
        oblk = (1, tps) + ((P, CH) if out_pc else (CH, P))
        gspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT // tps,),
            in_specs=[
                pl.BlockSpec((1, tps * 4, P), lambda t, meta: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                oblk, lambda t, meta: (t, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tps, R_TOTAL, WIN_LANES), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, tps, NBLK)),
            ],
        )
        return pl.pallas_call(
            kernel, grid_spec=gspec,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        )(meta, perpx_g, page_arr)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="full")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--fields", default="/tmp/texfields.npz",
                    help="npz from tools/capture_texfields.py at the "
                         "same scene/resolution")
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
    page = jax.device_put(built.batch.atlas_page)

    d = np.load(args.fields)
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

    perpx, dma, n_used, dirty, _ = jax.jit(functools.partial(
        ts._plan_tiles_impl, size=plan.atlas_size,
        n_levels=plan.atlas_n_levels,
        num_materials=plan.atlas_num_materials))(
        mid_t, u_t, v_t, lvl, live_t, page.row0, page.col0)
    n_used0 = jnp.where(dirty, 0, n_used)
    meta = jnp.concatenate(
        [n_used0[:, None], dma.reshape(NT, ts.NBLK * 2)],
        axis=1).reshape(-1).astype(jnp.int32)
    perpx = jax.device_put(perpx)
    meta = jax.device_put(meta)

    variants = [
        ("warmup (discard)", dict()),
        ("full kernel (mm2=lhs tps=1)", dict()),
        ("mm2=rhs (P,CH out)", dict(mm2_mode="rhs")),
        ("mm2=fold (lane rolls)", dict(mm2_mode="fold")),
        ("tps=2", dict(tps=2)),
        ("tps=4", dict(tps=4)),
        ("mm2=rhs tps=4", dict(mm2_mode="rhs", tps=4)),
        ("mm2=fold tps=4", dict(mm2_mode="fold", tps=4)),
        ("no DMA", dict(do_dma=False)),
        ("no U construct (const U)", dict(do_u=False)),
        ("no mm1 (skip row matmul)", dict(do_mm1=False)),
        ("no Vw (const col weight)", dict(do_vw=False)),
        ("no mm2 (slice channels)", dict(do_mm2=False)),
        ("only DMA (no compute)", dict(do_u=False, do_mm1=False,
                                       do_vw=False, do_mm2=False)),
        ("nothing (grid overhead)", dict(do_dma=False, do_u=False,
                                         do_mm1=False, do_vw=False,
                                         do_mm2=False)),
        ("nothing tps=4", dict(do_dma=False, do_u=False,
                               do_mm1=False, do_vw=False,
                               do_mm2=False, tps=4)),
    ]
    ref = None
    for label, kw in variants:
        run = make_variant(**kw)
        try:
            ms = timed(run, page.page, meta, perpx, label=label)
            full = all(kw.get(k, True) for k in
                       ("do_dma", "do_u", "do_mm1", "do_vw", "do_mm2"))
            if full:
                out = jax.jit(run)(page.page, meta, perpx)
                o = np.asarray(out)
                o = (o.transpose(0, 1, 3, 2) if kw.get("mm2_mode")
                     in ("rhs", "fold") else o)
                o = o.reshape(-1, ts.CH, ts.P)
                if ref is None:
                    ref = o
                else:
                    err = np.abs(o - ref).max()
                    if err > 1e-3:
                        print(f"   ^ OUTPUT MISMATCH vs lhs: {err}")
        except Exception as e:  # noqa: BLE001
            print(f"{label:34s} FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
