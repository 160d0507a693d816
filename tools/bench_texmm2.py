#!/usr/bin/env python
"""Focused mm2-strategy shootout for the texsample kernel.

Variants (all share DMA + U + mm1 + Vw from the production kernel):
  lhs    — production: out (CH,P) = sel(768,CH) ^T-contracted with tmp
  pad    — out (P,128) = tmp @ sel128, channel slice done by XLA
  padb   — pad with bf16 output
  fold   — binary lane-fold (positive shifts), out (P,128) slice
  floor  — write zeros after DMA+mm1 (true lower bound w/o mm2)
"""
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
    s = jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum().astype("float32"), out, 0.0)
    float(s)  # force completion of warmup incl. first-touch paging
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    s = jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum().astype("float32"), out, 0.0)
    float(s)
    ms = (time.perf_counter() - t0) * 1e3 / n
    print(f"{label:30s} {ms:8.2f} ms", flush=True)
    return ms


def make(mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from soc_real_time_renderer_tpu.ops import texsample as ts

    WIN_R, R_TOTAL = ts.WIN_R, ts.NBLK * ts.WIN_R
    CH, P, NBLK, WIN_LANES = ts.CH, ts.P, ts.NBLK, ts.WIN_LANES
    ROW_AL = ts.ROW_AL
    OUT = {"lhs": (CH, P), "pad": (P, 128), "padb": (P, 128),
           "fold": (P, 128), "floor": (CH, P)}[mode]
    ODT = jnp.bfloat16 if mode == "padb" else jnp.float32

    def kernel(meta_ref, perpx_ref, page_ref, out_ref, w_buf, sem):
        STRIDE = 1 + NBLK * 2
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = jax.lax.rem(t, 2)

        def block_dma(tile, buf_slot, b):
            base = tile * STRIDE + 1 + b * 2
            r = pl.multiple_of(meta_ref[base], ROW_AL)
            c = pl.multiple_of(meta_ref[base + 1], 128)
            return pltpu.make_async_copy(
                page_ref.at[pl.ds(r, WIN_R), pl.ds(c, WIN_LANES)],
                w_buf.at[buf_slot, pl.ds(b * WIN_R, WIN_R), :],
                sem.at[buf_slot, b])

        def start_tile(tile, buf_slot):
            n = meta_ref[tile * STRIDE]
            for b in range(NBLK):
                @pl.when(b < n)
                def _():
                    block_dma(tile, buf_slot, b).start()

        @pl.when(t == 0)
        def _():
            w_buf[...] = jnp.zeros_like(w_buf)
            start_tile(0, 0)

        @pl.when(t + 1 < nt)
        def _():
            start_tile(t + 1, 1 - slot)

        n_cur = meta_ref[t * STRIDE]
        for b in range(NBLK):
            @pl.when(b < n_cur)
            def _():
                block_dma(t, slot, b).wait()

        W = w_buf[slot]
        rI0 = perpx_ref[0, 0, :][:, None]
        fv = perpx_ref[0, 1, :][:, None]
        u0 = perpx_ref[0, 2, :][:, None]
        fu = perpx_ref[0, 3, :][:, None]

        rIi = rI0.astype(jnp.int32)
        iR = jax.lax.broadcasted_iota(jnp.int32, (1, R_TOTAL), 1)
        U = ((iR == rIi).astype(jnp.float32) * (1.0 - fv)
             + (iR == rIi + 1).astype(jnp.float32) * fv)
        rowsel = jax.lax.dot_general(
            U.astype(jnp.bfloat16), W, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        if mode == "floor":
            out_ref[0] = jnp.zeros(OUT, ODT) + rowsel[0, 0]
            return

        u0i = u0.astype(jnp.int32)
        texel = (jax.lax.broadcasted_iota(
            jnp.int32, (1, WIN_LANES), 1) // CH)
        Vw = ((texel == u0i).astype(jnp.float32) * (1.0 - fu)
              + (texel == u0i + 1).astype(jnp.float32) * fu)
        tmp = (rowsel * Vw).astype(jnp.bfloat16)

        if mode == "lhs":
            lane = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, CH), 0)
            chan = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, CH), 1)
            sel = (lane % CH == chan).astype(jnp.bfloat16)
            out_ref[0] = jax.lax.dot_general(
                sel, tmp, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode in ("pad", "padb"):
            lane = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, 128), 0)
            chan = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, 128), 1)
            sel = ((lane % CH == chan) & (chan < CH)).astype(jnp.bfloat16)
            out_ref[0] = jax.lax.dot_general(
                tmp, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(ODT)
        else:  # fold
            acc = tmp.astype(jnp.float32)
            s = WIN_LANES // 2
            while s >= CH:
                acc = acc + pltpu.roll(acc, shift=WIN_LANES - s, axis=1)
                s //= 2
            out_ref[0] = acc[:, :128]

    def run(page_arr, meta, perpx):
        NT = perpx.shape[0]
        gspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((1, 4, P), lambda t, meta: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1,) + OUT, lambda t, meta: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, R_TOTAL, WIN_LANES), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, NBLK)),
            ],
        )
        return pl.pallas_call(
            kernel, grid_spec=gspec,
            out_shape=jax.ShapeDtypeStruct((NT,) + OUT, ODT),
        )(meta, perpx, page_arr)

    return run


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from soc_real_time_renderer_tpu.utils import compile_cache
    compile_cache.enable()

    from soc_real_time_renderer_tpu import scenes
    from soc_real_time_renderer_tpu.config import RenderConfig
    from soc_real_time_renderer_tpu.ops import texsample as ts

    H, W = 1088, 1920
    built = scenes.build("full", RenderConfig(width=W, height=H),
                         build_page=True)
    plan = built.plan
    page = jax.device_put(built.batch.atlas_page)

    d = np.load("/tmp/texfields.npz")
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

    ref = None
    for mode in ["lhs", "lhs", "pad", "padb", "fold", "floor"]:
        run = make(mode)
        try:
            timed(run, page.page, meta, perpx, label=f"mm2={mode}")
            if mode == "floor":
                continue
            o = np.asarray(jax.jit(run)(page.page, meta, perpx),
                           dtype=np.float32)
            if o.shape[1] == ts.P:      # (NT, P, 128) -> (NT, CH, P)
                o = o[:, :, :ts.CH].transpose(0, 2, 1)
            if ref is None:
                ref = o
            else:
                err = np.abs(o - ref).max()
                tag = "OK" if err <= 1.0 else "MISMATCH"
                print(f"   parity vs lhs: max err {err:.4f} [{tag}]")
        except Exception as e:  # noqa: BLE001
            print(f"mm2={mode:26s} FAILED: {type(e).__name__} "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
