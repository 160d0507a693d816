"""SSAO: 26-sample hemisphere occlusion + 4x4 box blur, half resolution.

Port of ``ssao_generation.inl:71-217`` and ``ssao_blur.inl:73-109``:
the exact hardcoded kernel, the procedural value-noise random vector
(``:184-192``), view-space depth comparison with smoothstep range check
and bias (``:194-211``), ``occlusion = 1 - sum/kernel_size``; the blur
averages the 4x4 neighbourhood with offsets in [-2, 1] (``:91-105``).
Rendered at half resolution like the reference (renderer.cpp:827-831).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import sampling

KERNEL = jnp.array([  # ssao_generation.inl:76-103 (26 samples)
    [0.2196607, 0.9032637, 0.2254677],
    [0.05916681, 0.2201506, 0.1430302],
    [-0.4152246, 0.1320857, 0.7036734],
    [-0.3790807, 0.1454145, 0.100605],
    [0.3149606, -0.1294581, 0.7044517],
    [-0.1108412, 0.2162839, 0.1336278],
    [0.658012, -0.4395972, 0.2919373],
    [0.5377914, 0.3112189, 0.426864],
    [-0.2752537, 0.07625949, 0.1273409],
    [-0.1915639, -0.4973421, 0.3129629],
    [-0.2634767, 0.5277923, 0.1107446],
    [0.8242752, 0.02434147, 0.06049098],
    [0.06262707, -0.2128643, 0.03671562],
    [-0.1795662, -0.3543862, 0.07924347],
    [0.06039629, 0.24629, 0.4501176],
    [-0.7786345, -0.3814852, 0.2391262],
    [0.2792919, 0.2487278, 0.05185341],
    [0.1841383, 0.1696993, 0.8936281],
    [-0.3479781, 0.4725766, 0.719685],
    [-0.1365018, -0.2513416, 0.470937],
    [0.1280388, -0.563242, 0.3419276],
    [-0.4800232, -0.1899473, 0.2398808],
    [0.6389147, 0.1191014, 0.5271206],
    [0.1932822, -0.3692099, 0.6060588],
    [-0.3465451, -0.1654651, 0.6746758],
    [0.2448421, -0.1610962, 0.1289366]], jnp.float32)


def _rand(cu, cv):
    """ssao_generation.inl:139-141 (planar components)."""
    return jnp.mod(jnp.sin(cu * 12.9898 + cv * 78.233) * 43758.5453, 1.0)


def _noise(u, v, freq):
    """Value noise, ssao_generation.inl:143-156 (planar components)."""
    unit = 2560.0 / freq
    iu = jnp.floor(u / unit)
    iv = jnp.floor(v / unit)
    xu = jnp.mod(u, unit) / unit
    xv = jnp.mod(v, unit) / unit
    xu = 0.5 * (1.0 - jnp.cos(jnp.pi * xu))
    xv = 0.5 * (1.0 - jnp.cos(jnp.pi * xv))
    a = _rand(iu, iv)
    b = _rand(iu + 1.0, iv)
    c = _rand(iu, iv + 1.0)
    d = _rand(iu + 1.0, iv + 1.0)
    x1 = a + (b - a) * xu
    x2 = c + (d - c) * xu
    return x1 + (x2 - x1) * xv


def _preamble(depth, normal, g, dense_resample: bool = False,
              row0_half=None, full_h: int | None = None):
    """Shared per-half-res-pixel setup (ssao_generation.inl:174-192):
    view-space fragment position + procedural-noise TBN.

    dense_resample: the half-res taps at half-pixel centres are EXACTLY
    the 2x2 mean, so resize_half is an exact gather-free rewrite of the
    bilinear sample_screen.  Only safe when the consumer materializes
    its inputs (the Pallas tail); inside the fused XLA tail the pooled
    operand gets recomputed per tap (-144 ms regression, PERF.md).

    row0_half / full_h: multi-chip row-band support (SPMD shard_map,
    parallel/halo.py): `depth` is a halo-padded row band whose first
    row is GLOBAL half-res row `row0_half` of a `full_h`-row screen.
    The uv grid (view reconstruction + noise pattern) must use global
    coordinates so each shard computes exactly what the single-chip
    kernel computes.
    """
    from . import sampling
    from .composition import view_from_depth
    from ..utils.vec import dot3, normalize3, cross3
    H, W = depth.shape
    h, w = H // 2, W // 2
    uv = sampling.grid_uv(h, w)                          # (2, h, w)
    if row0_half is not None:
        hh = full_h // 2
        vglob = ((jnp.arange(h, dtype=jnp.float32) + 0.5
                  + row0_half.astype(jnp.float32)) / hh)
        # halo rows outside the screen (edge shards) take the edge
        # row's uv: their depth is edge-replicated by parallel/halo.py,
        # so clamping v too reproduces the single-chip screen-edge
        # clamp EXACTLY (same frag_pos at every clamped tap)
        vglob = jnp.clip(vglob, 0.5 / hh, (hh - 0.5) / hh)
        uv = jnp.stack([uv[0], jnp.broadcast_to(vglob[:, None], (h, w))])

    if dense_resample:
        import jax
        d = jax.lax.optimization_barrier(
            sampling.resize_half(depth[:h * 2, :w * 2]))
        n_half = jax.lax.optimization_barrier(
            sampling.resize_half(normal[:, :h * 2, :w * 2]))
    else:
        d = sampling.sample_screen(depth, uv)
        n_half = sampling.sample_screen(normal, uv)
    frag_pos = view_from_depth(uv, d, g.camera.inv_projection)  # (3, h, w)
    n_world = normalize3(n_half)
    vm = g.camera.view[:3, :3]
    normal_v = jnp.stack([
        vm[0, 0] * n_world[0] + vm[0, 1] * n_world[1] + vm[0, 2] * n_world[2],
        vm[1, 0] * n_world[0] + vm[1, 1] * n_world[1] + vm[1, 2] * n_world[2],
        vm[2, 0] * n_world[0] + vm[2, 1] * n_world[1] + vm[2, 2] * n_world[2]])

    # random vector (ssao_generation.inl:184-192); noise_dim = full width
    rx = _noise(uv[0], uv[1], W * 2.0)
    ry = _noise(uv[0] ** 1.1, uv[1] ** 1.1,
                jnp.power(W * 4.2, 1.5 + uv[0] / 10.0))
    rv = jnp.stack([rx, ry, jnp.zeros_like(rx)])
    rv = normalize3(rv)

    tangent = normalize3(rv - normal_v * dot3(rv, normal_v)[None])
    bitangent = cross3(tangent, normal_v)
    return frag_pos, tangent, bitangent, normal_v


def ssao_generate(depth, normal, g, kernel_size: int = 26):
    """depth: (H, W) full-res; normal: (3, H, W) full-res world normals;
    output: (H/2, W/2) occlusion (half-res like renderer.cpp:827-831).

    Planar port of ssao_generation.inl:174-214: view-space hemisphere
    sampling with the hardcoded kernel, procedural-noise random vector,
    smoothstep range check, occlusion = 1 - sum/kernel_size.
    """
    from . import sampling
    H, W = depth.shape
    h, w = H // 2, W // 2
    frag_pos, tangent, bitangent, normal_v = _preamble(depth, normal, g)
    proj = g.camera.projection

    # All 26 hemisphere taps vectorized into ONE flat gather: index math
    # inside lax.scan bodies explodes the TPU compiler (PERF.md), and a
    # single (K, h, w) gather is also fastest at runtime.
    k = KERNEL[:kernel_size]                                  # (K, 3)
    sp_x = (tangent[0][None] * k[:, 0, None, None]
            + bitangent[0][None] * k[:, 1, None, None]
            + normal_v[0][None] * k[:, 2, None, None])
    sp_y = (tangent[1][None] * k[:, 0, None, None]
            + bitangent[1][None] * k[:, 1, None, None]
            + normal_v[1][None] * k[:, 2, None, None])
    sp_z = (tangent[2][None] * k[:, 0, None, None]
            + bitangent[2][None] * k[:, 1, None, None]
            + normal_v[2][None] * k[:, 2, None, None])
    sx = frag_pos[0][None] + sp_x * g.ssao_radius             # (K, h, w)
    sy = frag_pos[1][None] + sp_y * g.ssao_radius
    sz = frag_pos[2][None] + sp_z * g.ssao_radius

    ox = proj[0, 0] * sx + proj[0, 1] * sy + proj[0, 2] * sz + proj[0, 3]
    oy = proj[1, 0] * sx + proj[1, 1] * sy + proj[1, 2] * sz + proj[1, 3]
    ow = proj[3, 0] * sx + proj[3, 1] * sy + proj[3, 2] * sz + proj[3, 3]
    ows = jnp.where(ow != 0, ow, 1.0)
    ou = ox / ows * 0.5 + 0.5
    ov = oy / ows * 0.5 + 0.5

    Hf, Wf = depth.shape
    xi = jnp.clip((ou * Wf - 0.5).astype(jnp.int32), 0, Wf - 1)
    yi = jnp.clip((ov * Hf - 0.5).astype(jnp.int32), 0, Hf - 1)
    # barrier: keep XLA from fusing the whole tap-position chain into
    # the gather (fusion analysis on chained gathers hangs the TPU
    # compiler — PERF.md)
    idx = jax.lax.optimization_barrier(yi * Wf + xi)
    sd = depth.reshape(-1)[idx]                               # (K, h, w)

    # view-space z of the sampled depth (view_from_depth z-row inlined)
    P = g.camera.inv_projection
    nx = ou * 2.0 - 1.0
    ny = ov * 2.0 - 1.0
    vz = P[2, 0] * nx + P[2, 1] * ny + P[2, 2] * sd + P[2, 3]
    vw = P[3, 0] * nx + P[3, 1] * ny + P[3, 2] * sd + P[3, 3]
    sample_depth = vz / jnp.where(vw != 0, vw, 1.0)

    denom = jnp.maximum(jnp.abs(frag_pos[2][None] - sample_depth), 1e-8)
    t = jnp.clip(g.ssao_radius / denom, 0.0, 1.0)
    range_check = t * t * (3.0 - 2.0 * t)                     # smoothstep
    hit = sample_depth >= sz + g.ssao_bias
    occlusion = jnp.sum(hit.astype(jnp.float32) * range_check, axis=0)
    return 1.0 - occlusion / float(kernel_size)


def ssao_blur(ssao):
    """4x4 box blur, offsets [-2, 1] at own-res texel steps
    (ssao_blur.inl:91-105) — pure shifts."""
    from . import sampling
    acc = jnp.zeros_like(ssao)
    for x in range(-2, 2):
        for y in range(-2, 2):
            acc = acc + sampling.shift(ssao, x, y)
    return acc / 16.0


# ---------------------------------------------------------------------------
# Pallas windowed SSAO (the production TPU path)
# ---------------------------------------------------------------------------
#
# The XLA tail above spends 26 taps x h*w gather indices at ~6.3 ns/idx
# (114.5 ms of the 312 ms full-config 1080p frame, PERF.md) — the XLA
# gather is the hardware floor for *global* random access.  But every
# SSAO tap lands within a bounded screen-space window of its pixel, so
# the kernel below makes the access LOCAL:
#
#   per (8, 128) half-res output tile
#     DMA a (WR, WL) HALF-RES view-z window (f32) into VMEM and split it
#     to a stacked bf16 hi/lo pair in-registers (bf16 view-z alone is
#     far too coarse for the depth compare; hi + lo recovers ~16
#     mantissa bits);
#     for each of the 26 hemisphere taps
#       compute the tap's half-res texel (same projection math as the
#       XLA tail) and gather it from the window with an MXU ONE-HOT
#       GATHER:
#         lanes: win(2*WR, WL)bf16 @ onehot(WL, 128)bf16 -> (2*WR, 128)
#         rows:  mask-and-reduce over WR with a row one-hot
#       (Mosaic has no big-table gather; the systolic array is the
#        fastest arbitrary-index machine on the chip — measured cost
#        scales with window AREA, which is why the table is the
#        half-res view-z: same angular margins, 1/4 the texels of the
#        full-res window this kernel first shipped with.)
#
# Deviations from the XLA tail (both visually negligible post 4x4 blur,
# and RenderConfig.ssao_impl="xla" keeps the exact path):
#   * occluder depth comes from the half-res (2x2-mean) depth — the
#     same field frag_pos is built from — instead of full-res point
#     samples;
#   * taps whose projected radius exceeds the window margins
#     (rows -48/+64, lanes ±256 in full-res pixels at the defaults)
#     clamp to the window edge (very close geometry only).


def _ssao_kernel(params_ref, kern_ref, planes_ref, vz_ref, out_ref,
                 win, winhl, sem, *, K, WR, WL, MY, MX, hp, wp, w_true,
                 h_true, h_glob):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    # offsets must be PROVABLY tile-aligned for the dynamic-slice DMA
    # (f32 tiling (8, 128)): MY / MX and the clamp bounds are multiples
    # of 8 / 128, but Mosaic can't see that through clip — assert it.
    oy = pl.multiple_of(jnp.clip(ty * 8 - MY, 0, hp - WR), 8)
    ox = pl.multiple_of(jnp.clip(tx * 128 - MX, 0, wp - WL), 128)

    dma = pltpu.make_async_copy(
        vz_ref.at[pl.ds(oy, WR), pl.ds(ox, WL)], win, sem)
    dma.start()

    planes = planes_ref[:]                      # (12, 8, 128) f32
    frag = planes[0:3]
    Av, Bv, Cv = planes[3:6], planes[6:9], planes[9:12]
    p = [params_ref[i] for i in range(15)]
    radius, bias = p[12], p[13]
    row0 = p[14]  # global half-res row of this band's first row (SPMD)

    iL = jax.lax.broadcasted_iota(jnp.int32, (WL, 128), 0)
    iR = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 0)

    dma.wait()
    wf = win[:]                                 # (WR, WL) f32
    hi = wf.astype(jnp.bfloat16)
    winhl[0:WR] = hi
    winhl[WR:2 * WR] = (wf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    whl = winhl[:]                              # (2*WR, WL) bf16

    def tap(k, acc):
        kx, ky, kz = kern_ref[k, 0], kern_ref[k, 1], kern_ref[k, 2]
        sx = frag[0] + Av[0] * kx + Bv[0] * ky + Cv[0] * kz
        sy = frag[1] + Av[1] * kx + Bv[1] * ky + Cv[1] * kz
        sz = frag[2] + Av[2] * kx + Bv[2] * ky + Cv[2] * kz
        ow_ = p[8] * sx + p[9] * sy + p[10] * sz + p[11]
        ows = jnp.where(ow_ != 0, ow_, 1.0)
        ou = (p[0] * sx + p[1] * sy + p[2] * sz + p[3]) / ows * 0.5 + 0.5
        ov = (p[4] * sx + p[5] * sy + p[6] * sz + p[7]) / ows * 0.5 + 0.5
        # point-sample the half-res table: texel = floor(u * w) (the
        # XLA tail's trunc(u*W - 0.5) at full res carries a half-texel
        # bias; at half res that bias would be a full-res texel)
        xi = jnp.clip(jnp.floor(ou * w_true).astype(jnp.int32), 0,
                      w_true - 1)
        # ov is GLOBAL screen uv: texel vs the full screen, then into
        # band-local rows (row0 = 0 single-chip); the clamp to the
        # band edge reproduces the screen-edge clamp since halos cover
        # the window margins (parallel/halo.py)
        yi = jnp.clip(jnp.floor(ov * h_glob).astype(jnp.int32)
                      - row0.astype(jnp.int32), 0, h_true - 1)
        wx = jnp.clip(xi - ox, 0, WL - 1)       # (8, 128)
        wy = jnp.clip(yi - oy, 0, WR - 1)

        # all 8 sublanes in ONE (2WR, WL) @ (WL, 1024) matmul — same
        # MACs as the 8 per-sublane matmuls, 8x fewer MXU dispatches
        # (dispatch overhead is first-order at 26 taps/tile; the sky
        # kernel documents the same packing)
        ohL = jnp.concatenate(
            [(iL == wx[s:s + 1, :]).astype(jnp.bfloat16)
             for s in range(8)], axis=1)                     # (WL, 1024)
        C2 = jax.lax.dot_general(
            whl, ohL, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (2WR, 1024)
        Chl = C2[:WR] + C2[WR:]                              # hi + lo
        ohR = jnp.concatenate(
            [iR == wy[s:s + 1, :] for s in range(8)], axis=1)  # (WR, 1024)
        vz = jnp.sum(jnp.where(ohR, Chl, 0.0), axis=0).reshape(8, 128)

        denom = jnp.maximum(jnp.abs(frag[2] - vz), 1e-8)
        t = jnp.clip(radius / denom, 0.0, 1.0)
        rc = t * t * (3.0 - 2.0 * t)
        hit = vz >= sz + bias
        return acc + jnp.where(hit, rc, 0.0)

    acc = jax.lax.fori_loop(0, K, tap, jnp.zeros((8, 128), jnp.float32))
    out_ref[:] = 1.0 - acc / K


def ssao_generate_pallas(depth, normal, g, kernel_size: int = 26,
                         interpret: bool | None = None,
                         window_rows: int = 64, window_lanes: int = 384,
                         row0_half=None, full_h: int | None = None):
    """Pallas windowed SSAO — same contract as :func:`ssao_generate`.

    row0_half / full_h: row-band mode for SPMD sharding — `depth` is a
    halo-padded band starting at global half-res row `row0_half` of a
    `full_h`-row screen (see parallel/halo.py)."""
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    H, W = depth.shape
    if H % 2 or W % 2:
        # dense_resample's reshape-mean half-res equals the reference's
        # bilinear half-res taps only for even dimensions (ADVICE round
        # 2); all shipped configs pad to even — fall back to the exact
        # gather path rather than silently deviating.
        assert row0_half is None, "row-band mode requires even bands"
        return ssao_generate(depth, normal, g, kernel_size)
    h, w = H // 2, W // 2
    frag_pos, tangent, bitangent, normal_v = _preamble(
        depth, normal, g, dense_resample=True,
        row0_half=row0_half, full_h=full_h)

    # the gather table IS frag_pos.z: per-texel half-res view z
    viewz = frag_pos[2]

    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    WL = min(window_lanes, wp)
    WR = min(window_rows, hp)
    MY = (WR - 8) // 2 // 8 * 8        # 8-aligned row margin (24 @ WR=64)
    MX = (WL - 128) // 2 // 128 * 128  # 128-aligned lane margin

    r = g.ssao_radius
    planes = jnp.concatenate([
        frag_pos, tangent * r, bitangent * r, normal_v * r], axis=0)
    planes = jnp.pad(planes, ((0, 0), (0, hp - h), (0, wp - w)))
    viewz = jnp.pad(viewz, ((0, hp - h), (0, wp - w)))

    proj = g.camera.projection
    row0 = (jnp.float32(0.0) if row0_half is None
            else row0_half.astype(jnp.float32))
    h_glob = h if full_h is None else full_h // 2
    params = jnp.concatenate([
        proj[0], proj[1], proj[3],
        jnp.stack([g.ssao_radius, g.ssao_bias, row0])]).astype(jnp.float32)
    kern = KERNEL[:kernel_size]

    kernel = functools.partial(
        _ssao_kernel, K=kernel_size, WR=WR, WL=WL, MY=MY, MX=MX, hp=hp,
        wp=wp, w_true=w, h_true=h, h_glob=h_glob)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(hp // 8, wp // 128),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),       # params (15,)
                pl.BlockSpec(memory_space=pltpu.SMEM),       # kern (K, 3)
                pl.BlockSpec((12, 8, 128), lambda ty, tx: (0, ty, tx),
                             memory_space=pltpu.VMEM),       # planes
                pl.BlockSpec(memory_space=pl.ANY),           # viewz (HBM)
            ],
            out_specs=pl.BlockSpec((8, 128), lambda ty, tx: (ty, tx),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((WR, WL), jnp.float32),
                pltpu.VMEM((2 * WR, WL), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(params, kern, planes, viewz)
    return out[:h, :w]
