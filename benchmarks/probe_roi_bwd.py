#!/usr/bin/env python
"""Attribution probe for the RoI-pool backward kernel (dev tool).

Times STRIPPED variants of the windowed-scatter backward to attribute its
measured cost (13.3 ms at the b8x128 train shape vs a ~2.6 ms VPU bound):

  base     - the shipping kernel, unchanged
  nocount  - even-split count/scale removed (WRONG grads; times the two
             window passes the count costs)
  static   - dynamic 8-aligned window starts replaced by column 0 (WRONG
             grads; times Mosaic's dynamic-slice handling)
  nodband  - per-pw RMW straight into the dfeat block, no dband scratch
             (same semantics; times the band zero + band RMW per ph)
  fullband - no column windows: every pw compares against the full-width
             band (same semantics; times the window machinery itself)
  fullband_val - fullband, but the per-ph accumulator is an SSA value
             chain instead of dband scratch RMW (same semantics; lets
             Mosaic register-allocate the accumulation)

Usage: python benchmarks/probe_roi_bwd.py [--variants base nocount ...]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rois", type=int, default=128)
    ap.add_argument("--h", type=int, default=38)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--out_size", type=int, default=7)
    ap.add_argument("--spatial_scale", type=float, default=1.0 / 16.0)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--variants", nargs="+",
                    default=["base", "nocount", "static", "nodband",
                             "fullband"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from trcnn.ops.roi_pool import max_bin_extent, roi_bin_bounds
    from trcnn.ops import roi_pool_pallas as rpp_mod

    def kern_variant(bounds_ref, feat_ref, pooled_ref, g_ref, dfeat_ref,
                     dband_ref, *, out_size, mbh, mbw, feat_h, feat_w,
                     feat_c, num_rois, rois_per_program, variant):
        b = pl.program_id(0)
        rg = pl.program_id(2)
        use_window = (variant not in ("fullband", "fullband_val")
                      and mbw < feat_w)
        win_w = mbw if use_window else feat_w
        col_idx = lax.broadcasted_iota(jnp.int32, (win_w, feat_c), 0)
        band_rows = lax.broadcasted_iota(jnp.int32, (mbh, win_w, feat_c), 0)

        @pl.when(rg == 0)
        def _init():
            dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

        direct = variant == "nodband"
        for j in range(rois_per_program):
            base = (b * num_rois + rg * rois_per_program + j) * out_size
            for ph in range(out_size):
                packed_h = bounds_ref[base + ph]
                hs = packed_h & 0xFF
                he = (packed_h >> 8) & 0xFF
                hs_c = jnp.clip(hs, 0, max(feat_h - mbh, 0))
                rmask = ((band_rows + hs_c >= hs)
                         & (band_rows + hs_c < he))
                use_val = variant == "fullband_val"
                acc = None
                if not direct and not use_val:
                    dband_ref[...] = jnp.zeros_like(dband_ref)
                for pw in range(out_size):
                    packed_w = bounds_ref[base + pw]
                    ws = (packed_w >> 16) & 0xFF
                    we = (packed_w >> 24) & 0xFF
                    if use_window and variant != "static":
                        ws_c = jnp.clip((ws // 8) * 8, 0, feat_w - mbw)
                        ws_a = pl.multiple_of(ws_c, 8)
                    else:
                        ws_c = 0
                        ws_a = 0
                    win = feat_ref[0, pl.ds(hs_c, mbh),
                                   pl.ds(ws_a, win_w), :].astype(jnp.float32)
                    binmax = pooled_ref[0, j, ph, pw, :].astype(jnp.float32)
                    gbin = g_ref[0, j, ph, pw, :].astype(jnp.float32)
                    cmask = (col_idx + ws_c >= ws) & (col_idx + ws_c < we)
                    hit = rmask & cmask[None] & (win == binmax)
                    eq_f = jnp.where(hit, 1.0, 0.0)
                    if variant == "nocount":
                        scale = gbin
                    else:
                        count = jnp.sum(eq_f, axis=(0, 1))
                        scale = gbin / jnp.maximum(count, 1.0)
                    if use_val:
                        contrib = eq_f * scale
                        acc = contrib if acc is None else acc + contrib
                    elif direct:
                        cur = dfeat_ref[0, pl.ds(hs_c, mbh),
                                        pl.ds(ws_a, win_w), :]
                        dfeat_ref[0, pl.ds(hs_c, mbh),
                                  pl.ds(ws_a, win_w), :] = cur + eq_f * scale
                    else:
                        cur = dband_ref[:, pl.ds(ws_a, win_w), :]
                        dband_ref[:, pl.ds(ws_a, win_w), :] = (
                            cur + eq_f * scale)
                if use_val:
                    cur = dfeat_ref[0, pl.ds(hs_c, mbh), :, :]
                    dfeat_ref[0, pl.ds(hs_c, mbh), :, :] = cur + acc
                elif not direct:
                    cur = dfeat_ref[0, pl.ds(hs_c, mbh), :, :]
                    dfeat_ref[0, pl.ds(hs_c, mbh), :, :] = (
                        cur + dband_ref[...])

    out_size, sscale = args.out_size, args.spatial_scale

    def backward(feat, rois, pooled, g, variant):
        b, h, w, c = feat.shape
        r = rois.shape[1]
        mbh = max_bin_extent(h, out_size)
        bounds = jax.vmap(
            lambda rr: roi_bin_bounds(rr, sscale, out_size, h, w))(rois)
        hs, he, ws, we = (x.astype(jnp.int32).reshape(-1) for x in bounds)
        packed = hs | (he << 8) | (ws << 16) | (we << 24)
        cblock = c if c % 256 or c <= 256 else 256
        ncb = c // cblock
        # same divisor selection as the shipping kernel — a --rois value
        # not divisible by 8 would otherwise silently drop remainder RoIs
        # from the grid (ADVICE r4)
        rpp = next(g_ for g_ in rpp_mod._RPP_CANDIDATES if r % g_ == 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, ncb, r // rpp),
            in_specs=[
                pl.BlockSpec((1, h, w, cblock),
                             lambda bb, cc, rr, *_: (bb, 0, 0, cc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rpp, out_size, out_size, cblock),
                             lambda bb, cc, rr, *_: (bb, rr, 0, 0, cc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rpp, out_size, out_size, cblock),
                             lambda bb, cc, rr, *_: (bb, rr, 0, 0, cc),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, cblock),
                                   lambda bb, cc, rr, *_: (bb, 0, 0, cc),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((mbh, w, cblock), jnp.float32)],
        )
        mbw = rpp_mod._stage_b_window(w, out_size)
        kern = functools.partial(kern_variant, out_size=out_size,
                                 mbh=mbh, mbw=mbw,
                                 feat_h=h, feat_w=w, feat_c=cblock,
                                 num_rois=r, rois_per_program=rpp,
                                 variant=variant)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
            grid_spec=grid_spec,
        )(packed, feat, pooled, g)

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(args.batch, args.h, args.w, args.c)
                       .astype(np.float32)).astype(jnp.bfloat16)
    x1 = rng.uniform(0, 900, (args.batch, args.rois))
    y1 = rng.uniform(0, 500, (args.batch, args.rois))
    x2 = np.minimum(x1 + rng.uniform(16, 400, x1.shape), 999)
    y2 = np.minimum(y1 + rng.uniform(16, 300, x1.shape), 599)
    rois = jnp.asarray(np.stack([x1, y1, x2, y2], -1).astype(np.float32))
    pooled = rpp_mod.roi_max_pool_pallas(feat, rois, out_size, sscale,
                                         False, False)
    g = jnp.asarray(rng.randn(*pooled.shape).astype(np.float32)
                    ).astype(pooled.dtype)

    ref = None
    for variant in args.variants:
        @jax.jit
        def run(f, r, p, gg, variant=variant):
            # pooled/g ride as jit ARGUMENTS, not closure constants — a
            # constant-embedded operand can get different layout/folding
            # treatment than the donated runtime operands the production
            # backward sees (ADVICE r4)
            def body(carry, _):
                df = backward(f + carry.astype(f.dtype), r, p, gg,
                              variant)
                return jnp.float32(df[0, 0, 0, 0]) * 1e-30, None
            carry, _ = lax.scan(body, jnp.float32(0), None,
                                length=args.inner)
            return carry
        try:
            # timing only — NO eager diff-check: each eager pallas compile
            # is its own multi-minute uncached executable via the tunnel
            # (semantics of candidate variants are checked in interpret
            # mode by the kernel's unit tests once promoted)
            float(np.asarray(run(feat, rois, pooled, g)).reshape(-1)[0])
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(np.asarray(run(feat, rois, pooled, g)).reshape(-1)[0])
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) * 1e3 / args.inner
            print(f"{variant}: {ms:.3f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001 - probe tool, report and go on
            print(f"{variant}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
