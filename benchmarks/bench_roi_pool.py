#!/usr/bin/env python
"""Standalone RoI-pool forward bench at the b32 inference shape.

Scan-amortized device timing (one dispatch + one host-scalar sync for
INNER sequential calls, carry->input dependence so XLA cannot hoist).
A/B of kernel knobs must compare numbers from THIS bench only
(NOTES_ROUND2: cross-bench comparisons misled once already).

    python benchmarks/bench_roi_pool.py [--rpp 8 16 32] [--batch 32]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rois", type=int, default=304)
    ap.add_argument("--h", type=int, default=38)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--rpp", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--flat_out", action="store_true", default=True)
    ap.add_argument("--check", action="store_true",
                    help="compare outputs across rpp settings")
    ap.add_argument("--bwd", action="store_true",
                    help="bench the backward scatter kernel instead "
                         "(use --batch 8 --rois 128 for the train shape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import trcnn.ops.roi_pool_pallas as rpp_mod

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(args.batch, args.h, args.w, args.c)
                       .astype(np.float32)).astype(jnp.bfloat16)
    # proposal-like RoIs in image coords (stride 16)
    x1 = rng.uniform(0, 900, (args.batch, args.rois))
    y1 = rng.uniform(0, 500, (args.batch, args.rois))
    x2 = np.minimum(x1 + rng.uniform(16, 400, x1.shape), 999)
    y2 = np.minimum(y1 + rng.uniform(16, 300, x1.shape), 599)
    rois = jnp.asarray(np.stack([x1, y1, x2, y2], -1).astype(np.float32))

    def make_run(flat):
        if args.bwd:
            pooled = rpp_mod.roi_max_pool_pallas(feat, rois, 7, 1.0 / 16.0,
                                                 False, False)
            g = jnp.asarray(rng.randn(*pooled.shape).astype(np.float32)
                            ).astype(pooled.dtype)

            from trcnn.ops.roi_pool import max_bin_extent as _mbe
            levels = rpp_mod._levels_for(_mbe(args.h, 7))

            @jax.jit
            def run(f, r):
                def body(carry, _):
                    # the backward consumes the forward's sliding-max
                    # table (VJP residual); in the real train graph its
                    # construction is CSE'd with the forward — rebuilding
                    # it here charges the backward a few fused elementwise
                    # maxes (conservative)
                    tab = jax.vmap(lambda x: rpp_mod.sliding_row_max_table(
                        x, levels))(f + carry.astype(f.dtype))
                    df = rpp_mod._backward_pallas(
                        tab, r, g, 7, 1.0 / 16.0, False)
                    return jnp.float32(df[0, 0, 0, 0]) * 1e-30, None
                carry, _ = lax.scan(body, jnp.float32(0), None,
                                    length=args.inner)
                return carry
            return run

        @jax.jit
        def run(f, r):
            def body(carry, _):
                out = rpp_mod.roi_max_pool_pallas(
                    f + carry.astype(f.dtype), r, 7, 1.0 / 16.0, False, flat)
                # scalar carry only — a stacked scan output would
                # materialize inner x (B*R, 49*C) in HBM (2.4 GB)
                return jnp.float32(out[0, 0]) * 1e-30, None
            carry, _ = lax.scan(body, jnp.float32(0), None,
                                length=args.inner)
            return carry
        return run

    ref = None
    for rpp in args.rpp:
        rpp_mod._RPP_CANDIDATES = (rpp,) + (8, 4, 2, 1)
        run = make_run(args.flat_out)
        out = np.asarray(run(feat, rois))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(np.asarray(run(feat, rois)).reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3 / args.inner
        print(f"rpp={rpp}: {ms:.3f} ms/call", flush=True)
        if args.check:
            if ref is None:
                ref = out
            else:
                print(f"  max |diff| vs rpp={args.rpp[0]}: "
                      f"{np.abs(out.astype(np.float32) - ref.astype(np.float32)).max()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
