#!/usr/bin/env python
"""Per-stage timing of the inference pipeline (SURVEY.md §6.1 tracing plan).

Times each stage of the detect graph in isolation (own jit, steady state)
so regressions and optimization targets are attributable:
backbone / rpn / proposal(+NMS) / roi_pool / head / postprocess.
Whole-graph time is also reported (stages overlap under XLA fusion, so the
sum exceeds it).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

from trcnn.utils.profiling import device_sync


def timeit(fn, *args, iters=10, warmup=2):
    out = device_sync(fn(*args))
    for _ in range(warmup):
        device_sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from trcnn.config import voc_config
    from trcnn.models import make_model
    from trcnn.models.faster_rcnn import postprocess
    from trcnn.ops.proposal import proposal_layer
    from trcnn.ops.roi_pool import roi_max_pool

    cfg = voc_config()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(cfg, dtype=dtype)
    b, h, w = args.batch_size, cfg.image.pad_h, cfg.image.pad_w
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (b, h, w, 3), jnp.float32) * 30.0
    im_info = jnp.tile(jnp.asarray([[600.0, 1000.0, 1.6]], jnp.float32), (b, 1))
    params = jax.jit(model.init)(rng, images, im_info)

    r = {}

    backbone = jax.jit(lambda p, x: model.apply(p, x, method="features"))
    t, feat = timeit(backbone, params, images)
    r["backbone"] = t

    rpn = jax.jit(lambda p, f: model.apply(p, f, method="rpn_out"))
    t, rpnout = timeit(rpn, params, feat)
    r["rpn"] = t

    prop = functools.partial(proposal_layer, train=False,
                             anchor_cfg=cfg.anchors, cfg=cfg.proposals)
    prop_b = jax.jit(jax.vmap(lambda pr, d, info: prop(
        pr, d, info[0], info[1], info[2])))
    t, props = timeit(prop_b, rpnout.fg_probs, rpnout.deltas, im_info)
    r["proposal+nms"] = t

    pool = jax.jit(jax.vmap(functools.partial(
        roi_max_pool, out_size=7, spatial_scale=1.0 / 16.0)))
    feat32 = feat.astype(jnp.float32)
    t, pooled = timeit(pool, feat32, props.rois)
    r["roi_pool"] = t

    # head (fc stack) on pre-pooled features
    flat = pooled.reshape((-1,) + pooled.shape[2:])
    from trcnn.models.roi_head import VGG16RoIHead
    head_mod = VGG16RoIHead(num_classes=cfg.num_classes,
                            hidden=cfg.head_hidden, dtype=dtype)
    head_params = {"params": params["params"]["head"]}
    head_jit = jax.jit(lambda p, x: head_mod.apply(p, x))
    t, (cls_score, bbox_pred) = timeit(head_jit, head_params, flat)
    r["head(fc)"] = t

    raw_fn = jax.jit(lambda p, x, i: model.apply(p, x, i, method="detect"))
    t, raw = timeit(raw_fn, params, images, im_info)
    r["detect(all)"] = t

    post = jax.jit(lambda rw, i: postprocess(rw, i, cfg))
    t, dets = timeit(post, raw, im_info)
    r["postprocess"] = t

    full = jax.jit(lambda p, x, i: postprocess(
        model.apply(p, x, i, method="detect"), i, cfg))
    t, _ = timeit(full, params, images, im_info)
    r["full"] = t

    print(f"\nbatch={b} dtype={args.dtype} device={jax.devices()[0]}")
    for k, v in r.items():
        print(f"  {k:>14s}: {v * 1e3:8.2f} ms  ({v * 1e3 / b:6.2f} ms/img)")
    print(f"  throughput: {b / r['full']:.1f} img/s")


if __name__ == "__main__":
    main()
