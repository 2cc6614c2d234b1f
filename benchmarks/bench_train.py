#!/usr/bin/env python
"""Device train-step throughput (VERDICT r1 item 2: ≥70 img/s device).

Measures the steady-state jitted train step with device-resident batches
(loader excluded — host IO is benchmarked by scripts/train.py wall time).
Dispatch latency is hidden by enqueueing a window of steps and syncing
once.

    python benchmarks/bench_train.py --batch_size 8 [--trace]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np

from trcnn.utils.profiling import device_sync


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "resnet101"])
    ap.add_argument("--config", default="voc", choices=["voc", "coco"],
                    help="coco: 800x1344 canvas, 81 classes, COCO "
                         "capacities (BASELINE config 5's training half)")
    ap.add_argument("--trace", action="store_true",
                    help="also write a profiler trace to /tmp/trcnn_train_trace")
    ap.add_argument("--inner_steps", type=int, default=1,
                    help=">1: run K optimizer steps per dispatch via "
                         "lax.scan (make_train_step inner_steps) — "
                         "isolates per-call dispatch latency from the "
                         "device step.  The same batch is replayed K "
                         "times (timing probe; the Trainer feeds distinct "
                         "slices)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trcnn.config import coco_config, voc_config
    from trcnn.models import make_model
    from trcnn.train.optim import make_optimizer
    from trcnn.train.step import TrainState, make_train_step

    cfg = voc_config() if args.config == "voc" else coco_config()
    if args.backbone != "vgg16":
        cfg = cfg.replace(backbone=args.backbone)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(cfg, dtype=dtype)
    b, h, w = args.batch_size, cfg.image.pad_h, cfg.image.pad_w
    rng = jax.random.PRNGKey(0)
    images = (jax.random.normal(rng, (b, h, w, 3), jnp.float32) * 30.0
              ).astype(dtype)
    info_hw = ((600.0, 1000.0, 1.6) if args.config == "voc"
               else (800.0, 1333.0, 1.665))
    im_info = jnp.tile(jnp.asarray([list(info_hw)], jnp.float32), (b, 1))
    g = 8
    gt_boxes = jnp.tile(jnp.asarray(
        [[[40.0, 60.0, 300.0, 280.0], [350.0, 100.0, 600.0, 420.0]]
         + [[0.0, 0.0, 0.0, 0.0]] * (g - 2)], jnp.float32), (b, 1, 1))
    gt_labels = jnp.tile(
        jnp.asarray([[3, 7] + [0] * (g - 2)], jnp.int32), (b, 1))
    gt_valid = jnp.tile(jnp.asarray([[True, True] + [False] * (g - 2)]),
                        (b, 1))
    batch = {"images": images, "im_info": im_info, "gt_boxes": gt_boxes,
             "gt_labels": gt_labels, "gt_valid": gt_valid}

    params = jax.jit(model.init)(rng, images, im_info)
    tx = make_optimizer(params, cfg.optim, cfg.backbone)
    state = TrainState.create(params, tx)
    k = args.inner_steps
    step = make_train_step(model, tx, mesh=None, inner_steps=k)
    if k > 1:
        batch = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch)

    t0 = time.time()
    state, metrics = step(state, batch, rng)
    device_sync(metrics)
    print(f"compile: {time.time() - t0:.1f}s "
          f"loss={float(metrics['loss']):.3f} "
          f"fg_anchors={float(metrics['num_fg_anchors']):.1f}",
          file=sys.stderr)

    for _ in range(3):
        state, metrics = step(state, batch, rng)
    device_sync(metrics)

    if args.trace:
        with jax.profiler.trace("/tmp/trcnn_train_trace"):
            for _ in range(3):
                state, metrics = step(state, batch, rng)
            device_sync(metrics)
        print("trace: /tmp/trcnn_train_trace", file=sys.stderr)

    # steps chain through the donated state, so syncing the LAST step's
    # metrics fences the whole window
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, rng)
    device_sync(metrics)
    dt = (time.perf_counter() - t0) / (args.iters * k)
    print(json.dumps({
        "metric": "train_imgs_per_sec_device",
        "value": round(b / dt, 2),
        "step_ms": round(dt * 1e3, 2),
        "batch_size": b,
        "backbone": args.backbone,
        "config": args.config,
        "inner_steps": k,
        "loss": round(float(metrics["loss"]), 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
