#!/usr/bin/env python
"""Whole-graph op-level profile via jax.profiler + xplane parsing.

One compile of the full detect graph, a few traced steps, then the
per-op device times from the trace — attributable hot-spot list without
compiling each stage separately (remote compiles are expensive in this
environment).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--logdir", default="/tmp/trcnn_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--input", default="uint8", choices=["uint8", "float"],
                    help="canvas format; uint8 mirrors bench.py's "
                         "production loader contract")
    ap.add_argument("--train", action="store_true",
                    help="trace the train step instead of detect "
                         "(float canvas — the trainer feeds float)")
    ap.add_argument("--config", default="voc", choices=["voc", "coco"],
                    help="coco: 800x1344 canvas, 81 classes")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "resnet101"])
    args = ap.parse_args()

    from trcnn.config import coco_config, voc_config
    from trcnn.models import make_model
    from trcnn.models.faster_rcnn import postprocess

    cfg = voc_config() if args.config == "voc" else coco_config()
    if args.backbone != "vgg16":
        cfg = cfg.replace(backbone=args.backbone)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(cfg, dtype=dtype)
    b, h, w = args.batch_size, cfg.image.pad_h, cfg.image.pad_w
    rng = jax.random.PRNGKey(0)
    if args.input == "uint8":
        images = jax.random.randint(rng, (b, h, w, 3), 0, 256, jnp.uint8)
    else:
        images = (jax.random.normal(rng, (b, h, w, 3), jnp.float32) * 30.0
                  ).astype(dtype)
    info_hw = ((600.0, 1000.0, 1.6) if args.config == "voc"
               else (800.0, 1333.0, 1.665))
    im_info = jnp.tile(jnp.asarray([list(info_hw)], jnp.float32), (b, 1))
    params = jax.jit(model.init)(rng, images, im_info)
    if not args.train:
        # serving-standard pre-cast, mirroring bench.py (training keeps
        # f32 master params)
        from trcnn.models.faster_rcnn import cast_params_for_inference

        params = cast_params_for_inference(params, dtype)

    if args.train:
        from trcnn.train.optim import make_optimizer
        from trcnn.train.step import TrainState, make_train_step

        tx = make_optimizer(params, cfg.optim, cfg.backbone)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, mesh=None, donate=True)
        gt_boxes = jnp.zeros((b, 8, 4), jnp.float32).at[:, 0].set(
            jnp.asarray([50.0, 50.0, 300.0, 300.0]))
        batch = {"images": images, "im_info": im_info, "gt_boxes": gt_boxes,
                 "gt_labels": jnp.ones((b, 8), jnp.int32),
                 "gt_valid": jnp.zeros((b, 8), bool).at[:, 0].set(True)}
        state_box = [state]

        def run():
            state_box[0], metrics = step(state_box[0], batch, rng)
            return float(np.asarray(metrics["loss"]))
    else:
        full = jax.jit(lambda p, x, i: postprocess(
            model.apply(p, x, i, method="detect"), i, cfg))

        def run():
            det = full(params, images, im_info)
            # a host read is the only reliable execution fence on the
            # tunneled chip (block_until_ready can return early)
            return float(np.asarray(det.scores[0, 0]))

    run()
    print("compiled; tracing...", flush=True)

    with jax.profiler.trace(args.logdir):
        for _ in range(3):
            run()

    # chrome-trace parsing only — the tensorboard profile plugin's
    # generated protos clash with this environment's protobuf
    import collections
    import gzip

    paths = sorted(glob.glob(
        args.logdir + "/plugins/profile/*/*.trace.json.gz"))
    t = json.load(gzip.open(paths[-1]))
    events = t["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # only the "XLA Ops" rail — the Steps / XLA Modules / TC Overlay rails
    # carry whole-step envelope events that double-count everything
    tids = {(e["pid"], e["tid"]) for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e["args"].get("name") == "XLA Ops"}
    agg = collections.Counter()
    total = 0
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and (e["pid"], e.get("tid")) in tids
                and "jit_" not in e["name"]):
            agg[e["name"]] += e["dur"]
            total += e["dur"]
    nsteps = 3
    print(f"TOTAL {total / nsteps / 1000:.2f} ms/step "
          f"(see benchmarks/map_fusions.py for source attribution)")
    for k, v in agg.most_common(args.top):
        print(f"{v / nsteps / 1000:8.3f} ms  {k}")


if __name__ == "__main__":
    main()
