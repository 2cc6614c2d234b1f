#!/usr/bin/env python
"""Headline benchmark: single-chip inference throughput at 600×1000.

Prints ONE JSON line:
  {"metric": "images/sec/chip", "value": N, "unit": "img/s",
   "vs_baseline": N / 50.0}

The baseline denominator is the rebuild target of ≥50 img/s/chip at
600×1000 on v5e (BASELINE.md); the reference implementation itself ran at
~6.7 img/s on a K40 (~150 ms/img, BASELINE.md).

Full image→detections path in one jitted graph: VGG-16 backbone (bf16) →
RPN → proposal layer (decode/clip/top-k/NMS) → RoI pool → head → per-class
NMS.  Batched (default 8) padded canvases, steady-state timing after
compile, p50 latency reported to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--backbone", default="vgg16")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trcnn.config import voc_config
    from trcnn.models import make_model
    from trcnn.models.faster_rcnn import postprocess

    cfg = voc_config()
    if args.backbone != "vgg16":
        cfg = cfg.replace(backbone=args.backbone)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(cfg, dtype=dtype)

    b, h, w = args.batch_size, cfg.image.pad_h, cfg.image.pad_w
    rng = jax.random.PRNGKey(0)
    # synthetic 600x1000 inputs on the padded canvas
    images = jax.random.normal(rng, (b, h, w, 3), jnp.float32) * 30.0
    im_info = jnp.tile(jnp.asarray([[600.0, 1000.0, 1.6]], jnp.float32),
                       (b, 1))
    params = jax.jit(model.init)(rng, images, im_info)

    @jax.jit
    def run(p, x, info):
        raw = model.apply(p, x, info, method="detect")
        return postprocess(raw, info, cfg)

    t0 = time.time()
    jax.block_until_ready(run(params, images, im_info))
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    for _ in range(args.warmup):
        jax.block_until_ready(run(params, images, im_info))

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, images, im_info))
        times.append(time.perf_counter() - t0)

    times = np.asarray(times)
    imgs_per_sec = b / float(np.median(times))
    p50_ms = float(np.median(times)) / b * 1e3
    print(f"batch={b} p50_batch={np.median(times) * 1e3:.2f}ms "
          f"p50_per_img={p50_ms:.2f}ms device={jax.devices()[0].platform}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "images/sec/chip",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / 50.0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
