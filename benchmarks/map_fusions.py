#!/usr/bin/env python
"""Map trace fusion names → HLO ops (what is fusion.33, actually?).

Compiles the detect graph, dumps optimized HLO, parses each fusion
computation's constituent ops, then joins against the newest trace in
--logdir to print a source-attributed hot-op table.  This is the
conv-efficiency measurement tool (VERDICT r1 item 2).

    python benchmarks/map_fusions.py --logdir /tmp/trcnn_trace
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])


def parse_hlo_fusions(hlo: str):
    """fusion name → list of interesting ops inside its computation."""
    # computation name -> ops
    comps = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^%?([\w.\-]+)\s*\([^)]*\)\s*->.*{$", line.strip())
        if m:
            cur = m.group(1)
            comps[cur] = []
            continue
        if cur and line.strip().startswith("}"):
            cur = None
            continue
        if cur is not None:
            lm = re.search(r"=\s*(\S+)\s+(convolution|dot|reduce-window|"
                           r"reduce|transpose|scatter|gather|sort|iota)\(",
                           line)
            if lm:
                comps[cur].append(f"{lm.group(2)} {lm.group(1)}")
            elif "convolution" in line or " dot(" in line:
                comps[cur].append(line.strip()[:160])

    # instruction name -> called computation (fusions) with shape
    fusion_info = {}
    for line in hlo.splitlines():
        m = re.search(r"%?([\w.\-]+)\s*=\s*(\S+)\s+fusion\(.*calls=%?([\w.\-]+)", line)
        if m:
            fusion_info[m.group(1)] = (m.group(2), m.group(3))
        m2 = re.search(r"%?([\w.\-]+)\s*=\s*(\S+)\s+(convolution|custom-call|"
                       r"while|sort|copy)\(", line)
        if m2 and m2.group(1) not in fusion_info:
            fusion_info[m2.group(1)] = (m2.group(2), m2.group(3))
    return comps, fusion_info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--logdir", default="/tmp/trcnn_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hlo_out", default="/tmp/detect_hlo.txt")
    ap.add_argument("--train", action="store_true",
                    help="map the train step instead of detect")
    ap.add_argument("--input", default="uint8", choices=["uint8", "float"],
                    help="canvas format; uint8 mirrors bench.py (detect "
                         "mapping only — the train step feeds float)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trcnn.config import voc_config
    from trcnn.models import make_model
    from trcnn.models.faster_rcnn import postprocess

    cfg = voc_config()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(cfg, dtype=dtype)
    b, h, w = args.batch_size, cfg.image.pad_h, cfg.image.pad_w
    rng = jax.random.PRNGKey(0)
    if args.input == "uint8" and not args.train:
        images = jax.random.randint(rng, (b, h, w, 3), 0, 256, jnp.uint8)
    else:
        images = jax.random.normal(rng, (b, h, w, 3), jnp.float32) * 30.0
    im_info = jnp.tile(jnp.asarray([[600.0, 1000.0, 1.6]], jnp.float32), (b, 1))
    params = jax.jit(model.init)(rng, images, im_info)

    if args.train:
        from trcnn.train.optim import make_optimizer
        from trcnn.train.step import TrainState, make_train_step

        tx = make_optimizer(params, cfg.optim, cfg.backbone)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, mesh=None, donate=False)
        gt_boxes = jnp.zeros((b, 8, 4), jnp.float32).at[:, 0].set(
            jnp.asarray([50.0, 50.0, 300.0, 300.0]))
        gt_labels = jnp.ones((b, 8), jnp.int32)
        gt_valid = jnp.zeros((b, 8), bool).at[:, 0].set(True)
        batch = {"images": images, "im_info": im_info, "gt_boxes": gt_boxes,
                 "gt_labels": gt_labels, "gt_valid": gt_valid}
        lowered = jax.jit(step).lower(state, batch, rng)
    else:
        lowered = jax.jit(lambda p, x, i: postprocess(
            model.apply(p, x, i, method="detect"), i, cfg)).lower(
            params, images, im_info)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open(args.hlo_out, "w") as f:
        f.write(hlo)
    print(f"wrote {args.hlo_out} ({len(hlo)} bytes)")

    comps, fusion_info = parse_hlo_fusions(hlo)

    paths = sorted(glob.glob(args.logdir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found; run benchmarks/trace_ops.py style tracing first")
        return
    t = json.load(gzip.open(paths[-1]))
    events = t["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]) for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e["args"].get("name") == "XLA Ops"}
    agg = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and (e["pid"], e.get("tid")) in tids
                and "jit_" not in e["name"]):
            agg[e["name"]] += e["dur"]

    nsteps = 3
    for name, dur in agg.most_common(args.top):
        info = fusion_info.get(name)
        detail = ""
        if info:
            shape, called = info
            inner = comps.get(called, [])[:3]
            detail = f"{shape}  {'; '.join(inner)}" if inner else shape
        print(f"{dur / nsteps / 1000:8.3f} ms  {name:<24} {detail[:200]}")


if __name__ == "__main__":
    main()
