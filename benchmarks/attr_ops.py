#!/usr/bin/env python
"""Source-attributed per-op table straight from a saved profiler trace.

Unlike map_fusions.py (which re-compiles and joins fusion NAMES against a
fresh HLO dump — fragile when fusion numbering shifts between compiles),
this reads the attribution the trace itself carries: every XLA-Ops event
has ``tf_op`` (the jax source op path), ``model_flops`` and
``bytes_accessed``, which is exactly what a roofline needs.  No TPU or
recompile required — point it at any logdir trace_ops.py wrote.

    python benchmarks/attr_ops.py --logdir /tmp/trcnn_trace
    python benchmarks/attr_ops.py --logdir /tmp/trcnn_trace --by_group

``--by_group`` buckets ops by their source op (forward/backward labels
preserved: jvp(...) vs transpose(jvp(...))) so 1243 fusions collapse to
the ~40 lines a human reads.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re

PEAK_BF16 = 197e12        # v5e MXU bf16 FLOP/s
HBM_BW = 819e9            # v5e HBM bytes/s


def load_ops(logdir: str, nsteps: int):
    paths = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {logdir}")
    t = json.load(gzip.open(paths[-1]))
    events = t["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]) for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e["args"].get("name") == "XLA Ops"}
    agg = {}
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and (e["pid"], e.get("tid")) in tids):
            # NOTE: an earlier "jit_" name filter (meant for outer jit
            # wrapper spans, which in fact live on other rails) silently
            # dropped vmap_jit_nms_padded_pallas — the train-time proposal
            # NMS, 4.33 ms/step — from every r3/r4 roofline table.  All
            # XLA-Ops events here are real device ops with attribution.
            a = e.get("args", {})
            r = agg.setdefault(e["name"], [0.0, 0.0, 0.0, ""])
            r[0] += e["dur"] / 1000.0 / nsteps
            # per-execution numbers; identical across the traced steps
            r[1] = float(a.get("model_flops", 0) or 0)
            r[2] = float(a.get("bytes_accessed", 0) or 0)
            r[3] = a.get("tf_op", "")
    return agg


def group_key(tf_op: str) -> str:
    """'jit(step)/transpose(jvp(...))/extractor/conv4_2/conv...' →
    'bwd extractor/conv4_2'."""
    if not tf_op:
        return "(unattributed)"
    direction = "bwd" if "transpose(jvp" in tf_op else "fwd"
    parts = [p for p in tf_op.split("/")
             if p and not re.match(r"jit\(|jvp\(|transpose\(|vmap\(", p)]
    label = "/".join(parts[:-1][-2:] or parts[-1:])
    return f"{direction} {label}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/trcnn_trace")
    ap.add_argument("--nsteps", type=int, default=3,
                    help="traced iterations (trace_ops.py runs 3)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by_group", action="store_true")
    ap.add_argument("--min_ms", type=float, default=0.05)
    args = ap.parse_args()

    agg = load_ops(args.logdir, args.nsteps)
    total = sum(r[0] for r in agg.values())
    print(f"TOTAL {total:.2f} ms/step ({len(agg)} distinct ops)")

    if args.by_group:
        g = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
        for ms, fl, by, tf_op in agg.values():
            r = g[group_key(tf_op)]
            r[0] += ms
            r[1] += fl
            r[2] += by
        rows = sorted(g.items(), key=lambda kv: -kv[1][0])
        print(f"{'ms':>8}  {'mxu-roof':>8}  {'hbm-roof':>8}  {'x-off':>5}  group")
        shown = 0.0
        for k, (ms, fl, by) in rows:
            if ms < args.min_ms or shown >= 0 and len(k) == 0:
                continue
            tm = fl / PEAK_BF16 * 1e3
            th = by / HBM_BW * 1e3
            roof = max(tm, th)
            off = f"{ms / roof:5.2f}" if roof > 1e-3 else "    -"
            print(f"{ms:8.3f}  {tm:8.2f}  {th:8.2f}  {off}  {k}")
            shown += ms
        print(f"(groups <{args.min_ms} ms omitted: {total - shown:.2f} ms)")
    else:
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
        for name, (ms, fl, by, tf_op) in rows:
            tm = fl / PEAK_BF16 * 1e3
            th = by / HBM_BW * 1e3
            print(f"{ms:8.3f} ms | mxu {tm:5.2f} hbm {th:5.2f} | "
                  f"{name[:30]:30s} | {tf_op[:100]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
