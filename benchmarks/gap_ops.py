#!/usr/bin/env python
"""Device idle-gap analysis from a saved profiler trace (dev tool).

The XLA-Ops rail (attr_ops.py) sums op durations; bench wall time can
exceed it when the TensorCore sits idle BETWEEN ops (scheduling stalls,
unattributed DMA waits).  This tool walks the XLA-Ops timeline, computes
occupancy = busy / span, and prints the largest inter-op gaps with the
ops on either side — the evidence needed to attribute a wall-vs-rail
discrepancy (NOTES_ROUND5 §11: train b8 wall 69.9 ms vs rail 64.05 ms).

    python benchmarks/trace_ops.py --train --batch_size 8
    python benchmarks/gap_ops.py --logdir /tmp/trcnn_train_trace
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/trcnn_train_trace")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--min_gap_us", type=float, default=20.0)
    args = ap.parse_args()

    paths = sorted(glob.glob(
        args.logdir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {args.logdir}")
    t = json.load(gzip.open(paths[-1]))
    events = t["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]) for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e["args"].get("name") == "XLA Ops"}
    ops = sorted(
        (e["ts"], e["ts"] + e["dur"], e["name"])
        for e in events
        if (e.get("ph") == "X" and "dur" in e
            and "TPU" in pids.get(e["pid"], "")
            and (e["pid"], e.get("tid")) in tids))
    if not ops:
        raise SystemExit("no XLA-Ops events")

    span = ops[-1][1] - ops[0][0]
    busy, cursor, gaps = 0.0, ops[0][0], []
    prev_name = ""
    for ts, te, name in ops:
        if ts > cursor:
            gaps.append((ts - cursor, prev_name, name, cursor))
        busy += max(0.0, te - max(ts, cursor))
        if te > cursor:
            cursor, prev_name = te, name
    gaps.sort(reverse=True)
    total_gap = sum(g[0] for g in gaps)
    print(f"span {span / 1e3:.2f} ms  busy {busy / 1e3:.2f} ms  "
          f"occupancy {busy / span:.1%}  idle {total_gap / 1e3:.2f} ms "
          f"in {len(gaps)} gaps")
    big = [g for g in gaps if g[0] >= args.min_gap_us]
    print(f"gaps >= {args.min_gap_us} us: {len(big)}, "
          f"{sum(g[0] for g in big) / 1e3:.2f} ms total")
    for dur, before, after, at in gaps[:args.top]:
        print(f"  {dur / 1e3:7.3f} ms after {before[:48]:<48} "
              f"before {after[:48]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
