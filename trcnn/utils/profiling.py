"""Profiling and timing harnesses (SURVEY.md §6.1 tracing plan).

The reference had nothing beyond external nvprof; here:
  * ``time_fn`` — steady-state median wall time of a jitted callable
    (block_until_ready semantics, warmup included);
  * ``trace_to`` — context manager around jax.profiler.trace writing a
    TensorBoard/Perfetto trace directory;
  * ``op_time_breakdown`` — parse the chrome-trace json of a captured
    profile into per-op device-time totals (works without the tensorboard
    profile plugin; used by benchmarks/trace_ops.py).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time
from typing import Callable, Dict, Tuple

import numpy as np


def device_sync(out):
    """Reliable execution fence: fetch one scalar of one output leaf to
    host.  jax.block_until_ready is NOT a dependable fence on every
    transport (observed returning before execution completes on the
    tunneled-TPU backend); a D2H read cannot complete before the producing
    program does.  Returns ``out`` unchanged."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))
    return out


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> Tuple[float, object]:
    """Median wall seconds per call and the last output (device_sync'd)."""
    out = device_sync(fn(*args))
    for _ in range(warmup):
        device_sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = device_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


@contextlib.contextmanager
def trace_to(logdir: str):
    import jax

    with jax.profiler.trace(logdir):
        yield


def op_time_breakdown(logdir: str, steps: int = 1) -> Dict[str, float]:
    """Aggregate device op times (ms per step) from the newest trace in
    ``logdir``.  Groups by op family (fusion/while/copy/...)."""
    paths = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    events = t["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg: collections.Counter = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and "jit_" not in e["name"]):
            agg[e["name"].split(".")[0]] += e["dur"]
    return {k: v / steps / 1000.0 for k, v in agg.most_common()}
