#!/usr/bin/env python
"""One-script perf-ledger refresh (VERDICT r2: "the perf ledger disagrees
with itself" — README/BASELINE/bench JSON each carried numbers from a
different commit).

Runs the full measurement matrix on the CURRENT checkout against the real
chip and rewrites every measured table from ONE set of numbers tied to ONE
commit hash:

  * appends a ``{commit, timestamp, results}`` record to
    ``benchmarks/ledger.json`` (the machine-readable history), and
  * regenerates the ``<!-- ledger:begin -->…<!-- ledger:end -->`` spans in
    ``BASELINE.md`` and ``README.md`` from the last record.

    python benchmarks/refresh_ledger.py            # measure + rewrite
    python benchmarks/refresh_ledger.py --rewrite_only   # docs from ledger

Matrix (all single-chip, bf16, synthetic inputs — no datasets in this
environment): detect VGG b32/b8/b1, detect R101 b8, detect COCO-config b4,
train-step VGG b8 and R101 b8.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "benchmarks", "ledger.json")
PY = sys.executable

# key -> (script, args)
MATRIX = {
    "detect_vgg_b32": ("bench.py", ["--batch_size", "32"]),
    "detect_vgg_b8": ("bench.py", ["--batch_size", "8"]),
    "detect_vgg_b1": ("bench.py", ["--batch_size", "1", "--scan_steps", "1",
                                   "--iters", "40"]),
    # device-only b1 latency (VERDICT r4 weak 5 / item 5): 8 back-to-back
    # device steps per dispatch amortize the ~25 ms axon-tunnel dispatch to
    # ~3 ms/step, so p50_step_ms here is the number that transfers to a
    # non-tunneled deployment; the row above keeps the honest wall figure
    "detect_vgg_b1_device": ("bench.py", ["--batch_size", "1",
                                          "--scan_steps", "8",
                                          "--iters", "20"]),
    "detect_r101_b8": ("bench.py", ["--batch_size", "8",
                                    "--backbone", "resnet101"]),
    "detect_coco_b4": ("bench.py", ["--batch_size", "4", "--config", "coco"]),
    "train_vgg_b8": ("benchmarks/bench_train.py", ["--batch_size", "8"]),
    "train_r101_b8": ("benchmarks/bench_train.py",
                      ["--batch_size", "8", "--backbone", "resnet101"]),
    "train_coco_b4": ("benchmarks/bench_train.py",
                      ["--batch_size", "4", "--config", "coco"]),
}


def run_one(key: str) -> dict:
    script, extra = MATRIX[key]
    cmd = [PY, os.path.join(ROOT, script)] + extra
    print(f"[{key}] {' '.join(cmd)}", flush=True)
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                       timeout=1800)
    if p.returncode != 0:
        print(p.stdout[-2000:], p.stderr[-2000:], sep="\n", file=sys.stderr)
        raise RuntimeError(f"{key} failed rc={p.returncode}")
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    # p50 per-image latency and compile wall ride on stderr
    for sline in p.stderr.splitlines():
        if "p50_per_img=" in sline:
            out["p50_per_img_ms"] = float(
                sline.split("p50_per_img=")[1].split("ms")[0])
        if "p50_step=" in sline:
            out["p50_step_ms"] = float(
                sline.split("p50_step=")[1].split("ms")[0])
        if sline.startswith("compile: "):
            out["compile_s"] = float(
                sline.split("compile: ")[1].split("s")[0])
    out["wall_s"] = round(time.time() - t0, 1)
    print(f"[{key}] -> {out}", flush=True)
    return out


# A single-run throughput number on the tunneled shared chip can be off by
# 2x under transient contention: the r3 ledger recorded detect_vgg_b8 at
# 145.7 img/s where three r4 re-runs of the IDENTICAL code measured
# 252-256 (NOTES_ROUND4.md), and no process caught it.  If a metric moves
# more than REMEASURE_REL vs the previous record, re-run until two samples
# agree within AGREE_REL (max 3 samples) and keep the median — transients
# get outvoted, real regressions reproduce and stand.
REMEASURE_REL = 0.20
AGREE_REL = 0.10


def run_stable(key: str, prev: dict | None) -> dict:
    out = run_one(key)
    prev_v = (prev or {}).get("value")
    v = out.get("value")
    # compile-time tracking (VERDICT r4 weak 2: BENCH_r04 recorded a 12x
    # compile jump — 1191.7 s vs 88.4 s r3 — that nothing watched; a
    # same-code re-run this round measured 70.5 s, confirming an
    # environment transient).  Compile wall is far noisier than
    # steady-state throughput (executable caching, tunnel contention), so
    # >3x vs the previous record warns loudly rather than re-triggering
    # the full re-measure loop; the value is always recorded.
    prev_c = (prev or {}).get("compile_s")
    c = out.get("compile_s")
    if (isinstance(prev_c, (int, float)) and isinstance(c, (int, float))
            and prev_c > 0 and c / prev_c > 3.0):
        print(f"[{key}] WARNING: compile {c:g}s is {c / prev_c:.1f}x the "
              f"previous record ({prev_c:g}s) — known transient class; "
              "investigate if it reproduces", flush=True)
        out["compile_anomaly"] = True
    if not (isinstance(prev_v, (int, float)) and isinstance(v, (int, float))
            and prev_v > 0):
        return out
    if abs(v / prev_v - 1.0) <= REMEASURE_REL:
        return out
    print(f"[{key}] {v:g} is {v / prev_v:.2f}x the previous record "
          f"({prev_v:g}) — re-measuring to rule out a transient", flush=True)
    samples = [out]
    while len(samples) < 3:
        samples.append(run_one(key))
        vals = sorted(s["value"] for s in samples)
        if len(vals) >= 2 and vals[-1] > 0 and \
                (vals[-1] - vals[0]) / vals[-1] <= AGREE_REL:
            break
    vals = sorted(samples, key=lambda s: s["value"])
    med = vals[len(vals) // 2]
    med["samples"] = [s["value"] for s in samples]
    med["remeasured"] = True
    print(f"[{key}] kept median {med['value']:g} of {med['samples']}",
          flush=True)
    return med


def head_commit() -> str:
    return subprocess.run(["git", "-C", ROOT, "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()


def load_ledger() -> list:
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return json.load(f)
    return []


def fmt(rec: dict, key: str, field: str = "value", suffix: str = "") -> str:
    r = rec["results"].get(key)
    if not r or field not in r:
        return "—"
    v = r[field]
    return f"{v:g}{suffix}" if isinstance(v, (int, float)) else str(v)


def render_baseline_table(history: list) -> str:
    """Markdown table: one column per recorded refresh (last 3)."""
    recs = history[-3:]
    heads = " | ".join(f"{r['label']} ({r['commit']})" for r in recs)
    rows = [
        ("Inference, VGG-16 600×1000 b32, bf16 (img/s/chip)",
         "detect_vgg_b32", "value"),
        ("… batch 8 (img/s)", "detect_vgg_b8", "value"),
        ("… batch 1 wall incl. tunnel dispatch (ms)",
         "detect_vgg_b1", "p50_step_ms"),
        ("… batch 1 device-only, dispatch amortized (ms)",
         "detect_vgg_b1_device", "p50_step_ms"),
        ("bench.py compile wall, VGG b32 (s)", "detect_vgg_b32",
         "compile_s"),
        ("Inference, ResNet-101-C4 b8 (img/s)", "detect_r101_b8", "value"),
        ("Inference, COCO config 800×1344, 81 cls, b4 (img/s)",
         "detect_coco_b4", "value"),
        ("Train step, VGG-16 b8 device (img/s)", "train_vgg_b8", "value"),
        ("Train step, ResNet-101-C4 b8 device (img/s)",
         "train_r101_b8", "value"),
        ("Train step, COCO config 800×1344, 81 cls, b4 (img/s)",
         "train_coco_b4", "value"),
    ]
    lines = [f"| Metric | {heads} |",
             "|---|" + "---|" * len(recs)]
    for title, key, field in rows:
        cells = " | ".join(fmt(r, key, field) for r in recs)
        lines.append(f"| {title} | {cells} |")
    return "\n".join(lines)


def render_readme_row(rec: dict) -> str:
    if not rec["results"]:
        return ""
    return "\n".join([
        f"| Benchmark (single chip, 600×1000) | commit `{rec['commit']}` |",
        "|---|---|",
        f"| `bench.py` headline, VGG-16 b32 bf16 | **{fmt(rec, 'detect_vgg_b32')}"
        " img/s/chip** (target ≥50; reference ≈6.7 img/s on K40) |",
        f"| ResNet-101-C4 b8 | {fmt(rec, 'detect_r101_b8')} img/s |",
        f"| COCO 800×1344 config (81 cls) b4 | {fmt(rec, 'detect_coco_b4')}"
        " img/s |",
        f"| Train step b8, device (VGG / R101) | {fmt(rec, 'train_vgg_b8')} / "
        f"{fmt(rec, 'train_r101_b8')} img/s |",
    ])


def render_arch_table(rec: dict) -> str:
    return "\n".join([
        f"| Config (commit `{rec['commit']}`) | Throughput |",
        "|---|---|",
        f"| VGG-16 detect, batch 32 | {fmt(rec, 'detect_vgg_b32')} img/s "
        f"({fmt(rec, 'detect_vgg_b32', 'p50_per_img_ms')} ms/img) |",
        f"| VGG-16 detect, batch 8 | {fmt(rec, 'detect_vgg_b8')} img/s |",
        f"| VGG-16 detect, batch 1 | {fmt(rec, 'detect_vgg_b1')} img/s "
        f"({fmt(rec, 'detect_vgg_b1', 'p50_step_ms')} ms incl. tunnel "
        f"dispatch; {fmt(rec, 'detect_vgg_b1_device', 'p50_step_ms')} ms "
        "device-only) |",
        f"| ResNet-101-C4 detect, batch 8 | {fmt(rec, 'detect_r101_b8')}"
        " img/s |",
        "| COCO config (800×1344, 81 classes), batch 4 | "
        f"{fmt(rec, 'detect_coco_b4')} img/s |",
        "| Train step b8 bf16, device (VGG / R101) | "
        f"{fmt(rec, 'train_vgg_b8')} / {fmt(rec, 'train_r101_b8')} img/s |",
        "| Train step, COCO config (800×1344, 81 cls, multiscale caps), "
        f"batch 4 | {fmt(rec, 'train_coco_b4')} img/s |",
    ])


def splice(path: str, begin: str, end: str, body: str) -> None:
    with open(path) as f:
        text = f.read()
    b, e = text.index(begin) + len(begin), text.index(end)
    with open(path, "w") as f:
        f.write(text[:b] + "\n" + body + "\n" + text[e:])
    print(f"rewrote {os.path.basename(path)}")


# Paths whose changes cannot move a measurement: committing the refreshed
# ledger/docs themselves (or the driver's end-of-round snapshot of notes)
# must not re-stale the gate — that exact loop broke the r3 AND r4 ledgers
# (measure at X, commit the tables, HEAD moves past X, check fails).
# Tests and trace-ANALYSIS tools are unmeasured too: the matrix executes
# only bench.py and benchmarks/bench_train.py (plus the package they
# import); a probe or attribution fix cannot move a ledger number.
_UNMEASURED = ("*.md", "*.json", "*.jsonl", "docs/*", "benchmarks/ledger.json",
               ".gitignore", "tests/*", "benchmarks/attr_ops.py",
               "benchmarks/gap_ops.py", "benchmarks/map_fusions.py",
               "benchmarks/trace_ops.py", "benchmarks/probe_*",
               "benchmarks/profile_stages.py",
               # the orchestrator itself: edits after a refresh cannot
               # rewrite already-recorded numbers — and check() separately
               # compares the MATRIX hash stored in each record, so a row
               # DEFINITION change does invalidate the record
               "benchmarks/refresh_ledger.py")


def _matrix_hash() -> str:
    import hashlib

    return hashlib.sha256(repr(sorted(MATRIX.items())).encode()).hexdigest()[:12]


def _docs_only_since(commit: str) -> bool:
    import fnmatch

    p = subprocess.run(["git", "-C", ROOT, "diff", "--name-only",
                        f"{commit}..HEAD"], capture_output=True, text=True)
    if p.returncode != 0:
        return False
    files = [f for f in p.stdout.splitlines() if f.strip()]
    return all(any(fnmatch.fnmatch(f, pat) for pat in _UNMEASURED)
               for f in files)


def check(history: list) -> int:
    """Round-close gate (VERDICT r3 item 5 / r4 item 1): nonzero unless the
    last ledger record was measured at the CURRENT HEAD *or* every commit
    since it touched only docs/ledger/notes files that cannot change a
    measurement.  Also cross-checks the driver's BENCH_r*.json when one
    exists at the record's commit (>2% drift fails)."""
    if not history:
        print("ledger check: FAIL — empty ledger", file=sys.stderr)
        return 1
    rec, head = history[-1], head_commit()
    if rec["commit"] != head and not _docs_only_since(rec["commit"]):
        print(f"ledger check: FAIL — last record at {rec['commit']}, "
              f"HEAD is {head} and the diff between them touches measured "
              "code; run refresh_ledger.py", file=sys.stderr)
        return 1
    # refresh_ledger.py itself is in the docs-only allowlist (committing
    # it can't rewrite recorded numbers), but a ROW-DEFINITION change
    # means the tables describe a different measurement config than the
    # one at HEAD — compare the MATRIX hash the record was measured under
    if "matrix" in rec and rec["matrix"] != _matrix_hash():
        print(f"ledger check: FAIL — record '{rec['label']}' was measured "
              f"under MATRIX {rec['matrix']}, but HEAD's MATRIX hashes to "
              f"{_matrix_hash()}; run refresh_ledger.py", file=sys.stderr)
        return 1
    import glob

    for bp in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        try:
            with open(bp) as f:
                bench = json.load(f)
        except Exception:
            continue
        if bench.get("commit") != rec["commit"]:
            continue
        lv = rec["results"].get("detect_vgg_b32", {}).get("value")
        bv = bench.get("value")
        if lv and bv and abs(bv / lv - 1.0) > 0.02:
            print(f"ledger check: FAIL — {os.path.basename(bp)} at the same "
                  f"commit reads {bv} vs ledger {lv} (>2% drift)",
                  file=sys.stderr)
            return 1
    suffix = "" if rec["commit"] == head else (
        f" (HEAD {head} differs only in docs/ledger files)")
    print(f"ledger check: ok — record '{rec['label']}' at {rec['commit']}"
          + suffix)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of matrix keys to (re)measure")
    ap.add_argument("--label", default=None,
                    help="column label (default rN by history length)")
    ap.add_argument("--rewrite_only", action="store_true",
                    help="skip measurement; regenerate docs from ledger")
    ap.add_argument("--check", action="store_true",
                    help="no measurement: exit nonzero unless the last "
                         "ledger record is at the current HEAD (and agrees "
                         "with any BENCH_r*.json at that commit)")
    args = ap.parse_args()

    history = load_ledger()
    if args.check:
        return check(history)
    if not args.rewrite_only:
        keys = args.only or list(MATRIX)
        results = {}
        # reuse the previous record for keys not re-measured
        if args.only and history:
            results.update(history[-1]["results"])
        prev_results = history[-1]["results"] if history else {}
        for k in keys:
            results[k] = run_stable(k, prev_results.get(k))
        rec = {
            "label": args.label or f"r{len(history) + 1}",
            "commit": head_commit(),
            "matrix": _matrix_hash(),
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "results": results,
        }
        # re-measuring at the same commit replaces the record
        if history and history[-1]["commit"] == rec["commit"]:
            rec["label"] = history[-1]["label"]
            history[-1] = rec
        else:
            history.append(rec)
        with open(LEDGER, "w") as f:
            json.dump(history, f, indent=1)
        print(f"ledger: {LEDGER} ({len(history)} records)")

    if not history:
        print("empty ledger; nothing to rewrite", file=sys.stderr)
        return 1
    splice(os.path.join(ROOT, "BASELINE.md"),
           "<!-- ledger:begin -->", "<!-- ledger:end -->",
           render_baseline_table(history))
    splice(os.path.join(ROOT, "README.md"),
           "<!-- ledger:begin -->", "<!-- ledger:end -->",
           render_readme_row(history[-1]))
    splice(os.path.join(ROOT, "docs", "ARCHITECTURE.md"),
           "<!-- ledger:begin -->", "<!-- ledger:end -->",
           render_arch_table(history[-1]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
