#!/usr/bin/env python
"""One-command accuracy-parity harness (the release gate of SURVEY.md §7:
VOC07 mAP within 0.5 pt of the reference's 69.9, BASELINE.json metric 2).

The moment VOCdevkit + the reference's converted weights exist on disk,
this closes the gate in a single run:

    python scripts/parity.py --voc_root /path/VOCdevkit/VOC2007 \
        --reference_npz VGG16_faster_rcnn_final.npz

which performs, in order:

1. weight import through trcnn.convert (OIHW→HWIO, fc6 permute,
   bbox_pred normalization — SURVEY.md §4.3);
2. per-box golden capture on the first --golden_images test images:
   decoded boxes/scores/classes are written to --golden (JSON).  If the
   file already exists, current outputs are compared against it and the
   max deltas reported (per-box numerical-fidelity metric, BASELINE.json);
3. full VOC07-test evaluation (11-point mAP, per-class table);
4. a PARITY verdict line: pass iff mAP ≥ --target_map − 0.5.

Exit code 0 on pass, 2 on fail, so CI can gate on it.

No VOC data in this build environment (zero egress) — the harness is
validated by tests/test_parity_harness.py on a synthetic dataset with
exported-then-reimported weights (--dataset synthetic smoke path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--voc_root", default=None,
                    help="VOCdevkit/VOC2007 root (test split)")
    ap.add_argument("--reference_npz", default=None, required=False,
                    help="reference detector weights (chainer npz)")
    ap.add_argument("--split", default="test")
    ap.add_argument("--dataset", default="voc", choices=["voc", "synthetic"],
                    help="synthetic = harness smoke mode (no VOC needed)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None,
                    help="cap evaluated images (full test split otherwise)")
    ap.add_argument("--golden", default="parity_goldens.json",
                    help="golden per-box outputs: written if absent, "
                         "compared against if present")
    ap.add_argument("--golden_images", type=int, default=8,
                    help="images captured into the golden file")
    ap.add_argument("--target_map", type=float, default=0.699,
                    help="reference mAP to be within 0.5 pt of")
    ap.add_argument("--tolerance_box", type=float, default=0.1,
                    help="max per-coordinate golden delta (pixels)")
    ap.add_argument("--tolerance_score", type=float, default=1e-3)
    ap.add_argument("--out", default=None,
                    help="write the full parity report JSON here")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overrides JAX_PLATFORMS; tests need this)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from trcnn.config import voc_config
    from trcnn.data import DetectionLoader, SyntheticDetection, VOCDetection
    from trcnn.eval import Evaluator
    from trcnn.models import make_model

    if args.dataset == "voc":
        cfg = voc_config()
        if not args.voc_root:
            ap.error("--dataset voc requires --voc_root")
        ds = VOCDetection(args.voc_root, args.split, use_difficult=True)
    else:
        # smoke mode: tiny model + tiny canvases so the harness plumbing
        # verifies in seconds on CPU (the real gate needs VOC anyway)
        from __graft_entry__ import _tiny_cfg
        cfg = _tiny_cfg()
        ds = SyntheticDetection(n=32, num_classes=cfg.num_classes, seed=11,
                                hw_range=((48, 60), (64, 90)))

    model = make_model(cfg)
    report = {"weights": args.reference_npz, "dataset": args.dataset,
              "n_images": args.limit or len(ds)}

    # ---- 1. weight import -------------------------------------------------
    if args.reference_npz:
        from trcnn.convert import import_chainer_npz
        params = jax.device_put(import_chainer_npz(args.reference_npz, cfg))
        print(f"[parity] imported reference weights: {args.reference_npz}")
    else:
        print("[parity] WARNING: no --reference_npz — random init "
              "(harness smoke only)", file=sys.stderr)
        loader = DetectionLoader(ds, batch_size=1, image_cfg=cfg.image)
        b = next(iter(loader))
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     np.asarray(b.images),
                                     np.asarray(b.im_info))

    evaluator = Evaluator(model, cfg, ds, batch_size=args.batch_size,
                          limit=args.limit)

    # ---- 2. per-box golden capture / comparison ---------------------------
    golden_eval = Evaluator(model, cfg, ds, batch_size=1,
                            limit=args.golden_images)
    dets = golden_eval.collect_detections(params)
    current = {
        d["id"]: {"boxes": np.round(np.asarray(d["boxes"], np.float64), 4)
                  .tolist(),
                  "scores": np.round(np.asarray(d["scores"], np.float64), 6)
                  .tolist(),
                  "classes": np.asarray(d["classes"], int).tolist()}
        for d in dets
    }
    if os.path.exists(args.golden):
        with open(args.golden) as f:
            golden = json.load(f)
        max_box, max_score, mismatches = 0.0, 0.0, []
        for iid, g in golden.items():
            c = current.get(iid)
            if c is None:
                mismatches.append(f"{iid}: missing")
                continue
            gb, cb = np.asarray(g["boxes"]), np.asarray(c["boxes"])
            gs, cs = np.asarray(g["scores"]), np.asarray(c["scores"])
            if gb.shape != cb.shape or g["classes"] != c["classes"]:
                mismatches.append(
                    f"{iid}: detection set changed "
                    f"({gb.shape[0]} vs {cb.shape[0]} boxes)")
                continue
            if len(gb):
                max_box = max(max_box, float(np.abs(gb - cb).max()))
                max_score = max(max_score, float(np.abs(gs - cs).max()))
        golden_ok = (not mismatches and max_box <= args.tolerance_box
                     and max_score <= args.tolerance_score)
        report["golden"] = {"compared": len(golden), "max_box_delta": max_box,
                            "max_score_delta": max_score,
                            "mismatches": mismatches, "ok": golden_ok}
        print(f"[parity] golden check: {len(golden)} images, "
              f"max box Δ {max_box:.4g}px, max score Δ {max_score:.4g}, "
              f"{len(mismatches)} mismatches → "
              f"{'OK' if golden_ok else 'FAIL'}")
    else:
        with open(args.golden, "w") as f:
            json.dump(current, f, indent=1)
        report["golden"] = {"captured": len(current), "path": args.golden}
        print(f"[parity] captured {len(current)}-image goldens → "
              f"{args.golden}")

    # ---- 3. full mAP -------------------------------------------------------
    t0 = time.time()
    results = evaluator(params)
    map_v = results["eval_mAP"]
    for k in sorted(results):
        if k.startswith("eval_AP/"):
            print(f"  AP[{k.split('/', 1)[1]:>12s}] = {results[k]:.4f}")
    print(f"mAP = {map_v:.4f}  ({results['eval_images']:.0f} images, "
          f"{time.time() - t0:.1f}s)")
    report["mAP"] = map_v
    report["per_class"] = {k.split("/", 1)[1]: v for k, v in results.items()
                           if k.startswith("eval_AP/")}

    # ---- 4. verdict ---------------------------------------------------------
    gate = args.target_map - 0.005
    passed = map_v >= gate
    if args.dataset == "synthetic":
        # smoke mode: gate is meaningless on random weights; report only
        passed = True
        print(f"[parity] smoke mode: harness ran end-to-end "
              f"(mAP {map_v:.4f} not gated)")
    else:
        print(f"PARITY {'PASS' if passed else 'FAIL'}: mAP {map_v:.4f} vs "
              f"gate {gate:.4f} (reference {args.target_map:.4f} − 0.5 pt)")
    report["pass"] = bool(passed)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0 if passed else 2


if __name__ == "__main__":
    raise SystemExit(main())
