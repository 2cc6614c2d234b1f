#!/usr/bin/env python
"""VOC detection evaluation (SURVEY.md §4.5) — batched padded inference +
VOC07 11-point mAP, the release-gate metric (BASELINE.json).

    python scripts/evaluate.py --dataset_root /path/VOC2007 --split test \
        --pretrained_model weights.npz --batch_size 8
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="voc",
                    choices=["voc", "coco", "synthetic"])
    ap.add_argument("--dataset_root", default=None,
                    help="VOCdevkit/VOC2007 root, or COCO image dir")
    ap.add_argument("--ann_file", default=None,
                    help="COCO instances json (with --dataset coco)")
    ap.add_argument("--metric", default=None, choices=["voc07", "voc", "coco"],
                    help="AP protocol (default: matches the dataset)")
    ap.add_argument("--split", default="test")
    ap.add_argument("--pretrained_model", default=None)
    ap.add_argument("--checkpoint_dir", default=None,
                    help="orbax dir to restore trained params from")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype. float32 = bit-parity with the "
                         "reference (default); bfloat16 = TPU serving "
                         "mode with a one-time kernel pre-cast "
                         "(bit-identical to in-graph casting, removes "
                         "the per-dispatch cast traffic)")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "resnet101"])
    ap.add_argument("--use_07_metric", action="store_true", default=True)
    ap.add_argument("--limit", type=int, default=None,
                    help="evaluate only the first N images")
    ap.add_argument("--write_dets", default=None, metavar="DIR",
                    help="also write VOC-devkit comp4_det_<split>_<class>"
                         ".txt files to DIR (external devkit re-scoring)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from trcnn.config import VOC_CLASSES, coco_config, voc_config
    from trcnn.data import (COCODetection, DetectionLoader,
                            SyntheticDetection, VOCDetection)
    from trcnn.eval import Evaluator
    from trcnn.eval.voc_ap import build_records, voc_mean_ap
    from trcnn.models import make_model
    from trcnn.train.step import make_mesh

    class_names = VOC_CLASSES
    if args.dataset == "voc":
        cfg = voc_config()
        if not args.dataset_root:
            ap.error("--dataset voc requires --dataset_root")
        ds = VOCDetection(args.dataset_root, args.split, use_difficult=True)
    elif args.dataset == "coco":
        cfg = coco_config()
        if not (args.dataset_root and args.ann_file):
            ap.error("--dataset coco requires --dataset_root and --ann_file")
        ds = COCODetection(args.dataset_root, args.ann_file, use_crowd=True)
        class_names = ds.class_names
    else:
        cfg = voc_config()
        ds = SyntheticDetection(n=64, num_classes=cfg.num_classes)
    if args.backbone != "vgg16":
        cfg = cfg.replace(backbone=args.backbone)

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(cfg, dtype=dtype)
    # prefetch=0: a one-shot shape probe must not leave a prefetch worker
    # thread blocked on its queue holding decoded canvases for the rest of
    # the process lifetime
    first = next(iter(DetectionLoader(ds, batch_size=args.batch_size,
                                      image_cfg=cfg.image, prefetch=0)))
    if args.pretrained_model:
        from trcnn.convert import import_weights
        params = jax.device_put(import_weights(args.pretrained_model, cfg))
    elif args.checkpoint_dir:
        import orbax.checkpoint as ocp
        from trcnn.train import TrainState, make_optimizer
        import os
        mgr = ocp.CheckpointManager(os.path.abspath(args.checkpoint_dir))
        init_params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                          np.asarray(first.images),
                                          np.asarray(first.im_info))
        tx = make_optimizer(init_params, cfg.optim, cfg.backbone)
        tmpl = jax.tree.map(np.asarray, TrainState.create(init_params, tx))
        restored = mgr.restore(mgr.latest_step(),
                               args=ocp.args.StandardRestore(tmpl))
        params = jax.device_put(restored.params)  # numpy tree otherwise
        print(f"restored step {mgr.latest_step()}")
    else:
        print("[warn] random init (smoke mode)", file=sys.stderr)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     np.asarray(first.images),
                                     np.asarray(first.im_info))
    from trcnn.models.faster_rcnn import cast_params_for_inference
    params = cast_params_for_inference(params, dtype)  # no-op at f32

    mesh = make_mesh() if jax.device_count() > 1 else None
    metric = args.metric or ("coco" if args.dataset == "coco" else "voc07")
    evaluator = Evaluator(model, cfg, ds, class_names=class_names,
                          batch_size=args.batch_size, limit=args.limit,
                          metric=metric, mesh=mesh)

    t0 = time.time()
    detections = evaluator.collect_detections(params)
    t_total = time.time() - t0
    # annotations from XML/JSON only — no second image decode pass
    annotations = evaluator.annotations()
    n_img = len(detections)

    if args.write_dets:
        from trcnn.eval.voc_ap import write_voc_detection_files
        paths = write_voc_detection_files(class_names, detections,
                                          args.write_dets, split=args.split)
        print(f"wrote {len(paths)} devkit detection files to "
              f"{args.write_dets}")

    if metric == "coco":
        from trcnn.eval.coco_ap import coco_eval

        res = coco_eval(detections, annotations, len(class_names))
        print(f"AP={res['AP']:.4f} AP50={res['AP50']:.4f} "
              f"AP75={res['AP75']:.4f}  ({n_img} images, "
              f"{n_img / max(t_total, 1e-9):.1f} img/s incl. compile)")
    else:
        records = build_records(class_names, detections, annotations)
        mean_ap, aps = voc_mean_ap(records,
                                   use_07_metric=(metric == "voc07"))
        for name, ap_v in sorted(aps.items()):
            print(f"  AP[{name:>12s}] = {ap_v:.4f}")
        print(f"mAP = {mean_ap:.4f}  ({n_img} images, "
              f"{n_img / max(t_total, 1e-9):.1f} img/s incl. compile)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
