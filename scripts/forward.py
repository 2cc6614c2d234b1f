#!/usr/bin/env python
"""Inference demo — CLI parity with the reference's ``forward.py``
(SURVEY.md §4.1: image file → preprocess → network → per-class NMS → boxes
drawn on the output image).

    python scripts/forward.py --img_fn img.jpg --out_fn result.jpg \
        --pretrained_model weights.npz

Unlike the reference there is no host/device ping-pong: preprocessing
output goes up once, one jitted graph returns final detections.
``--gpu`` is accepted for CLI compatibility and ignored (device selection
is JAX's platform choice).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--img_fn", required=True, help="input image file")
    ap.add_argument("--out_fn", default="result.jpg", help="output image file")
    ap.add_argument("--pretrained_model", default=None,
                    help="chainer-format npz detection weights")
    ap.add_argument("--score_thresh", type=float, default=None,
                    help="visualization score threshold (default 0.7)")
    ap.add_argument("--nms_thresh", type=float, default=None)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype. float32 = bit-parity with the "
                         "reference (default); bfloat16 = TPU serving "
                         "mode with a one-time kernel pre-cast "
                         "(bit-identical to in-graph casting, removes "
                         "the per-dispatch cast traffic)")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "resnet101"])
    ap.add_argument("--gpu", type=int, default=-1,
                    help="accepted for reference CLI parity; ignored")
    ap.add_argument("--min_size", type=int, default=600)
    ap.add_argument("--max_size", type=int, default=1000)
    args = ap.parse_args()

    import cv2
    import jax

    from trcnn.config import VOC_CLASSES, voc_config
    from trcnn.data.preprocess import preprocess_image
    from trcnn.models import make_model
    from trcnn.models.faster_rcnn import postprocess

    cfg = voc_config()
    if args.backbone != "vgg16":
        cfg = cfg.replace(backbone=args.backbone)
    if (args.min_size, args.max_size) != (600, 1000):
        # rescale target only; the padded canvas bucket (and therefore the
        # compiled graph shape) stays the config's
        import dataclasses

        cfg = cfg.replace(image=dataclasses.replace(
            cfg.image, target_min_size=args.min_size,
            target_max_size=args.max_size))
    if args.nms_thresh is not None:
        cfg = cfg.replace(test=cfg.test.__class__(nms_thresh=args.nms_thresh))
    score_thresh = (args.score_thresh if args.score_thresh is not None
                    else cfg.test.score_thresh_demo)

    img = cv2.imread(args.img_fn, cv2.IMREAD_COLOR)
    if img is None:
        print(f"cannot read {args.img_fn}", file=sys.stderr)
        return 1
    canvas, im_info = preprocess_image(img, cfg.image)
    images = canvas[None]
    im_info = im_info[None]

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(cfg, dtype=dtype)
    if args.pretrained_model:
        from trcnn.convert import import_weights
        # device_put once — a host-numpy param tree would re-upload on
        # every jitted call.  Accepts chainer .npz, torchvision/chainercv
        # R101 npz, or a raw .caffemodel (the reference's original format)
        params = jax.device_put(import_weights(args.pretrained_model, cfg))
    else:
        print("[warn] no --pretrained_model: using random init "
              "(smoke-test mode)", file=sys.stderr)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, im_info)
    from trcnn.models.faster_rcnn import cast_params_for_inference
    params = cast_params_for_inference(params, dtype)  # no-op at f32

    @jax.jit
    def run(p, x, info):
        raw = model.apply(p, x, info, method="detect")
        return postprocess(raw, info, cfg, score_thresh=score_thresh)

    t0 = time.time()
    dets = jax.block_until_ready(run(params, images, im_info))
    t_first = time.time() - t0
    t0 = time.time()
    dets = jax.block_until_ready(run(params, images, im_info))
    t_steady = time.time() - t0
    print(f"inference: {t_steady * 1e3:.1f} ms/img "
          f"(first call incl. compile {t_first:.1f} s)")

    boxes = np.asarray(dets.boxes[0])
    scores = np.asarray(dets.scores[0])
    classes = np.asarray(dets.classes[0])
    valid = np.asarray(dets.valid[0])
    n = int(valid.sum())
    print(f"{n} detections (score >= {score_thresh}):")
    for i in np.where(valid)[0]:
        x1, y1, x2, y2 = boxes[i]
        name = VOC_CLASSES[classes[i]]
        print(f"  {name:>12s} {scores[i]:.3f}  "
              f"({x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f})")
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                      (0, 0, 255), 2)
        cv2.putText(img, f"{name} {scores[i]:.2f}",
                    (int(x1), max(int(y1) - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 255), 1)
    cv2.imwrite(args.out_fn, img)
    print(f"wrote {args.out_fn}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
