#!/usr/bin/env python
"""End-to-end Faster R-CNN training — CLI parity with the reference's
``train.py`` (SURVEY.md §4.2: approximate joint training, MomentumSGD
lr 1e-3 ×0.1 @50k, 70k iters, batch 1 image, VOC07 trainval).

    python scripts/train.py --dataset_root /path/VOCdevkit/VOC2007 \
        --pretrained_model imagenet_vgg16.npz --out checkpoints/

TPU-native deltas vs the reference: any batch size (padded canvases),
data-parallel over every local device via a jax.sharding mesh, orbax
snapshots with auto-resume, one jitted step.  ``--dataset synthetic``
trains on the built-in synthetic set (no VOC on disk needed).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="voc", choices=["voc", "synthetic"])
    ap.add_argument("--dataset_root", default=None,
                    help="VOCdevkit/VOC2007 root (required for --dataset voc)")
    ap.add_argument("--split", default="trainval")
    ap.add_argument("--pretrained_model", default=None,
                    help="chainer npz to warm-start from (ImageNet trunk or "
                         "full detector)")
    ap.add_argument("--out", default="result",
                    help="checkpoint/log output directory")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--iters", type=int, default=None,
                    help="override total iterations (default 70000)")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "resnet101"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype (params stay fp32)")
    ap.add_argument("--transfer", default="float32",
                    choices=["float32", "uint8"],
                    help="host->device image format; uint8 quarters the "
                         "upload bytes (mean-subtract moves on device, "
                         "<=0.5-intensity rounding)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=20)
    ap.add_argument("--checkpoint_every", type=int, default=5000)
    ap.add_argument("--no_mesh", action="store_true",
                    help="single-device jit (CPU debug path)")
    ap.add_argument("--gpu", type=int, default=-1, help="ignored (CLI parity)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from trcnn.config import voc_config
    from trcnn.data import DetectionLoader, SyntheticDetection, VOCDetection
    from trcnn.models import make_model
    from trcnn.train import TrainConfig, Trainer

    cfg = voc_config()
    if args.backbone != "vgg16":
        cfg = cfg.replace(backbone=args.backbone)
    if args.lr is not None:
        cfg = cfg.replace(optim=cfg.optim.__class__(base_lr=args.lr))

    if args.dataset == "voc":
        if not args.dataset_root:
            ap.error("--dataset voc requires --dataset_root")
        ds = VOCDetection(args.dataset_root, args.split)
    else:
        ds = SyntheticDetection(n=512, num_classes=cfg.num_classes,
                                seed=args.seed)
    print(f"dataset: {args.dataset} ({len(ds)} images), "
          f"devices: {jax.device_count()}", flush=True)

    loader = DetectionLoader(
        ds, batch_size=args.batch_size, image_cfg=cfg.image,
        augment=True, shuffle=True, repeat=True, seed=args.seed,
        uint8_images=(args.transfer == "uint8"))

    import jax.numpy as jnp
    model = make_model(cfg, dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                       else jnp.float32)
    ex = next(iter(DetectionLoader(ds, batch_size=args.batch_size,
                                   image_cfg=cfg.image)))
    if args.pretrained_model:
        from trcnn.convert import import_chainer_npz
        params = import_chainer_npz(args.pretrained_model, cfg, strict=False)
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(args.seed),
            np.asarray(ex.images), np.asarray(ex.im_info))

    trainer = Trainer(model, params, cfg, TrainConfig(
        total_iters=args.iters,
        log_every=args.log_every,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=args.out,
        seed=args.seed,
        use_mesh=not args.no_mesh,
    ))
    trainer.fit(iter(loader))
    print("training done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
