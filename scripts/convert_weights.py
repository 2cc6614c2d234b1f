#!/usr/bin/env python
"""Weight conversion CLI (SURVEY.md §3.4 "Weight fetch/convert").

Chainer npz → trcnn Flax params (and back):

    # import reference weights, save as orbax-free .npz flax tree
    python scripts/convert_weights.py --src VGG16_faster_rcnn_final.npz \
        --dst flax_params.npz --direction to_flax

    # export trained flax params back to the reference's npz layout
    python scripts/convert_weights.py --src flax_params.npz \
        --dst chainer.npz --direction to_chainer

The flax-side container is a flat npz with '/'-joined keys (loadable via
``load_flax_npz`` below / ``trcnn.convert``).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_flax_npz(path):
    return unflatten(dict(np.load(path)))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--direction", required=True,
                    choices=["to_flax", "to_chainer"])
    ap.add_argument("--num_classes", type=int, default=21)
    ap.add_argument("--head_hidden", type=int, default=4096)
    ap.add_argument("--no_bbox_normalize", action="store_true",
                    help="skip the bbox_pred normalization fix-up "
                         "(for trees that never baked unnormalization in)")
    ap.add_argument("--loose", action="store_true",
                    help="skip missing tensors instead of erroring")
    args = ap.parse_args()

    from trcnn.config import FasterRCNNConfig
    from trcnn.convert import export_chainer_npz, import_chainer_npz

    cfg = FasterRCNNConfig(num_classes=args.num_classes,
                           head_hidden=args.head_hidden)
    if args.direction == "to_flax":
        params = import_chainer_npz(
            args.src, cfg,
            normalize_bbox_pred=not args.no_bbox_normalize,
            strict=not args.loose)
        flat = flatten(params)
        np.savez(args.dst, **flat)
        print(f"wrote {len(flat)} tensors to {args.dst}")
    else:
        params = load_flax_npz(args.src)
        export_chainer_npz(params, args.dst, cfg)
        print(f"wrote chainer-layout npz to {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
