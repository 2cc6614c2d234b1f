#!/usr/bin/env python
"""Pretrained-weight fetcher (SURVEY.md §3.4 "Weight fetch/convert").

The reference ships a script that downloads the converted Caffe weights
(``VGG16_faster_rcnn_final`` → Chainer npz).  This environment has zero
network egress, so this script documents the canonical sources and
converts if a file is already present:

  * detection weights (Chainer npz, converted from the original Caffe
    ``VGG16_faster_rcnn_final.caffemodel`` of rbgirshick/py-faster-rcnn):
    the mitmul/chainer-faster-rcnn release assets.
  * ImageNet VGG-16 trunk for training warm-start: the Chainer VGG16Layers
    pretrained npz (``vgg16.npz``).

Usage once a file is obtainable:
    python scripts/download_weights.py --file VGG16_faster_rcnn_final.npz \
        --out flax_params.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", default=None,
                    help="already-downloaded chainer npz to convert")
    ap.add_argument("--out", default="flax_params.npz")
    args = ap.parse_args()

    if not args.file:
        print(__doc__)
        print("no --file given and no network egress available; "
              "download the npz elsewhere and pass it with --file.")
        return 1
    if not os.path.exists(args.file):
        print(f"{args.file} not found", file=sys.stderr)
        return 1

    import numpy as np

    from trcnn.config import voc_config
    from trcnn.convert import import_chainer_npz

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from convert_weights import flatten

    params = import_chainer_npz(args.file, voc_config(), strict=False)
    np.savez(args.out, **flatten(params))
    print(f"converted {args.file} -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
