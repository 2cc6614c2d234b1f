"""COCO detection dataset (BASELINE.json config 5).

Self-contained COCO JSON parsing (pycocotools is not available in this
environment and is not needed for the detection task): images +
annotations + categories from ``instances_*.json``, xywh→xyxy box
conversion, crowd-region flags.  Protocol-compatible with VOCDetection so
the same DetectionLoader / trainer / evaluator drive it.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


class COCODetection:
    """COCO instances dataset.

    Args:
      image_root: directory with the image files (e.g. train2017/).
      ann_file: instances json path.
      use_crowd: include iscrowd=1 boxes (eval wants them flagged, training
        skips them — upstream Detectron behavior).

    ``get_example(i)`` → {image (H,W,3) BGR uint8, boxes (G,4) xyxy,
    labels (G,) int32 contiguous ids (1..80), difficult (G,) bool
    (=iscrowd, so the VOC-protocol evaluator ignores crowd regions),
    id str}.
    """

    def __init__(self, image_root: str, ann_file: str,
                 use_crowd: bool = False):
        self.image_root = image_root
        self.use_crowd = use_crowd
        with open(ann_file) as f:
            data = json.load(f)

        # contiguous category mapping: COCO ids are sparse (1..90 for 80)
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_ids = [c["id"] for c in cats]
        self.class_names = ("__background__",) + tuple(c["name"] for c in cats)
        self._cat_to_label = {cid: i + 1 for i, cid in enumerate(self.cat_ids)}

        self._images: Dict[int, dict] = {im["id"]: im for im in data["images"]}
        self._anns: Dict[int, List[dict]] = {i: [] for i in self._images}
        for a in data.get("annotations", []):
            if a["image_id"] in self._anns:
                self._anns[a["image_id"]].append(a)
        self.ids = sorted(self._images.keys())

    def __len__(self) -> int:
        return len(self.ids)

    def get_example(self, i: int) -> dict:
        import cv2

        img_id = self.ids[i]
        info = self._images[img_id]
        path = os.path.join(self.image_root, info["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        ann = self.get_annotation(i)
        return {"image": img, **ann}

    def get_size(self, i: int):
        """(height, width) from the instances json — no image decode."""
        info = self._images[self.ids[i]]
        return int(info["height"]), int(info["width"])

    def get_annotation(self, i: int) -> dict:
        """Annotation only — no image decode (evaluator gt pass)."""
        img_id = self.ids[i]
        boxes, labels, crowd = [], [], []
        for a in self._anns[img_id]:
            if a.get("iscrowd", 0) and not self.use_crowd:
                continue
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w - 1.0, y + h - 1.0])
            labels.append(self._cat_to_label[a["category_id"]])
            crowd.append(bool(a.get("iscrowd", 0)))
        g = len(boxes)
        return {
            "boxes": np.asarray(boxes, np.float32).reshape(g, 4),
            "labels": np.asarray(labels, np.int32),
            "difficult": np.asarray(crowd, bool),
            "id": str(img_id),
        }

    __getitem__ = get_example
