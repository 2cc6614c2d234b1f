"""PASCAL VOC dataset (SURVEY.md §3.4 "VOC dataset" row).

Parses VOCdevkit-style XML annotations into (image, gt_boxes, gt_labels)
examples with the Chainer dataset protocol the reference uses
(``get_example(i)`` / ``__len__``), plus horizontal-flip augmentation —
the only augmentation in the py-faster-rcnn lineage (SURVEY.md §8).

Layout expected (standard VOCdevkit):
    root/
      JPEGImages/<id>.jpg
      Annotations/<id>.xml
      ImageSets/Main/<split>.txt
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from trcnn.config import VOC_CLASSES

_CLASS_TO_ID: Dict[str, int] = {n: i for i, n in enumerate(VOC_CLASSES)}


def parse_voc_xml(
    path: str, use_difficult: bool = False
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse one annotation file →
    (boxes (G,4) float32, labels (G,) int32, difficult (G,) bool).

    VOC stores 1-based inclusive pixel coordinates; the py-faster-rcnn
    lineage subtracts 1 to get 0-based (x1, y1, x2, y2).  Difficult objects
    are skipped for training by default (upstream behavior); evaluation
    loads them (``use_difficult=True``) so the AP code can ignore-not-
    penalize them (VOC devkit protocol).
    """
    tree = ET.parse(path)
    boxes: List[List[float]] = []
    labels: List[int] = []
    difficult: List[bool] = []
    for obj in tree.findall("object"):
        diff = obj.find("difficult")
        is_diff = diff is not None and int(diff.text) == 1
        if not use_difficult and is_diff:
            continue
        name = obj.find("name").text.lower().strip()
        if name not in _CLASS_TO_ID:
            continue
        bb = obj.find("bndbox")
        boxes.append([
            float(bb.find("xmin").text) - 1.0,
            float(bb.find("ymin").text) - 1.0,
            float(bb.find("xmax").text) - 1.0,
            float(bb.find("ymax").text) - 1.0,
        ])
        labels.append(_CLASS_TO_ID[name])
        difficult.append(is_diff)
    if not boxes:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.int32),
                np.zeros((0,), bool))
    return (np.asarray(boxes, np.float32), np.asarray(labels, np.int32),
            np.asarray(difficult, bool))


class VOCDetection:
    """VOC detection dataset with the reference's example protocol.

    ``get_example(i)`` → dict with raw ``image`` (H, W, 3) uint8 BGR,
    ``boxes`` (G, 4) float32, ``labels`` (G,) int32, ``id`` str.
    Preprocessing/batching live in DetectionLoader (separation the
    reference lacks; it lets one dataset serve train/eval/bench paths).
    """

    def __init__(self, root: str, split: str = "trainval",
                 use_difficult: bool = False):
        self.root = root
        self.split = split
        self.use_difficult = use_difficult
        list_file = os.path.join(root, "ImageSets", "Main", f"{split}.txt")
        with open(list_file) as f:
            self.ids = [line.strip().split()[0] for line in f if line.strip()]

    def __len__(self) -> int:
        return len(self.ids)

    def get_example(self, i: int) -> dict:
        import cv2

        img_id = self.ids[i]
        img_path = os.path.join(self.root, "JPEGImages", f"{img_id}.jpg")
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)  # BGR, matches reference
        if img is None:
            raise FileNotFoundError(img_path)
        boxes, labels, difficult = parse_voc_xml(
            os.path.join(self.root, "Annotations", f"{img_id}.xml"),
            self.use_difficult)
        return {"image": img, "boxes": boxes, "labels": labels,
                "difficult": difficult, "id": img_id}

    def get_size(self, i: int):
        """(height, width) of the raw image from the XML <size> element —
        no JPEG decode.  The multi-host loader needs sizes for a globally
        consistent canvas-bucket schedule."""
        tree = ET.parse(
            os.path.join(self.root, "Annotations", f"{self.ids[i]}.xml"))
        sz = tree.find("size")
        return int(sz.find("height").text), int(sz.find("width").text)

    def get_annotation(self, i: int) -> dict:
        """Annotation only — no image decode (the evaluator's gt pass
        needs just the XML; decoding every JPEG a second time is O(dataset)
        wasted work)."""
        img_id = self.ids[i]
        boxes, labels, difficult = parse_voc_xml(
            os.path.join(self.root, "Annotations", f"{img_id}.xml"),
            self.use_difficult)
        return {"boxes": boxes, "labels": labels, "difficult": difficult,
                "id": img_id}

    __getitem__ = get_example
