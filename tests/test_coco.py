"""COCO dataset parsing and COCO-style AP tests."""

import json
import os

import numpy as np
import pytest

from trcnn.eval.coco_ap import coco_eval


def _write_coco_fixture(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    for i, (h, w) in enumerate([(120, 160), (90, 140)]):
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(img_dir / name),
                    np.full((h, w, 3), 100 + i, np.uint8))
        images.append({"id": 100 + i, "file_name": name,
                       "height": h, "width": w})
    annotations += [
        {"id": aid, "image_id": 100, "category_id": 18,
         "bbox": [10.0, 20.0, 50.0, 40.0], "iscrowd": 0, "area": 2000.0},
        {"id": aid + 1, "image_id": 100, "category_id": 1,
         "bbox": [60.0, 10.0, 30.0, 30.0], "iscrowd": 1, "area": 900.0},
        {"id": aid + 2, "image_id": 101, "category_id": 44,
         "bbox": [5.0, 5.0, 20.0, 25.0], "iscrowd": 0, "area": 500.0},
    ]
    categories = [{"id": 1, "name": "person"}, {"id": 18, "name": "dog"},
                  {"id": 44, "name": "bottle"}]
    ann = {"images": images, "annotations": annotations,
           "categories": categories}
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(ann))
    return str(img_dir), str(ann_path)


def test_coco_dataset_parsing(tmp_path):
    from trcnn.data.coco import COCODetection

    img_dir, ann_path = _write_coco_fixture(tmp_path)
    ds = COCODetection(img_dir, ann_path)
    assert len(ds) == 2
    assert ds.class_names == ("__background__", "person", "dog", "bottle")
    ex = ds.get_example(0)
    assert ex["image"].shape == (120, 160, 3)
    # crowd skipped by default; xywh -> xyxy with -1
    assert ex["boxes"].shape == (1, 4)
    np.testing.assert_allclose(ex["boxes"][0], [10, 20, 59, 59])
    assert ex["labels"][0] == 2  # dog -> contiguous id 2

    ds2 = COCODetection(img_dir, ann_path, use_crowd=True)
    ex2 = ds2.get_example(0)
    assert ex2["boxes"].shape == (2, 4)
    assert list(ex2["difficult"]) == [False, True]


BOX = [10.0, 10.0, 60.0, 60.0]


def _ann(boxes, labels, crowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return {"boxes": boxes, "labels": np.asarray(labels),
            "crowd": np.asarray(crowd if crowd is not None
                                else [False] * len(boxes))}


def test_coco_eval_perfect():
    dets = [{"id": "a", "boxes": np.asarray([BOX]),
             "scores": np.asarray([0.9]), "classes": np.asarray([1])}]
    anns = {"a": _ann([BOX], [1])}
    res = coco_eval(dets, anns, num_classes=3)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)


def test_coco_eval_iou_sensitivity():
    # detection with IoU ~0.6 vs gt: counts at t=0.5/0.55/0.6 only
    shifted = [10.0, 10.0 + 50 * 0.25, 60.0, 60.0 + 50 * 0.25]
    dets = [{"id": "a", "boxes": np.asarray([shifted]),
             "scores": np.asarray([0.9]), "classes": np.asarray([1])}]
    anns = {"a": _ann([BOX], [1])}
    res = coco_eval(dets, anns, num_classes=2)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert 0.0 < res["AP"] < 1.0


def test_coco_eval_crowd_not_penalized():
    far = [200.0, 200.0, 260.0, 250.0]
    dets = [{"id": "a", "boxes": np.asarray([BOX, far]),
             "scores": np.asarray([0.9, 0.8]),
             "classes": np.asarray([1, 1])}]
    # far overlaps a crowd gt -> matched-to-ignored, neither TP nor FP
    anns = {"a": _ann([BOX, far], [1, 1], crowd=[False, True])}
    res = coco_eval(dets, anns, num_classes=2)
    assert res["AP"] == pytest.approx(1.0)
