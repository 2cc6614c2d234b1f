"""VOC AP metric tests against hand-computed expectations."""

import numpy as np

from trcnn.eval.voc_ap import (DetectionRecord, build_records, voc_ap,
                               voc_eval_class, voc_mean_ap)
import pytest

pytestmark = pytest.mark.fast


def test_voc_ap_perfect_curve():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 1.0])
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-9
    assert abs(voc_ap(rec, prec, use_07_metric=False) - 1.0) < 1e-9


def test_voc_ap_11_point_known_value():
    # one TP then one FP over 2 gt: recall [0.5, 0.5], precision [1.0, 0.5]
    rec = np.asarray([0.5, 0.5])
    prec = np.asarray([1.0, 0.5])
    # 11-point: t in 0..0.5 -> max prec at recall>=t is 1.0 (6 points),
    # t>0.5 -> 0. AP = 6/11
    assert abs(voc_ap(rec, prec, True) - 6.0 / 11.0) < 1e-9


def _record(dets, gts, difficult=None):
    """dets: list of (img, score, box). gts: {img: [boxes]}"""
    difficult = difficult or {}
    return DetectionRecord(
        image_ids=[d[0] for d in dets],
        scores=np.asarray([d[1] for d in dets], np.float64),
        boxes=np.asarray([d[2] for d in dets], np.float64).reshape(-1, 4),
        gt_boxes={k: np.asarray(v, np.float64).reshape(-1, 4)
                  for k, v in gts.items()},
        gt_difficult={k: np.asarray(difficult.get(k, [False] * len(v)), bool)
                      for k, v in gts.items()},
    )


BOX = [10.0, 10.0, 60.0, 60.0]
FAR = [200.0, 200.0, 260.0, 250.0]


def test_eval_class_simple_match():
    rec = _record(
        dets=[("a", 0.9, BOX), ("b", 0.8, FAR)],
        gts={"a": [BOX], "b": [FAR]},
    )
    ap, recall, precision = voc_eval_class(rec)
    assert abs(ap - 1.0) < 1e-9
    assert recall[-1] == 1.0 and (precision == 1.0).all()


def test_eval_class_duplicate_is_fp():
    # two detections on the same gt: second is a false positive
    rec = _record(
        dets=[("a", 0.9, BOX), ("a", 0.8, [12.0, 12.0, 62.0, 62.0])],
        gts={"a": [BOX]},
    )
    ap, recall, precision = voc_eval_class(rec)
    assert recall[-1] == 1.0
    assert abs(precision[-1] - 0.5) < 1e-9
    assert abs(ap - 1.0) < 1e-9  # 07 metric: max precision at each recall


def test_eval_class_localization_miss_is_fp():
    rec = _record(
        dets=[("a", 0.9, [100.0, 100.0, 140.0, 140.0])],
        gts={"a": [BOX]},
    )
    ap, recall, _ = voc_eval_class(rec)
    assert ap == 0.0 and recall[-1] == 0.0


def test_eval_difficult_ignored_not_penalized():
    rec = _record(
        dets=[("a", 0.9, BOX)],
        gts={"a": [BOX, FAR]},
        difficult={"a": [True, False]},
    )
    ap, recall, precision = voc_eval_class(rec)
    # matching a difficult gt: detection neither TP nor FP; npos counts only
    # the non-difficult gt (unmatched) -> recall 0, no penalty
    assert recall[-1] == 0.0 and ap == 0.0
    assert precision[-1] == precision[0]  # no FP recorded


def test_build_records_and_mean_ap():
    class_names = ("__background__", "cat", "dog")
    detections = [
        {"id": "a", "boxes": np.asarray([BOX]), "scores": np.asarray([0.9]),
         "classes": np.asarray([1])},
        {"id": "b", "boxes": np.asarray([FAR]), "scores": np.asarray([0.8]),
         "classes": np.asarray([2])},
    ]
    annotations = {
        "a": {"boxes": np.asarray([BOX]), "labels": np.asarray([1])},
        "b": {"boxes": np.asarray([FAR]), "labels": np.asarray([2])},
    }
    records = build_records(class_names, detections, annotations)
    mean_ap, aps = voc_mean_ap(records)
    assert abs(mean_ap - 1.0) < 1e-9
    assert set(aps) == {"cat", "dog"}
