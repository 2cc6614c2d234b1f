"""Evaluation: VOC-style detection mAP.

The reference relies on the upstream py-faster-rcnn VOC devkit AP path
(SURVEY.md §4.5); the rebuild ships it first-class since mAP parity is a
tracked metric (BASELINE.json).
"""

from trcnn.eval.voc_ap import (DetectionRecord, voc_ap, voc_eval_class,
                               voc_mean_ap, write_voc_detection_files)
from trcnn.eval.coco_ap import coco_eval
from trcnn.eval.evaluator import Evaluator

__all__ = ["DetectionRecord", "voc_ap", "voc_eval_class", "voc_mean_ap",
           "write_voc_detection_files", "coco_eval", "Evaluator"]
