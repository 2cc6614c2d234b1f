"""Reusable detection evaluator: params → mAP over a dataset.

One object wraps what scripts/evaluate.py does inline — jitted batched
inference, padded-duplicate filtering, annotation collection (XML/JSON
only, no image decode), and the VOC07/VOC10+/COCO AP protocols — so the
Trainer can run it periodically during training (SURVEY.md §6.5 lists
eval mAP as a tracked scalar; the reference trains blind between
snapshots) and the parity harness can call it once.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np


class _Subset:
    """First-N view of a dataset (keeps the loader's iteration finite so
    limited in-training evals don't leave prefetch threads blocked)."""

    def __init__(self, dataset, n: int):
        self._ds = dataset
        self._n = min(n, len(dataset))

    def __len__(self):
        return self._n

    def get_example(self, i):
        return self._ds.get_example(i)

    def get_annotation(self, i):
        return self._ds.get_annotation(i)

    __getitem__ = get_example


class Evaluator:
    """Callable ``evaluator(params) -> {"mAP": ..., ...}``.

    Args:
      model: flax module (make_model output).
      cfg: FasterRCNNConfig.
      dataset: VOCDetection-protocol dataset (get_example/get_annotation).
      class_names: full class list incl. background; defaults to VOC.
      batch_size: inference batch.
      limit: evaluate only the first N images (fast in-training eval).
      metric: 'voc07' (11-point), 'voc' (AUC), or 'coco' (@[.5:.95]).
      mesh: optional device mesh to shard the eval batch over.
    """

    def __init__(self, model, cfg, dataset, class_names=None,
                 batch_size: int = 8, limit: Optional[int] = None,
                 metric: str = "voc07", mesh=None,
                 score_thresh: Optional[float] = None):
        from trcnn.config import VOC_CLASSES
        from trcnn.data import DetectionLoader
        from trcnn.train.step import make_detect_step

        self.model = model
        self.cfg = cfg
        self.class_names = tuple(class_names or
                                 getattr(dataset, "class_names", VOC_CLASSES))
        self.metric = metric
        self.limit = min(limit, len(dataset)) if limit else len(dataset)
        if self.limit < len(dataset):
            dataset = _Subset(dataset, self.limit)
        self.dataset = dataset
        self.loader = DetectionLoader(dataset, batch_size=batch_size,
                                      image_cfg=cfg.image)
        self._mesh = mesh
        self._detect = make_detect_step(model, cfg, mesh,
                                        score_thresh=score_thresh)
        self._annotations: Optional[Dict[str, dict]] = None

    # annotations never change across calls — parse once, no image decode
    def annotations(self) -> Dict[str, dict]:
        if self._annotations is None:
            anns = {}
            for idx in range(self.limit):
                ex = self.dataset.get_annotation(idx)
                g = len(ex["labels"])
                diff = np.asarray(ex.get("difficult", np.zeros(g, bool)))
                anns[ex["id"]] = {"boxes": ex["boxes"],
                                  "labels": ex["labels"],
                                  "difficult": diff, "crowd": diff}
            self._annotations = anns
        return self._annotations

    def collect_detections(self, params) -> List[dict]:
        """Run inference over the dataset → per-image detection dicts in
        ORIGINAL image coordinates.

        Multi-host: params live on the GLOBAL (data, model) mesh, so the
        detect step is collective.  Every process loads the SAME eval
        batches (the loader is deterministic: no shuffle, no augment),
        device_puts them onto the mesh's batch sharding, and allgathers
        the sharded outputs — each process computes identical mAP, and no
        host-local numpy ever meets a global-mesh jit (which raises
        'incompatible devices')."""
        import jax

        multi = self._mesh is not None and jax.process_count() > 1
        if multi:
            from jax.experimental import multihost_utils

            from trcnn.train.step import batch_sharding
            bsh = batch_sharding(self._mesh)

        detections = []
        seen = set()
        for batch in self.loader:
            if len(seen) >= self.limit:
                break
            images, im_info = batch.images, batch.im_info
            if multi:
                images = jax.device_put(images, bsh)
                im_info = jax.device_put(im_info, bsh)
            dets = self._detect(params, images, im_info)
            if multi:
                dets = jax.tree.map(
                    lambda a: multihost_utils.process_allgather(a, tiled=True),
                    dets)
            boxes = np.asarray(dets.boxes)
            scores = np.asarray(dets.scores)
            classes = np.asarray(dets.classes)
            valid = np.asarray(dets.valid)
            for i, iid in enumerate(batch.ids):
                if iid in seen or len(seen) >= self.limit:
                    continue  # padded duplicate in a partial final batch
                seen.add(iid)
                v = valid[i]
                detections.append({
                    "id": iid, "boxes": boxes[i, v], "scores": scores[i, v],
                    "classes": classes[i, v]})
        return detections

    def __call__(self, params) -> Dict[str, float]:
        t0 = time.time()
        detections = self.collect_detections(params)
        annotations = self.annotations()
        if self.metric == "coco":
            from trcnn.eval.coco_ap import coco_eval

            res = coco_eval(detections, annotations, len(self.class_names))
            out = {"eval_AP": res["AP"], "eval_AP50": res["AP50"],
                   "eval_AP75": res["AP75"]}
        else:
            from trcnn.eval.voc_ap import build_records, voc_mean_ap

            records = build_records(self.class_names, detections, annotations)
            mean_ap, aps = voc_mean_ap(
                records, use_07_metric=(self.metric == "voc07"))
            out = {"eval_mAP": mean_ap}
            out.update({f"eval_AP/{k}": v for k, v in aps.items()})
        out["eval_seconds"] = time.time() - t0
        out["eval_images"] = float(len(detections))
        return out
