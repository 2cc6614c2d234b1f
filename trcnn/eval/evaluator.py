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

    def get_size(self, i):
        # forwarded so the multi-host sharded loader (which needs the
        # no-decode size probe for its global bucket schedule) works on
        # limited subsets too
        return self._ds.get_size(i)

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
        import jax
        self._multi = mesh is not None and jax.process_count() > 1
        if self._multi:
            # multi-host: each process decodes ONLY its loader shard
            # (1/n_hosts of the set); detections are allgathered host-side
            # in __call__ (SURVEY.md §3.5 DP / §6.8)
            n_proc = jax.process_count()
            local_bs = max(batch_size // n_proc, 1)
            self.loader = DetectionLoader(
                dataset, batch_size=local_bs, image_cfg=cfg.image,
                shard_id=jax.process_index(), num_shards=n_proc)
        else:
            self.loader = DetectionLoader(dataset, batch_size=batch_size,
                                          image_cfg=cfg.image)
        self._mesh = mesh
        self._detect = make_detect_step(model, cfg, mesh,
                                        score_thresh=score_thresh)
        self._annotations: Optional[Dict[str, dict]] = None
        self._ids: Optional[List[str]] = None
        self.last_local_images = 0   # decode work done by THIS process

    # annotations never change across calls — parse once, no image decode
    def annotations(self) -> Dict[str, dict]:
        if self._annotations is None:
            anns = {}
            ids = []
            for idx in range(self.limit):
                ex = self.dataset.get_annotation(idx)
                g = len(ex["labels"])
                diff = np.asarray(ex.get("difficult", np.zeros(g, bool)))
                anns[ex["id"]] = {"boxes": ex["boxes"],
                                  "labels": ex["labels"],
                                  "difficult": diff, "crowd": diff}
                ids.append(ex["id"])
            self._annotations = anns
            self._ids = ids          # dataset index -> id (gather keying)
        return self._annotations

    def collect_detections(self, params) -> List[dict]:
        """Run inference over the dataset → per-image detection dicts in
        ORIGINAL image coordinates.

        Multi-host: params live on the GLOBAL (data, model) mesh, so the
        detect step is collective — but each process DECODES only its
        1/n_hosts loader shard.  Per step, every process contributes its
        local batch to the global batch (host_local_array_to_global_array;
        the sharded loader's global bucket schedule keeps local shapes
        lock-stepped), runs the collective detect, and takes back exactly
        its own rows via the inverse transform.  The per-process detection
        lists are then allgathered HOST-side (fixed-shape padded arrays
        keyed by dataset index) so every process computes identical mAP
        over the full set while doing 1/n_hosts of the decode + its share
        of the device compute."""
        import jax

        if not self._multi:
            detections = []
            seen = set()
            for batch in self.loader:
                if len(seen) >= self.limit:
                    break
                dets = self._detect(params, batch.images, batch.im_info)
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
                        "id": iid, "boxes": boxes[i, v],
                        "scores": scores[i, v], "classes": classes[i, v]})
            self.last_local_images = len(detections)
            return detections

        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        self.annotations()                       # builds self._ids
        idx_of = {iid: i for i, iid in enumerate(self._ids)}

        def to_global(a):
            return multihost_utils.host_local_array_to_global_array(
                a, self._mesh, P("data"))

        def to_local(a):
            return multihost_utils.global_array_to_host_local_array(
                a, self._mesh, P("data"))

        # 1) local pass: each process detects its own shard's images only
        loc_idx: List[int] = []
        loc = {"boxes": [], "scores": [], "classes": [], "valid": []}
        seen = set()
        for batch in self.loader:
            dets = self._detect(params, to_global(batch.images),
                                to_global(batch.im_info))
            dets = jax.tree.map(to_local, dets)
            boxes = np.asarray(dets.boxes)
            scores = np.asarray(dets.scores)
            classes = np.asarray(dets.classes)
            valid = np.asarray(dets.valid)
            for i, iid in enumerate(batch.ids):
                if iid in seen:
                    continue  # padded duplicate within this shard
                seen.add(iid)
                loc_idx.append(idx_of[iid])
                loc["boxes"].append(boxes[i])
                loc["scores"].append(scores[i])
                loc["classes"].append(classes[i])
                loc["valid"].append(valid[i])

        self.last_local_images = len(loc_idx)

        # 2) host-side allgather of fixed-shape padded per-image arrays
        #    (counts differ across shards: partial global buckets pad by
        #    repeating head examples into specific shards)
        n_local = len(loc_idx)
        counts = multihost_utils.process_allgather(
            np.asarray([n_local], np.int32))             # (P, 1)
        n_max = int(counts.max())
        d = self.cfg.test.max_dets_per_image

        def padded(x, shape, dtype, fill=0):
            out = np.full((n_max,) + shape, fill, dtype)
            if n_local:
                out[:n_local] = np.stack(x)
            return out

        g_idx = multihost_utils.process_allgather(
            padded([np.int32(i) for i in loc_idx], (), np.int32, fill=-1))
        g_boxes = multihost_utils.process_allgather(
            padded(loc["boxes"], (d, 4), np.float32))
        g_scores = multihost_utils.process_allgather(
            padded(loc["scores"], (d,), np.float32))
        g_classes = multihost_utils.process_allgather(
            padded(loc["classes"], (d,), np.int32))
        g_valid = multihost_utils.process_allgather(
            padded(loc["valid"], (d,), bool))

        # 3) merge in process order — identical on every process
        detections = []
        merged = set()
        for p in range(g_idx.shape[0]):
            for j in range(g_idx.shape[1]):
                di = int(g_idx[p, j])
                if di < 0 or di in merged:
                    continue  # pad row / cross-shard duplicate
                merged.add(di)
                v = g_valid[p, j]
                detections.append({
                    "id": self._ids[di], "boxes": g_boxes[p, j, v],
                    "scores": g_scores[p, j, v],
                    "classes": g_classes[p, j, v]})
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
