"""Dataset concatenation — VOC07+12 union training (BASELINE config 4).

The reference trains its 73.2-mAP row on the union of VOC2007 and VOC2012
trainval (SURVEY.md §7 row 2); upstream py-faster-rcnn expresses this as
the "voc_2007_trainval+voc_2012_trainval" imdb. Here the union is a plain
index-space concatenation over any datasets speaking the VOCDetection
protocol, so one loader/trainer drives it unchanged:

    ds = ConcatDetection([VOCDetection(root07), VOCDetection(root12)])

Shuffling, multi-host sharding, and canvas bucketing all operate on the
combined index space (the loader never knows it is a union).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


class ConcatDetection:
    """Concatenation of VOCDetection-protocol datasets.

    Example ids are prefixed with the part index ("0:000005") so they stay
    unique across parts even when two VOC years reuse an id scheme — the
    evaluator keys detections by id.
    """

    def __init__(self, parts: Sequence):
        if not parts:
            raise ValueError("ConcatDetection needs at least one dataset")
        self.parts = list(parts)
        self._offsets: List[int] = []
        total = 0
        for p in self.parts:
            self._offsets.append(total)
            total += len(p)
        self._total = total
        self.ids = [f"{pi}:{ex_id}"
                    for pi, p in enumerate(self.parts)
                    for ex_id in getattr(p, "ids", range(len(p)))]

    def __len__(self) -> int:
        return self._total

    def _locate(self, i: int) -> Tuple[int, int]:
        if not (0 <= i < self._total):
            raise IndexError(i)
        # linear scan over parts (2-3 parts in practice)
        for pi in range(len(self.parts) - 1, -1, -1):
            if i >= self._offsets[pi]:
                return pi, i - self._offsets[pi]
        raise IndexError(i)

    def get_example(self, i: int) -> dict:
        pi, j = self._locate(i)
        ex = dict(self.parts[pi].get_example(j))
        ex["id"] = f"{pi}:{ex['id']}"
        return ex

    def get_annotation(self, i: int) -> dict:
        pi, j = self._locate(i)
        ann = dict(self.parts[pi].get_annotation(j))
        ann["id"] = f"{pi}:{ann['id']}"
        return ann

    def get_size(self, i: int):
        pi, j = self._locate(i)
        return self.parts[pi].get_size(j)

    __getitem__ = get_example
