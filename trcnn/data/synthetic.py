"""Synthetic detection dataset.

Not in the reference; exists so tests, benchmarks, and the training loop
run end-to-end on machines without VOC/COCO on disk (this build
environment has no datasets).  Images are seeded-random noise with drawn
rectangles at the gt boxes, so a detector *can* overfit it — useful as a
training smoke test.
"""

from __future__ import annotations

import numpy as np


class SyntheticDetection:
    """Deterministic random dataset with the VOCDetection protocol."""

    def __init__(self, n: int = 64, num_classes: int = 21, max_boxes: int = 6,
                 hw_range=((360, 600), (480, 800)), seed: int = 0):
        self.n = n
        self.num_classes = num_classes
        self.max_boxes = max_boxes
        self.hw_range = hw_range
        self.seed = seed
        self.ids = [f"syn{i:06d}" for i in range(n)]

    def __len__(self) -> int:
        return self.n

    def get_size(self, i: int):
        """(height, width) without generating the image (same RNG draws)."""
        rng = np.random.RandomState(self.seed * 100003 + i)
        (h_lo, h_hi), (w_lo, w_hi) = self.hw_range
        return int(rng.randint(h_lo, h_hi + 1)), int(rng.randint(w_lo, w_hi + 1))

    def get_example(self, i: int) -> dict:
        rng = np.random.RandomState(self.seed * 100003 + i)
        (h_lo, h_hi), (w_lo, w_hi) = self.hw_range
        h = int(rng.randint(h_lo, h_hi + 1))
        w = int(rng.randint(w_lo, w_hi + 1))
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        g = int(rng.randint(1, self.max_boxes + 1))
        x1 = rng.uniform(0, w * 0.6, g)
        y1 = rng.uniform(0, h * 0.6, g)
        bw = rng.uniform(0.15 * w, 0.4 * w, g)
        bh = rng.uniform(0.15 * h, 0.4 * h, g)
        x2 = np.minimum(x1 + bw, w - 1.0)
        y2 = np.minimum(y1 + bh, h - 1.0)
        boxes = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
        labels = rng.randint(1, self.num_classes, size=g).astype(np.int32)
        # draw filled class-colored rectangles so the task is learnable
        for (a, b, c, d), lab in zip(boxes.astype(np.int32), labels):
            color = ((lab * 37) % 256, (lab * 91) % 256, (lab * 157) % 256)
            img[b:d + 1, a:c + 1] = color
        return {"image": img, "boxes": boxes, "labels": labels,
                "id": f"syn{i:06d}"}

    def get_annotation(self, i: int) -> dict:
        ex = self.get_example(i)  # generation is cheap; keep one code path
        return {k: v for k, v in ex.items() if k != "image"}

    __getitem__ = get_example
