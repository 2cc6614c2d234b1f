"""Batching + prefetching host loader.

The reference iterates batch=1 images through Chainer's iterator
(SURVEY.md §4.2); the TPU rebuild batches padded canvases into fixed
shapes and overlaps host preprocessing with device compute via a
background-thread prefetcher (double buffering) plus a thread pool for
per-example decode/resize (cv2 releases the GIL) — measured on chip, a
single-threaded loader capped batch-8 training at ~4 img/s against a
~24 img/s device step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from trcnn.config import ImageConfig
from trcnn.data.preprocess import preprocess_image, scale_gt_boxes


class Batch(NamedTuple):
    images: np.ndarray     # (B, pad_h, pad_w, 3) float32 mean-subtracted BGR
    im_info: np.ndarray    # (B, 3) (scaled_h, scaled_w, scale)
    gt_boxes: np.ndarray   # (B, G, 4) float32 canvas coords
    gt_labels: np.ndarray  # (B, G) int32
    gt_valid: np.ndarray   # (B, G) bool
    ids: tuple             # (B,) example ids (host-only metadata)


class DetectionLoader:
    """Shuffled, epoch-repeating, prefetching batch loader.

    Args:
      dataset: anything with __len__/get_example (VOCDetection protocol).
      batch_size: images per batch (global batch; shard across devices
        downstream).
      max_boxes: static gt capacity per image (G).
      augment: horizontal flip with p=0.5 (the reference's only
        augmentation, SURVEY.md §8).
      shuffle/seed, repeat: iteration behavior; prefetch: queue depth.
      shard_id/num_shards: multi-host data sharding — every process runs
        the same seeded shuffle then keeps ids[shard_id::num_shards], so
        shards are disjoint and deterministic; pass
        (jax.process_index(), jax.process_count()) and a per-process
        batch_size of global_batch // process_count.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        max_boxes: int = 64,
        image_cfg: ImageConfig = ImageConfig(),
        augment: bool = False,
        shuffle: bool = False,
        repeat: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        workers: int = 8,
        uint8_images: bool = False,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.image_cfg = image_cfg
        self.augment = augment
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self.prefetch = prefetch
        self.workers = workers
        self.uint8_images = uint8_images
        self.shard_id = shard_id
        self.num_shards = num_shards

    def __len__(self) -> int:
        n = len(range(self.shard_id, len(self.dataset), self.num_shards))
        return (n + self.batch_size - 1) // self.batch_size

    # ---- single example -> padded arrays --------------------------------

    def _load(self, idx: int, rng: np.random.RandomState):
        ex = self.dataset.get_example(idx)
        flip = bool(self.augment and rng.rand() < 0.5)
        # multi-scale training: per-image random shorter-side target
        # (BASELINE config 5); canvas bucket stays fixed so shapes don't
        # change across scales
        min_size = None
        scales = self.image_cfg.multiscale_min_sizes
        if self.augment and scales:
            min_size = int(scales[rng.randint(len(scales))])
        canvas, im_info = preprocess_image(ex["image"], self.image_cfg, flip,
                                           min_size=min_size,
                                           as_uint8=self.uint8_images)
        g = self.max_boxes
        boxes = np.zeros((g, 4), np.float32)
        labels = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        gt = scale_gt_boxes(ex["boxes"], float(im_info[2]),
                            ex["image"].shape[1], flip)
        k = min(len(gt), g)
        if k:
            boxes[:k] = gt[:k]
            labels[:k] = ex["labels"][:k]
            valid[:k] = True
        return canvas, im_info, boxes, labels, valid, ex["id"]

    def _make_batch(self, parts) -> Batch:
        return Batch(
            images=np.stack([p[0] for p in parts]),
            im_info=np.stack([p[1] for p in parts]),
            gt_boxes=np.stack([p[2] for p in parts]),
            gt_labels=np.stack([p[3] for p in parts]),
            gt_valid=np.stack([p[4] for p in parts]),
            ids=tuple(p[5] for p in parts),
        )

    def _index_stream(self) -> Iterator[int]:
        rng = np.random.RandomState(self.seed)
        while True:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(order)
            if self.num_shards > 1:
                yield from self._sharded_epoch(order)
            else:
                yield from order
            if not self.repeat:
                return

    def _sharded_epoch(self, order: np.ndarray) -> Iterator[int]:
        """Multi-host index schedule with globally consistent canvas
        buckets.

        Naive per-example sharding (``order[shard_id::num_shards]``) lets
        each process group ITS shard by orientation bucket independently —
        process 0's k-th batch can be landscape while process 1's is
        portrait, so ``make_array_from_process_local_data`` would assemble
        a global batch from mismatched local shapes and the lock-stepped
        SPMD step diverges.  Instead every process runs the SAME schedule:
        the (seed-identical) shuffled order is grouped into GLOBAL batches
        of batch_size*num_shards examples of one bucket — orientation read
        via ``dataset.get_size`` (no image decode) — and each process
        keeps its contiguous slice of every global batch.
        """
        if not hasattr(self.dataset, "get_size"):
            raise TypeError(
                "multi-host sharding (num_shards > 1) needs "
                f"{type(self.dataset).__name__}.get_size(i) -> (h, w) for "
                "a globally consistent canvas-bucket schedule")
        from trcnn.data.preprocess import canvas_shape

        global_bs = self.batch_size * self.num_shards
        lo = self.shard_id * self.batch_size
        buckets: Dict[Tuple[int, int], list] = {}
        for idx in order:
            h, w = self.dataset.get_size(int(idx))
            key = canvas_shape(h, w, self.image_cfg)
            bucket = buckets.setdefault(key, [])
            bucket.append(int(idx))
            if len(bucket) == global_bs:
                yield from bucket[lo:lo + self.batch_size]
                buckets[key] = []
        if not self.repeat:
            # flush partial global buckets, padded by repeating the head so
            # every process still sees a full, same-bucket local batch
            for bucket in buckets.values():
                if bucket:
                    bucket = (bucket * ((global_bs // len(bucket)) + 1)
                              )[:global_bs]
                    yield from bucket[lo:lo + self.batch_size]

    def _batches(self) -> Iterator[Batch]:
        """Emit fixed-shape batches, grouping examples by canvas bucket
        (landscape vs portrait orientation — images in one batch must share
        one static shape; each bucket is one compiled graph).

        Per-example decode/resize runs on a thread pool with a bounded
        in-flight window; results are consumed in submission order so the
        stream stays deterministic.  Each example gets its own
        seed-derived RandomState (a shared one would race across threads).
        """
        pending: Dict[Tuple[int, ...], list] = {}

        def load(idx: int, k: int):
            rng = np.random.RandomState(
                (self.seed + 1) * 1000003 + k & 0x7FFFFFFF)
            return self._load(idx, rng)

        stream = enumerate(self._index_stream())

        with ThreadPoolExecutor(max_workers=max(self.workers, 1)) as pool:
            window: list = []

            def submit() -> bool:
                try:
                    k, idx = next(stream)
                except StopIteration:
                    return False
                window.append(pool.submit(load, idx, k))
                return True

            for _ in range(max(self.workers, 1) * 2):
                if not submit():
                    break
            while window:
                part = window.pop(0).result()
                submit()
                key = part[0].shape
                bucket = pending.setdefault(key, [])
                bucket.append(part)
                if len(bucket) == self.batch_size:
                    yield self._make_batch(bucket)
                    pending[key] = []
        if not self.repeat:
            # flush partial buckets, padding by repeating the first example
            for bucket in pending.values():
                if bucket:
                    bucket += [bucket[0]] * (self.batch_size - len(bucket))
                    yield self._make_batch(bucket)

    def __iter__(self) -> Iterator[Batch]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # surface in the consumer thread —
                err.append(e)           # a swallowed decode/preprocess error
            finally:                    # must not look like end-of-data
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise RuntimeError("DetectionLoader worker failed") \
                        from err[0]
                return
            yield item
