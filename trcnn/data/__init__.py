"""Data layer: preprocessing, datasets, batching.

Rebuild of the reference's VOC dataset module (SURVEY.md §3.4): VOC XML
parsing, BGR + Caffe pixel-mean preprocessing, 600/1000 aspect-preserving
resize, horizontal-flip augmentation — plus what the reference lacks:
static padded canvases (fixed-shape batches for XLA), a COCO loader, a
synthetic dataset for tests/benchmarks, and a prefetching host loader.
"""

from trcnn.data.preprocess import (
    compute_scale,
    preprocess_image,
    preprocess_device,
)
from trcnn.data.voc import VOCDetection, parse_voc_xml
from trcnn.data.coco import COCODetection
from trcnn.data.synthetic import SyntheticDetection
from trcnn.data.concat import ConcatDetection
from trcnn.data.loader import DetectionLoader, Batch

__all__ = [
    "compute_scale",
    "preprocess_image",
    "preprocess_device",
    "VOCDetection",
    "parse_voc_xml",
    "COCODetection",
    "ConcatDetection",
    "SyntheticDetection",
    "DetectionLoader",
    "Batch",
]
