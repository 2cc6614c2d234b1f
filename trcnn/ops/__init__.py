"""Detection ops: the device-side building blocks of the pipeline.

Everything here is pure-functional jnp / Pallas, fixed-shape, and jittable.
The reference implements these as host-side numpy + Cython/CUDA
(SURVEY.md §3.2/§3.3); here they are XLA/Pallas device code so the full
image -> detections path stays in one compiled graph.
"""

from trcnn.ops.anchors import generate_base_anchors, shifted_anchors
from trcnn.ops.boxes import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    box_iou,
    box_area,
)
from trcnn.ops.topk import masked_topk
from trcnn.ops.nms import nms_padded, batched_nms, multiclass_nms
from trcnn.ops.roi_pool import roi_max_pool
from trcnn.ops.roi_align import roi_align
from trcnn.ops.proposal import proposal_layer

__all__ = [
    "generate_base_anchors",
    "shifted_anchors",
    "bbox_transform",
    "bbox_transform_inv",
    "clip_boxes",
    "box_iou",
    "box_area",
    "masked_topk",
    "nms_padded",
    "batched_nms",
    "multiclass_nms",
    "roi_max_pool",
    "roi_align",
    "proposal_layer",
]
