"""Box transforms, clipping, and IoU — the numerical heart of the contract.

Device-side jnp reimplementation of the bbox_transform / bbox_overlaps math
the reference ports from py-faster-rcnn (SURVEY.md §3.2).  Every function
honors the "+1" pixel convention: width = x2 - x1 + 1 (SURVEY.md §4.4 calls
this out as the fidelity trap — it appears in encode, decode, clip, IoU and
min-size filtering alike).

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap/grad-safe.  Boxes are (..., 4) float arrays in (x1, y1, x2, y2).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

# Clamp on (dw, dh) before exp() in decode.  Trained networks never reach it;
# it only guards exp overflow under random init.  log(1000/16) matches the
# Detectron-lineage constant.
DELTA_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area under the +1 convention: (w+1)*(h+1) style."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w * h


def _ctr_form(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * (w - 1.0)
    cy = boxes[..., 1] + 0.5 * (h - 1.0)
    return w, h, cx, cy


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes relative to example (anchor/proposal) boxes.

    Returns (..., 4) targets (dx, dy, dw, dh):
      dx = (gt_cx - ex_cx) / ex_w,  dw = log(gt_w / ex_w)   (+1 convention)
    """
    ex_w, ex_h, ex_cx, ex_cy = _ctr_form(ex_rois)
    gt_w, gt_h, gt_cx, gt_cy = _ctr_form(gt_rois)
    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(
    boxes: jnp.ndarray,
    deltas: jnp.ndarray,
    delta_clip: Optional[float] = DELTA_CLIP,
) -> jnp.ndarray:
    """Decode regression deltas on top of boxes (inverse of bbox_transform).

    ``deltas`` may carry 4*K channels in its last dim (class-specific
    regression); boxes broadcast across the K groups.
    """
    w, h, cx, cy = _ctr_form(boxes)
    d = deltas.reshape(deltas.shape[:-1] + (-1, 4))
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    if delta_clip is not None:
        dw = jnp.minimum(dw, delta_clip)
        dh = jnp.minimum(dh, delta_clip)
    # broadcast box geometry over the class-group axis
    w, h, cx, cy = (x[..., None] for x in (w, h, cx, cy))
    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h
    out = jnp.stack(
        [
            pred_cx - 0.5 * (pred_w - 1.0),
            pred_cy - 0.5 * (pred_h - 1.0),
            pred_cx + 0.5 * (pred_w - 1.0),
            pred_cy + 0.5 * (pred_h - 1.0),
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, im_h, im_w) -> jnp.ndarray:
    """Clip boxes to [0, W-1] x [0, H-1] (+1 convention image bounds).

    ``im_h``/``im_w`` may be Python ints or traced scalars (per-image valid
    sizes inside a padded batch).  Supports 4*K channel groups like
    bbox_transform_inv.
    """
    im_h = jnp.asarray(im_h, dtype=boxes.dtype)
    im_w = jnp.asarray(im_w, dtype=boxes.dtype)
    shape = boxes.shape
    b = boxes.reshape(shape[:-1] + (-1, 4))
    x1 = jnp.clip(b[..., 0], 0.0, im_w - 1.0)
    y1 = jnp.clip(b[..., 1], 0.0, im_h - 1.0)
    x2 = jnp.clip(b[..., 2], 0.0, im_w - 1.0)
    y2 = jnp.clip(b[..., 3], 0.0, im_h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


def box_iou(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix (..., N, K) under the +1 convention.

    TPU-native replacement for the reference's Cython ``bbox_overlaps``
    (SURVEY.md §3.3): a broadcasted XLA computation; also the inner math of
    the NMS kernels.
    """
    area_n = box_area(boxes)[..., :, None]  # (..., N, 1)
    area_k = box_area(query)[..., None, :]  # (..., 1, K)
    lt = jnp.maximum(boxes[..., :, None, :2], query[..., None, :, :2])
    rb = jnp.minimum(boxes[..., :, None, 2:], query[..., None, :, 2:])
    wh = jnp.maximum(rb - lt + 1.0, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_n + area_k - inter
    return jnp.where(union > 0, inter / union, 0.0)


def box_overlap_gt(boxes: jnp.ndarray, query: jnp.ndarray,
                   thresh) -> jnp.ndarray:
    """Pairwise ``IoU > thresh`` predicate (..., N, K), division-free.

    inter/(a+b-inter) > t  ⟺  inter*(1+t) > t*(a+b) for positive areas —
    the VPU reciprocal chain is the costliest op of a broadcast IoU pass.
    Rounding can differ from the divided form within ~1 ulp of the
    threshold (the reference's cpu_nms/gpu_nms pair diverges the same
    way).  Used by the NMS hot paths, which only consume the predicate.
    """
    t = jnp.asarray(thresh, jnp.float32)
    ta_n = t * box_area(boxes)[..., :, None]
    ta_k = t * box_area(query)[..., None, :]
    lt = jnp.maximum(boxes[..., :, None, :2], query[..., None, :, :2])
    rb = jnp.minimum(boxes[..., :, None, 2:], query[..., None, :, 2:])
    wh = jnp.maximum(rb - lt + 1.0, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter * (1.0 + t) > ta_n + ta_k
