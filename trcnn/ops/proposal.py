"""Device-side proposal layer.

The reference's ``proposal_layer.py`` is host-side numpy with dynamic shapes
(SURVEY.md §4.4); this is the fixed-shape XLA rebuild: the five sub-stages
(anchor enumeration, decode+clip, min-size filter, top-k, NMS) become one
jittable function with static capacities and validity masks.  Runs inside
the same compiled graph as the backbone — the host/device ping-pong of the
reference (SURVEY.md §2 "key architectural property") is gone.

Numbers (SURVEY.md §8): pre-NMS top-k 12000/6000 (train/test), NMS@0.7,
post-NMS 2000/300, min_size 16 * im_scale, +1 pixel convention everywhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp

from trcnn.config import AnchorConfig, ProposalConfig
from trcnn.ops.anchors import shifted_anchors
from trcnn.ops.boxes import bbox_transform_inv, clip_boxes
from trcnn.ops.nms import nms_padded
from trcnn.ops.topk import masked_topk_payload


class Proposals(NamedTuple):
    rois: jnp.ndarray        # (post_nms_topk, 4) boxes in image coords
    scores: jnp.ndarray      # (post_nms_topk,) objectness
    valid: jnp.ndarray       # (post_nms_topk,) bool


def proposal_layer(
    rpn_fg_probs: jnp.ndarray,
    rpn_deltas: jnp.ndarray,
    im_h,
    im_w,
    im_scale,
    train: bool,
    anchor_cfg: AnchorConfig = AnchorConfig(),
    cfg: ProposalConfig = ProposalConfig(),
    nms_tile=None,
) -> Proposals:
    """Generate object proposals for one image.

    Args:
      rpn_fg_probs: (fH, fW, A) foreground probabilities from the RPN head.
      rpn_deltas:   (fH, fW, A*4) box regression deltas.
      im_h, im_w:   valid (scaled) image extent inside the padded canvas;
                    Python ints or traced scalars.
      im_scale:     the preprocessing scale factor (min-size filter is
                    16 * im_scale, SURVEY.md §8).
      train:        static; selects train/test capacities.

    Returns:
      Proposals with static shape (post_nms_topk, 4/1/1).
    """
    fh, fw, a = rpn_fg_probs.shape
    anchors = shifted_anchors(fh, fw, anchor_cfg)          # (fH*fW*A, 4)
    deltas = rpn_deltas.reshape(-1, 4)
    scores = rpn_fg_probs.reshape(-1)

    proposals = bbox_transform_inv(anchors, deltas)
    proposals = clip_boxes(proposals, im_h, im_w)

    # min-size filter (+1 convention) at the scaled image resolution
    min_size = cfg.min_size * jnp.asarray(im_scale, jnp.float32)
    ws = proposals[:, 2] - proposals[:, 0] + 1.0
    hs = proposals[:, 3] - proposals[:, 1] + 1.0
    size_ok = (ws >= min_size) & (hs >= min_size)

    # padded-canvas guard: the reference runs on exactly-sized images; on the
    # static canvas we must ignore RPN outputs at grid positions beyond the
    # valid feature extent (they see only zero padding).
    stride = anchor_cfg.feat_stride
    valid_fh = jnp.ceil(jnp.asarray(im_h, jnp.float32) / stride).astype(jnp.int32)
    valid_fw = jnp.ceil(jnp.asarray(im_w, jnp.float32) / stride).astype(jnp.int32)
    gy = jnp.arange(fh, dtype=jnp.int32)
    gx = jnp.arange(fw, dtype=jnp.int32)
    grid_ok = (gy[:, None] < valid_fh) & (gx[None, :] < valid_fw)  # (fH, fW)
    grid_ok = jnp.repeat(grid_ok.reshape(-1), a)

    valid = size_ok & grid_ok

    pre_k = min(cfg.pre_nms_topk(train), scores.shape[0])
    # box coordinates ride the top-k sort as payload operands — on TPU
    # lax.top_k(21888→12000/6000) + an (N, 4) row-gather is slower than
    # one stable 5-operand sort (see masked_topk_payload)
    top_scores, (px1, py1, px2, py2), top_valid = masked_topk_payload(
        scores, valid, pre_k,
        proposals[:, 0], proposals[:, 1], proposals[:, 2], proposals[:, 3])
    top_boxes = jnp.stack([px1, py1, px2, py2], axis=-1)

    post_k = cfg.post_nms_topk(train)
    # masked_topk's output is already score-sorted descending with invalid
    # entries at the end — presorted=True skips the NMS-internal re-sort
    # (~1/3 of the 12000-box device time).
    # impl "auto": the VMEM-resident Pallas kernel on TPU (1.6x the XLA
    # fixpoint at the clustered train shape, benchmarks/bench_nms.py),
    # the portable XLA spec elsewhere.
    impl = cfg.nms_impl
    if impl == "auto":
        import jax

        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from trcnn.ops.nms_pallas import nms_padded_pallas

        keep_idx, keep_valid = nms_padded_pallas(
            top_boxes, top_scores, top_valid, cfg.nms_thresh, post_k,
            presorted=True)
    else:
        keep_idx, keep_valid = nms_padded(
            top_boxes, top_scores, top_valid, cfg.nms_thresh, post_k,
            tile=nms_tile, presorted=True)
    rois = jnp.take(top_boxes, keep_idx, axis=0)
    roi_scores = jnp.take(top_scores, keep_idx, axis=0)
    rois = jnp.where(keep_valid[:, None], rois, 0.0)
    roi_scores = jnp.where(keep_valid, roi_scores, 0.0)
    return Proposals(rois=rois, scores=roi_scores, valid=keep_valid)
