"""RPN anchor target assignment, fully on device.

Rebuild of the reference's ``anchor_target_layer.py`` (SURVEY.md §3.2,
numbers §8): keep inside-image anchors (allowed_border 0); label positive if
IoU ≥ 0.7 with any gt OR the anchor is a per-gt argmax (ties included);
negative if max IoU < 0.3; else ignore (−1); subsample to 256 with at most
50% foreground; regression targets = bbox_transform(anchor, matched gt).

Differences by design (SURVEY.md §10):
  * no compaction — labels stay on the full (fH·fW·A) anchor grid with −1
    padding, so every shape is static;
  * subsampling replaces ``np.random.choice`` with ranking of iid uniforms:
    every positive gets a random priority, only the ``fg_cap`` best keep
    their label (identical uniform-without-replacement distribution);
  * the dynamic negative quota (256 − num_fg) is enforced by comparing each
    negative's random *rank* to the traced quota — rank-vs-scalar compare
    instead of a dynamic-length choice.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from trcnn.config import AnchorTargetConfig
from trcnn.ops.boxes import bbox_transform, box_iou


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray        # (N,) int32: 1 fg, 0 bg, -1 ignore
    bbox_targets: jnp.ndarray  # (N, 4) float32 (defined where labels == 1)
    num_examples: jnp.ndarray  # () int32: count of labels >= 0 (loss norm)
    num_fg: jnp.ndarray        # () int32


def _random_rank(rng: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """0-based random rank among ``mask`` members; masked-out entries get
    ranks after all members (uniform-without-replacement order)."""
    u = jax.random.uniform(rng, mask.shape)
    key = jnp.where(mask, u, 2.0)  # non-members sort last
    order = jnp.argsort(key)
    ranks = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return ranks


def anchor_targets(
    rng: jax.Array,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    im_h,
    im_w,
    cfg: AnchorTargetConfig = AnchorTargetConfig(),
) -> AnchorTargets:
    """Assign RPN training targets for one image.

    Args:
      rng: PRNG key for fg/bg subsampling.
      anchors: (N, 4) all anchors over the feature grid
               (``shifted_anchors`` order).
      gt_boxes: (G, 4) padded ground-truth boxes.
      gt_valid: (G,) bool validity of each gt slot.
      im_h, im_w: scaled image extent (traced scalars ok).
    """
    n = anchors.shape[0]
    im_h = jnp.asarray(im_h, jnp.float32)
    im_w = jnp.asarray(im_w, jnp.float32)

    inside = (
        (anchors[:, 0] >= -cfg.allowed_border)
        & (anchors[:, 1] >= -cfg.allowed_border)
        & (anchors[:, 2] < im_w + cfg.allowed_border)
        & (anchors[:, 3] < im_h + cfg.allowed_border)
    )

    any_gt = jnp.any(gt_valid)
    iou = box_iou(anchors, gt_boxes)                     # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    iou = jnp.where(inside[:, None], iou, 0.0)

    max_iou = jnp.max(iou, axis=1)                        # (N,)
    argmax_gt = jnp.argmax(iou, axis=1)                   # (N,)

    # per-gt argmax anchors, *including ties* (upstream uses
    # np.where(overlaps == gt_max_overlaps) — every tying anchor is positive)
    gt_max = jnp.max(iou, axis=0)                         # (G,)
    is_gt_argmax = jnp.any(
        (iou == gt_max[None, :]) & (gt_max[None, :] > 0) & gt_valid[None, :],
        axis=1,
    )

    neg = inside & (max_iou < cfg.negative_iou)
    pos = inside & (is_gt_argmax | (max_iou >= cfg.positive_iou)) & any_gt
    if not cfg.clobber_positives:
        neg = neg & ~pos
    else:
        pos = pos & ~(max_iou < cfg.negative_iou)

    # --- subsample (rank-based, static shapes) ---------------------------
    fg_cap = int(cfg.fg_fraction * cfg.batch_size)
    rng_fg, rng_bg = jax.random.split(rng)
    pos_rank = _random_rank(rng_fg, pos)
    pos = pos & (pos_rank < fg_cap)
    num_fg = jnp.sum(pos.astype(jnp.int32))

    bg_quota = cfg.batch_size - num_fg                    # traced scalar
    neg_rank = _random_rank(rng_bg, neg)
    neg = neg & (neg_rank < bg_quota)
    num_examples = num_fg + jnp.sum(neg.astype(jnp.int32))

    labels = jnp.where(pos, 1, jnp.where(neg, 0, -1)).astype(jnp.int32)
    matched_gt = jnp.take(gt_boxes, argmax_gt, axis=0)    # (N, 4)
    bbox_targets = bbox_transform(anchors, matched_gt)
    bbox_targets = jnp.where(pos[:, None], bbox_targets, 0.0)

    return AnchorTargets(
        labels=labels,
        bbox_targets=bbox_targets,
        num_examples=num_examples,
        num_fg=num_fg,
    )
