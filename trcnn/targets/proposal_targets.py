"""RoI head target assignment (sampling 128 training RoIs), fully on device.

Rebuild of the reference's ``proposal_target_layer.py`` (SURVEY.md §3.2,
numbers §8): append gt boxes to the proposal set; sample ``rois_per_image``
(128) RoIs — foreground (IoU ≥ 0.5) up to 25%, background with IoU in
[0.1, 0.5) filling the rest; per-class regression targets normalized by
means (0,0,0,0) and stds (0.1,0.1,0.2,0.2).

Fixed-capacity design (SURVEY.md §10): fg/bg subsampling is rank-based over
iid uniforms; the 128 output slots are compacted with one top-k over a
combined priority key (selected fg first, then selected bg).  When fewer
than 128 candidates exist (upstream falls back to sampling with
replacement), leftover slots are filled by cycling the selected candidates
— same marginal distribution — and if an image has no candidates at all the
slots are marked invalid and masked in the loss.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from trcnn.config import ProposalTargetConfig
from trcnn.ops.boxes import bbox_transform, box_iou
from trcnn.targets.anchor_targets import _random_rank


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray          # (S, 4) sampled boxes (image coords)
    labels: jnp.ndarray        # (S,) int32 class ids, 0 = background
    bbox_targets: jnp.ndarray  # (S, 4) normalized regression targets (fg rows)
    is_fg: jnp.ndarray         # (S,) bool
    valid: jnp.ndarray         # (S,) bool — slot holds a real sample
    num_fg: jnp.ndarray        # () int32


def proposal_targets(
    rng: jax.Array,
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: ProposalTargetConfig = ProposalTargetConfig(),
) -> ProposalTargets:
    """Sample RoI-head training targets for one image.

    Args:
      rng: PRNG key for fg/bg subsampling.
      rois: (P, 4) proposals from the proposal layer.
      roi_valid: (P,) bool.
      gt_boxes: (G, 4) padded gt boxes; gt_labels (G,) int32 (1..C-1);
      gt_valid: (G,) bool.
    """
    s = cfg.rois_per_image
    fg_cap = int(round(cfg.fg_fraction * s))

    # gt boxes join the candidate set (upstream appends them so every gt has
    # at least one perfect-IoU candidate)
    cand = jnp.concatenate([rois, gt_boxes], axis=0)            # (P+G, 4)
    cand_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    iou = box_iou(cand, gt_boxes)                                # (P+G, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    fg = cand_valid & (max_iou >= cfg.fg_iou)
    bg = cand_valid & (max_iou < cfg.bg_iou_hi) & (max_iou >= cfg.bg_iou_lo)

    rng_fg, rng_bg = jax.random.split(rng)
    fg_rank = _random_rank(rng_fg, fg)
    sel_fg = fg & (fg_rank < fg_cap)
    num_fg = jnp.sum(sel_fg.astype(jnp.int32))

    bg_quota = s - num_fg
    bg_rank = _random_rank(rng_bg, bg)
    sel_bg = bg & (bg_rank < bg_quota)
    num_sel = num_fg + jnp.sum(sel_bg.astype(jnp.int32))

    # --- compact into S slots: fg first (rank order), then bg ------------
    n = cand.shape[0]
    num_bg = num_sel - num_fg
    key = jnp.where(sel_fg, fg_rank,
                    jnp.where(sel_bg, n + bg_rank, 2 * n + 1))
    order = jnp.argsort(key)                                     # selected first
    # Fill leftover tail slots by cycling the selected *background* samples
    # — upstream samples bg with replacement when the band has too few
    # candidates.  Degenerate no-bg image: cycle the fg instead (upstream
    # would error here); no candidates at all: slots are marked invalid.
    slot = jnp.arange(s)
    over = slot - num_sel                                        # >= 0 on tail
    bg_fill = num_fg + jnp.where(num_bg > 0, over % jnp.maximum(num_bg, 1), 0)
    fg_fill = jnp.where(num_fg > 0, over % jnp.maximum(num_fg, 1), 0)
    fill = jnp.where(num_bg > 0, bg_fill, fg_fill)
    src_slot = jnp.where(over >= 0, fill, slot)
    take = jnp.take(order, jnp.clip(src_slot, 0, n - 1), axis=0)  # (S,)
    slot_valid = (num_sel > 0) & jnp.ones((s,), bool)

    out_rois = jnp.take(cand, take, axis=0)
    out_max_iou = jnp.take(max_iou, take, axis=0)
    out_arg = jnp.take(argmax_gt, take, axis=0)
    out_is_fg = jnp.take(sel_fg, take, axis=0)

    labels = jnp.take(gt_labels, out_arg, axis=0).astype(jnp.int32)
    labels = jnp.where(out_is_fg, labels, 0)

    matched = jnp.take(gt_boxes, out_arg, axis=0)
    targets = bbox_transform(out_rois, matched)
    means = jnp.asarray(cfg.bbox_normalize_means, jnp.float32)
    stds = jnp.asarray(cfg.bbox_normalize_stds, jnp.float32)
    targets = (targets - means) / stds
    targets = jnp.where(out_is_fg[:, None], targets, 0.0)

    return ProposalTargets(
        rois=jnp.where(slot_valid[:, None], out_rois, 0.0),
        labels=jnp.where(slot_valid, labels, 0),
        bbox_targets=targets,
        is_fg=out_is_fg & slot_valid,
        valid=slot_valid,
        num_fg=num_fg,
    )
