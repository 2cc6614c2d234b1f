"""Independent pure-numpy TRAINING pipeline for cross-implementation checks.

VERDICT r3 item 3: the round-3 cross-impl harness pinned the inference
composition (tests/cross_impl_reference.py); the training side — anchor
targets → proposal targets → the four losses (SURVEY.md §4.2) — was pinned
only by per-op unit tests.  This module is a second, independent
implementation of the full train-mode forward, written from the SURVEY.md
§8 spec in plain numpy:

  * target-assignment logic (inside-anchor mask, per-gt argmax with ties,
    IoU bands, fg/bg quotas, gt-append, per-class normalized targets) is
    re-derived here with numpy primitives;
  * the four losses (softmax CE with ignore, smooth-L1 σ=3/σ=1, the
    per-image num_examples normalizer and the Caffe B·S bbox normalizer)
    are recomputed from the spec text;
  * SAMPLING RANDOMNESS IS SHARED, NOT REIMPLEMENTED: the production
    layers rank iid uniforms (trcnn/targets/*: rank-of-uniforms =
    uniform-without-replacement); the test harness draws the exact same
    uniform arrays from the graph's key derivation and hands them in, so
    every sampling DECISION is bit-comparable while the decision LOGIC
    stays independent.  (RNG bit-streams are not part of the reference
    contract — SURVEY.md §10 "preserving the sampling distribution".)

Network forwards (conv trunk, RPN, head) come from cross_impl_reference's
im2col implementations; RoI pooling from the literal-loop Caffe oracle.
"""

from __future__ import annotations

import math

import numpy as np

from tests.cross_impl_reference import (all_anchors, base_anchors,
                                        proposal_forward, rpn_forward,
                                        softmax, vgg16_features)
from trcnn.ops.roi_pool import roi_max_pool_oracle_numpy

F32 = np.float32


# --------------------------------------------------------------------------
# Box math (+1 convention), re-derived
# --------------------------------------------------------------------------


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, K) pairwise IoU under w = x2 - x1 + 1."""
    aw = a[:, 2] - a[:, 0] + F32(1.0)
    ah = a[:, 3] - a[:, 1] + F32(1.0)
    bw = b[:, 2] - b[:, 0] + F32(1.0)
    bh = b[:, 3] - b[:, 1] + F32(1.0)
    area_a = (aw * ah)[:, None]
    area_b = (bw * bh)[None, :]
    ix = (np.minimum(a[:, None, 2], b[None, :, 2])
          - np.maximum(a[:, None, 0], b[None, :, 0]) + F32(1.0))
    iy = (np.minimum(a[:, None, 3], b[None, :, 3])
          - np.maximum(a[:, None, 1], b[None, :, 1]) + F32(1.0))
    inter = np.maximum(ix, 0.0) * np.maximum(iy, 0.0)
    union = area_a + area_b - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out.astype(F32)


def encode_boxes(ex: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """bbox_transform: (dx, dy, dw, dh) of gt relative to ex (+1 widths)."""
    ew = ex[:, 2] - ex[:, 0] + F32(1.0)
    eh = ex[:, 3] - ex[:, 1] + F32(1.0)
    ecx = ex[:, 0] + F32(0.5) * (ew - F32(1.0))
    ecy = ex[:, 1] + F32(0.5) * (eh - F32(1.0))
    gw = gt[:, 2] - gt[:, 0] + F32(1.0)
    gh = gt[:, 3] - gt[:, 1] + F32(1.0)
    gcx = gt[:, 0] + F32(0.5) * (gw - F32(1.0))
    gcy = gt[:, 1] + F32(0.5) * (gh - F32(1.0))
    return np.stack([(gcx - ecx) / ew, (gcy - ecy) / eh,
                     np.log(gw / ew), np.log(gh / eh)], axis=1).astype(F32)


# --------------------------------------------------------------------------
# Shared-uniform sampling: keep the ``cap`` members with the smallest u
# (identical in distribution AND decision to rank-of-uniforms selection)
# --------------------------------------------------------------------------


def select_smallest_u(mask: np.ndarray, u: np.ndarray, cap: int):
    """Returns (kept bool mask, kept indices in ascending-u order)."""
    idx = np.flatnonzero(mask)
    order = idx[np.argsort(u[idx], kind="stable")]
    keep = order[:max(int(cap), 0)]
    out = np.zeros_like(mask)
    out[keep] = True
    return out, keep


# --------------------------------------------------------------------------
# Target layers (SURVEY.md §8)
# --------------------------------------------------------------------------


def anchor_targets_ref(u_fg, u_bg, anchors, gt_boxes, gt_valid, im_h, im_w,
                       *, allowed_border=0.0, pos_iou=0.7, neg_iou=0.3,
                       batch=256, fg_fraction=0.5):
    """labels (N,) {1,0,-1}, bbox_targets (N,4), num_examples, num_fg."""
    n = anchors.shape[0]
    inside = ((anchors[:, 0] >= -allowed_border)
              & (anchors[:, 1] >= -allowed_border)
              & (anchors[:, 2] < im_w + allowed_border)
              & (anchors[:, 3] < im_h + allowed_border))

    iou = iou_matrix(anchors.astype(F32), gt_boxes.astype(F32))
    iou[:, ~gt_valid] = 0.0
    iou[~inside, :] = 0.0

    max_iou = iou.max(axis=1) if iou.shape[1] else np.zeros(n, F32)
    argmax_gt = iou.argmax(axis=1) if iou.shape[1] else np.zeros(n, np.int64)

    # per-gt argmax anchors including ties (upstream: every anchor tying the
    # per-gt max overlap is positive)
    gt_max = iou.max(axis=0)
    is_gt_argmax = ((iou == gt_max[None, :]) & (gt_max[None, :] > 0)
                    & gt_valid[None, :]).any(axis=1)

    any_gt = bool(gt_valid.any())
    pos = inside & (is_gt_argmax | (max_iou >= pos_iou)) & any_gt
    neg = inside & (max_iou < neg_iou) & ~pos

    fg_cap = int(fg_fraction * batch)
    pos, _ = select_smallest_u(pos, u_fg, fg_cap)
    num_fg = int(pos.sum())
    neg, _ = select_smallest_u(neg, u_bg, batch - num_fg)
    num_ex = num_fg + int(neg.sum())

    labels = np.full((n,), -1, np.int32)
    labels[neg] = 0
    labels[pos] = 1
    targets = np.zeros((n, 4), F32)
    if any_gt and num_fg:
        matched = gt_boxes[argmax_gt[pos]]
        targets[pos] = encode_boxes(anchors[pos].astype(F32),
                                    matched.astype(F32))
    return labels, targets, num_ex, num_fg


def proposal_targets_ref(u_fg, u_bg, rois, roi_valid, gt_boxes, gt_labels,
                         gt_valid, *, s=128, fg_fraction=0.25, fg_iou=0.5,
                         bg_hi=0.5, bg_lo=0.1,
                         means=(0.0, 0.0, 0.0, 0.0),
                         stds=(0.1, 0.1, 0.2, 0.2)):
    """Sampled (rois, labels, norm targets, is_fg, valid, num_fg) — S slots.

    gt boxes join the candidate set; fg up to round(fg_fraction*S) by
    shared uniforms; bg fills to S; a short candidate set cycles the
    selected bg (fg if no bg) — replacement-fill; zero candidates marks
    every slot invalid.
    """
    cand = np.concatenate([rois, gt_boxes], axis=0).astype(F32)
    cand_valid = np.concatenate([roi_valid, gt_valid], axis=0)

    iou = iou_matrix(cand, gt_boxes.astype(F32))
    iou[:, ~gt_valid] = 0.0
    max_iou = iou.max(axis=1)
    argmax_gt = iou.argmax(axis=1)

    fg = cand_valid & (max_iou >= fg_iou)
    bg = cand_valid & (max_iou < bg_hi) & (max_iou >= bg_lo)

    fg_cap = int(round(fg_fraction * s))
    _, fg_keep = select_smallest_u(fg, u_fg, fg_cap)
    num_fg = len(fg_keep)
    _, bg_keep = select_smallest_u(bg, u_bg, s - num_fg)
    num_bg = len(bg_keep)
    num_sel = num_fg + num_bg

    sel = list(fg_keep) + list(bg_keep)       # fg first, each in u order
    take = np.zeros((s,), np.int64)
    is_fg = np.zeros((s,), bool)
    valid = np.zeros((s,), bool)
    if num_sel:
        for slot in range(s):
            if slot < num_sel:
                take[slot] = sel[slot]
                is_fg[slot] = slot < num_fg
            else:
                over = slot - num_sel
                if num_bg:
                    take[slot] = sel[num_fg + over % num_bg]
                else:
                    take[slot] = sel[over % num_fg]
            valid[slot] = True
    # is_fg at a slot = whether the TAKEN candidate is a selected-fg —
    # replacement fills cycle candidates, so fg-cycled tail slots (the
    # degenerate no-bg image) re-mark fg, exactly as a with-replacement
    # sampler would
    if num_sel:
        sel_fg_mask = np.zeros((cand.shape[0],), bool)
        sel_fg_mask[fg_keep] = True
        is_fg = sel_fg_mask[take] & valid

    out_rois = np.where(valid[:, None], cand[take], 0.0).astype(F32)
    labels = gt_labels[argmax_gt[take]].astype(np.int32)
    labels = np.where(is_fg, labels, 0)
    labels = np.where(valid, labels, 0)

    targets = encode_boxes(cand[take], gt_boxes[argmax_gt[take]].astype(F32))
    targets = ((targets - np.asarray(means, F32)) / np.asarray(stds, F32))
    targets = np.where(is_fg[:, None], targets, 0.0).astype(F32)
    return out_rois, labels, targets, is_fg, valid, num_fg


# --------------------------------------------------------------------------
# Losses (SURVEY.md §8 "Losses")
# --------------------------------------------------------------------------


def smooth_l1(x: np.ndarray, sigma: float) -> np.ndarray:
    s2 = sigma * sigma
    ax = np.abs(x)
    return np.where(ax < 1.0 / s2, 0.5 * s2 * x * x, ax - 0.5 / s2)


def softmax_ce(logits: np.ndarray, labels: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    logz = (m[..., 0] + np.log(np.exp(logits - m).sum(axis=-1)))
    return logz - np.take_along_axis(logits, labels[:, None].astype(np.int64),
                                     axis=1)[:, 0]


def rpn_logits_anchor_order(raw_logits: np.ndarray, a: int) -> np.ndarray:
    """(fh, fw, 2A) Caffe channel layout (bg/fg major, anchor minor) →
    (N, 2) rows in anchor enumeration order (y, x major; anchor minor)."""
    fh, fw, _ = raw_logits.shape
    return (raw_logits.reshape(fh * fw, 2, a).transpose(0, 2, 1)
            .reshape(fh * fw * a, 2).astype(F32))


def losses_ref(params, images, im_infos, gts, uniforms, cfg):
    """The complete independent train-mode forward for a batch.

    Args:
      params: unfrozen flax param dict of trcnn's FasterRCNN (vgg16).
      images: (B, H, W, 3) float canvases.
      im_infos: (B, 3).
      gts: list of (gt_boxes (G,4), gt_labels (G,), gt_valid (G,)).
      uniforms: list per image of dict(at_fg, at_bg, pt_fg, pt_bg) —
        the graph's own uniform draws (shared randomness, see module doc).
      cfg: FasterRCNNConfig.

    Returns dict of the four losses + total + per-image stage outputs.
    """
    p = params["params"]
    a = cfg.anchors.num_anchors
    base = base_anchors(cfg.anchors.base_size, cfg.anchors.ratios,
                        cfg.anchors.scales)
    b = images.shape[0]

    rpn_cls, rpn_box, head_ce_sum, head_l1_sum = [], [], 0.0, 0.0
    n_valid_rois = 0
    per_image = []
    s = cfg.proposal_targets.rois_per_image
    for i in range(b):
        ih, iw, sc = (float(x) for x in im_infos[i])
        gt_boxes, gt_labels, gt_valid = gts[i]
        feat = vgg16_features(p["extractor"], images[i])
        fg_probs, deltas = rpn_forward(p["rpn"], feat, a)
        fh, fw, _ = fg_probs.shape
        anchors = all_anchors(fh, fw, cfg.anchors.feat_stride, base)

        # raw logits in anchor order (recompute the score conv's raw output)
        import tests.cross_impl_reference as cir
        h = cir.relu(cir.conv2d_same(
            feat, np.asarray(p["rpn"]["rpn_conv"]["kernel"], F32),
            np.asarray(p["rpn"]["rpn_conv"]["bias"], F32)))
        raw_scores = cir.conv2d_same(
            h, np.asarray(p["rpn"]["rpn_cls_score"]["kernel"], F32),
            np.asarray(p["rpn"]["rpn_cls_score"]["bias"], F32))
        logits2 = rpn_logits_anchor_order(raw_scores, a)
        deltas_flat = deltas.reshape(-1, 4)

        u = uniforms[i]
        labels, at_targets, num_ex, num_fg = anchor_targets_ref(
            u["at_fg"], u["at_bg"], anchors, gt_boxes, gt_valid, ih, iw,
            allowed_border=cfg.anchor_targets.allowed_border,
            pos_iou=cfg.anchor_targets.positive_iou,
            neg_iou=cfg.anchor_targets.negative_iou,
            batch=cfg.anchor_targets.batch_size,
            fg_fraction=cfg.anchor_targets.fg_fraction)

        denom = max(float(num_ex), 1.0)
        sampled = labels >= 0
        ce = softmax_ce(logits2, np.maximum(labels, 0))
        rpn_cls.append(float(ce[sampled].sum() / denom))
        l1 = smooth_l1(deltas_flat - at_targets,
                       cfg.loss.rpn_smooth_l1_sigma).sum(axis=1)
        rpn_box.append(float(l1[labels == 1].sum() / denom))

        rois, roi_valid = proposal_forward(
            fg_probs, deltas, ih, iw, sc,
            stride=cfg.anchors.feat_stride, base=base,
            pre_k=cfg.proposals.pre_nms_topk_train,
            post_k=cfg.proposals.post_nms_topk_train,
            nms_thresh=cfg.proposals.nms_thresh,
            min_size=cfg.proposals.min_size)

        (s_rois, s_labels, s_targets, s_is_fg, s_valid,
         pt_num_fg) = proposal_targets_ref(
            u["pt_fg"], u["pt_bg"], rois, roi_valid,
            gt_boxes, gt_labels, gt_valid,
            s=s, fg_fraction=cfg.proposal_targets.fg_fraction,
            fg_iou=cfg.proposal_targets.fg_iou,
            bg_hi=cfg.proposal_targets.bg_iou_hi,
            bg_lo=cfg.proposal_targets.bg_iou_lo,
            means=cfg.proposal_targets.bbox_normalize_means,
            stds=cfg.proposal_targets.bbox_normalize_stds)

        pooled = roi_max_pool_oracle_numpy(
            feat, s_rois, out_size=cfg.roi.output_size,
            spatial_scale=cfg.roi.spatial_scale)
        y = pooled.reshape(pooled.shape[0], -1).astype(F32)
        y = cir.relu(y @ np.asarray(p["head"]["fc6"]["kernel"], F32)
                     + np.asarray(p["head"]["fc6"]["bias"], F32))
        y = cir.relu(y @ np.asarray(p["head"]["fc7"]["kernel"], F32)
                     + np.asarray(p["head"]["fc7"]["bias"], F32))
        cls_score = (y @ np.asarray(p["head"]["cls_score"]["kernel"], F32)
                     + np.asarray(p["head"]["cls_score"]["bias"], F32))
        bbox_pred = (y @ np.asarray(p["head"]["bbox_pred"]["kernel"], F32)
                     + np.asarray(p["head"]["bbox_pred"]["bias"], F32))

        hce = softmax_ce(cls_score, s_labels)
        head_ce_sum += float(hce[s_valid].sum())
        n_valid_rois += int(s_valid.sum())
        pred = bbox_pred.reshape(s, cfg.num_classes, 4)[
            np.arange(s), s_labels]                          # (S, 4)
        hl1 = smooth_l1(pred - s_targets,
                        cfg.loss.head_smooth_l1_sigma).sum(axis=1)
        head_l1_sum += float(hl1[s_is_fg].sum())

        per_image.append({
            "at_labels": labels, "at_targets": at_targets,
            "at_num_fg": num_fg, "at_num_ex": num_ex,
            "rois": rois, "roi_valid": roi_valid,
            "pt_rois": s_rois, "pt_labels": s_labels,
            "pt_targets": s_targets, "pt_is_fg": s_is_fg,
            "pt_valid": s_valid, "pt_num_fg": pt_num_fg,
        })

    rpn_cls_loss = float(np.mean(rpn_cls))
    rpn_bbox_loss = float(np.mean(rpn_box))
    cls_loss = head_ce_sum / max(n_valid_rois, 1)
    bbox_loss = head_l1_sum / float(b * s)
    return {
        "rpn_cls_loss": rpn_cls_loss,
        "rpn_bbox_loss": rpn_bbox_loss,
        "cls_loss": cls_loss,
        "bbox_loss": bbox_loss,
        "loss": rpn_cls_loss + rpn_bbox_loss + cls_loss + bbox_loss,
        "per_image": per_image,
    }
