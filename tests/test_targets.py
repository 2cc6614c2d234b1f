"""Target-assignment layer tests (SURVEY.md §5 rebuild plan items 1, 2).

Checks the fixed-capacity device-side layers against the upstream
anchor/proposal-target semantics: label rules, sampling caps, target
encoding — on hand-made fixtures where the expected assignment is known.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trcnn.config import AnchorTargetConfig, ProposalTargetConfig
from trcnn.ops.anchors import shifted_anchors
from trcnn.ops.boxes import bbox_transform
from trcnn.targets import anchor_targets, proposal_targets
import pytest

pytestmark = pytest.mark.fast


def test_anchor_targets_basic_rules():
    # 600x600 image: plenty of inside anchors at all scales
    fh = fw = 38
    anchors = shifted_anchors(fh, fw)
    gt = jnp.asarray([[100.0, 100.0, 260.0, 260.0],
                      [400.0, 150.0, 520.0, 380.0],
                      [0.0, 0.0, 0.0, 0.0]])
    gt_valid = jnp.asarray([True, True, False])
    out = anchor_targets(jax.random.PRNGKey(0), anchors, gt, gt_valid,
                         600.0, 600.0)
    labels = np.asarray(out.labels)
    cfg = AnchorTargetConfig()
    n_fg = int((labels == 1).sum())
    n_bg = int((labels == 0).sum())
    assert n_fg >= 2            # at least the per-gt argmax anchors
    assert n_fg <= cfg.batch_size * cfg.fg_fraction
    assert n_fg + n_bg == int(out.num_examples) <= cfg.batch_size
    # with many candidate negatives the quota is filled exactly
    assert int(out.num_examples) == cfg.batch_size

    # every positive must obey the positive rule
    iou = np.zeros(0)
    from trcnn.ops.boxes import box_iou
    iou = np.asarray(box_iou(anchors, gt[:2]))
    max_iou = iou.max(axis=1)
    gt_max = iou.max(axis=0)
    is_argmax = (iou == gt_max[None, :]).any(axis=1)
    pos_ok = (max_iou >= cfg.positive_iou) | is_argmax
    assert pos_ok[labels == 1].all()
    # every negative must be < negative_iou
    assert (max_iou[labels == 0] < cfg.negative_iou).all()

    # targets encode the matched gt: decoding a positive anchor's target
    # must land on its argmax gt box
    pos_idx = np.where(labels == 1)[0]
    enc = np.asarray(bbox_transform(anchors[pos_idx],
                                    gt[np.asarray(iou.argmax(1))[pos_idx]]))
    np.testing.assert_allclose(np.asarray(out.bbox_targets)[pos_idx], enc,
                               rtol=1e-5, atol=1e-5)


def test_anchor_targets_outside_anchors_ignored():
    fh = fw = 4  # 64px image: every anchor sticks out -> all ignored
    anchors = shifted_anchors(fh, fw)
    gt = jnp.asarray([[5.0, 5.0, 40.0, 40.0]])
    out = anchor_targets(jax.random.PRNGKey(0), anchors, gt,
                         jnp.asarray([True]), 64.0, 64.0)
    assert int(out.num_examples) == 0
    assert (np.asarray(out.labels) == -1).all()


def test_anchor_targets_fg_cap_sampling_varies():
    """Oversubscribed positives: the sampled fg set depends on the rng."""
    fh = fw = 38
    anchors = shifted_anchors(fh, fw)
    # a 256x256 gt matches ~25 same-size anchors at IoU>=0.7; cap at 8 so
    # the fg quota is oversubscribed and the rng decides which survive
    gt = jnp.asarray([[150.0, 150.0, 405.0, 405.0]])
    v = jnp.asarray([True])
    cfg = AnchorTargetConfig(batch_size=16, fg_fraction=0.5)
    o1 = anchor_targets(jax.random.PRNGKey(1), anchors, gt, v, 600.0, 600.0,
                        cfg=cfg)
    o2 = anchor_targets(jax.random.PRNGKey(2), anchors, gt, v, 600.0, 600.0,
                        cfg=cfg)
    l1, l2 = np.asarray(o1.labels), np.asarray(o2.labels)
    assert (l1 == 1).sum() == (l2 == 1).sum() == 8  # cap hit
    assert ((l1 == 1) != (l2 == 1)).any()           # different sampled sets


def _toy_rois_and_gt():
    gt = jnp.asarray([[100.0, 100.0, 200.0, 200.0],
                      [300.0, 300.0, 420.0, 420.0]])
    gt_labels = jnp.asarray([3, 7], jnp.int32)
    gt_valid = jnp.asarray([True, True])
    rois = jnp.asarray([
        [105.0, 95.0, 205.0, 198.0],    # IoU ~0.85 with gt0 -> fg
        [290.0, 310.0, 430.0, 415.0],   # high IoU with gt1 -> fg
        [150.0, 150.0, 260.0, 260.0],   # partial overlap -> likely bg band
        [0.0, 0.0, 50.0, 50.0],         # IoU 0 -> below bg_lo, never sampled
        [140.0, 140.0, 240.0, 240.0],   # mid overlap
    ])
    roi_valid = jnp.ones((5,), bool)
    return rois, roi_valid, gt, gt_labels, gt_valid


def test_proposal_targets_labels_and_encoding():
    rois, roi_valid, gt, gt_labels, gt_valid = _toy_rois_and_gt()
    cfg = ProposalTargetConfig(rois_per_image=8)
    out = proposal_targets(jax.random.PRNGKey(0), rois, roi_valid,
                           gt, gt_labels, gt_valid, cfg=cfg)
    assert out.rois.shape == (8, 4)
    labels = np.asarray(out.labels)
    is_fg = np.asarray(out.is_fg)
    assert np.asarray(out.valid).all()
    # fg rows carry the matched gt class; bg rows are 0
    assert set(labels[is_fg]) <= {3, 7}
    assert (labels[~is_fg] == 0).all()
    # gt boxes were appended as candidates: perfect-IoU fg exists
    assert is_fg.sum() >= 2
    # fg cap respected
    assert is_fg.sum() <= int(round(cfg.fg_fraction * cfg.rois_per_image))

    # encoding: fg targets decode back to the matched gt (un-normalize first)
    stds = np.asarray(cfg.bbox_normalize_stds)
    means = np.asarray(cfg.bbox_normalize_means)
    from trcnn.ops.boxes import bbox_transform_inv
    dec = np.asarray(bbox_transform_inv(
        out.rois, jnp.asarray(np.asarray(out.bbox_targets) * stds + means)))
    from trcnn.ops.boxes import box_iou
    ious = np.asarray(box_iou(jnp.asarray(dec[is_fg]), gt))
    assert (ious.max(axis=1) > 0.99).all()


def test_proposal_targets_no_gt_all_invalid_or_bg():
    rois, roi_valid, gt, gt_labels, _ = _toy_rois_and_gt()
    gt_valid = jnp.asarray([False, False])
    out = proposal_targets(jax.random.PRNGKey(0), rois, roi_valid,
                           gt, gt_labels, gt_valid,
                           cfg=ProposalTargetConfig(rois_per_image=8))
    assert not np.asarray(out.is_fg).any()
    assert (np.asarray(out.labels) == 0).all()


def test_proposal_targets_capacity_fill_cycles():
    """Fewer candidates than slots: tail slots cycle the selected set."""
    rois, roi_valid, gt, gt_labels, gt_valid = _toy_rois_and_gt()
    cfg = ProposalTargetConfig(rois_per_image=64)
    out = proposal_targets(jax.random.PRNGKey(3), rois, roi_valid,
                           gt, gt_labels, gt_valid, cfg=cfg)
    assert np.asarray(out.valid).all()
    # all slots hold real candidate boxes (from rois or gt)
    cand = np.concatenate([np.asarray(rois), np.asarray(gt)], 0)
    sampled = np.asarray(out.rois)
    for row in sampled:
        assert (np.abs(cand - row).sum(1) < 1e-4).any()
