"""Proposal layer tests: fixed-shape outputs, masking, numpy-pipeline parity."""

import numpy as np
import jax.numpy as jnp

from trcnn.config import AnchorConfig, ProposalConfig
from trcnn.ops.anchors import generate_base_anchors
from trcnn.ops.nms import nms_oracle_numpy
from trcnn.ops.proposal import proposal_layer
import pytest

pytestmark = pytest.mark.fast


def numpy_proposal_oracle(fg, deltas, im_h, im_w, im_scale, cfg, acfg):
    """Host-side replica of the reference proposal_layer (dynamic shapes)."""
    fh, fw, a = fg.shape
    base = generate_base_anchors(acfg.base_size, acfg.ratios, acfg.scales)
    sx, sy = np.meshgrid(np.arange(fw) * acfg.feat_stride,
                         np.arange(fh) * acfg.feat_stride)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], 1)
    anchors = (shifts[:, None, :] + base[None]).reshape(-1, 4).astype(np.float64)

    d = deltas.reshape(-1, 4).astype(np.float64)
    w = anchors[:, 2] - anchors[:, 0] + 1
    h = anchors[:, 3] - anchors[:, 1] + 1
    cx = anchors[:, 0] + 0.5 * (w - 1)
    cy = anchors[:, 1] + 0.5 * (h - 1)
    pcx = d[:, 0] * w + cx
    pcy = d[:, 1] * h + cy
    pw = np.exp(np.minimum(d[:, 2], np.log(1000 / 16))) * w
    ph = np.exp(np.minimum(d[:, 3], np.log(1000 / 16))) * h
    boxes = np.stack(
        [pcx - 0.5 * (pw - 1), pcy - 0.5 * (ph - 1),
         pcx + 0.5 * (pw - 1), pcy + 0.5 * (ph - 1)], 1)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, im_w - 1)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, im_h - 1)

    scores = fg.reshape(-1).astype(np.float64)
    ms = cfg.min_size * im_scale
    keep = ((boxes[:, 2] - boxes[:, 0] + 1 >= ms)
            & (boxes[:, 3] - boxes[:, 1] + 1 >= ms))
    boxes, scores = boxes[keep], scores[keep]
    order = np.argsort(-scores, kind="stable")[: cfg.pre_nms_topk_test]
    boxes, scores = boxes[order], scores[order]
    keep = nms_oracle_numpy(boxes, scores, cfg.nms_thresh)[: cfg.post_nms_topk_test]
    return boxes[keep], scores[keep]


def test_proposal_parity_with_numpy_pipeline(rng):
    fh, fw, a = 12, 16, 9
    im_h, im_w, im_scale = 180.0, 250.0, 1.0
    fg = rng.uniform(size=(fh, fw, a)).astype(np.float32)
    deltas = rng.uniform(-0.4, 0.4, size=(fh, fw, a * 4)).astype(np.float32)

    acfg = AnchorConfig()
    cfg = ProposalConfig(pre_nms_topk_test=600, post_nms_topk_test=50)
    out = proposal_layer(jnp.asarray(fg), jnp.asarray(deltas),
                         im_h, im_w, im_scale, train=False,
                         anchor_cfg=acfg, cfg=cfg, nms_tile=64)
    rois = np.asarray(out.rois)[np.asarray(out.valid)]
    scores = np.asarray(out.scores)[np.asarray(out.valid)]

    want_boxes, want_scores = numpy_proposal_oracle(
        fg, deltas, im_h, im_w, im_scale, cfg, acfg)

    assert rois.shape == want_boxes.shape
    np.testing.assert_allclose(rois, want_boxes, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(scores, want_scores, rtol=1e-5, atol=1e-6)


def test_proposal_static_shapes(rng):
    fh, fw = 6, 8
    cfg = ProposalConfig(pre_nms_topk_test=300, post_nms_topk_test=40)
    fg = rng.uniform(size=(fh, fw, 9)).astype(np.float32)
    deltas = np.zeros((fh, fw, 36), np.float32)
    out = proposal_layer(jnp.asarray(fg), jnp.asarray(deltas),
                         90.0, 120.0, 1.0, train=False, cfg=cfg, nms_tile=64)
    assert out.rois.shape == (40, 4)
    assert out.scores.shape == (40,)
    assert out.valid.shape == (40,)


def test_proposal_grid_mask(rng):
    # image occupying a quarter of the canvas: anchors from padded grid
    # positions must never be selected even with high scores there.
    fh, fw = 8, 8
    fg = np.zeros((fh, fw, 9), np.float32)
    fg[5:, 5:, :] = 0.99  # only in the padded region (valid extent = 4 cells)
    fg[0, 0, 4] = 0.5     # one real proposal
    deltas = np.zeros((fh, fw, 36), np.float32)
    cfg = ProposalConfig(pre_nms_topk_test=100, post_nms_topk_test=10, min_size=4)
    out = proposal_layer(jnp.asarray(fg), jnp.asarray(deltas),
                         64.0, 64.0, 1.0, train=False, cfg=cfg, nms_tile=64)
    valid = np.asarray(out.valid)
    scores = np.asarray(out.scores)[valid]
    assert (scores <= 0.51).all()
    assert valid.sum() >= 1


def test_masked_topk_payload_matches_gather(rng):
    """masked_topk_payload == masked_topk + row gathers, including at
    score ties (stable sort on -score is tie-identical to lax.top_k)."""
    import jax
    import jax.numpy as jnp

    from trcnn.ops.topk import masked_topk, masked_topk_payload

    n, k = 500, 64
    scores = rng.uniform(size=n).astype(np.float32)
    scores[::7] = 0.5  # ties
    valid = rng.uniform(size=n) > 0.2
    payload = rng.randn(n, 4).astype(np.float32)

    vals, idx, ok = masked_topk(jnp.asarray(scores), jnp.asarray(valid), k)
    pvals, cols, pok = masked_topk_payload(
        jnp.asarray(scores), jnp.asarray(valid), k,
        *[jnp.asarray(payload[:, i]) for i in range(4)])
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(pvals))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(pok))
    gathered = np.asarray(jax.vmap(lambda c: jnp.take(c, idx))(
        jnp.asarray(payload.T)))
    got = np.stack([np.asarray(c) for c in cols])
    m = np.asarray(ok)
    np.testing.assert_array_equal(got[:, m], gathered[:, m])
