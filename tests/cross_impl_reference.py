"""Independent pure-numpy forward pipeline for cross-implementation checks.

VERDICT r2 item 1: every op in the jitted graph is oracle-tested in
isolation, but a self-captured golden cannot catch an always-been-wrong
CROSS-COMPONENT contract (anchor enumeration order ↔ RPN channel layout ↔
fc6 flatten order ↔ +1 decode convention ↔ NMS tie rules).  This module is
a second, independent implementation of the full image→detections forward
— plain numpy loops and matmuls, no jax — written from the SURVEY.md §8
numerical spec.  tests/test_cross_impl.py loads the SAME weights into this
and the production graph and diffs them stage by stage.

Deliberate implementation choices:
  * conv via explicit im2col + matmul (nothing shared with XLA's conv);
  * anchors re-derived with scalar loops (independent of trcnn.ops.anchors);
  * greedy NMS from trcnn.ops.nms.nms_oracle_numpy — the canonical O(n²)
    host loop kept precisely for cross-checks (SURVEY.md §5);
  * RoI pooling from trcnn.ops.roi_pool.roi_max_pool_oracle_numpy — the
    literal-loop Caffe-semantics oracle;
  * all elementwise decode/clip math in float32 so discrete decisions
    (min-size filter, top-k, NMS) see bit-comparable inputs.
"""

from __future__ import annotations

import math

import numpy as np

from trcnn.ops.nms import nms_oracle_numpy
from trcnn.ops.roi_pool import roi_max_pool_oracle_numpy

F32 = np.float32


# --------------------------------------------------------------------------
# NN primitives (numpy, NHWC, HWIO kernels — flax's parameter layout)
# --------------------------------------------------------------------------


def conv2d_same(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray) -> np.ndarray:
    """SAME convolution via im2col.  x (H, W, Cin) f32; kernel
    (kh, kw, Cin, Cout); returns (H, W, Cout) f32."""
    kh, kw, cin, cout = kernel.shape
    h, w, _ = x.shape
    ph, pw = kh // 2, kw // 2
    xp = np.zeros((h + 2 * ph, w + 2 * pw, cin), F32)
    xp[ph:ph + h, pw:pw + w] = x
    # patches in (kh, kw, cin) order to match kernel.reshape(kh*kw*cin, cout)
    cols = np.empty((h, w, kh, kw, cin), F32)
    for i in range(kh):
        for j in range(kw):
            cols[:, :, i, j, :] = xp[i:i + h, j:j + w, :]
    out = cols.reshape(h * w, kh * kw * cin) @ kernel.reshape(-1, cout)
    return (out + bias).reshape(h, w, cout).astype(F32)


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def max_pool_2x2(x: np.ndarray) -> np.ndarray:
    h, w, c = x.shape
    return x[:h - h % 2, :w - w % 2].reshape(h // 2, 2, w // 2, 2, c).max(
        axis=(1, 3))


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


# --------------------------------------------------------------------------
# Backbone + heads
# --------------------------------------------------------------------------

VGG_BLOCKS = (("conv1", 2), ("conv2", 2), ("conv3", 3), ("conv4", 3),
              ("conv5", 3))


def vgg16_features(params: dict, image: np.ndarray) -> np.ndarray:
    """13-conv VGG trunk, pools after blocks 1–4.  image (H, W, 3) f32."""
    x = image.astype(F32)
    for bi, (name, n_convs) in enumerate(VGG_BLOCKS):
        for ci in range(1, n_convs + 1):
            p = params[f"{name}_{ci}"]
            x = relu(conv2d_same(x, np.asarray(p["kernel"], F32),
                                 np.asarray(p["bias"], F32)))
        if bi < len(VGG_BLOCKS) - 1:
            x = max_pool_2x2(x)
    return x


def rpn_forward(params: dict, feat: np.ndarray, num_anchors: int):
    """Returns (fg_probs (fh, fw, A), deltas (fh, fw, A, 4)).

    Channel-layout contract (trcnn/models/rpn.py docstring / Caffe
    rpn_cls_score): score channels are (bg/fg major, anchor minor); delta
    channels are (anchor major, coord minor).
    """
    a = num_anchors
    h = relu(conv2d_same(feat, np.asarray(params["rpn_conv"]["kernel"], F32),
                         np.asarray(params["rpn_conv"]["bias"], F32)))
    scores = conv2d_same(h, np.asarray(params["rpn_cls_score"]["kernel"], F32),
                         np.asarray(params["rpn_cls_score"]["bias"], F32))
    deltas = conv2d_same(h, np.asarray(params["rpn_bbox_pred"]["kernel"], F32),
                         np.asarray(params["rpn_bbox_pred"]["bias"], F32))
    fh, fw, _ = scores.shape
    logits = scores.reshape(fh, fw, 2, a)
    fg_probs = softmax(logits, axis=2)[:, :, 1, :]
    return fg_probs.astype(F32), deltas.reshape(fh, fw, a, 4).astype(F32)


def roi_head_forward(params: dict, pooled: np.ndarray):
    """fc6/fc7 + sibling outputs.  pooled (R, P, P, C) — flattened natively
    in (h, w, c) order, the graph's NHWC contract."""
    y = pooled.reshape(pooled.shape[0], -1).astype(F32)
    y = relu(y @ np.asarray(params["fc6"]["kernel"], F32)
             + np.asarray(params["fc6"]["bias"], F32))
    y = relu(y @ np.asarray(params["fc7"]["kernel"], F32)
             + np.asarray(params["fc7"]["bias"], F32))
    cls_score = (y @ np.asarray(params["cls_score"]["kernel"], F32)
                 + np.asarray(params["cls_score"]["bias"], F32))
    bbox_pred = (y @ np.asarray(params["bbox_pred"]["kernel"], F32)
                 + np.asarray(params["bbox_pred"]["bias"], F32))
    return cls_score.astype(F32), bbox_pred.astype(F32)


# --------------------------------------------------------------------------
# Detection math (SURVEY.md §8 spec, re-derived with scalar loops)
# --------------------------------------------------------------------------


def base_anchors(base_size=16, ratios=(0.5, 1.0, 2.0),
                 scales=(8.0, 16.0, 32.0)) -> np.ndarray:
    """The A base anchor windows, re-derived from the published recipe:
    ratio enumeration preserves rounded area of the base_size² cell, then
    scale enumeration multiplies width/height."""
    out = []
    w0 = h0 = float(base_size)
    cx = (base_size - 1) / 2.0
    cy = (base_size - 1) / 2.0
    for r in ratios:
        size = w0 * h0
        ws = round(math.sqrt(size / r))
        hs = round(ws * r)
        for s in scales:
            w, h = ws * s, hs * s
            out.append([cx - 0.5 * (w - 1), cy - 0.5 * (h - 1),
                        cx + 0.5 * (w - 1), cy + 0.5 * (h - 1)])
    return np.asarray(out, F32)


def all_anchors(fh: int, fw: int, stride: int, base: np.ndarray) -> np.ndarray:
    """(fh*fw*A, 4): grid position major (y outer, x inner), anchor minor."""
    out = np.empty((fh * fw * base.shape[0], 4), F32)
    i = 0
    for y in range(fh):
        for x in range(fw):
            for a in range(base.shape[0]):
                out[i, 0] = base[a, 0] + x * stride
                out[i, 1] = base[a, 1] + y * stride
                out[i, 2] = base[a, 2] + x * stride
                out[i, 3] = base[a, 3] + y * stride
                i += 1
    return out


DELTA_CLIP = F32(math.log(1000.0 / 16.0))


def decode_boxes(boxes: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """bbox_transform_inv under the +1 convention, all math in f32.
    deltas may carry 4K channels (class-specific groups)."""
    boxes = boxes.astype(F32)
    d = deltas.astype(F32).reshape(deltas.shape[0], -1, 4)
    w = boxes[:, 2] - boxes[:, 0] + F32(1.0)
    h = boxes[:, 3] - boxes[:, 1] + F32(1.0)
    cx = boxes[:, 0] + F32(0.5) * (w - F32(1.0))
    cy = boxes[:, 1] + F32(0.5) * (h - F32(1.0))
    dx, dy = d[:, :, 0], d[:, :, 1]
    dw = np.minimum(d[:, :, 2], DELTA_CLIP)
    dh = np.minimum(d[:, :, 3], DELTA_CLIP)
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = np.exp(dw) * w[:, None]
    ph = np.exp(dh) * h[:, None]
    out = np.stack([pcx - F32(0.5) * (pw - F32(1.0)),
                    pcy - F32(0.5) * (ph - F32(1.0)),
                    pcx + F32(0.5) * (pw - F32(1.0)),
                    pcy + F32(0.5) * (ph - F32(1.0))], axis=-1)
    return out.reshape(deltas.shape).astype(F32)


def clip_to_image(boxes: np.ndarray, im_h: float, im_w: float) -> np.ndarray:
    b = boxes.astype(F32).reshape(boxes.shape[0], -1, 4)
    b[:, :, 0] = np.clip(b[:, :, 0], 0.0, im_w - 1.0)
    b[:, :, 1] = np.clip(b[:, :, 1], 0.0, im_h - 1.0)
    b[:, :, 2] = np.clip(b[:, :, 2], 0.0, im_w - 1.0)
    b[:, :, 3] = np.clip(b[:, :, 3], 0.0, im_h - 1.0)
    return b.reshape(boxes.shape)


def proposal_forward(fg_probs, deltas, im_h, im_w, im_scale, *,
                     stride, base, pre_k, post_k, nms_thresh, min_size):
    """The five proposal sub-stages (SURVEY.md §4.4) as host loops.

    Returns (rois (post_k, 4) zero-padded, valid (post_k,) bool).
    """
    fh, fw, a = fg_probs.shape
    anchors = all_anchors(fh, fw, stride, base)
    scores = fg_probs.reshape(-1).astype(F32)
    boxes = decode_boxes(anchors, deltas.reshape(-1, 4))
    boxes = clip_to_image(boxes, im_h, im_w)

    ms = F32(min_size) * F32(im_scale)
    ws = boxes[:, 2] - boxes[:, 0] + F32(1.0)
    hs = boxes[:, 3] - boxes[:, 1] + F32(1.0)
    ok = (ws >= ms) & (hs >= ms)

    # padded-canvas guard: grid positions past the valid feature extent
    valid_fh = math.ceil(im_h / stride)
    valid_fw = math.ceil(im_w / stride)
    grid_ok = np.zeros((fh, fw), bool)
    grid_ok[:valid_fh, :valid_fw] = True
    ok &= np.repeat(grid_ok.reshape(-1), a)

    masked = np.where(ok, scores, -np.inf)
    order = np.argsort(-masked, kind="stable")[:pre_k]
    order = order[masked[order] > -np.inf]          # drop invalid tail
    top_boxes = boxes[order]
    top_scores = scores[order]

    keep = nms_oracle_numpy(top_boxes, top_scores, nms_thresh)[:post_k]
    rois = np.zeros((post_k, 4), F32)
    valid = np.zeros((post_k,), bool)
    rois[:len(keep)] = top_boxes[keep]
    valid[:len(keep)] = True
    return rois, valid


def postprocess_forward(rois, roi_valid, cls_prob, bbox_pred, im_h, im_w,
                        im_scale, *, num_classes, stds, means, nms_thresh,
                        score_thresh, max_total):
    """Test-time epilogue: un-normalize deltas, class-specific decode, clip,
    per-class greedy NMS, global merge — score-sorted, static capacity.

    Candidate enumeration is class-major / RoI-minor so stable score ties
    break identically to the graph's flattened grouped-NMS path.
    """
    r = rois.shape[0]
    stds_t = np.tile(np.asarray(stds, F32), num_classes)
    means_t = np.tile(np.asarray(means, F32), num_classes)
    deltas = bbox_pred.astype(F32) * stds_t + means_t
    boxes = decode_boxes(rois, deltas)
    boxes = clip_to_image(boxes, im_h, im_w).reshape(r, num_classes, 4)

    dets = []  # (score, class, box), collected class-major
    for c in range(1, num_classes):
        sc = cls_prob[:, c].astype(F32)
        m = roi_valid & (sc > F32(score_thresh))
        if not m.any():
            continue
        idx = np.flatnonzero(m)
        keep = nms_oracle_numpy(boxes[idx, c], sc[idx], nms_thresh)
        for k in keep:
            dets.append((float(sc[idx[k]]), c, boxes[idx[k], c]))

    # global merge: stable sort by score desc (ties: class-major input order)
    order = np.argsort(-np.asarray([d[0] for d in dets] or [0.0]),
                       kind="stable")
    out_boxes = np.zeros((max_total, 4), F32)
    out_scores = np.zeros((max_total,), F32)
    out_classes = np.zeros((max_total,), np.int32)
    out_valid = np.zeros((max_total,), bool)
    for slot, i in enumerate(order[:max_total]):
        if not dets:
            break
        s, c, b = dets[i]
        out_boxes[slot] = b / F32(im_scale)
        out_scores[slot] = s
        out_classes[slot] = c
        out_valid[slot] = True
    return out_boxes, out_scores, out_classes, out_valid


def full_forward(params, image, im_h, im_w, im_scale, cfg):
    """The complete independent image→detections chain for one image.

    ``params`` is the unfrozen flax param dict of trcnn's FasterRCNN;
    ``cfg`` a FasterRCNNConfig.  Returns the stage outputs for diffing.
    """
    p = params["params"]
    feat = vgg16_features(p["extractor"], image)
    fg_probs, deltas = rpn_forward(p["rpn"], feat, cfg.anchors.num_anchors)
    rois, roi_valid = proposal_forward(
        fg_probs, deltas, im_h, im_w, im_scale,
        stride=cfg.anchors.feat_stride,
        base=base_anchors(cfg.anchors.base_size, cfg.anchors.ratios,
                          cfg.anchors.scales),
        pre_k=cfg.proposals.pre_nms_topk_test,
        post_k=cfg.proposals.post_nms_topk_test,
        nms_thresh=cfg.proposals.nms_thresh,
        min_size=cfg.proposals.min_size)
    pooled = roi_max_pool_oracle_numpy(
        feat, rois, out_size=cfg.roi.output_size,
        spatial_scale=cfg.roi.spatial_scale)
    cls_score, bbox_pred = roi_head_forward(p["head"], pooled)
    cls_prob = softmax(cls_score, axis=-1).astype(F32)
    det = postprocess_forward(
        rois, roi_valid, cls_prob, bbox_pred, im_h, im_w, im_scale,
        num_classes=cfg.num_classes,
        stds=cfg.proposal_targets.bbox_normalize_stds,
        means=cfg.proposal_targets.bbox_normalize_means,
        nms_thresh=cfg.test.nms_thresh,
        score_thresh=cfg.test.score_thresh_eval,
        max_total=cfg.test.max_dets_per_image)
    return {
        "feat": feat,
        "fg_probs": fg_probs,
        "deltas": deltas,
        "rois": rois,
        "roi_valid": roi_valid,
        "cls_prob": cls_prob,
        "bbox_pred": bbox_pred,
        "detections": det,
    }
