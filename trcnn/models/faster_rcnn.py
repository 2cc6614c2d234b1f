"""Composite Faster R-CNN model: one jitted graph per phase.

Rebuild of the reference's ``FasterRCNN(Chain)`` (SURVEY.md §3.1:
``R:lib/models/faster_rcnn.py``) with the host/device ping-pong removed
(SURVEY.md §2 "key architectural property"): backbone → RPN → proposal
layer → RoI pooling → head — and, in training, the anchor/proposal target
layers — all trace into a single XLA graph with static shapes.

Public surface mirrors the reference's train/test duality:
  * ``apply(..., method="detect")``   — image batch → raw per-RoI outputs
    (the reference's test-mode ``(cls_prob, bbox_pred, rois)`` return),
  * ``apply(..., method="losses")``   — image batch + gt → the four losses
    (the reference's train-mode scalar loss),
plus ``postprocess`` (decode + per-class NMS, the reference's forward.py
epilogue) as a pure function so it can fuse into the same jit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from trcnn.config import FasterRCNNConfig
from trcnn.models.losses import masked_mean, smooth_l1, softmax_ce
from trcnn.models.resnet import ResNet101C4, ResNetC5Head
from trcnn.models.roi_head import VGG16RoIHead
from trcnn.models.rpn import RPNHead, RPNOut
from trcnn.models.vgg16 import VGG16
from trcnn.ops.anchors import shifted_anchors
from trcnn.ops.boxes import bbox_transform_inv, clip_boxes
from trcnn.ops.nms import multiclass_nms
from trcnn.ops.proposal import proposal_layer
from trcnn.ops.roi_pool import roi_max_pool


def _pallas_pool_fits(feat: jnp.ndarray, pool_size: int) -> bool:
    from trcnn.ops.roi_pool_pallas import pallas_vmem_fits
    _, h, w, c = feat.shape
    return pallas_vmem_fits(h, w, c, jnp.dtype(feat.dtype).itemsize,
                            pool_size)
from trcnn.targets.anchor_targets import anchor_targets
from trcnn.targets.proposal_targets import proposal_targets


class RawDetections(NamedTuple):
    """Per-RoI raw network outputs (reference test-mode return)."""

    rois: jnp.ndarray        # (B, R, 4) proposal boxes, image coords
    roi_valid: jnp.ndarray   # (B, R) bool
    cls_prob: jnp.ndarray    # (B, R, C) softmax class probabilities
    bbox_pred: jnp.ndarray   # (B, R, 4C) normalized per-class deltas


class Detections(NamedTuple):
    """Final post-processed detections (static capacity D per image)."""

    boxes: jnp.ndarray       # (B, D, 4) in original-image coordinates
    scores: jnp.ndarray      # (B, D)
    classes: jnp.ndarray     # (B, D) int32 (1..C-1)
    valid: jnp.ndarray       # (B, D) bool


class FasterRCNN(nn.Module):
    """Backbone + RPN + RoI head under one parameter tree.

    ``cfg`` is a frozen dataclass (hashable) — safe as a static module
    attribute.  ``cfg.backbone`` selects VGG-16 (7x7 RoI pool → fc head) or
    ResNet-101-C4 (14x14 RoI pool → res5 head).
    """

    cfg: FasterRCNNConfig = FasterRCNNConfig()
    dtype: Any = jnp.float32
    # "int8": dynamic-PTQ inference (trcnn/ops/quant.py) — convs + fc6/fc7
    # on the MXU's 2x int8 path.  Inference-only (no gradient through the
    # quantizer); ``losses`` asserts.  Parameter tree identical to fp32.
    quant: str = "none"

    def setup(self):
        if self.quant not in ("none", "int8"):
            raise ValueError(f"unknown quant mode {self.quant!r}")
        if self.quant != "none" and self.cfg.backbone != "vgg16":
            raise ValueError("quant='int8' currently supports the vgg16 "
                             "backbone only")
        if self.cfg.backbone == "vgg16":
            self.extractor = VGG16(dtype=self.dtype, quant=self.quant)
            self.head = VGG16RoIHead(num_classes=self.cfg.num_classes,
                                     hidden=self.cfg.head_hidden,
                                     dropout_rate=self.cfg.head_dropout,
                                     dtype=self.dtype, quant=self.quant)
            self.pool_size = self.cfg.roi.output_size          # 7
        elif self.cfg.backbone == "resnet101":
            self.extractor = ResNet101C4(dtype=self.dtype)
            self.head = ResNetC5Head(num_classes=self.cfg.num_classes,
                                     dtype=self.dtype)
            self.pool_size = 2 * self.cfg.roi.output_size      # 14
        else:
            raise ValueError(f"unknown backbone {self.cfg.backbone!r}")
        self.rpn = RPNHead(num_anchors=self.cfg.anchors.num_anchors,
                           mid_channels=self.cfg.rpn_channels,
                           dtype=self.dtype)

    # ---- graph pieces ---------------------------------------------------

    def _prepare(self, images: jnp.ndarray, im_info: jnp.ndarray) -> jnp.ndarray:
        """uint8 input handling: the loader may ship raw uint8 canvases
        (4x fewer host→device bytes); mean subtraction then happens here,
        with the padding region re-zeroed from im_info so it matches the
        float path exactly."""
        if images.dtype != jnp.uint8:
            return images
        means = jnp.asarray(self.cfg.image.pixel_means_bgr, jnp.float32)
        x = images.astype(jnp.float32) - means
        _, h, w, _ = images.shape
        yy = jnp.arange(h)[None, :, None, None]
        xx = jnp.arange(w)[None, None, :, None]
        inside = ((yy < im_info[:, 0, None, None, None])
                  & (xx < im_info[:, 1, None, None, None]))
        return jnp.where(inside, x, 0.0)

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.extractor(images)

    def rpn_out(self, feat: jnp.ndarray) -> RPNOut:
        return self.rpn(feat)

    def roi_forward(
        self, feat: jnp.ndarray, rois: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """RoI pool + head over a batch: feat (B,fh,fw,C), rois (B,R,4).

        Returns (cls_score (B,R,C), bbox_pred (B,R,4C)).  The pooled crops
        of all images are flattened into one (B·R, ...) head batch so the
        fc6 matmul hits the MXU at full tile occupancy.

        On TPU the pooling runs as the VMEM-resident Pallas kernel (the XLA
        gather formulation moves ~28 GB/batch on the VGG config); the XLA
        path serves CPU and stays the numerical spec.
        """
        b, r = rois.shape[:2]
        flat_groups = None
        if self.cfg.roi.mode == "align":
            from trcnn.ops.roi_align import roi_align_batched
            pooled = roi_align_batched(
                feat, rois, out_size=self.pool_size,
                spatial_scale=self.cfg.roi.spatial_scale)
        elif jax.default_backend() == "cpu":
            pool = functools.partial(
                roi_max_pool,
                out_size=self.pool_size,
                spatial_scale=self.cfg.roi.spatial_scale,
            )
            pooled = jax.vmap(pool)(feat, rois)
        elif not _pallas_pool_fits(feat, self.pool_size):
            # f32 at the COCO 800x1344 canvas overflows the kernel's
            # scoped-VMEM budget even at the minimum channel block (see
            # pallas_vmem_fits); the XLA formulation is the correctness
            # fallback — bf16, the recommended dtype, keeps the kernel
            pool = functools.partial(
                roi_max_pool,
                out_size=self.pool_size,
                spatial_scale=self.cfg.roi.spatial_scale,
            )
            pooled = jax.vmap(pool)(feat, rois)
        else:
            from trcnn.ops.roi_pool_pallas import (flat_lane_groups,
                                                   roi_max_pool_pallas)
            # the fc head consumes a flat (B*R, P*P*C) row per RoI: have
            # the kernel write that directly (channel-block-major lanes,
            # fc6 compensates — kills the 1.7 ms/b32 pre-fc6 relayout).
            # The R101 C5 head convolves over a spatial crop instead, so
            # it keeps the 5-D layout.
            # flat_out pays at inference (kills the 1.7 ms/b32 pre-fc6
            # relayout of 9600 RoI rows); in training the equivalent
            # relayout is ~0.1 ms (128 RoIs) while the grouped-fc6 weight
            # (inverse-)permutes and the backward unflatten cost ~5 ms/b8
            # — so the flat path is test-time only
            want_flat = self.cfg.backbone == "vgg16" and deterministic
            pool_rois = rois
            if want_flat and r % 8:
                # Mosaic requires the flat output's row blocks be 8-aligned;
                # pad the RoI capacity (300 -> 304 at test time) with dead
                # all-zero slots and slice the head outputs back below —
                # +1.3% head rows vs the 1.7 ms relayout this path removes
                pool_rois = jnp.pad(rois, ((0, 0), (0, (-r) % 8), (0, 0)))
            pooled = roi_max_pool_pallas(
                feat, pool_rois, self.pool_size, self.cfg.roi.spatial_scale,
                flat_out=want_flat)
            if want_flat:
                flat_groups = flat_lane_groups(
                    feat.shape[1], feat.shape[2], feat.shape[3],
                    self.pool_size, jnp.dtype(feat.dtype).itemsize)
        if pooled.ndim == 2:
            flat = pooled
        else:
            flat = pooled.reshape((b * r,) + pooled.shape[2:])
        if flat_groups is not None:
            cls_score, bbox_pred = self.head(
                flat, deterministic=deterministic, flat_groups=flat_groups)
        else:
            cls_score, bbox_pred = self.head(flat, deterministic=deterministic)
        rp = cls_score.shape[0] // b
        return (cls_score.reshape(b, rp, -1)[:, :r],
                bbox_pred.reshape(b, rp, -1)[:, :r])

    # ---- inference ------------------------------------------------------

    def detect(self, images: jnp.ndarray, im_info: jnp.ndarray) -> RawDetections:
        """Full test-mode forward for a padded image batch.

        Args:
          images: (B, H, W, 3) mean-subtracted BGR, zero-padded canvas
            (or raw uint8 — see ``_prepare``).
          im_info: (B, 3) rows (scaled_h, scaled_w, im_scale).
        """
        feat = self.extractor(self._prepare(images, im_info))
        rpnout = self.rpn(feat)

        prop = functools.partial(
            proposal_layer,
            train=False,
            anchor_cfg=self.cfg.anchors,
            cfg=self.cfg.proposals,
        )
        props = jax.vmap(
            lambda p, d, info: prop(p, d, info[0], info[1], info[2])
        )(rpnout.fg_probs, rpnout.deltas, im_info)

        cls_score, bbox_pred = self.roi_forward(
            feat, props.rois, deterministic=True)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        return RawDetections(
            rois=props.rois,
            roi_valid=props.valid,
            cls_prob=cls_prob,
            bbox_pred=bbox_pred,
        )

    # ---- training -------------------------------------------------------

    def losses(
        self,
        images: jnp.ndarray,
        im_info: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_valid: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Train-mode forward: the four losses of approximate joint training
        (SURVEY.md §4.2).  Needs rngs={'dropout','sampling'} in apply().

        Args:
          images: (B, H, W, 3) padded canvas batch.
          im_info: (B, 3) (scaled_h, scaled_w, im_scale).
          gt_boxes: (B, G, 4) scaled to canvas coords; gt_labels (B, G);
          gt_valid: (B, G) bool.
        """
        if self.quant != "none":
            raise ValueError("quantized models are inference-only: "
                             "jnp.round passes no gradient (train fp32, "
                             "deploy int8)")
        cfg = self.cfg
        b = images.shape[0]
        feat = self.extractor(self._prepare(images, im_info))
        rpnout = self.rpn(feat)
        _, fh, fw, _ = feat.shape
        a = cfg.anchors.num_anchors
        n = fh * fw * a
        anchors = shifted_anchors(fh, fw, cfg.anchors)

        rng = self.make_rng("sampling")
        rngs_at = jax.random.split(jax.random.fold_in(rng, 0), b)
        rngs_pt = jax.random.split(jax.random.fold_in(rng, 1), b)

        # ---- RPN losses -------------------------------------------------
        at = jax.vmap(
            lambda k, gtb, gtv, info: anchor_targets(
                k, anchors, gtb, gtv, info[0], info[1], cfg=cfg.anchor_targets)
        )(rngs_at, gt_boxes, gt_valid, im_info)

        # logits (B,fh,fw,2,A) -> (B, N, 2) in anchor order (pos major, a minor)
        logits = jnp.transpose(
            rpnout.logits.reshape(b, fh * fw, 2, a), (0, 1, 3, 2)
        ).reshape(b, n, 2)
        deltas = rpnout.deltas.reshape(b, n, 4)

        sampled = at.labels >= 0
        denom = jnp.maximum(at.num_examples.astype(jnp.float32), 1.0)  # (B,)
        ce = softmax_ce(logits, jnp.maximum(at.labels, 0))
        rpn_cls_loss = jnp.mean(
            jnp.sum(jnp.where(sampled, ce, 0.0), axis=1) / denom)

        l1 = jnp.sum(
            smooth_l1(deltas - at.bbox_targets, cfg.loss.rpn_smooth_l1_sigma),
            axis=-1)
        rpn_bbox_loss = jnp.mean(
            jnp.sum(jnp.where(at.labels == 1, l1, 0.0), axis=1) / denom)

        # ---- proposals + RoI sampling (no gradient through coords) ------
        prop = functools.partial(
            proposal_layer, train=True,
            anchor_cfg=cfg.anchors, cfg=cfg.proposals)
        props = jax.vmap(
            lambda p, d, info: prop(p, d, info[0], info[1], info[2])
        )(
            jax.lax.stop_gradient(rpnout.fg_probs),
            jax.lax.stop_gradient(rpnout.deltas),
            im_info,
        )
        pt = jax.vmap(
            lambda k, r, rv, gtb, gtl, gtv: proposal_targets(
                k, r, rv, gtb, gtl, gtv, cfg=cfg.proposal_targets)
        )(rngs_pt, props.rois, props.valid, gt_boxes, gt_labels, gt_valid)

        # ---- head losses ------------------------------------------------
        cls_score, bbox_pred = self.roi_forward(
            feat, pt.rois, deterministic=False)
        s = pt.labels.shape[1]
        head_ce = softmax_ce(cls_score, pt.labels)
        cls_loss = masked_mean(head_ce, pt.valid)

        c = cfg.num_classes
        pred_by_class = bbox_pred.reshape(b, s, c, 4)
        pred = jnp.take_along_axis(
            pred_by_class, pt.labels[..., None, None].astype(jnp.int32), axis=2
        )[:, :, 0, :]                                            # (B, S, 4)
        head_l1 = jnp.sum(
            smooth_l1(pred - pt.bbox_targets, cfg.loss.head_smooth_l1_sigma),
            axis=-1)
        # Caffe SmoothL1Loss normalizes by the RoI blob size (B·S)
        bbox_loss = masked_mean(
            head_l1, pt.is_fg,
            denom=jnp.asarray(b * s, jnp.float32))

        total = rpn_cls_loss + rpn_bbox_loss + cls_loss + bbox_loss
        return {
            "loss": total,
            "rpn_cls_loss": rpn_cls_loss,
            "rpn_bbox_loss": rpn_bbox_loss,
            "cls_loss": cls_loss,
            "bbox_loss": bbox_loss,
            "num_fg_anchors": jnp.mean(at.num_fg.astype(jnp.float32)),
            "num_fg_rois": jnp.mean(pt.num_fg.astype(jnp.float32)),
        }

    # default entry point (used for init / shape inference)
    def __call__(self, images: jnp.ndarray, im_info: jnp.ndarray) -> RawDetections:
        return self.detect(images, im_info)


def postprocess(
    raw: RawDetections,
    im_info: jnp.ndarray,
    cfg: FasterRCNNConfig,
    score_thresh: Optional[float] = None,
    nms_tile: int = 1024,
) -> Detections:
    """Decode class-specific boxes, clip, per-class NMS, merge — the
    reference's forward.py epilogue (SURVEY.md §4.1), batched and on device.

    bbox_pred is in the *normalized* delta convention (see trcnn/convert):
    deltas are multiplied by the target stds / shifted by the means before
    decoding.  Output boxes are divided by im_scale — original image coords.

    nms_tile: the grouped-NMS suppression tile.  1024 measured fastest at
    the VOC (20 x 300 candidate) shape — 128 pays ~47 sequential tile
    iterations, 2048+ re-scans a >VMEM bool matrix every fixpoint step
    (b32 device: 128 -> 136.8, 512 -> 128.3, 1024 -> 126.3, one-shot ->
    130.7 ms/step).
    """
    t = cfg.test
    if score_thresh is None:
        score_thresh = t.score_thresh_eval
    stds = jnp.tile(jnp.asarray(cfg.proposal_targets.bbox_normalize_stds,
                                jnp.float32), cfg.num_classes)
    means = jnp.tile(jnp.asarray(cfg.proposal_targets.bbox_normalize_means,
                                 jnp.float32), cfg.num_classes)

    def per_image(rois, roi_valid, cls_prob, bbox_pred, info):
        deltas = bbox_pred * stds + means
        boxes = bbox_transform_inv(rois, deltas)          # (R, 4C)
        boxes = clip_boxes(boxes, info[0], info[1])
        boxes = boxes.reshape(boxes.shape[0], cfg.num_classes, 4)
        det_boxes, det_scores, det_classes, det_valid = multiclass_nms(
            boxes, cls_prob, roi_valid,
            t.nms_thresh, score_thresh,
            max_per_class=t.max_dets_per_class,
            max_total=t.max_dets_per_image,
            tile=nms_tile,
            nms_impl=t.nms_impl,
        )
        return det_boxes / info[2], det_scores, det_classes, det_valid

    boxes, scores, classes, valid = jax.vmap(per_image)(
        raw.rois, raw.roi_valid, raw.cls_prob, raw.bbox_pred, im_info)
    return Detections(boxes=boxes, scores=scores, classes=classes, valid=valid)


def make_model(cfg: FasterRCNNConfig = FasterRCNNConfig(),
               dtype: Any = jnp.float32,
               quant: str = "none") -> FasterRCNN:
    return FasterRCNN(cfg=cfg, dtype=dtype, quant=quant)


def cast_params_for_inference(params, dtype) -> Any:
    """One-time KERNEL cast to the compute dtype, for inference serving.

    Inside the graph every conv/dense kernel is promoted to the compute
    dtype at its use site, so pre-casting the ``kernel`` leaves produces
    bit-identical activations while removing the per-dispatch f32-read +
    low-precision-write of the cast itself — material when nothing hoists
    it: at batch-1 detect the fc6 weight cast alone measured ~1.5 ms of a
    5.9 ms device step (benchmarks/attr_ops.py, round 5; a ``lax.scan``
    over steps hoists the loop-invariant cast, which is why batched scan
    benches never see it).  Only ``kernel`` leaves are touched: biases
    are negligible and FrozenBN statistics must stay f32 (their folding
    arithmetic runs in f32 before the result is cast).

    Training must NOT use this — the optimizer needs f32 master params.
    """
    if dtype == jnp.float32:
        return params

    # modules that COMPUTE in f32 (precision islands): their kernels are
    # consumed at f32, so pre-casting would change numerics instead of
    # being a no-op.  cls_score/bbox_pred are the output heads (RoI head
    # and R101 C5 head alike); everything else takes dtype=self.dtype.
    f32_islands = ("cls_score", "bbox_pred")

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in f32_islands:
                    out[k] = v
                elif (k == "kernel"
                      and jnp.issubdtype(jnp.asarray(v).dtype,
                                         jnp.floating)):
                    out[k] = jnp.asarray(v, dtype)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)
