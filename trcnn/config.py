"""Configuration tree for the whole framework.

One frozen-dataclass hierarchy holding every numerical constant of the
Faster R-CNN contract (SURVEY.md §8).  The reference keeps these in a
py-faster-rcnn style ``config.py`` ``__C`` tree + argparse (SURVEY.md §6.6);
here the schema is typed, immutable, and hashable so configs can be closed
over by jitted functions as static data.

All defaults reproduce the published Faster R-CNN / py-faster-rcnn VGG-16
VOC configuration exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Class lists
# ---------------------------------------------------------------------------

VOC_CLASSES: Tuple[str, ...] = (
    "__background__",
    "aeroplane", "bicycle", "bird", "boat", "bottle",
    "bus", "car", "cat", "chair", "cow",
    "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)

# COCO-2017: 80 foreground classes + background (names omitted here; the data
# layer carries the category-id mapping).
NUM_COCO_CLASSES = 81


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor generation (SURVEY.md §8: base 16, 3 ratios x 3 scales, A=9)."""

    base_size: int = 16
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    scales: Tuple[float, ...] = (8.0, 16.0, 32.0)
    feat_stride: int = 16

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) * len(self.scales)


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    """Proposal layer capacities and thresholds (SURVEY.md §8).

    ``pre_nms_topk`` / ``post_nms_topk`` are the *static* capacities of the
    fixed-shape TPU pipeline; the reference's dynamic counts are replaced by
    these caps plus validity masks.
    """

    pre_nms_topk_train: int = 12000
    post_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 6000
    post_nms_topk_test: int = 300
    nms_thresh: float = 0.7
    min_size: float = 16.0  # scaled by im_scale at call time
    # proposal-NMS kernel: "auto" (Pallas VMEM kernel on TPU — 1.6x the XLA
    # path at the clustered 12000-box train shape, benchmarks/bench_nms.py —
    # XLA spec elsewhere), or force "xla" / "pallas"; all are exactly
    # greedy, so selection is a pure performance choice
    nms_impl: str = "auto"

    def pre_nms_topk(self, train: bool) -> int:
        return self.pre_nms_topk_train if train else self.pre_nms_topk_test

    def post_nms_topk(self, train: bool) -> int:
        return self.post_nms_topk_train if train else self.post_nms_topk_test


@dataclasses.dataclass(frozen=True)
class AnchorTargetConfig:
    """RPN training target assignment (SURVEY.md §8)."""

    allowed_border: float = 0.0
    positive_iou: float = 0.7
    negative_iou: float = 0.3
    batch_size: int = 256       # sampled anchors per image
    fg_fraction: float = 0.5
    clobber_positives: bool = False


@dataclasses.dataclass(frozen=True)
class ProposalTargetConfig:
    """RoI head training target assignment (SURVEY.md §8)."""

    rois_per_image: int = 128
    fg_fraction: float = 0.25
    fg_iou: float = 0.5
    bg_iou_hi: float = 0.5
    bg_iou_lo: float = 0.1
    bbox_normalize_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)


@dataclasses.dataclass(frozen=True)
class RoIConfig:
    """RoI feature extraction."""

    output_size: int = 7
    spatial_scale: float = 1.0 / 16.0
    # "max" reproduces the reference's roi_pooling_2d; "align" is the modern
    # bilinear RoIAlign alternative (2x2 samples per bin).
    mode: str = "max"


@dataclasses.dataclass(frozen=True)
class ImageConfig:
    """Preprocessing (SURVEY.md §8): BGR, Caffe pixel means, 600/1000 scaling.

    ``pad_h``/``pad_w`` define the static padded canvas; the canvas must be a
    multiple of the feature stride.  Default 608x1024 holds any landscape
    600x<=1000 image; portrait images use the transposed bucket (the data
    layer picks a bucket per image; each bucket is one compiled graph).
    """

    target_min_size: int = 600
    target_max_size: int = 1000
    pixel_means_bgr: Tuple[float, float, float] = (102.9801, 115.9465, 122.7717)
    pad_h: int = 608
    pad_w: int = 1024
    # multi-scale training (COCO config, BASELINE.json config 5): per-image
    # random choice of shorter-side target; () disables.  The canvas stays
    # the single (pad_h, pad_w) bucket sized for the LARGEST scale — one
    # compiled graph per orientation regardless of the sampled scale
    # (SURVEY.md §6.7: scale variation via padding, not recompilation).
    multiscale_min_sizes: Tuple[int, ...] = ()


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weighting (SURVEY.md §8)."""

    rpn_smooth_l1_sigma: float = 3.0
    head_smooth_l1_sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """MomentumSGD schedule (SURVEY.md §8)."""

    base_lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    lr_decay_factor: float = 0.1
    lr_decay_step: int = 50000
    total_iters: int = 70000
    # Linear lr warmup from base_lr*warmup_factor over the first
    # warmup_steps iterations (Detectron-lineage recipe for deep-backbone
    # stability; 0 disables — the reference VGG schedule has none).
    warmup_steps: int = 0
    warmup_factor: float = 1.0 / 3.0
    # Global-norm gradient clipping before every other transform; 0.0
    # disables (reference parity).  Guards the first steps of from-scratch
    # deep backbones where a single outsized gradient can destroy the
    # momentum trace.
    clip_grad_norm: float = 0.0


@dataclasses.dataclass(frozen=True)
class TestTimeConfig:
    """Test-time post-processing (SURVEY.md §8)."""

    nms_thresh: float = 0.3
    score_thresh_eval: float = 0.05
    score_thresh_demo: float = 0.7
    max_dets_per_class: int = 100
    max_dets_per_image: int = 100
    # multiclass-epilogue NMS kernel: "xla" (default), "pallas" (grouped
    # VMEM kernel), or "auto" (pallas on TPU).  Keep-sets are identical
    # (grouped-kernel parity proven vs per-class oracle); measured b32
    # full-model A/B is a tie (281.6 xla vs 280.1 pallas img/s) while the
    # vmapped Pallas epilogue costs 8x the compile time (319s vs 41s), so
    # xla stays the default.  The kernel remains the PROPOSAL-path NMS
    # where it wins 1.6x (ProposalConfig.nms_impl).
    nms_impl: str = "xla"


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    """Top-level config: the full §8 contract in one immutable tree."""

    num_classes: int = len(VOC_CLASSES)
    backbone: str = "vgg16"  # or "resnet101"
    head_hidden: int = 4096  # fc6/fc7 width (VGG head); small in unit tests
    rpn_channels: int = 512  # RPN 3x3 conv width
    head_dropout: float = 0.5  # fc6/fc7 dropout rate (reference recipe);
    #                            0.0 disables (cross-impl train parity runs
    #                            compare deterministic loss values)
    anchors: AnchorConfig = AnchorConfig()
    proposals: ProposalConfig = ProposalConfig()
    anchor_targets: AnchorTargetConfig = AnchorTargetConfig()
    proposal_targets: ProposalTargetConfig = ProposalTargetConfig()
    roi: RoIConfig = RoIConfig()
    image: ImageConfig = ImageConfig()
    loss: LossConfig = LossConfig()
    optim: OptimConfig = OptimConfig()
    test: TestTimeConfig = TestTimeConfig()

    def replace(self, **kw) -> "FasterRCNNConfig":
        return dataclasses.replace(self, **kw)


def voc_config() -> FasterRCNNConfig:
    """Default VOC 21-class configuration (the reference's setup)."""
    return FasterRCNNConfig()


def coco_config() -> FasterRCNNConfig:
    """COCO-2017 configuration: 80 fg classes, larger capacities
    (BASELINE.json config 5 stresses top-k/NMS capacity)."""
    return FasterRCNNConfig(
        num_classes=NUM_COCO_CLASSES,
        proposals=ProposalConfig(
            pre_nms_topk_train=12000,
            post_nms_topk_train=2000,
            pre_nms_topk_test=6000,
            post_nms_topk_test=1000,
        ),
        image=ImageConfig(target_min_size=800, target_max_size=1333,
                          pad_h=800, pad_w=1344,
                          multiscale_min_sizes=(640, 672, 704, 736, 768, 800)),
        test=TestTimeConfig(max_dets_per_class=100, max_dets_per_image=100),
    )
