"""Cross-implementation check of the ResNet-101-C4 pipeline (VERDICT r3
item 4's independent-check half).

Same structure as tests/test_cross_impl.py, with the trunk and RoI head
swapped for the independent numpy R101 of cross_impl_resnet_reference:
the jitted graph and the scalar-derived im2col chain consume the SAME
weights and image and must agree stage by stage — pinning the C4 trunk
contract (7x7/2 pad-3 stem, 3x3/2 pad-1 maxpool, style-A bottleneck
striding, FrozenBN folding) and the C5 head contract (14x14 crop, res5
stride 2, global average pool) independently of flax/XLA.

The fixture randomizes every conv3 kernel (zero-init at model.init — the
from-scratch stability choice — would leave all residual branches dead
and the comparison vacuous) and every FrozenBN affine/stat leaf (identity
stats would not exercise the folding math).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import cross_impl_reference as ref
from tests import cross_impl_resnet_reference as rref
from trcnn.config import (AnchorConfig, FasterRCNNConfig, ImageConfig,
                          ProposalConfig, TestTimeConfig)
from trcnn.models import make_model
from trcnn.models.faster_rcnn import postprocess


def _cfg():
    return FasterRCNNConfig(
        backbone="resnet101",
        rpn_channels=64,
        anchors=AnchorConfig(scales=(2.0, 4.0, 8.0)),
        proposals=ProposalConfig(pre_nms_topk_test=512,
                                 post_nms_topk_test=48),
        image=ImageConfig(pad_h=128, pad_w=192),
        test=TestTimeConfig(max_dets_per_class=32, max_dets_per_image=32),
    )


@functools.lru_cache(maxsize=1)
def _fixture():
    cfg = _cfg()
    model = make_model(cfg, dtype=jnp.float32)
    b, h, w = 1, cfg.image.pad_h, cfg.image.pad_w
    key = jax.random.PRNGKey(21)
    images = jax.random.normal(key, (b, h, w, 3), jnp.float32) * 40.0
    im_info = jnp.asarray([[120.0, 180.0, 1.2]], jnp.float32)
    params = jax.jit(model.init)(key, images, im_info)
    params = jax.tree.map(np.asarray, params)

    # wake the residual branches + generalize the BN folding (see docstring)
    rng = np.random.RandomState(4)

    def walk(node):
        for k, v in node.items():
            if isinstance(v, dict):
                if "mean" in v and "var" in v:     # a FrozenBatchNorm
                    ch = v["mean"].shape[0]
                    v["scale"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
                    v["var"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
                    v["mean"] = rng.normal(0, 0.1, ch).astype(np.float32)
                    v["bias"] = rng.normal(0, 0.1, ch).astype(np.float32)
                elif k == "conv3":
                    v["kernel"] = rng.normal(
                        0, 0.02, v["kernel"].shape).astype(np.float32)
                else:
                    walk(v)

    walk(params["params"]["extractor"])
    walk(params["params"]["head"])

    # calibrate the output heads exactly like the VGG fixture
    def scale(path, factor):
        node = params["params"]
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = node[path[-1]] * factor

    feat = model.apply(params, images, method="features")
    rpnout = model.apply(params, feat, method="rpn_out")
    scale(("rpn", "rpn_cls_score", "kernel"),
          2.0 / float(jnp.std(rpnout.logits)))
    scale(("rpn", "rpn_bbox_pred", "kernel"),
          0.15 / float(jnp.std(rpnout.deltas)))
    rois = jnp.asarray(
        np.stack([np.asarray([10.0, 10.0, 80.0, 90.0]) + 3 * i
                  for i in range(8)])[None], jnp.float32)
    cs, bp = model.apply(params, feat, rois, method="roi_forward")
    scale(("head", "cls_score", "kernel"), 2.0 / float(jnp.std(cs)))
    scale(("head", "bbox_pred", "kernel"), 0.1 / float(jnp.std(bp)))
    return cfg, model, params, np.asarray(images), np.asarray(im_info)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


def test_c4_trunk_numerics():
    """Independent im2col trunk reproduces the stride-16 1024-ch features
    (stem padding, maxpool, 33 bottlenecks, FrozenBN folding)."""
    cfg, model, params, images, im_info = _fixture()
    feat_j = np.asarray(model.apply(params, jnp.asarray(images),
                                    method="features"))
    assert feat_j.shape == (1, 8, 12, 1024)
    feat_n = rref.resnet101_c4_features(params["params"]["extractor"],
                                        images[0])
    assert _rel_err(feat_n, feat_j[0]) < 1e-4


def test_c5_head_numerics():
    """Independent res5 + global-average-pool head reproduces the class
    probabilities and box deltas on the graph's own RoIs."""
    cfg, model, params, images, im_info = _fixture()
    raw = jax.jit(functools.partial(model.apply, method="detect"))(
        params, jnp.asarray(images), jnp.asarray(im_info))
    feat = np.asarray(model.apply(params, jnp.asarray(images),
                                  method="features"))

    crops = ref.roi_max_pool_oracle_numpy(
        feat[0], np.asarray(raw.rois)[0], out_size=2 * cfg.roi.output_size,
        spatial_scale=cfg.roi.spatial_scale)
    cls_n, bp_n = rref.resnet_c5_head(params["params"]["head"], crops)
    prob_n = ref.softmax(cls_n, axis=-1)

    assert _rel_err(prob_n, np.asarray(raw.cls_prob)[0]) < 1e-4
    assert _rel_err(bp_n, np.asarray(raw.bbox_pred)[0]) < 1e-4


def test_r101_full_chain_end_to_end():
    """The complete independently-composed numpy R101 chain reproduces the
    jitted graph's detections (proposal + epilogue stages shared with the
    VGG harness — the backbone/head contracts are what's new here)."""
    cfg, model, params, images, im_info = _fixture()

    @jax.jit
    def graph(p, x, info):
        raw = model.apply(p, x, info, method="detect")
        return postprocess(raw, info, cfg)

    det_j = graph(params, jnp.asarray(images), jnp.asarray(im_info))
    ih, iw, sc = (float(x) for x in im_info[0])

    feat_n = rref.resnet101_c4_features(params["params"]["extractor"],
                                        images[0])
    fg_n, dl_n = ref.rpn_forward(params["params"]["rpn"], feat_n,
                                 cfg.anchors.num_anchors)
    rois_n, valid_n = ref.proposal_forward(
        fg_n, dl_n, ih, iw, sc,
        stride=cfg.anchors.feat_stride,
        base=ref.base_anchors(cfg.anchors.base_size, cfg.anchors.ratios,
                              cfg.anchors.scales),
        pre_k=cfg.proposals.pre_nms_topk_test,
        post_k=cfg.proposals.post_nms_topk_test,
        nms_thresh=cfg.proposals.nms_thresh,
        min_size=cfg.proposals.min_size)
    crops_n = ref.roi_max_pool_oracle_numpy(
        feat_n, rois_n, out_size=2 * cfg.roi.output_size,
        spatial_scale=cfg.roi.spatial_scale)
    cls_n, bp_n = rref.resnet_c5_head(params["params"]["head"], crops_n)
    prob_n = ref.softmax(cls_n, axis=-1).astype(np.float32)
    b_n, s_n, c_n, v_n = ref.postprocess_forward(
        rois_n, valid_n, prob_n, bp_n, ih, iw, sc,
        num_classes=cfg.num_classes,
        stds=cfg.proposal_targets.bbox_normalize_stds,
        means=cfg.proposal_targets.bbox_normalize_means,
        nms_thresh=cfg.test.nms_thresh,
        score_thresh=cfg.test.score_thresh_eval,
        max_total=cfg.test.max_dets_per_image)

    v_j = np.asarray(det_j.valid)[0]
    assert v_n.sum() == v_j.sum(), (
        f"detection count mismatch: numpy {v_n.sum()} vs graph {v_j.sum()}")
    assert v_n.sum() > 3, "degenerate fixture: too few detections to test"
    np.testing.assert_array_equal(c_n, np.asarray(det_j.classes)[0])
    np.testing.assert_allclose(np.asarray(det_j.scores)[0], s_n, atol=1e-3)
    np.testing.assert_allclose(np.asarray(det_j.boxes)[0], b_n, atol=0.1)
