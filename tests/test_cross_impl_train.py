"""Cross-implementation check of the TRAINING composition (VERDICT r3
item 3).

The jitted ``losses`` graph and an independent numpy implementation
(tests/cross_impl_train_reference) consume the SAME weights, images, gt,
and — critically — the SAME uniform draws for fg/bg subsampling (the
graph's key derivation is replayed outside the graph; randomness is
shared so every sampling DECISION is bit-comparable while the decision
LOGIC stays independent).  Pins the train-side contracts of SURVEY.md §8:
inside-anchor mask, per-gt argmax ties, IoU bands, fg/bg quotas and
replacement fill, gt-append, normalized per-class targets, σ=3/σ=1
smooth-L1, and the two loss normalizers (per-image num_examples; Caffe
B·S).

Structure mirrors tests/test_cross_impl.py: target layers are compared on
IDENTICAL inputs (labels/decisions exactly equal), then the full composed
losses graph against the independent chain end-to-end.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import cross_impl_train_reference as tref
from tests.cross_impl_reference import all_anchors, base_anchors
from trcnn.config import (AnchorConfig, FasterRCNNConfig, ImageConfig,
                          ProposalConfig, ProposalTargetConfig)
from trcnn.models import make_model
from trcnn.targets.anchor_targets import anchor_targets
from trcnn.targets.proposal_targets import proposal_targets

# fast marks are per-test: the heaviest cases (>15 s on the 1-CPU box)
# run in the full suite only, keeping `pytest -m fast` inside its
# 5-minute budget (VERDICT r3 weak 5).

B = 2


def _cfg():
    return FasterRCNNConfig(
        head_hidden=64,
        rpn_channels=64,
        head_dropout=0.0,  # dropout bit-streams are not part of the contract
        # small scales: the default 128-512 px anchors have no inside-image
        # members on the 120x180 fixture (allowed_border 0), which would
        # leave zero positives to test
        anchors=AnchorConfig(scales=(2.0, 4.0, 8.0)),
        proposals=ProposalConfig(pre_nms_topk_train=512,
                                 post_nms_topk_train=64,
                                 pre_nms_topk_test=512,
                                 post_nms_topk_test=64),
        proposal_targets=ProposalTargetConfig(rois_per_image=16),
        image=ImageConfig(pad_h=128, pad_w=192),
    )


@functools.lru_cache(maxsize=1)
def _fixture():
    """(cfg, model, params, images, im_info, gt) — RPN heads rescaled so
    scores spread (σ=0.01 random init is tie-dominated)."""
    cfg = _cfg()
    model = make_model(cfg, dtype=jnp.float32)
    h, w = cfg.image.pad_h, cfg.image.pad_w
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (B, h, w, 3), jnp.float32) * 40.0
    im_info = jnp.asarray([[120.0, 180.0, 1.2], [100.0, 160.0, 1.0]],
                          jnp.float32)
    params = jax.jit(model.init)(key, images, im_info)
    params = jax.tree.map(np.asarray, params)

    feat = model.apply(params, images, method="features")
    rpnout = model.apply(params, feat, method="rpn_out")

    def scale(path, factor):
        node = params["params"]
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = node[path[-1]] * factor

    scale(("rpn", "rpn_cls_score", "kernel"),
          2.0 / float(jnp.std(rpnout.logits)))
    scale(("rpn", "rpn_bbox_pred", "kernel"),
          0.15 / float(jnp.std(rpnout.deltas)))

    # gt: a few well-separated boxes per image + one padded slot
    g = 4
    gt_boxes = np.zeros((B, g, 4), np.float32)
    gt_labels = np.zeros((B, g), np.int32)
    gt_valid = np.zeros((B, g), bool)
    gt_boxes[0, :3] = [[10, 12, 70, 60], [90, 30, 170, 100], [40, 70, 110, 115]]
    gt_labels[0, :3] = [3, 7, 12]
    gt_valid[0, :3] = True
    gt_boxes[1, :2] = [[20, 15, 95, 80], [100, 40, 150, 95]]
    gt_labels[1, :2] = [5, 18]
    gt_valid[1, :2] = True
    return (cfg, model, params, np.asarray(images), np.asarray(im_info),
            (gt_boxes, gt_labels, gt_valid))


def _sampling_rng(model, params, key):
    """The exact folded key ``losses`` sees from make_rng('sampling') —
    captured through an apply with the identical call signature."""
    return model.apply(params, rngs={"sampling": key},
                       method=lambda m: m.make_rng("sampling"))


def _derive_uniforms(sampling, b, n_anchors, n_cand):
    """Replay the graph's key tree: fold_in(0/1) → per-image split →
    (fg, bg) split → uniform over the mask shape."""
    rngs_at = jax.random.split(jax.random.fold_in(sampling, 0), b)
    rngs_pt = jax.random.split(jax.random.fold_in(sampling, 1), b)
    out = []
    for i in range(b):
        at_fg, at_bg = jax.random.split(rngs_at[i])
        pt_fg, pt_bg = jax.random.split(rngs_pt[i])
        out.append({
            "at_fg": np.asarray(jax.random.uniform(at_fg, (n_anchors,))),
            "at_bg": np.asarray(jax.random.uniform(at_bg, (n_anchors,))),
            "pt_fg": np.asarray(jax.random.uniform(pt_fg, (n_cand,))),
            "pt_bg": np.asarray(jax.random.uniform(pt_bg, (n_cand,))),
        })
    return rngs_at, rngs_pt, out


def _geom(cfg):
    fh, fw = cfg.image.pad_h // 16, cfg.image.pad_w // 16
    n = fh * fw * cfg.anchors.num_anchors
    n_cand = cfg.proposals.post_nms_topk_train + 4  # + gt capacity
    return fh, fw, n, n_cand


# --------------------------------------------------------------------------


def test_anchor_target_layer_decisions_exact():
    """Same anchors/gt/uniforms into both implementations: identical labels,
    counts, and regression targets (per-gt argmax ties, IoU bands, quota)."""
    cfg, model, params, images, im_info, (gtb, gtl, gtv) = _fixture()
    fh, fw, n, n_cand = _geom(cfg)
    anchors = all_anchors(fh, fw, cfg.anchors.feat_stride,
                          base_anchors(cfg.anchors.base_size,
                                       cfg.anchors.ratios,
                                       cfg.anchors.scales))
    sampling = _sampling_rng(model, params, jax.random.PRNGKey(11))
    rngs_at, _, uniforms = _derive_uniforms(sampling, B, n, n_cand)

    for i in range(B):
        at = anchor_targets(rngs_at[i], jnp.asarray(anchors),
                            jnp.asarray(gtb[i]), jnp.asarray(gtv[i]),
                            im_info[i][0], im_info[i][1],
                            cfg=cfg.anchor_targets)
        labels_n, targets_n, num_ex_n, num_fg_n = tref.anchor_targets_ref(
            uniforms[i]["at_fg"], uniforms[i]["at_bg"], anchors,
            gtb[i], gtv[i], float(im_info[i][0]), float(im_info[i][1]),
            allowed_border=cfg.anchor_targets.allowed_border,
            pos_iou=cfg.anchor_targets.positive_iou,
            neg_iou=cfg.anchor_targets.negative_iou,
            batch=cfg.anchor_targets.batch_size,
            fg_fraction=cfg.anchor_targets.fg_fraction)
        np.testing.assert_array_equal(labels_n, np.asarray(at.labels),
                                      err_msg=f"image {i} labels")
        assert num_fg_n == int(at.num_fg)
        assert num_ex_n == int(at.num_examples)
        np.testing.assert_allclose(np.asarray(at.bbox_targets), targets_n,
                                   atol=1e-6)
        # the fixture must exercise both bands (quota binding is covered by
        # tests/test_sampling_dist.py; this tiny image has <256 candidates)
        assert num_fg_n > 0 and num_ex_n > num_fg_n


@pytest.mark.fast
def test_proposal_target_layer_decisions_exact():
    """Same candidates/gt/uniforms: identical sampled set, labels, fg flags,
    normalized targets (gt-append, bands, replacement fill)."""
    cfg, model, params, images, im_info, (gtb, gtl, gtv) = _fixture()
    fh, fw, n, n_cand = _geom(cfg)
    sampling = _sampling_rng(model, params, jax.random.PRNGKey(11))
    _, rngs_pt, uniforms = _derive_uniforms(sampling, B, n, n_cand)

    p = cfg.proposals.post_nms_topk_train
    rng = np.random.RandomState(5)
    for i in range(B):
        # synthetic proposal set: some near-gt (fg band), some shifted
        # (bg band), some far/invalid — deterministic
        rois = np.zeros((p, 4), np.float32)
        valid = np.zeros((p,), bool)
        k = 0
        for (x1, y1, x2, y2), v in zip(gtb[i], gtv[i]):
            if not v:
                continue
            for dx, dy in [(0, 0), (3, 2), (-4, 5), (25, 18), (40, -30)]:
                rois[k] = [max(x1 + dx, 0), max(y1 + dy, 0),
                           max(x2 + dx, 1), max(y2 + dy, 1)]
                valid[k] = True
                k += 1
        extra = rng.uniform(0, 90, size=(20, 2)).astype(np.float32)
        for e in extra:
            rois[k] = [e[0], e[1], e[0] + 12, e[1] + 9]
            valid[k] = True
            k += 1

        pt = proposal_targets(rngs_pt[i], jnp.asarray(rois),
                              jnp.asarray(valid), jnp.asarray(gtb[i]),
                              jnp.asarray(gtl[i]), jnp.asarray(gtv[i]),
                              cfg=cfg.proposal_targets)
        (rois_n, labels_n, targets_n, is_fg_n, valid_n,
         num_fg_n) = tref.proposal_targets_ref(
            uniforms[i]["pt_fg"], uniforms[i]["pt_bg"], rois, valid,
            gtb[i], gtl[i], gtv[i],
            s=cfg.proposal_targets.rois_per_image,
            fg_fraction=cfg.proposal_targets.fg_fraction,
            fg_iou=cfg.proposal_targets.fg_iou,
            bg_hi=cfg.proposal_targets.bg_iou_hi,
            bg_lo=cfg.proposal_targets.bg_iou_lo,
            means=cfg.proposal_targets.bbox_normalize_means,
            stds=cfg.proposal_targets.bbox_normalize_stds)

        assert num_fg_n == int(pt.num_fg)
        np.testing.assert_array_equal(valid_n, np.asarray(pt.valid))
        np.testing.assert_array_equal(is_fg_n, np.asarray(pt.is_fg))
        np.testing.assert_array_equal(labels_n, np.asarray(pt.labels))
        np.testing.assert_allclose(np.asarray(pt.rois), rois_n, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pt.bbox_targets), targets_n,
                                   atol=1e-5)
        assert num_fg_n > 0 and is_fg_n.sum() < valid_n.sum()


@pytest.mark.fast
def test_losses_composed_end_to_end():
    """The full independent numpy train chain reproduces the jitted
    ``losses`` graph: all four losses + both fg counters."""
    cfg, model, params, images, im_info, (gtb, gtl, gtv) = _fixture()
    fh, fw, n, n_cand = _geom(cfg)
    key = jax.random.PRNGKey(11)
    sampling = _sampling_rng(model, params, key)
    _, _, uniforms = _derive_uniforms(sampling, B, n, n_cand)

    graph = jax.jit(functools.partial(model.apply, method="losses"))
    out_j = graph(params, jnp.asarray(images), jnp.asarray(im_info),
                  jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(gtv),
                  rngs={"sampling": key, "dropout": jax.random.PRNGKey(99)})

    out_n = tref.losses_ref(params, images, im_info,
                            [(gtb[i], gtl[i], gtv[i]) for i in range(B)],
                            uniforms, cfg)

    # sampling decisions must agree exactly (the shared-uniform contract)
    np.testing.assert_allclose(
        float(out_j["num_fg_anchors"]),
        np.mean([pi["at_num_fg"] for pi in out_n["per_image"]]), atol=0)
    np.testing.assert_allclose(
        float(out_j["num_fg_rois"]),
        np.mean([pi["pt_num_fg"] for pi in out_n["per_image"]]), atol=0)
    # losses: independent convs/matmuls accumulate f32 divergence
    for k in ("rpn_cls_loss", "rpn_bbox_loss", "cls_loss", "bbox_loss",
              "loss"):
        j, nref = float(out_j[k]), float(out_n[k])
        assert abs(j - nref) / max(abs(nref), 1e-6) < 1e-4, (
            f"{k}: graph {j} vs numpy {nref}")
    # non-degenerate: every loss term is exercised
    assert float(out_j["rpn_bbox_loss"]) > 0
    assert float(out_j["bbox_loss"]) > 0
