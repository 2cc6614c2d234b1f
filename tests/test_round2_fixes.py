"""Regression tests for the round-2 fixes (VERDICT + ADVICE round 1).

Covers: ImageNet-trunk warm-start merge (ADVICE medium), the VOC devkit
strict-IoU match boundary, the COCO evaluation +1/continuous convention
equivalence, Caffe-semantics momentum (lr inside the velocity), loader
process-sharding, and the devkit detection-file writer.
"""

import json
import os

import numpy as np
import pytest


# ---- warm-start merge (ADVICE r1 medium) --------------------------------

def _tiny_cfg():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_cfg as f
    return f()


def test_imagenet_warm_start_merge(tmp_path):
    """Trunk-only npz + merge_params → full tree that model.apply accepts
    (the reproduced round-1 crash: strict=False alone returned a partial
    tree with missing rpn/head)."""
    import jax
    import jax.numpy as jnp

    from trcnn.convert import (export_chainer_npz, import_chainer_npz,
                               merge_params)
    from trcnn.models import make_model

    cfg = _tiny_cfg()
    model = make_model(cfg)
    images = np.zeros((1, cfg.image.pad_h, cfg.image.pad_w, 3), np.float32)
    im_info = np.asarray([[cfg.image.pad_h, cfg.image.pad_w, 1.0]], np.float32)

    donor = jax.jit(model.init)(jax.random.PRNGKey(1), images, im_info)
    full_npz = str(tmp_path / "full.npz")
    export_chainer_npz(jax.tree.map(np.asarray, donor), full_npz, cfg)

    # strip it down to an ImageNet-style trunk-only npz
    loaded = dict(np.load(full_npz))
    trunk_only = {k: v for k, v in loaded.items() if k.startswith("trunk/")}
    trunk_npz = str(tmp_path / "trunk.npz")
    np.savez(trunk_npz, **trunk_only)

    imported = import_chainer_npz(trunk_npz, cfg, strict=False)
    assert "extractor" in imported["params"]
    assert "rpn" not in imported["params"]      # partial tree, by contract

    init = jax.jit(model.init)(jax.random.PRNGKey(2), images, im_info)
    params = merge_params(jax.tree.map(np.asarray, init), imported)

    # trunk came from the donor, heads from the fresh init
    d = jax.tree.map(np.asarray, donor)["params"]
    i = jax.tree.map(np.asarray, init)["params"]
    got = params["params"]
    conv1 = next(iter(d["extractor"]))
    np.testing.assert_allclose(got["extractor"][conv1]["kernel"],
                               d["extractor"][conv1]["kernel"], atol=1e-6)
    np.testing.assert_array_equal(got["rpn"]["rpn_conv"]["kernel"],
                                  i["rpn"]["rpn_conv"]["kernel"])

    # and the merged tree actually runs (the round-1 crash site)
    out = jax.jit(lambda p: model.apply(p, images, im_info, method="detect"))(
        params)
    jax.block_until_ready(out)


def test_merge_params_rejects_leaf_overlay_mismatch():
    from trcnn.convert import merge_params

    with pytest.raises(ValueError):
        merge_params({"a": 1}, {"a": {"b": 2}})
    merged = merge_params({"a": {"x": 1}, "b": 2}, {"a": {"y": 3}})
    assert merged == {"a": {"x": 1, "y": 3}, "b": 2}


# ---- VOC devkit strict IoU boundary (ADVICE r1) --------------------------

def test_voc_eval_iou_exactly_half_is_fp():
    """devkit voc_eval uses ovmax > ovthresh strictly; IoU == 0.5 must not
    match.  gt (0,0,9,19) vs det (0,10,9,19): inter 100, union 200."""
    from trcnn.eval.voc_ap import DetectionRecord, voc_eval_class

    rec = DetectionRecord(
        image_ids=["im0"],
        scores=np.asarray([0.9]),
        boxes=np.asarray([[0.0, 10.0, 9.0, 19.0]]),
        gt_boxes={"im0": np.asarray([[0.0, 0.0, 9.0, 19.0]])},
        gt_difficult={"im0": np.zeros(1, bool)},
    )
    ap, recall, _ = voc_eval_class(rec, iou_thresh=0.5)
    assert ap == 0.0 and recall[-1] == 0.0

    # nudge the detection 1px up → IoU > 0.5 → TP
    rec.boxes = np.asarray([[0.0, 9.0, 9.0, 19.0]])
    ap, recall, _ = voc_eval_class(rec, iou_thresh=0.5)
    assert recall[-1] == 1.0 and ap > 0.9


# ---- COCO +1/continuous equivalence (ADVICE r1) ---------------------------

def test_coco_ap_discrete_convention_matches_cocoeval():
    """COCO xywh (0,0,10,10) → pipeline box (0,0,9,9).  A det covering the
    left half, (0,0,4,9), has continuous IoU exactly 0.5 in COCOeval's
    protocol; the evaluator must reproduce that on discrete boxes (the old
    continuous-on-discrete math gave 36/81 ≈ 0.444 → FP at 0.5)."""
    from trcnn.eval.coco_ap import coco_eval

    detections = [{"id": "0", "boxes": np.asarray([[0.0, 0.0, 4.0, 9.0]]),
                   "scores": np.asarray([0.9]),
                   "classes": np.asarray([1])}]
    annotations = {"0": {"boxes": np.asarray([[0.0, 0.0, 9.0, 9.0]]),
                         "labels": np.asarray([1]),
                         "crowd": np.zeros(1, bool)}}
    res = coco_eval(detections, annotations, num_classes=2)
    assert res["AP50"] == pytest.approx(1.0)   # IoU 0.5 matches at t=0.5
    assert res["AP75"] == 0.0                  # but not at t=0.75


# ---- Caffe momentum semantics (ADVICE r1) ---------------------------------

def test_momentum_lr_inside_velocity():
    """v = m·v − lr·g (Chainer/Caffe): at an lr decay the velocity decays
    over ~1/(1−m) steps instead of being instantly rescaled."""
    import jax
    import jax.numpy as jnp

    from trcnn.config import OptimConfig
    from trcnn.train.optim import make_optimizer

    cfg = OptimConfig(base_lr=0.1, momentum=0.9, weight_decay=0.0,
                      lr_decay_step=1, lr_decay_factor=0.1)
    params = {"params": {"head": {"fc6": {"kernel": jnp.ones((2, 2))}}}}
    tx = make_optimizer(params, cfg)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)

    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    v1 = float(u1["params"]["head"]["fc6"]["kernel"][0, 0])
    v2 = float(u2["params"]["head"]["fc6"]["kernel"][0, 0])
    lr1, lr2, m = 0.1, 0.01, 0.9
    assert v1 == pytest.approx(-lr1)
    # Caffe: v2 = m·v1 − lr2·g = −0.09 − 0.01 = −0.1
    # (old optax order gave lr2·(g + m·g) = −0.019)
    assert v2 == pytest.approx(m * v1 - lr2)


# ---- loader process sharding ----------------------------------------------

def test_loader_sharding_disjoint_and_complete():
    from trcnn.config import ImageConfig
    from trcnn.data import DetectionLoader, SyntheticDetection

    ds = SyntheticDetection(n=10, hw_range=((40, 48), (56, 64)))
    icfg = ImageConfig(target_min_size=40, target_max_size=96,
                       pad_h=64, pad_w=96)
    ids = []
    for shard in range(2):
        loader = DetectionLoader(ds, batch_size=1, image_cfg=icfg,
                                 shuffle=True, seed=3, prefetch=0, workers=1,
                                 shard_id=shard, num_shards=2)
        got = [b.ids[0] for b in loader]
        assert len(got) == len(loader) == 5
        ids.append(set(got))
    assert ids[0] & ids[1] == set()
    assert ids[0] | ids[1] == set(ds.ids)

    with pytest.raises(ValueError):
        DetectionLoader(ds, shard_id=2, num_shards=2)


# ---- in-training evaluator --------------------------------------------------

def test_evaluator_runs_and_reports():
    import jax

    from trcnn.data import SyntheticDetection
    from trcnn.eval import Evaluator
    from trcnn.models import make_model

    cfg = _tiny_cfg()
    ds = SyntheticDetection(n=6, num_classes=cfg.num_classes,
                            hw_range=((48, 60), (64, 90)))
    model = make_model(cfg)
    ev = Evaluator(model, cfg, ds, batch_size=2, limit=4)
    ex = ds.get_example(0)
    images = np.zeros((2, cfg.image.pad_h, cfg.image.pad_w, 3), np.float32)
    im_info = np.tile(np.asarray(
        [[cfg.image.pad_h, cfg.image.pad_w, 1.0]], np.float32), (2, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, im_info)

    out = ev(params)
    assert "eval_mAP" in out and 0.0 <= out["eval_mAP"] <= 1.0
    assert out["eval_images"] == 4.0
    # annotations parsed once, without image decode, and cached
    assert len(ev.annotations()) == 4
    assert ev.annotations() is ev.annotations()


# ---- frozen-stem gradient pruning -------------------------------------------

def test_frozen_stem_gets_zero_raw_grads_but_head_trains():
    """freeze_stem stop_gradient: conv1_1..conv2_2 raw grads are exactly
    zero (their backward is pruned from the graph — they were masked to
    zero by the optimizer anyway), while conv3+ and heads get real
    gradients."""
    import jax
    import jax.numpy as jnp

    from trcnn.models import make_model

    cfg = _tiny_cfg()
    model = make_model(cfg)
    b, h, w = 1, cfg.image.pad_h, cfg.image.pad_w
    images = jnp.asarray(
        np.random.RandomState(0).rand(b, h, w, 3), jnp.float32)
    im_info = jnp.asarray([[h, w, 1.0]], jnp.float32)
    gt_boxes = jnp.asarray([[[5.0, 5.0, 40.0, 40.0]]])
    gt_labels = jnp.asarray([[3]], jnp.int32)
    gt_valid = jnp.ones((1, 1), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, im_info)

    def loss_fn(p):
        out = model.apply(p, images, im_info, gt_boxes, gt_labels, gt_valid,
                          method="losses",
                          rngs={"dropout": jax.random.PRNGKey(1),
                                "sampling": jax.random.PRNGKey(2)})
        return out["loss"]

    grads = jax.jit(jax.grad(loss_fn))(params)["params"]
    for name in ("conv1_1", "conv1_2", "conv2_1", "conv2_2"):
        g = grads["extractor"][name]["kernel"]
        assert float(jnp.abs(g).max()) == 0.0, name
    assert float(jnp.abs(
        grads["extractor"]["conv3_1"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(grads["rpn"]["rpn_conv"]["kernel"]).max()) > 0.0


# ---- devkit detection files -----------------------------------------------

def test_write_voc_detection_files(tmp_path):
    from trcnn.eval.voc_ap import write_voc_detection_files

    detections = [
        {"id": "000001", "boxes": np.asarray([[0.0, 1.0, 10.0, 11.0]]),
         "scores": np.asarray([0.875]), "classes": np.asarray([1])},
        {"id": "000002", "boxes": np.asarray([[5.0, 5.0, 20.0, 20.0]]),
         "scores": np.asarray([0.5]), "classes": np.asarray([2])},
    ]
    names = ("__background__", "aeroplane", "bicycle")
    paths = write_voc_detection_files(names, detections, str(tmp_path))
    assert len(paths) == 2
    line = open(os.path.join(
        tmp_path, "comp4_det_test_aeroplane.txt")).read().strip()
    # devkit format: image_id score x1 y1 x2 y2, 1-BASED coordinates
    assert line == "000001 0.875 1.0 2.0 11.0 12.0"
    assert open(os.path.join(
        tmp_path, "comp4_det_test_bicycle.txt")).read().startswith(
        "000002 0.500 6.0 6.0 21.0 21.0")
