"""Model-graph tests: shapes, jit-ability, losses, gradient flow.

Small-capacity config so the whole graph compiles quickly on the CPU test
platform; numerical fidelity of the ops inside is covered by the op-level
golden/oracle tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trcnn.config import (FasterRCNNConfig, ProposalConfig,
                          ProposalTargetConfig)
from trcnn.models import make_model
from trcnn.models.faster_rcnn import postprocess


def tiny_cfg(**kw):
    return FasterRCNNConfig(
        head_hidden=32,
        rpn_channels=16,
        proposals=ProposalConfig(pre_nms_topk_train=192, post_nms_topk_train=48,
                                 pre_nms_topk_test=192, post_nms_topk_test=24),
        proposal_targets=ProposalTargetConfig(rois_per_image=16),
        **kw,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = make_model(cfg)
    b, h, w = 2, 64, 96
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (b, h, w, 3))
    im_info = jnp.asarray([[60.0, 90.0, 1.0], [64.0, 96.0, 1.5]], jnp.float32)
    params = model.init(rng, images, im_info)
    return cfg, model, params, images, im_info


def test_detect_shapes_and_probs(setup):
    cfg, model, params, images, im_info = setup
    raw = jax.jit(lambda p, x, i: model.apply(p, x, i, method="detect"))(
        params, images, im_info)
    r = cfg.proposals.post_nms_topk_test
    assert raw.rois.shape == (2, r, 4)
    assert raw.cls_prob.shape == (2, r, cfg.num_classes)
    assert raw.bbox_pred.shape == (2, r, cfg.num_classes * 4)
    probs = np.asarray(raw.cls_prob)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    # proposals stay inside their image's valid extent
    rois = np.asarray(raw.rois)
    valid = np.asarray(raw.roi_valid)
    info = np.asarray(im_info)
    for i in range(2):
        v = valid[i]
        assert rois[i, v, 0].min() >= 0 and rois[i, v, 1].min() >= 0
        assert rois[i, v, 2].max() <= info[i, 1] - 1
        assert rois[i, v, 3].max() <= info[i, 0] - 1


def test_postprocess_shapes(setup):
    cfg, model, params, images, im_info = setup
    raw = model.apply(params, images, im_info, method="detect")
    dets = jax.jit(lambda r, i: postprocess(r, i, cfg))(raw, im_info)
    d = cfg.test.max_dets_per_image
    assert dets.boxes.shape == (2, d, 4)
    assert dets.scores.shape == dets.classes.shape == dets.valid.shape == (2, d)
    # scores of valid detections sorted descending
    s = np.asarray(dets.scores)
    v = np.asarray(dets.valid)
    for i in range(2):
        sv = s[i, v[i]]
        assert (np.diff(sv) <= 1e-6).all()


def _gt_batch():
    gt_boxes = jnp.asarray([[[5, 5, 40, 40], [10, 20, 60, 50], [0, 0, 0, 0]]] * 2,
                           jnp.float32)
    gt_labels = jnp.asarray([[3, 7, 0]] * 2, jnp.int32)
    gt_valid = jnp.asarray([[True, True, False]] * 2)
    return gt_boxes, gt_labels, gt_valid


def test_losses_finite_and_keys(setup):
    cfg, model, params, images, im_info = setup
    gt_boxes, gt_labels, gt_valid = _gt_batch()
    rng = jax.random.PRNGKey(1)
    out = jax.jit(lambda p: model.apply(
        p, images, im_info, gt_boxes, gt_labels, gt_valid, method="losses",
        rngs={"dropout": rng, "sampling": rng}))(params)
    for k in ("loss", "rpn_cls_loss", "rpn_bbox_loss", "cls_loss", "bbox_loss"):
        assert k in out and np.isfinite(float(out[k])), k
    assert float(out["cls_loss"]) > 0  # CE over random init ~ log(21)


def test_gradients_flow_to_heads(setup):
    cfg, model, params, images, im_info = setup
    gt_boxes, gt_labels, gt_valid = _gt_batch()
    rng = jax.random.PRNGKey(2)

    def total(p):
        return model.apply(p, images, im_info, gt_boxes, gt_labels, gt_valid,
                           method="losses",
                           rngs={"dropout": rng, "sampling": rng})["loss"]

    g = jax.jit(jax.grad(total))(params)
    # head cls path must receive gradient; backbone too (joint training)
    gp = g["params"]
    assert float(jnp.abs(gp["head"]["cls_score"]["kernel"]).sum()) > 0
    assert float(jnp.abs(gp["extractor"]["conv5_3"]["kernel"]).sum()) > 0
    assert all(np.isfinite(float(jnp.abs(x).sum()))
               for x in jax.tree.leaves(g))


def test_uint8_input_path_matches_float(setup):
    """uint8 canvases (device-side mean subtraction) must produce the same
    detections as the host mean-subtracted float path up to the <=0.5
    rounding of the uint8 quantization."""
    cfg, model, params, _, _ = setup
    rng = np.random.RandomState(3)
    img_u8 = rng.randint(0, 256, size=(2, 64, 96, 3)).astype(np.uint8)
    im_info = jnp.asarray([[60.0, 90.0, 1.0], [64.0, 96.0, 1.5]], jnp.float32)
    means = np.asarray(cfg.image.pixel_means_bgr, np.float32)

    # float path: mean-subtracted, zero beyond the valid extent
    imgs_f = img_u8.astype(np.float32) - means
    for i, (sh, sw) in enumerate([(60, 90), (64, 96)]):
        imgs_f[i, sh:] = 0.0
        imgs_f[i, :, sw:] = 0.0

    raw_f = model.apply(params, jnp.asarray(imgs_f), im_info, method="detect")
    raw_u = model.apply(params, jnp.asarray(img_u8), im_info, method="detect")
    np.testing.assert_allclose(np.asarray(raw_u.cls_prob),
                               np.asarray(raw_f.cls_prob), atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw_u.rois),
                               np.asarray(raw_f.rois), atol=1e-3)


def test_cast_params_for_inference_bit_identical():
    """The serving pre-cast (kernels → compute dtype, once) must produce
    BIT-identical detect outputs to feeding f32 params into the same
    bf16 graph — the graph casts kernels at their use sites either way;
    the pre-cast only removes the per-dispatch cast traffic (round-5 b1
    attribution: the fc6 cast alone was ~1.5 ms of a 5.9 ms device
    step).  FrozenBN-style non-kernel leaves must stay f32."""
    from trcnn.models.faster_rcnn import cast_params_for_inference

    cfg = tiny_cfg()
    model = make_model(cfg, dtype=jnp.bfloat16)
    b, h, w = 1, 64, 96
    rng = jax.random.PRNGKey(3)
    images = jax.random.normal(rng, (b, h, w, 3))
    im_info = jnp.asarray([[60.0, 90.0, 1.0]], jnp.float32)
    params = model.init(rng, images, im_info)

    cast = cast_params_for_inference(params, jnp.bfloat16)
    # kernels cast, biases untouched, f32 precision islands untouched
    assert cast["params"]["head"]["fc6"]["kernel"].dtype == jnp.bfloat16
    assert cast["params"]["head"]["fc6"]["bias"].dtype == jnp.float32
    assert cast["params"]["head"]["cls_score"]["kernel"].dtype == jnp.float32
    assert cast["params"]["head"]["bbox_pred"]["kernel"].dtype == jnp.float32

    run = jax.jit(lambda p, x, i: model.apply(p, x, i, method="detect"))
    raw_f32 = run(params, images, im_info)
    raw_cast = run(cast, images, im_info)
    for field in ("rois", "roi_valid", "cls_prob", "bbox_pred"):
        np.testing.assert_array_equal(
            np.asarray(getattr(raw_f32, field)),
            np.asarray(getattr(raw_cast, field)), err_msg=field)
    # f32 compute dtype: pure no-op, same object tree
    assert cast_params_for_inference(params, jnp.float32) is params


def test_roi_align_mode_config():
    """RoIConfig.mode='align' must actually select RoIAlign in the model
    (it was a dead switch until round 2.1)."""
    import dataclasses

    cfg = tiny_cfg()
    cfg_align = cfg.replace(roi=dataclasses.replace(cfg.roi, mode="align"))
    model = make_model(cfg_align)
    b, h, w = 1, 64, 96
    imgs = jnp.asarray(np.random.RandomState(0).rand(b, h, w, 3), jnp.float32)
    info = jnp.asarray([[64.0, 96.0, 1.0]], jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, info)
    raw = model.apply(params, imgs, info, method="detect")
    assert np.isfinite(np.asarray(raw.cls_prob)).all()
    # the align graph must differ from the max-pool graph
    model_max = make_model(cfg)
    txt_align = jax.jit(lambda p, x, i: model.apply(p, x, i, method="detect")
                        ).lower(params, imgs, info).as_text()
    txt_max = jax.jit(lambda p, x, i: model_max.apply(p, x, i, method="detect")
                      ).lower(params, imgs, info).as_text()
    assert txt_align != txt_max
