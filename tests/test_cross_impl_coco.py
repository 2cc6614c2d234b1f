"""81-class COCO-config cross-implementation check (VERDICT r4 item 6).

The three cross-impl harnesses through round 4 all ran VOC-shaped
configs (21 classes), so the COCO config's DISTINCT contracts — the
324-wide class-grouped bbox head, the 81-way grouped NMS epilogue, the
multiscale-bucket scale geometry — were pinned only by self-consistent
unit tests: a class-group layout flip would have passed the suite.  This
module runs the independent numpy chain (tests/cross_impl_reference —
num-classes-agnostic by construction) against the jitted graph at
num_classes=81 on a small canvas, requires the discrete 81-way epilogue
decisions bit-equal, and proves the check has teeth with a seeded
class-group layout flip that must turn it red.

Multiscale geometry: the COCO preset's shorter-side list is checked
against an independent scalar re-derivation of the scale/canvas math the
loader applies per image (scale = min(min_size/min(H,W),
max_size/max(H,W)), fixed orientation bucket).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import cross_impl_reference as ref
from tests.test_cross_impl import _rel_err, _scale_leaf
from trcnn.config import (FasterRCNNConfig, ImageConfig, ProposalConfig,
                          TestTimeConfig, coco_config)
from trcnn.models import make_model
from trcnn.models.faster_rcnn import postprocess

F32 = np.float32
NUM = 81  # COCO: 80 things + background


def _cfg():
    return FasterRCNNConfig(
        num_classes=NUM,
        head_hidden=64,
        rpn_channels=64,
        proposals=ProposalConfig(pre_nms_topk_test=512,
                                 post_nms_topk_test=64),
        image=ImageConfig(pad_h=128, pad_w=192),
        test=TestTimeConfig(max_dets_per_class=16, max_dets_per_image=48),
    )


@functools.lru_cache(maxsize=1)
def _fixture():
    """(cfg, model, params-as-numpy, image, im_info) at 81 classes, head
    scales calibrated exactly like the VOC harness fixture."""
    cfg = _cfg()
    model = make_model(cfg, dtype=jnp.float32)
    b, h, w = 1, cfg.image.pad_h, cfg.image.pad_w
    key = jax.random.PRNGKey(11)
    images = jax.random.normal(key, (b, h, w, 3), jnp.float32) * 40.0
    im_info = jnp.asarray([[120.0, 180.0, 1.2]], jnp.float32)
    params = jax.jit(model.init)(key, images, im_info)
    params = jax.tree.map(lambda x: np.asarray(x), params)

    feat = model.apply(params, images, method="features")
    rpnout = model.apply(params, feat, method="rpn_out")
    _scale_leaf(params, ("rpn", "rpn_cls_score", "kernel"),
                2.0 / float(jnp.std(rpnout.logits)))
    _scale_leaf(params, ("rpn", "rpn_bbox_pred", "kernel"),
                0.15 / float(jnp.std(rpnout.deltas)))
    rois = jnp.asarray(
        np.stack([np.asarray([10.0, 10.0, 80.0, 90.0]) + i
                  for i in range(8)])[None], jnp.float32)
    cs, bp = model.apply(params, feat, rois, method="roi_forward")
    _scale_leaf(params, ("head", "cls_score", "kernel"),
                2.0 / float(jnp.std(cs)))
    _scale_leaf(params, ("head", "bbox_pred", "kernel"),
                0.1 / float(jnp.std(bp)))
    return cfg, model, params, np.asarray(images), np.asarray(im_info)


def _graph_raw(cfg, model, params, images, im_info):
    return jax.jit(functools.partial(model.apply, method="detect"))(
        params, jnp.asarray(images), jnp.asarray(im_info))


def _pp_kwargs(cfg):
    return dict(num_classes=cfg.num_classes,
                stds=cfg.proposal_targets.bbox_normalize_stds,
                means=cfg.proposal_targets.bbox_normalize_means,
                nms_thresh=cfg.test.nms_thresh,
                score_thresh=cfg.test.score_thresh_eval,
                max_total=cfg.test.max_dets_per_image)


@pytest.mark.fast
def test_coco_head_widths_and_numerics():
    """81/324 head widths exist in the params, and the independent numpy
    head reproduces the graph's probs/deltas on the graph's own RoIs."""
    cfg, model, params, images, im_info = _fixture()
    hp = params["params"]["head"]
    assert hp["cls_score"]["kernel"].shape[-1] == NUM
    assert hp["bbox_pred"]["kernel"].shape[-1] == 4 * NUM

    raw = _graph_raw(cfg, model, params, images, im_info)
    feat = np.asarray(model.apply(params, jnp.asarray(images),
                                  method="features"))
    pooled_n = ref.roi_max_pool_oracle_numpy(
        feat[0], np.asarray(raw.rois)[0], out_size=cfg.roi.output_size,
        spatial_scale=cfg.roi.spatial_scale)
    cls_n, bp_n = ref.roi_head_forward(params["params"]["head"], pooled_n)
    assert bp_n.shape[-1] == 4 * NUM
    prob_n = ref.softmax(cls_n, axis=-1)
    assert _rel_err(prob_n, np.asarray(raw.cls_prob)[0]) < 1e-4
    assert _rel_err(bp_n, np.asarray(raw.bbox_pred)[0]) < 1e-4


@pytest.mark.fast
def test_coco_postprocess_81way_discrete_exact():
    """Same raw head outputs into both 81-way epilogues: identical
    detection sets (class-grouped decode layout, 81-way grouped NMS,
    merge order)."""
    cfg, model, params, images, im_info = _fixture()
    raw = _graph_raw(cfg, model, params, images, im_info)
    det_j = postprocess(raw, jnp.asarray(im_info), cfg)

    ih, iw, sc = (float(x) for x in im_info[0])
    b_n, s_n, c_n, v_n = ref.postprocess_forward(
        np.asarray(raw.rois)[0], np.asarray(raw.roi_valid)[0],
        np.asarray(raw.cls_prob)[0], np.asarray(raw.bbox_pred)[0],
        ih, iw, sc, **_pp_kwargs(cfg))

    # detections span many of the 81 classes (the epilogue is genuinely
    # exercised class-wide, not on a near-empty class set)
    assert len(set(c_n[v_n].tolist())) >= 8
    np.testing.assert_array_equal(v_n, np.asarray(det_j.valid)[0])
    np.testing.assert_array_equal(c_n, np.asarray(det_j.classes)[0])
    np.testing.assert_allclose(np.asarray(det_j.scores)[0], s_n, atol=1e-6)
    np.testing.assert_allclose(np.asarray(det_j.boxes)[0], b_n, atol=2e-3)


def test_coco_full_chain_end_to_end():
    """The complete independently-composed numpy chain reproduces the
    graph's detections at 81 classes."""
    cfg, model, params, images, im_info = _fixture()

    @jax.jit
    def graph(p, x, info):
        raw = model.apply(p, x, info, method="detect")
        return postprocess(raw, info, cfg)

    det_j = graph(params, jnp.asarray(images), jnp.asarray(im_info))
    ih, iw, sc = (float(x) for x in im_info[0])
    out = ref.full_forward(params, images[0], ih, iw, sc, cfg)
    b_n, s_n, c_n, v_n = out["detections"]

    np.testing.assert_array_equal(v_n, np.asarray(det_j.valid)[0])
    np.testing.assert_array_equal(c_n, np.asarray(det_j.classes)[0])
    np.testing.assert_allclose(np.asarray(det_j.scores)[0], s_n, atol=1e-4)
    np.testing.assert_allclose(np.asarray(det_j.boxes)[0], b_n, atol=5e-2)


@pytest.mark.fast
def test_mutation_coco_class_group_layout_flip_detected():
    """THE MUTATION (teeth proof): read bbox_pred as class-MINOR
    (r, 4, 81) instead of the class-grouped (r, 81, 4) layout.  The
    81-way epilogue must diverge loudly from the graph — this is exactly
    the flip VERDICT r4 weak 6 says the round-4 suite would have
    passed."""
    cfg, model, params, images, im_info = _fixture()
    raw = _graph_raw(cfg, model, params, images, im_info)
    det_j = postprocess(raw, jnp.asarray(im_info), cfg)
    ih, iw, sc = (float(x) for x in im_info[0])

    bp = np.asarray(raw.bbox_pred)[0]
    r = bp.shape[0]
    bp_mut = bp.reshape(r, 4, NUM).transpose(0, 2, 1).reshape(r, 4 * NUM)
    b_m, s_m, c_m, v_m = ref.postprocess_forward(
        np.asarray(raw.rois)[0], np.asarray(raw.roi_valid)[0],
        np.asarray(raw.cls_prob)[0], bp_mut, ih, iw, sc, **_pp_kwargs(cfg))

    same_valid = bool(np.array_equal(v_m, np.asarray(det_j.valid)[0]))
    same_classes = bool(np.array_equal(c_m, np.asarray(det_j.classes)[0]))
    boxes_close = bool(np.allclose(np.asarray(det_j.boxes)[0], b_m,
                                   atol=0.3))
    assert not (same_valid and same_classes and boxes_close), (
        "harness has no teeth: a class-group layout flip reproduced the "
        "graph's detections")


@pytest.mark.fast
def test_coco_multiscale_bucket_geometry_independent():
    """Independent scalar re-derivation of the multiscale scale/canvas
    math for every shorter-side in the COCO preset's list: the loader's
    preprocess must agree on (scaled_h, scaled_w, scale) and keep ONE
    fixed orientation bucket across all scales (the property that makes
    multiscale free of recompiles)."""
    from trcnn.data.preprocess import canvas_shape, preprocess_image

    ccfg = coco_config().image
    assert len(ccfg.multiscale_min_sizes) >= 2
    rng = np.random.RandomState(0)
    # a 4:3 image (cap never binds) and a wide panorama (the 1333 longer-
    # side cap binds at the large scales)
    for shape in ((480, 640), (300, 1200)):
        img = rng.randint(0, 256, shape + (3,), np.uint8)
        h, w = shape
        buckets = set()
        for ms in ccfg.multiscale_min_sizes:
            canvas, info = preprocess_image(img, ccfg, min_size=ms)
            # independent derivation (float64 scalar math, no shared
            # helper): shorter side to ms, capped by the longer side
            want_scale = float(ms) / min(h, w)
            if round(want_scale * max(h, w)) > ccfg.target_max_size:
                want_scale = float(ccfg.target_max_size) / max(h, w)
            assert abs(float(info[2]) - want_scale) < 1e-6
            assert int(info[0]) == int(round(h * want_scale))
            assert int(info[1]) == int(round(w * want_scale))
            buckets.add(canvas.shape[:2])
            assert canvas.shape[:2] == canvas_shape(h, w, ccfg)
        assert len(buckets) == 1, (
            "multiscale must not change the canvas bucket")
