"""Full-config cross-implementation run (VERDICT r3 item 8, slow tier).

The fast cross-impl check (tests/test_cross_impl.py) runs a 128x192
canvas with 64-dim heads — the right CI cost point, but it covers the
FLAGSHIP contract only transitively: the 608x1024 landscape bucket, the
6000-candidate proposal stage, and the full-width 25088 -> 4096 fc6
flatten are all geometry the tiny fixture never builds.  This slow test
pushes ONE image at the production VOC config (un-shrunk heads, default
capacities) through the independent numpy chain and the jitted graph and
requires the same end-to-end agreement.  Minutes of numpy im2col on CPU;
run with `pytest -m slow`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import cross_impl_reference as ref
from trcnn.config import FasterRCNNConfig
from trcnn.models import make_model
from trcnn.models.faster_rcnn import postprocess

pytestmark = pytest.mark.slow


def test_full_config_chain_end_to_end():
    cfg = FasterRCNNConfig()          # production VOC preset, nothing shrunk
    assert cfg.image.pad_h == 608 and cfg.image.pad_w == 1024
    assert cfg.head_hidden == 4096
    assert cfg.proposals.pre_nms_topk_test == 6000

    model = make_model(cfg, dtype=jnp.float32)
    b, h, w = 1, cfg.image.pad_h, cfg.image.pad_w
    key = jax.random.PRNGKey(17)
    images = jax.random.normal(key, (b, h, w, 3), jnp.float32) * 40.0
    im_info = jnp.asarray([[600.0, 1000.0, 1.8]], jnp.float32)
    params = jax.jit(model.init)(key, images, im_info)
    params = jax.tree.map(np.asarray, params)

    # calibrate the four output kernels exactly as the fast fixture does:
    # σ=0.01 random init leaves softmax near-constant and every discrete
    # stage tie-dominated; spread logits exercise sort/NMS for real
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
        np.stack([np.asarray([20.0, 20.0, 300.0, 350.0]) + 5 * i
                  for i in range(8)])[None], jnp.float32)
    cs, bp = model.apply(params, feat, rois, method="roi_forward")
    scale(("head", "cls_score", "kernel"), 2.0 / float(jnp.std(cs)))
    scale(("head", "bbox_pred", "kernel"), 0.1 / float(jnp.std(bp)))

    @jax.jit
    def graph(p, x, info):
        raw = model.apply(p, x, info, method="detect")
        return postprocess(raw, info, cfg)

    det_j = graph(params, images, im_info)
    np_images = np.asarray(images)
    ih, iw, sc = (float(x) for x in np.asarray(im_info)[0])
    out = ref.full_forward(params, np_images[0], ih, iw, sc, cfg)
    b_n, s_n, c_n, v_n = out["detections"]

    v_j = np.asarray(det_j.valid)[0]
    assert v_n.sum() == v_j.sum(), (
        f"detection count mismatch: numpy {v_n.sum()} vs graph {v_j.sum()}")
    assert v_n.sum() > 3, "degenerate fixture: too few detections to test"
    np.testing.assert_array_equal(c_n, np.asarray(det_j.classes)[0])
    # tolerances mirror the fast test, widened for the ~26x larger
    # spatial reduction footprint (f32 sums over 608x1024 vs 128x192)
    np.testing.assert_allclose(np.asarray(det_j.scores)[0], s_n, atol=3e-3)
    np.testing.assert_allclose(np.asarray(det_j.boxes)[0], b_n, atol=0.25)
    # the proposal stage really ran at full capacity
    assert out["roi_valid"].sum() > 100
