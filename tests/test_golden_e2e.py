"""End-to-end golden regression (SURVEY.md §5 rebuild plan item 4).

Fixed seed + fixed tiny config through the FULL detect pipeline
(backbone → RPN → proposal/NMS → RoI pool → head → decode → per-class
NMS); detections must match the stored goldens.  Guards every numerical
contract at once — any refactor that shifts a box or a score trips it.
(Pretrained-weight goldens are not possible in this environment: no
weights on disk, zero egress — this is the seeded-weights equivalent.)
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from trcnn.config import FasterRCNNConfig, ProposalConfig
from trcnn.models import make_model
from trcnn.models.faster_rcnn import postprocess

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_e2e.json")


def test_detect_pipeline_matches_golden():
    cfg = FasterRCNNConfig(
        head_hidden=32, rpn_channels=16,
        proposals=ProposalConfig(pre_nms_topk_test=192, post_nms_topk_test=24,
                                 pre_nms_topk_train=192,
                                 post_nms_topk_train=48),
    )
    model = make_model(cfg)
    rng = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(rng)
    images = jax.random.uniform(k1, (1, 64, 96, 3)) * 120.0 - 60.0
    im_info = jnp.asarray([[60.0, 90.0, 1.2]], jnp.float32)
    params = model.init(k2, images, im_info)
    raw = model.apply(params, images, im_info, method="detect")
    dets = postprocess(raw, im_info, cfg, score_thresh=0.02)

    with open(GOLDEN) as f:
        g = json.load(f)
    v = np.asarray(dets.valid[0])
    assert int(v.sum()) == g["n_valid"]
    np.testing.assert_allclose(np.asarray(raw.rois).sum(), g["roi_sum"],
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(raw.cls_prob).mean(),
                               g["cls_prob_mean"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dets.boxes[0])[v][:10],
                               np.asarray(g["boxes"]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dets.scores[0])[v][:10],
                               np.asarray(g["scores"]), rtol=1e-4, atol=1e-6)
    assert list(np.asarray(dets.classes[0])[v][:10]) == g["classes"]
