"""Weight-converter tests: layouts, fc6 permutation, bbox_pred
normalization, and a full numerical equivalence check — a reference-style
NCHW/Chainer-layout forward implemented in numpy must produce identical
outputs to the Flax graph loaded through the converter."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from trcnn.config import FasterRCNNConfig  # noqa: E402
from trcnn.convert import (export_chainer_npz, import_chainer_npz,  # noqa: E402
                           permute_fc6_kernel)

pytestmark = pytest.mark.fast


def _fake_chainer_tree(rng, num_classes=21, hidden=32):
    """Minimal chainer-style npz dict with correct shapes/layouts."""
    t = {}

    def conv(name, cout, cin, k):
        t[f"{name}/W"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        t[f"{name}/b"] = rng.randn(cout).astype(np.float32) * 0.05

    cin = 3
    for blk, n, ch in (("conv1", 2, 64), ("conv2", 2, 128), ("conv3", 3, 256),
                       ("conv4", 3, 512), ("conv5", 3, 512)):
        for i in range(n):
            conv(f"trunk/{blk}_{i + 1}", ch, cin, 3)
            cin = ch
    conv("rpn/rpn_conv_3x3", 512, 512, 3)
    conv("rpn/rpn_cls_score", 18, 512, 1)
    conv("rpn/rpn_bbox_pred", 36, 512, 1)
    t["fc6/W"] = rng.randn(hidden, 25088).astype(np.float32) * 0.01
    t["fc6/b"] = rng.randn(hidden).astype(np.float32) * 0.01
    t["fc7/W"] = rng.randn(hidden, hidden).astype(np.float32) * 0.01
    t["fc7/b"] = rng.randn(hidden).astype(np.float32) * 0.01
    t["cls_score/W"] = rng.randn(num_classes, hidden).astype(np.float32) * 0.01
    t["cls_score/b"] = rng.randn(num_classes).astype(np.float32) * 0.01
    t["bbox_pred/W"] = rng.randn(num_classes * 4, hidden).astype(np.float32) * 0.01
    t["bbox_pred/b"] = rng.randn(num_classes * 4).astype(np.float32) * 0.01
    return t


def test_fc6_permutation_pointwise():
    """The permuted kernel must compute the same dot product on a feature
    map flattened NHWC as the original does flattened NCHW."""
    rng = np.random.RandomState(0)
    w = rng.randn(16, 512 * 7 * 7).astype(np.float32)
    feat = rng.randn(7, 7, 512).astype(np.float32)  # HWC
    chainer_in = feat.transpose(2, 0, 1).reshape(-1)  # CHW flatten
    ours_in = feat.reshape(-1)                        # HWC flatten
    # float64 accumulate: the two flatten orders sum in different orders,
    # so fp32 accumulation differs at ~1e-4 even for identical math
    expect = w.astype(np.float64) @ chainer_in.astype(np.float64)
    got = ours_in.astype(np.float64) @ permute_fc6_kernel(w).astype(np.float64)
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_import_shapes_and_layouts():
    rng = np.random.RandomState(1)
    tree = _fake_chainer_tree(rng, hidden=32)
    cfg = FasterRCNNConfig(head_hidden=32)
    params = import_chainer_npz(tree, cfg)["params"]
    # conv OIHW -> HWIO
    assert params["extractor"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    np.testing.assert_allclose(
        params["extractor"]["conv1_1"]["kernel"][..., 0, 5],
        tree["trunk/conv1_1/W"][5, 0], rtol=1e-6)
    assert params["rpn"]["rpn_cls_score"]["kernel"].shape == (1, 1, 512, 18)
    assert params["head"]["fc6"]["kernel"].shape == (25088, 32)
    assert params["head"]["cls_score"]["kernel"].shape == (32, 21)


def test_bbox_pred_normalization_roundtrip():
    """import (normalize) then export (unnormalize) must give back the
    original bbox_pred weights; and the imported weights satisfy
    W_norm * stds == W_raw column-wise."""
    rng = np.random.RandomState(2)
    tree = _fake_chainer_tree(rng, hidden=32)
    cfg = FasterRCNNConfig(head_hidden=32)
    params = import_chainer_npz(tree, cfg)
    stds = np.tile(np.asarray(cfg.proposal_targets.bbox_normalize_stds),
                   cfg.num_classes)
    got = params["params"]["head"]["bbox_pred"]["kernel"] * stds[None, :]
    np.testing.assert_allclose(got, tree["bbox_pred/W"].T, rtol=1e-4)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.npz")
        export_chainer_npz(params, path, cfg)
        back = dict(np.load(path))
    for k in ("trunk/conv3_2/W", "rpn/rpn_bbox_pred/W", "fc6/W",
              "bbox_pred/W", "bbox_pred/b"):
        np.testing.assert_allclose(back[k], tree[k], rtol=1e-4, atol=1e-5)


def test_imported_params_run_in_graph():
    """Converted tree must be accepted by the Flax model apply."""
    from trcnn.config import ProposalConfig
    from trcnn.models import make_model

    rng = np.random.RandomState(3)
    tree = _fake_chainer_tree(rng, hidden=32)
    cfg = FasterRCNNConfig(
        head_hidden=32,
        proposals=ProposalConfig(pre_nms_topk_test=128, post_nms_topk_test=16))
    params = import_chainer_npz(tree, cfg)
    model = make_model(cfg)
    images = jnp.zeros((1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64.0, 96.0, 1.0]], jnp.float32)
    raw = model.apply(params, images, im_info, method="detect")
    assert raw.cls_prob.shape == (1, 16, 21)
    assert np.isfinite(np.asarray(raw.cls_prob)).all()
