"""ResNet-101-C4 backbone graph tests (BASELINE config 3).

The full 101-layer net is too heavy for CPU unit tests to *execute*, so
structure/shape checks go through jax.eval_shape (trace-only, no compute);
a reduced-depth stage is executed for numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trcnn.config import FasterRCNNConfig, ProposalConfig
from trcnn.models import make_model
from trcnn.models.resnet import (Bottleneck, FrozenBatchNorm, ResNet101C4,
                                 ResStage)


def test_frozen_bn_is_affine_with_loaded_stats():
    bn = FrozenBatchNorm()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 8),
                    jnp.float32)
    params = bn.init(jax.random.PRNGKey(0), x)
    p = {"params": {"scale": jnp.full((8,), 2.0), "bias": jnp.full((8,), 1.0),
                    "mean": jnp.full((8,), 0.5), "var": jnp.full((8,), 4.0)}}
    y = bn.apply(p, x)
    expect = (np.asarray(x) - 0.5) / np.sqrt(4.0 + 1e-5) * 2.0 + 1.0
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-5)


def test_bottleneck_residual_shapes_and_projection():
    blk = Bottleneck(channels=16, stride=2, project=True)
    x = jnp.zeros((1, 8, 8, 32))
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == (1, 4, 4, 64)


def test_resstage_executes():
    stage = ResStage(blocks=2, channels=8, stride=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16), jnp.float32)
    params = stage.init(jax.random.PRNGKey(0), x)
    y = stage.apply(params, x)
    assert y.shape == (1, 4, 4, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_resnet101_c4_stride_and_channels_traced():
    m = ResNet101C4()
    out = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 320, 3))))
    y = jax.eval_shape(
        m.apply, out, jnp.zeros((1, 224, 320, 3)))
    assert y.shape == (1, 14, 20, 1024)  # stride 16, 1024 ch


def test_resnet101_detector_graph_traces():
    """Full R101-C4 Faster R-CNN detect graph: shape inference only."""
    cfg = FasterRCNNConfig(
        backbone="resnet101",
        proposals=ProposalConfig(pre_nms_topk_test=192, post_nms_topk_test=16))
    model = make_model(cfg)
    images = jnp.zeros((1, 64, 96, 3))
    im_info = jnp.asarray([[64.0, 96.0, 1.0]])
    params = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), images, im_info))
    raw = jax.eval_shape(
        lambda p: model.apply(p, images, im_info, method="detect"), params)
    assert raw.cls_prob.shape == (1, 16, 21)
    assert raw.bbox_pred.shape == (1, 16, 84)
    # 101 layers worth of parameters present
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n_params > 40_000_000  # R101 backbone + heads
