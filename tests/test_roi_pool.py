"""RoI pooling tests: oracle parity forward + argmax-scatter backward
(SURVEY.md §5 plan item 3)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import random_boxes
from trcnn.ops.roi_align import roi_align
from trcnn.ops.roi_pool import (roi_max_pool, roi_max_pool_oracle_numpy,
                                roi_pool_backward_oracle_numpy)


def test_forward_matches_oracle(rng):
    h, w, c = 19, 25, 8
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = random_boxes(rng, 30, im_w=w * 16, im_h=h * 16, min_size=4)
    got = np.asarray(roi_max_pool(jnp.asarray(feat), jnp.asarray(rois)))
    want = roi_max_pool_oracle_numpy(feat, rois)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_forward_small_and_edge_rois(rng):
    h, w, c = 10, 10, 3
    feat = rng.randn(h, w, c).astype(np.float32) + 5.0  # strictly positive
    rois = np.array(
        [
            [17.0, 17.0, 18.0, 18.0],      # ~1 feature cell: all bins share it
            [144.0, 144.0, 159.0, 159.0],  # overhangs the feature map edge
        ],
        np.float32,
    )
    got = np.asarray(roi_max_pool(jnp.asarray(feat), jnp.asarray(rois)))
    want = roi_max_pool_oracle_numpy(feat, rois)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # clipped-away bins of the edge roi are exactly 0 (Caffe empty-bin rule)
    assert (want[1] == 0).any()
    # the tiny roi sees its one cell everywhere
    np.testing.assert_allclose(got[0], np.broadcast_to(feat[1, 1], got[0].shape),
                               rtol=1e-6)


def test_whole_image_roi(rng):
    h, w, c = 14, 21, 4
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array([[0.0, 0.0, w * 16 - 1, h * 16 - 1]], np.float32)
    got = np.asarray(roi_max_pool(jnp.asarray(feat), jnp.asarray(rois)))
    want = roi_max_pool_oracle_numpy(feat, rois)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # global max must appear in the pooled output
    assert np.isclose(got.max(), feat.max())


def test_backward_is_argmax_scatter(rng):
    h, w, c = 8, 8, 2
    feat = rng.randn(h, w, c).astype(np.float32)
    # distinct values => unique argmax => exact scatter semantics
    feat += np.arange(h * w * c).reshape(h, w, c) * 1e-3
    rois = np.array([[0.0, 0.0, 63.0, 63.0], [16.0, 16.0, 47.0, 47.0]], np.float32)

    def f(x):
        return jnp.sum(roi_max_pool(x, jnp.asarray(rois)))

    grad = np.asarray(jax.grad(f)(jnp.asarray(feat)))
    # numerical check on a few positions
    eps = 1e-3
    for (i, j, k) in [(0, 0, 0), (3, 4, 1), (7, 7, 0), (2, 6, 1)]:
        fp = feat.copy(); fp[i, j, k] += eps
        fm = feat.copy(); fm[i, j, k] -= eps
        num = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        assert abs(grad[i, j, k] - num) < 1e-2, (i, j, k, grad[i, j, k], num)
    # gradient mass equals number of non-empty bins
    assert np.isclose(grad.sum(), 2 * 7 * 7 * c, atol=1e-3)


def test_backward_matches_oracle_with_ties(rng):
    """XLA custom-VJP backward vs the literal-loop numpy oracle on a map
    with engineered exact ties (the single-winner contract's hard case —
    re-pinned round 5, trcnn/ops/roi_pool.py docstring)."""
    h, w, c = 19, 25, 6
    feat = rng.randn(h, w, c).astype(np.float32)
    feat[3:9, 4:15, :] = 2.0    # plateau -> many exact ties
    feat[11:16, 2:20, :] = 6.0
    rois = random_boxes(rng, 16, im_w=w * 16, im_h=h * 16, min_size=4)
    g = rng.randn(rois.shape[0], 7, 7, c).astype(np.float32)
    _, vjp = jax.vjp(lambda f: roi_max_pool(f, jnp.asarray(rois)),
                     jnp.asarray(feat))
    got = np.asarray(vjp(jnp.asarray(g))[0])
    want = roi_pool_backward_oracle_numpy(feat, rois, g)
    np.testing.assert_allclose(got, want, atol=1e-4)
    # single-winner mass conservation: every non-empty bin's gradient
    # lands somewhere exactly once
    assert np.isclose(got.sum(), want.sum(), atol=1e-3)


def test_roi_align_basic(rng):
    # constant feature map -> every aligned output equals the constant
    feat = np.full((12, 12, 3), 2.5, np.float32)
    rois = random_boxes(rng, 5, im_w=12 * 16, im_h=12 * 16, min_size=8)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois)))
    np.testing.assert_allclose(out, 2.5, rtol=1e-5)


def test_roi_align_linear_field():
    # bilinear sampling reproduces a linear ramp exactly (away from borders)
    h, w = 16, 16
    ramp = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)[..., None]
    rois = np.array([[32.0, 32.0, 160.0, 160.0]], np.float32)  # interior
    out = np.asarray(roi_align(jnp.asarray(ramp), jnp.asarray(rois)))[0, ..., 0]
    # x-coordinate of each sample center in feature units
    x1, x2 = 2.0, 10.0
    binw = (x2 - x1) / 7
    expect = x1 + (np.arange(7) + 0.5) * binw
    np.testing.assert_allclose(out.mean(axis=0), expect, rtol=1e-5)
