"""Property-based invariance tests (SURVEY.md §5 rebuild plan item 2).

hypothesis drives randomized box sets through the NMS and box-transform
ops, checking the invariances the kernels must hold:
  * padding invariance — appending invalid boxes never changes the result;
  * permutation invariance — NMS keep-set is a function of (box, score)
    pairs, not of input order (up to the stable score-tie rule);
  * encode/decode round trip.
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from trcnn.ops.boxes import bbox_transform, bbox_transform_inv
from trcnn.ops.nms import nms_oracle_numpy, nms_padded


def _boxes_scores(seed: int, n: int):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 500, n).astype(np.float32)
    y1 = rng.uniform(0, 400, n).astype(np.float32)
    w = rng.uniform(1, 200, n).astype(np.float32)
    h = rng.uniform(1, 200, n).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 120),
       thresh=st.sampled_from([0.3, 0.5, 0.7]))
def test_nms_matches_oracle(seed, n, thresh):
    boxes, scores = _boxes_scores(seed, n)
    ki, kv = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.ones(n, bool), thresh, max_out=n)
    got = list(np.asarray(ki)[np.asarray(kv)])
    assert got == nms_oracle_numpy(boxes, scores, thresh)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 100),
       pad=st.integers(1, 64))
def test_nms_padding_invariance(seed, n, pad):
    boxes, scores = _boxes_scores(seed, n)
    ki1, kv1 = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.ones(n, bool), 0.5, max_out=32)
    pb = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
    ps = np.concatenate([scores, np.full(pad, 9.9, np.float32)])  # high but invalid
    pv = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    ki2, kv2 = nms_padded(jnp.asarray(pb), jnp.asarray(ps),
                          jnp.asarray(pv), 0.5, max_out=32)
    np.testing.assert_array_equal(np.asarray(kv1), np.asarray(kv2))
    np.testing.assert_array_equal(np.asarray(ki1)[np.asarray(kv1)],
                                  np.asarray(ki2)[np.asarray(kv2)])


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 100))
def test_nms_permutation_invariance(seed, n):
    boxes, scores = _boxes_scores(seed, n)
    # unique scores so the stable-tie rule cannot differ across orders
    scores = np.sort(np.unique(scores))[::-1].copy()
    n = len(scores)
    boxes = boxes[:n]
    perm = np.random.RandomState(seed + 1).permutation(n)
    ki1, kv1 = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.ones(n, bool), 0.5, max_out=16)
    ki2, kv2 = nms_padded(jnp.asarray(boxes[perm]), jnp.asarray(scores[perm]),
                          jnp.ones(n, bool), 0.5, max_out=16)
    kept1 = np.asarray(ki1)[np.asarray(kv1)]
    kept2 = perm[np.asarray(ki2)[np.asarray(kv2)]]
    np.testing.assert_array_equal(kept1, kept2)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_encode_decode_roundtrip(seed):
    rng = np.random.RandomState(seed)
    n = 40
    a, _ = _boxes_scores(seed, n)
    g, _ = _boxes_scores(seed + 1, n)
    deltas = bbox_transform(jnp.asarray(a), jnp.asarray(g))
    back = bbox_transform_inv(jnp.asarray(a), deltas, delta_clip=None)
    np.testing.assert_allclose(np.asarray(back), g, rtol=1e-3, atol=1e-2)
