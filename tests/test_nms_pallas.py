"""Pallas NMS kernel parity (interpret mode on CPU — SURVEY.md §6.2).

The kernel must produce the *exact* greedy keep-set of the numpy oracle
(and hence of the portable XLA nms_padded, which has its own oracle
tests) — not an approximation (SURVEY.md §10 hard-parts list).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import random_boxes
from trcnn.ops.nms import nms_oracle_numpy, nms_padded
from trcnn.ops.nms_pallas import nms_padded_pallas


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_pallas_matches_oracle(seed, thresh):
    rng = np.random.RandomState(seed)
    n = 300
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.15
    vidx = np.where(valid)[0]
    oracle = [int(vidx[i]) for i in
              nms_oracle_numpy(boxes[valid], scores[valid], thresh)]

    ki, kv = nms_padded_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(valid), thresh, 48,
                               interpret=True)
    got = list(np.asarray(ki)[np.asarray(kv)])
    assert got == oracle[:48]


def test_pallas_matches_xla_reference():
    rng = np.random.RandomState(7)
    n = 640
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = np.ones(n, bool)
    a_i, a_v = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(valid), 0.7, 100)
    b_i, b_v = nms_padded_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.asarray(valid), 0.7, 100,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(a_v), np.asarray(b_v))
    np.testing.assert_array_equal(np.asarray(a_i)[np.asarray(a_v)],
                                  np.asarray(b_i)[np.asarray(b_v)])


def test_pallas_degenerate_all_invalid():
    boxes = jnp.zeros((128, 4))
    scores = jnp.zeros((128,))
    valid = jnp.zeros((128,), bool)
    ki, kv = nms_padded_pallas(boxes, scores, valid, 0.7, 16, interpret=True)
    assert not np.asarray(kv).any()


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_grouped_matches_per_class_oracle(seed):
    """groups masks cross-group suppression: the grouped kernel's keep-set
    over the flattened (class, roi) set == independent per-class oracle NMS
    merged in score order (the multiclass fast-path contract)."""
    rng = np.random.RandomState(seed)
    n_cls, r = 5, 64
    boxes = np.stack([random_boxes(rng, r) for _ in range(n_cls)])  # (C,R,4)
    scores = rng.rand(n_cls, r).astype(np.float32)
    valid = rng.rand(n_cls, r) > 0.2
    thresh, max_out = 0.4, 32

    # oracle: per-class greedy NMS, merged by score
    cand = []
    for c in range(n_cls):
        vidx = np.where(valid[c])[0]
        for k in nms_oracle_numpy(boxes[c][vidx], scores[c][vidx], thresh):
            i = int(vidx[k])
            cand.append((scores[c, i], c * r + i))
    cand.sort(key=lambda t: (-t[0], t[1]))
    oracle = [i for _, i in cand[:max_out]]

    flat_groups = np.repeat(np.arange(n_cls, dtype=np.int32), r)
    ki, kv = nms_padded_pallas(
        jnp.asarray(boxes.reshape(-1, 4)), jnp.asarray(scores.reshape(-1)),
        jnp.asarray(valid.reshape(-1)), thresh, max_out,
        groups=jnp.asarray(flat_groups), interpret=True)
    got = list(np.asarray(ki)[np.asarray(kv)])
    assert got == oracle


def test_pallas_grouped_matches_xla_grouped():
    rng = np.random.RandomState(11)
    n = 512
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = np.ones(n, bool)
    groups = rng.randint(0, 7, size=n).astype(np.int32)
    a_i, a_v = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(valid), 0.5, 64,
                          groups=jnp.asarray(groups))
    b_i, b_v = nms_padded_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.asarray(valid), 0.5, 64,
                                 groups=jnp.asarray(groups), interpret=True)
    np.testing.assert_array_equal(np.asarray(a_v), np.asarray(b_v))
    np.testing.assert_array_equal(np.asarray(a_i)[np.asarray(a_v)],
                                  np.asarray(b_i)[np.asarray(b_v)])


def test_pallas_grouped_presorted():
    """presorted + groups: the proposal-style fast path with group ids."""
    rng = np.random.RandomState(13)
    n = 256
    boxes = random_boxes(rng, n)
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()
    valid = np.ones(n, bool)
    groups = rng.randint(0, 3, size=n).astype(np.int32)
    a_i, a_v = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(valid), 0.5, 48,
                          groups=jnp.asarray(groups), presorted=True)
    b_i, b_v = nms_padded_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.asarray(valid), 0.5, 48,
                                 groups=jnp.asarray(groups), presorted=True,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(a_v), np.asarray(b_v))
    np.testing.assert_array_equal(np.asarray(a_i)[np.asarray(a_v)],
                                  np.asarray(b_i)[np.asarray(b_v)])


def test_multiclass_nms_pallas_impl_matches_xla():
    """multiclass_nms(nms_impl=...) fast path: identical detections."""
    from trcnn.ops.nms import multiclass_nms

    rng = np.random.RandomState(17)
    r, c = 96, 6
    boxes = np.stack([random_boxes(rng, r) for _ in range(c)], axis=1)
    scores = rng.rand(r, c).astype(np.float32)
    scores /= scores.sum(axis=1, keepdims=True)
    valid = rng.rand(r) > 0.1
    kw = dict(iou_thresh=0.3, score_thresh=0.05, max_per_class=32,
              max_total=32)
    import unittest.mock as mock

    from trcnn.ops import nms_pallas as npal

    orig = npal.nms_padded_pallas

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    a = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(valid), nms_impl="xla", **kw)
    with mock.patch.object(npal, "nms_padded_pallas", side_effect=interp):
        b = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                           jnp.asarray(valid), nms_impl="pallas", **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
