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
