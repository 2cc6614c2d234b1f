"""NMS kernel-parity tests (SURVEY.md §5 plan item 2).

The fixed-shape tiled XLA NMS must produce the *bit-identical keep set* of
the O(n^2) host-loop greedy NMS (the reference's cpu/gpu_nms semantics),
including under padding, permutation-of-padding, and tie-breaking.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_boxes
from trcnn.ops.nms import multiclass_nms, nms_oracle_numpy, nms_padded

pytestmark = pytest.mark.fast


def run_nms(boxes, scores, valid, thresh, max_out, tile=64):
    idx, ok = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thresh, max_out,
        tile=tile,
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    return idx[ok].tolist()


@pytest.mark.parametrize("n", [1, 7, 64, 65, 200, 513])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_oracle_parity_random(rng, n, thresh):
    boxes = random_boxes(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = np.ones(n, bool)
    got = run_nms(boxes, scores, valid, thresh, max_out=min(n, 300))
    want = nms_oracle_numpy(boxes, scores, thresh)[: min(n, 300)]
    assert got == want


def test_clustered_boxes(rng):
    # heavy-overlap regime: many boxes around few centers
    centers = random_boxes(rng, 8)
    boxes = np.repeat(centers, 25, axis=0)
    boxes += rng.uniform(-6, 6, size=boxes.shape).astype(np.float32)
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1)
    scores = rng.uniform(size=len(boxes)).astype(np.float32)
    valid = np.ones(len(boxes), bool)
    got = run_nms(boxes, scores, valid, 0.5, max_out=200)
    want = nms_oracle_numpy(boxes, scores, 0.5)[:200]
    assert got == want


def test_tie_breaking_lower_index_first():
    # identical scores: greedy must visit lower index first
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]], dtype=np.float32
    )
    scores = np.array([0.5, 0.5, 0.5], dtype=np.float32)
    got = run_nms(boxes, scores, np.ones(3, bool), 0.5, max_out=3)
    assert got == [0, 2]


def test_padding_invariance(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.uniform(size=50).astype(np.float32)
    base = run_nms(boxes, scores, np.ones(50, bool), 0.5, max_out=50)

    pad_boxes = np.concatenate([boxes, random_boxes(rng, 30)])
    pad_scores = np.concatenate([scores, rng.uniform(1.5, 2.0, 30).astype(np.float32)])
    pad_valid = np.concatenate([np.ones(50, bool), np.zeros(30, bool)])
    padded = run_nms(pad_boxes, pad_scores, pad_valid, 0.5, max_out=50)
    assert base == padded


def test_max_out_truncates(rng):
    boxes = random_boxes(rng, 100)
    scores = rng.uniform(size=100).astype(np.float32)
    full = run_nms(boxes, scores, np.ones(100, bool), 0.7, max_out=100)
    trunc = run_nms(boxes, scores, np.ones(100, bool), 0.7, max_out=5)
    assert trunc == full[:5]


def test_all_invalid():
    boxes = np.zeros((16, 4), np.float32)
    scores = np.zeros(16, np.float32)
    idx, ok = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.zeros(16, bool), 0.5, 8)
    assert not np.asarray(ok).any()


def test_tile_size_invariance(rng):
    boxes = random_boxes(rng, 300)
    scores = rng.uniform(size=300).astype(np.float32)
    valid = np.ones(300, bool)
    a = run_nms(boxes, scores, valid, 0.6, 300, tile=32)
    b = run_nms(boxes, scores, valid, 0.6, 300, tile=128)
    c = run_nms(boxes, scores, valid, 0.6, 300, tile=256)
    assert a == b == c


def test_multiclass_nms_basic(rng):
    r, c = 40, 4  # 3 fg classes
    boxes = random_boxes(rng, r)
    boxes_pc = np.broadcast_to(boxes[:, None, :], (r, c, 4)).copy()
    scores = rng.uniform(size=(r, c)).astype(np.float32)
    valid = np.ones(r, bool)
    db, ds, dc, dv = multiclass_nms(
        jnp.asarray(boxes_pc), jnp.asarray(scores), jnp.asarray(valid),
        0.5, 0.05, max_per_class=10, max_total=15,
    )
    db, ds, dc, dv = map(np.asarray, (db, ds, dc, dv))
    nvalid = dv.sum()
    assert nvalid > 0
    # outputs score-sorted, classes are foreground only
    assert (np.diff(ds[dv]) <= 1e-6).all()
    assert set(dc[dv]).issubset({1, 2, 3})
    # per-class results match standalone nms on that class
    for cls in (1, 2, 3):
        want = nms_oracle_numpy(boxes, scores[:, cls], 0.5)
        want = [i for i in want if scores[i, cls] > 0.05][:10]
        got_scores = sorted(ds[dv][dc[dv] == cls].tolist(), reverse=True)
        want_scores = sorted((scores[i, cls] for i in want), reverse=True)
        # got is the top-15 overall subset; every got score must be in want
        for g in got_scores:
            assert any(abs(g - w) < 1e-6 for w in want_scores)


def test_presorted_fast_path_matches_unsorted(rng):
    """presorted=True (the proposal-layer fast path fed by masked_topk)
    must select the same boxes as the internal-sort path, for both the XLA
    spec and the Pallas kernel (interpret mode)."""
    from trcnn.ops.nms_pallas import nms_padded_pallas
    from trcnn.ops.topk import masked_topk

    n = 300
    boxes = random_boxes(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = rng.rand(n) > 0.1

    ref = run_nms(boxes, scores, valid, 0.5, 40)
    ref_boxes = boxes[ref]

    svals, sidx, svalid = masked_topk(
        jnp.asarray(scores), jnp.asarray(valid), n)
    sboxes = jnp.take(jnp.asarray(boxes), sidx, axis=0)

    for fn, kw in ((nms_padded, dict(tile=64)),
                   (nms_padded_pallas, dict(tile=64, interpret=True))):
        ki, kv = fn(sboxes, svals, svalid, 0.5, 40, presorted=True, **kw)
        got = np.asarray(jnp.take(sboxes, ki, axis=0))[np.asarray(kv)]
        np.testing.assert_array_equal(got, ref_boxes)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_multiclass_fast_path_exact(seed):
    """max_per_class >= max_total (both VOC and COCO test configs) takes the
    single-call grouped-NMS fast path; its output must be EXACTLY the
    per-class-oracle + score-merge reference."""
    rng = np.random.RandomState(seed)
    r, c = 60, 5  # 4 fg classes
    boxes = random_boxes(rng, r)
    # clustered per-class boxes so suppression actually happens
    boxes_pc = np.broadcast_to(boxes[:, None, :], (r, c, 4)).copy()
    boxes_pc += rng.uniform(-4, 4, boxes_pc.shape).astype(np.float32)
    boxes_pc[..., 2:] = np.maximum(boxes_pc[..., 2:], boxes_pc[..., :2] + 1)
    scores = rng.uniform(size=(r, c)).astype(np.float32)
    valid = rng.rand(r) > 0.15
    thresh, sthresh, mtot = 0.5, 0.3, 12

    db, ds, dc, dv = multiclass_nms(
        jnp.asarray(boxes_pc), jnp.asarray(scores), jnp.asarray(valid),
        thresh, sthresh, max_per_class=mtot, max_total=mtot)
    db, ds, dc, dv = map(np.asarray, (db, ds, dc, dv))

    # numpy reference: per-class greedy NMS among valid & above-threshold,
    # then global merge by score (ties -> lower (class, roi) flat index,
    # matching lax.top_k's stable order over the class-major flat array)
    cand = []
    for cls in range(1, c):
        ok = valid & (scores[:, cls] > sthresh)
        idx = np.nonzero(ok)[0]
        keep = nms_oracle_numpy(boxes_pc[idx, cls], scores[idx, cls], thresh)
        for i in (idx[k] for k in keep):
            cand.append((scores[i, cls], -(cls - 1) * r - i, cls, i))
    cand.sort(key=lambda t: (-t[0], -t[1]))
    cand = cand[:mtot]

    assert dv.sum() == len(cand)
    for slot, (sc, _, cls, i) in enumerate(cand):
        assert dv[slot]
        assert ds[slot] == np.float32(sc)
        assert dc[slot] == cls
        np.testing.assert_array_equal(db[slot], boxes_pc[i, cls])
