"""Box transform / IoU tests: +1 convention goldens, encode/decode roundtrip."""

import numpy as np
import jax.numpy as jnp

from tests.conftest import random_boxes
from trcnn.ops.boxes import (
    bbox_transform,
    bbox_transform_inv,
    box_area,
    box_iou,
    clip_boxes,
)
import pytest

pytestmark = pytest.mark.fast


def iou_oracle(boxes, query):
    """Numpy oracle with the +1 convention (the Cython bbox_overlaps math)."""
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            bw = boxes[i, 2] - boxes[i, 0] + 1
            bh = boxes[i, 3] - boxes[i, 1] + 1
            qw = query[j, 2] - query[j, 0] + 1
            qh = query[j, 3] - query[j, 1] + 1
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                inter = iw * ih
                out[i, j] = inter / (bw * bh + qw * qh - inter)
    return out


def test_box_area_plus_one():
    b = jnp.array([[0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 9.0, 4.0]])
    np.testing.assert_allclose(box_area(b), [1.0, 50.0])


def test_iou_matches_oracle(rng):
    boxes = random_boxes(rng, 23)
    query = random_boxes(rng, 17)
    got = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(query)))
    want = iou_oracle(boxes.astype(np.float64), query.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_identity():
    b = jnp.array([[10.0, 10.0, 20.0, 20.0]])
    np.testing.assert_allclose(box_iou(b, b), [[1.0]], rtol=1e-6)


def test_encode_decode_roundtrip(rng):
    ex = random_boxes(rng, 40)
    gt = random_boxes(rng, 40)
    deltas = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    back = bbox_transform_inv(jnp.asarray(ex), deltas)
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-2)


def test_decode_zero_deltas_is_identity(rng):
    ex = random_boxes(rng, 10)
    out = bbox_transform_inv(jnp.asarray(ex), jnp.zeros((10, 4)))
    np.testing.assert_allclose(np.asarray(out), ex, rtol=1e-5, atol=1e-4)


def test_decode_golden():
    # one hand-computed case: box (0,0,9,9) => w=h=10, ctr=(4.5,4.5)
    # deltas (0.1, -0.2, ln2, 0): ctr=(5.5, 2.5), w=20, h=10
    box = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    deltas = jnp.array([[0.1, -0.2, np.log(2.0), 0.0]])
    out = np.asarray(bbox_transform_inv(box, deltas))[0]
    np.testing.assert_allclose(out, [5.5 - 9.5, 2.5 - 4.5, 5.5 + 9.5, 2.5 + 4.5],
                               rtol=1e-5, atol=1e-5)


def test_decode_multiclass_groups(rng):
    ex = random_boxes(rng, 6)
    deltas = rng.uniform(-0.2, 0.2, size=(6, 4 * 3)).astype(np.float32)
    out = bbox_transform_inv(jnp.asarray(ex), jnp.asarray(deltas))
    assert out.shape == (6, 12)
    # group k must equal decoding with just that group's deltas
    for k in range(3):
        solo = bbox_transform_inv(jnp.asarray(ex), jnp.asarray(deltas[:, 4 * k : 4 * k + 4]))
        np.testing.assert_allclose(np.asarray(out[:, 4 * k : 4 * k + 4]), np.asarray(solo))


def test_clip_boxes():
    b = jnp.array([[-10.0, -5.0, 700.0, 500.0], [5.0, 5.0, 10.0, 10.0]])
    out = np.asarray(clip_boxes(b, 480, 640))
    np.testing.assert_allclose(out[0], [0.0, 0.0, 639.0, 479.0])
    np.testing.assert_allclose(out[1], [5.0, 5.0, 10.0, 10.0])


def test_overlap_gt_matches_divided_predicate(rng):
    """box_overlap_gt (division-free NMS predicate) agrees with
    box_iou > t away from the ~1-ulp threshold boundary."""
    from trcnn.ops.boxes import box_overlap_gt

    boxes = random_boxes(rng, 200)
    query = random_boxes(rng, 150)
    for t in (0.3, 0.5, 0.7):
        iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(query)))
        pred = np.asarray(box_overlap_gt(jnp.asarray(boxes),
                                         jnp.asarray(query), t))
        clear = np.abs(iou - t) > 1e-5  # away from the rounding boundary
        np.testing.assert_array_equal(pred[clear], (iou > t)[clear])


def test_overlap_gt_degenerate_no_overlap():
    """Disjoint and zero-area-intersection pairs are never 'over'."""
    from trcnn.ops.boxes import box_overlap_gt

    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[100.0, 100.0, 110.0, 110.0],  # disjoint
                     [11.0, 0.0, 20.0, 10.0]])      # touching (+1 conv: iw=0)
    pred = np.asarray(box_overlap_gt(a, b, 0.0))
    assert not pred.any()
