"""Native C++ ops vs numpy/JAX oracles (the reference's kernel-parity
cross-check strategy, SURVEY.md §5)."""

import numpy as np
import pytest

from tests.conftest import random_boxes
from trcnn.ops import native

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_native_nms_matches_oracle():
    from trcnn.ops.nms import nms_oracle_numpy

    rng = np.random.RandomState(0)
    for seed in range(3):
        r = np.random.RandomState(seed)
        boxes = random_boxes(r, 400)
        scores = r.rand(400).astype(np.float32)
        assert native.nms_cpu(boxes, scores, 0.5) == \
            nms_oracle_numpy(boxes, scores, 0.5)


def test_native_overlaps_match_jax():
    import jax.numpy as jnp

    from trcnn.ops.boxes import box_iou

    rng = np.random.RandomState(1)
    a = random_boxes(rng, 50)
    b = random_boxes(rng, 30)
    got = native.bbox_overlaps_cpu(a, b)
    exp = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_native_roi_pool_matches_oracle():
    from trcnn.ops.roi_pool import roi_max_pool_oracle_numpy

    rng = np.random.RandomState(2)
    feat = rng.randn(38, 63, 16).astype(np.float32)
    rois = random_boxes(rng, 40, im_w=1000, im_h=600)
    got = native.roi_max_pool_cpu(feat, rois)
    exp = roi_max_pool_oracle_numpy(feat, rois)
    np.testing.assert_allclose(got, exp, atol=1e-5)
