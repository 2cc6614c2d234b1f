"""Golden-value tests for anchor generation (SURVEY.md §5 plan item 1).

The 9 canonical base anchors are reference-independent [ALGO] constants of
the py-faster-rcnn lineage.
"""

import numpy as np

from trcnn.config import AnchorConfig
from trcnn.ops.anchors import generate_base_anchors, shifted_anchors
import pytest

pytestmark = pytest.mark.fast

GOLDEN_BASE_ANCHORS = np.array(
    [
        [-84.0, -40.0, 99.0, 55.0],
        [-176.0, -88.0, 191.0, 103.0],
        [-360.0, -184.0, 375.0, 199.0],
        [-56.0, -56.0, 71.0, 71.0],
        [-120.0, -120.0, 135.0, 135.0],
        [-248.0, -248.0, 263.0, 263.0],
        [-36.0, -80.0, 51.0, 95.0],
        [-80.0, -168.0, 95.0, 183.0],
        [-168.0, -344.0, 183.0, 359.0],
    ],
    dtype=np.float32,
)


def test_base_anchors_golden():
    anchors = generate_base_anchors()
    assert anchors.shape == (9, 4)
    np.testing.assert_array_equal(anchors, GOLDEN_BASE_ANCHORS)


def test_base_anchors_areas_preserved():
    # within a ratio group, scale s multiplies side lengths by s
    a = generate_base_anchors(scales=(8.0,))
    b = generate_base_anchors(scales=(16.0,))
    wa = a[:, 2] - a[:, 0] + 1
    wb = b[:, 2] - b[:, 0] + 1
    np.testing.assert_allclose(wb, 2 * wa)


def test_shifted_anchor_count_and_order():
    fh, fw = 3, 5
    cfg = AnchorConfig()
    anchors = np.asarray(shifted_anchors(fh, fw, cfg))
    assert anchors.shape == (fh * fw * 9, 4)
    # first 9 anchors == base anchors (shift 0,0)
    np.testing.assert_allclose(anchors[:9], GOLDEN_BASE_ANCHORS, rtol=1e-6)
    # anchor block at grid position (y=0, x=1) is base + (16, 0)
    np.testing.assert_allclose(
        anchors[9:18], GOLDEN_BASE_ANCHORS + np.array([16, 0, 16, 0]), rtol=1e-6
    )
    # grid is raveled y-outer: position index fw (y=1, x=0) is base + (0, 16)
    np.testing.assert_allclose(
        anchors[9 * fw : 9 * fw + 9],
        GOLDEN_BASE_ANCHORS + np.array([0, 16, 0, 16]),
        rtol=1e-6,
    )
