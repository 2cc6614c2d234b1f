"""Anchor generation.

Reproduces the py-faster-rcnn ``generate_anchors.py`` lineage that the
reference ports (SURVEY.md §3.2): 9 base anchors at base_size 16,
ratios (0.5, 1, 2) x scales (8, 16, 32), enumerated over the H x W feature
grid at stride 16, ordered (grid position major, anchor index minor) with the
grid raveled row-major (y outer, x inner).

Anchors use the "+1" pixel convention throughout: a box (x1, y1, x2, y2) has
width x2 - x1 + 1 (SURVEY.md §4.4).  Base anchors are computed in plain
Python/NumPy at trace time (they are compile-time constants); the grid
enumeration is jnp so it fuses into the jitted graph.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from trcnn.config import AnchorConfig


def _whctrs(anchor: np.ndarray) -> Tuple[float, float, float, float]:
    """(x1,y1,x2,y2) -> (w, h, x_ctr, y_ctr) under the +1 convention."""
    w = anchor[2] - anchor[0] + 1.0
    h = anchor[3] - anchor[1] + 1.0
    x_ctr = anchor[0] + 0.5 * (w - 1.0)
    y_ctr = anchor[1] + 0.5 * (h - 1.0)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws: np.ndarray, hs: np.ndarray, x_ctr: float, y_ctr: float) -> np.ndarray:
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        (
            x_ctr - 0.5 * (ws - 1.0),
            y_ctr - 0.5 * (hs - 1.0),
            x_ctr + 0.5 * (ws - 1.0),
            y_ctr + 0.5 * (hs - 1.0),
        )
    )


def _ratio_enum(anchor: np.ndarray, ratios: Sequence[float]) -> np.ndarray:
    """Enumerate aspect-ratio variants of an anchor, preserving rounded area."""
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    size_ratios = size / np.asarray(ratios, dtype=np.float64)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios, dtype=np.float64))
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor: np.ndarray, scales: Sequence[float]) -> np.ndarray:
    """Enumerate scale variants of an anchor."""
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    ws = w * np.asarray(scales, dtype=np.float64)
    hs = h * np.asarray(scales, dtype=np.float64)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


@lru_cache(maxsize=None)
def _base_anchors_cached(
    base_size: int, ratios: Tuple[float, ...], scales: Tuple[float, ...]
) -> np.ndarray:
    base = np.array([0, 0, base_size - 1, base_size - 1], dtype=np.float64)
    ratio_anchors = _ratio_enum(base, ratios)
    all_anchors = np.vstack(
        [_scale_enum(ratio_anchors[i], scales) for i in range(ratio_anchors.shape[0])]
    )
    return all_anchors.astype(np.float32)


def generate_base_anchors(
    base_size: int = 16,
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales: Sequence[float] = (8.0, 16.0, 32.0),
) -> np.ndarray:
    """The (A, 4) base anchor windows centered on a base_size cell.

    With defaults this returns the 9 canonical Faster R-CNN anchors; the
    first one is (-84, -40, 99, 55) (golden constants tested in
    tests/test_anchors.py).
    """
    return _base_anchors_cached(int(base_size), tuple(float(r) for r in ratios),
                                tuple(float(s) for s in scales)).copy()


def shifted_anchors(
    feat_h: int,
    feat_w: int,
    cfg: AnchorConfig = AnchorConfig(),
) -> jnp.ndarray:
    """All anchors over a feat_h x feat_w feature grid.

    Returns (feat_h * feat_w * A, 4) float32, ordered with the grid position
    major (row-major over y, x) and the anchor index minor — the exact
    enumeration order of the proposal-layer lineage, which must match the
    (H, W, A) reshape of the RPN conv outputs.

    feat_h / feat_w are Python ints (static shapes), so this is safe to call
    inside jit; the result is a compile-time constant folded into the graph.
    """
    base = jnp.asarray(generate_base_anchors(cfg.base_size, cfg.ratios, cfg.scales))
    shift_x = jnp.arange(feat_w, dtype=jnp.float32) * cfg.feat_stride
    shift_y = jnp.arange(feat_h, dtype=jnp.float32) * cfg.feat_stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)  # each (feat_h, feat_w), y outer
    shifts = jnp.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    # (K, 1, 4) + (1, A, 4) -> (K, A, 4) -> (K*A, 4)
    anchors = shifts[:, None, :] + base[None, :, :]
    return anchors.reshape(-1, 4)
