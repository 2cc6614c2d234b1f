"""Detection losses (SURVEY.md §8 "Losses").

RPN: softmax CE over sampled anchors (ignore label −1) + smooth-L1 σ=3 on
positive anchors, both normalized by the sampled-anchor count (256).
Head: 21-way softmax CE over the 128 sampled RoIs + smooth-L1 σ=1 on the
matched class's 4 deltas of foreground rows, normalized by the RoI count.
Total = unweighted sum.  Smooth-L1: 0.5σ²x² if |x| < 1/σ² else |x| − 0.5/σ².
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Elementwise smooth-L1 with the py-faster-rcnn σ parameterization."""
    sigma2 = sigma * sigma
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0 / sigma2,
                     0.5 * sigma2 * x * x,
                     ax - 0.5 / sigma2)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row softmax cross-entropy; labels int32 (no ignore handling)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return logz - true_logit


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray,
                denom: jnp.ndarray | None = None) -> jnp.ndarray:
    """sum(values * mask) / denom, with denom defaulting to count(mask)."""
    num = jnp.sum(jnp.where(mask, values, 0.0))
    if denom is None:
        denom = jnp.sum(mask.astype(values.dtype))
    return num / jnp.maximum(denom, 1.0)
