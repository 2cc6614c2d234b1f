"""Masked fixed-K top-k selection.

The reference's proposal layer does a dynamic ``argsort`` + slice on host
numpy (SURVEY.md §4.4); on TPU that becomes a static ``lax.top_k`` over a
padded score vector with invalid entries pushed to -inf.  ``lax.top_k``
breaks ties toward the lower index, matching a stable descending sort —
SURVEY.md §10 flags tie ordering as a silent mAP mover, so we pin it here
and test it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

_NEG_INF = np.float32(-np.inf)


def masked_topk(
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k over the last axis, ignoring entries where ``valid`` is False.

    Returns (values, indices, out_valid):
      - values  (..., k) scores of selected entries (-inf where padded)
      - indices (..., k) int32 positions into the input axis
      - out_valid (..., k) bool, False for padding slots (fewer than k valid)
    """
    masked = jnp.where(valid, scores, _NEG_INF)
    values, indices = jax.lax.top_k(masked, k)
    out_valid = values > _NEG_INF
    return values, indices.astype(jnp.int32), out_valid
