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


def masked_topk_payload(
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    *payloads: jnp.ndarray,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """``masked_topk`` that carries payload rows through the selection.

    One stable multi-operand ``lax.sort`` on -score replaces
    ``lax.top_k`` + per-payload gathers: a stable ascending sort on the
    negated key is tie-identical to ``lax.top_k`` (equal keys keep input
    order — ties to the lower index), and on TPU the carried operands are
    cheaper than the row-gathers they replace (same finding as the
    payload-carrying NMS sort in trcnn.ops.nms).

    Returns (values, sorted_payloads_tuple, out_valid), each (..., k).
    """
    masked = jnp.where(valid, scores.astype(jnp.float32), _NEG_INF)
    out = jax.lax.sort((-masked,) + tuple(payloads), dimension=-1,
                       is_stable=True, num_keys=1)
    values = -out[0][..., :k]
    out_valid = values > _NEG_INF
    return values, tuple(o[..., :k] for o in out[1:]), out_valid
