"""Region Proposal Network head.

TPU-native rebuild of the reference's RPN chain (SURVEY.md §3.1:
``R:lib/models/rpn.py`` — 3x3 conv 512ch + ReLU, then sibling 1x1 convs for
2A objectness scores and 4A box deltas, A=9; gaussian σ=0.01 init).

Channel layout contract (needed for Caffe/Chainer weight import and for the
anchor-order contract of the proposal layer, SURVEY.md §4.3):

  * score conv emits 2A channels laid out (bg/fg major, anchor minor):
    channel ``0..A-1`` = background logits per anchor, ``A..2A-1`` =
    foreground — matching Caffe's ``rpn_cls_score`` reshape to (2, A).
  * bbox conv emits 4A channels laid out (anchor major, coord minor):
    anchor a's deltas at channels ``4a..4a+3``.

Outputs are returned as (fH, fW, A) / (fH, fW, A, 4) arrays whose row-major
ravel matches ``trcnn.ops.anchors.shifted_anchors`` ordering exactly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class RPNOut(NamedTuple):
    fg_probs: jnp.ndarray   # (B, fH, fW, A) softmax foreground probability
    logits: jnp.ndarray     # (B, fH, fW, 2, A) raw (bg, fg) logits
    deltas: jnp.ndarray     # (B, fH, fW, A, 4) box regression deltas


class RPNHead(nn.Module):
    """Sliding-window RPN over stride-16 features."""

    num_anchors: int = 9
    mid_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> RPNOut:
        a = self.num_anchors
        init = nn.initializers.normal(0.01)
        h = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                    kernel_init=init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="rpn_conv")(feat)
        h = nn.relu(h)
        scores = nn.Conv(2 * a, (1, 1), kernel_init=init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="rpn_cls_score")(h)
        deltas = nn.Conv(4 * a, (1, 1), kernel_init=init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="rpn_bbox_pred")(h)

        b, fh, fw, _ = scores.shape
        logits = scores.astype(jnp.float32).reshape(b, fh, fw, 2, a)
        fg_probs = jax.nn.softmax(logits, axis=3)[..., 1, :]
        deltas = deltas.astype(jnp.float32).reshape(b, fh, fw, a, 4)
        return RPNOut(fg_probs=fg_probs, logits=logits, deltas=deltas)
