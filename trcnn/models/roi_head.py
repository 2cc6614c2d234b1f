"""Fast R-CNN RoI head (VGG-16 variant).

TPU-native rebuild of the reference's detection head (SURVEY.md §3.1:
part of ``R:lib/models/faster_rcnn.py`` — roi_pool 7x7 → flatten 25088 →
fc6(4096)+ReLU+dropout → fc7(4096)+ReLU+dropout → cls_score(21) &
bbox_pred(84); gaussian init σ=0.01/0.001 per SURVEY.md §8).

Flatten order: the pooled (R, 7, 7, C) NHWC crop is flattened natively as
(h, w, c).  Chainer/Caffe flatten NCHW (c, h, w); the weight importer
permutes fc6's kernel accordingly (SURVEY.md §4.3 calls out this trap) —
keeping the TPU-friendly layout in the graph and paying the permutation
once at import time.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class _GroupedDense(nn.Module):
    """nn.Dense whose kernel rows are re-ordered in-graph to match a
    (channel_block, spatial, c_within) input lane order (the Pallas RoI
    pool's ``flat_out`` layout).  The PARAM stays in the canonical NHWC
    flatten order — converters/checkpoints are unaffected; with
    ``groups=(1, C)`` the permutation is the identity and XLA elides it.
    """

    features: int
    dtype: Any = jnp.float32
    quant: str = "none"   # "int8": dynamic-PTQ matmul (trcnn/ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 groups: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        d = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (d, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k = kernel
        if groups is not None and groups[0] > 1:
            ncb, cb = groups
            s = d // (ncb * cb)
            # canonical row order (spatial, cbi, cw) -> input order
            # (cbi, spatial, cw)
            k = k.reshape(s, ncb, cb, self.features)
            k = jnp.moveaxis(k, 1, 0).reshape(d, self.features)
        if self.quant == "int8":
            from trcnn.ops.quant import qdense
            # row permutation above commutes with per-OUT-channel scales
            return qdense(x, k, bias).astype(self.dtype)
        k = k.astype(self.dtype)
        return x.astype(self.dtype) @ k + bias.astype(self.dtype)


class VGG16RoIHead(nn.Module):
    """fc6/fc7 MLP head → (cls_score, bbox_pred).

    fc6 is the single largest weight in the model (25088x4096 ≈ 103M params
    — SURVEY.md §3.5 marks it as the tensor-parallel shard candidate); the
    matmul is R x 25088 @ 25088 x 4096, ideal MXU shape when R is the padded
    RoI capacity (128/300).
    """

    num_classes: int = 21
    hidden: int = 4096
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    quant: str = "none"   # "int8": fc6/fc7 run as dynamic-PTQ int8 matmuls

    @nn.compact
    def __call__(
        self, pooled: jnp.ndarray, deterministic: bool = True,
        flat_groups: Optional[Tuple[int, int]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        r = pooled.shape[0]
        y = pooled.reshape(r, -1).astype(self.dtype)   # (R, 7*7*512) NHWC order
        y = nn.relu(_GroupedDense(self.hidden, dtype=self.dtype,
                                  quant=self.quant,
                                  name="fc6")(y, flat_groups))
        y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        # fc7 via _GroupedDense(groups=None) == plain dense with the same
        # {kernel, bias} tree as nn.Dense — checkpoint-compatible
        y = nn.relu(_GroupedDense(self.hidden, dtype=self.dtype,
                                  quant=self.quant, name="fc7")(y)
                    if self.quant != "none" else
                    nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc7")(y))
        y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        y = y.astype(jnp.float32)
        cls_score = nn.Dense(self.num_classes, name="cls_score",
                             kernel_init=nn.initializers.normal(0.01))(y)
        bbox_pred = nn.Dense(self.num_classes * 4, name="bbox_pred",
                             kernel_init=nn.initializers.normal(0.001))(y)
        return cls_score, bbox_pred
