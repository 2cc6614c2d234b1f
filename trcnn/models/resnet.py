"""ResNet-101 C4 backbone + C5 RoI head (BASELINE.json config 3).

The reference repo is VGG-16-only; the backbone swap is a rebuild target
(`BASELINE.json` configs: "ResNet-101 backbone swap (C4 feature extractor,
same RPN/RoI heads)").  This follows the canonical Faster R-CNN R101-C4
recipe (He et al., and the Caffe2/Detectron lineage):

  * backbone = conv1 (7x7/2) + maxpool/2 + res2 (3 blocks) + res3 (4) +
    res4 (23) → stride 16, 1024-ch features feeding the RPN;
  * RoI head = res5 (3 blocks, first block stride 1 on the 14x14 RoI crop
    in the stride-preserving variant — here stride 2 on a 14x14 pool as in
    Detectron's C4 head) + global average pool → 2048-d vector → cls/bbox.
  * frozen: conv1 + res2, and all BatchNorm stats/scales (FrozenBN).

NHWC, bf16-friendly, flax.linen.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params.

    Detection fine-tuning at small batch sizes keeps BN frozen (Detectron
    lineage).  Scale/bias/mean/var are ordinary parameters excluded from
    training by the optimizer's gradient mask (trcnn/train/optim.py masks
    every '*/bn*' subtree), so importing pretrained stats is a plain key-map.
    """

    dtype: Any = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (ch,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (ch,), jnp.float32)
        # fold into one multiply+add (XLA fuses this into the preceding conv)
        inv = scale / jnp.sqrt(var + self.epsilon)
        return (x * inv.astype(self.dtype) +
                (bias - mean * inv).astype(self.dtype))


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual bottleneck with projection shortcut."""

    channels: int          # bottleneck width; output is 4x this
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.channels * 4
        residual = x
        if self.project:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="proj")(x)
            residual = FrozenBatchNorm(dtype=self.dtype, name="proj_bn")(residual)
        y = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(y))
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(y))
        # Zero-init residual exit: each block starts as identity, so a
        # RANDOM-init 101-layer net keeps unit-scale activations instead of
        # compounding variance over 30+ residual adds (at lr 1e-3 that
        # compounding diverged to NaN in 2 steps — round-3 ledger).  The
        # zero lives on the TRAINABLE conv3 kernel, not on bn3's scale:
        # FrozenBN scales are permanently masked by the optimizer
        # (trcnn/train/optim.py freezes every 'bn' subtree for resnet), so
        # a zero gamma there would cut the conv1/conv2 gradient path for
        # the whole run (ADVICE r3, high).  conv3's own gradient is nonzero
        # at init (its input is live), so it leaves zero after one update
        # and the residual branch trains — the trainable-gamma behavior of
        # Goyal et al. 2017 §5.1, expressed on the conv.  Pretrained
        # weights overwrite the kernel, so the converted path is untouched.
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3",
                    kernel_init=nn.initializers.zeros)(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn3")(y)
        return nn.relu(y + residual)


class ResStage(nn.Module):
    blocks: int
    channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Bottleneck(self.channels, stride=self.stride, project=True,
                       dtype=self.dtype, name="block1")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.channels, dtype=self.dtype,
                           name=f"block{i + 1}")(x)
        return x


class ResNet101C4(nn.Module):
    """conv1..res4 feature extractor: stride 16, 1024 channels.

    ``freeze_stem``: stop_gradient at the res2 boundary — conv1 + res2
    are frozen during detection training (Detectron recipe, see
    trcnn/train/optim.py RESNET_FROZEN_PREFIXES), so their backward is
    discarded work at the highest-resolution stages.
    """

    dtype: Any = jnp.float32
    freeze_stem: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = ResStage(3, 64, 1, dtype=self.dtype, name="res2")(x)
        if self.freeze_stem:
            x = jax.lax.stop_gradient(x)
        x = ResStage(4, 128, 2, dtype=self.dtype, name="res3")(x)
        x = ResStage(23, 256, 2, dtype=self.dtype, name="res4")(x)
        return x  # (B, H/16, W/16, 1024)


class ResNetC5Head(nn.Module):
    """res5 + global-average-pool RoI head → (cls_score, bbox_pred).

    Takes (R, 14, 14, 1024) RoI crops (RoI pool at 14x14), runs res5
    (stride 2 → 7x7x2048), average-pools, and applies the two output
    linears (gaussian init σ=0.01 / σ=0.001 per SURVEY.md §8).
    """

    num_classes: int = 21
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois_feat: jnp.ndarray, deterministic: bool = True):
        y = ResStage(3, 512, 2, dtype=self.dtype, name="res5")(rois_feat)
        y = jnp.mean(y, axis=(1, 2))  # (R, 2048)
        y = y.astype(jnp.float32)
        cls_score = nn.Dense(
            self.num_classes, name="cls_score",
            kernel_init=nn.initializers.normal(0.01))(y)
        bbox_pred = nn.Dense(
            self.num_classes * 4, name="bbox_pred",
            kernel_init=nn.initializers.normal(0.001))(y)
        return cls_score, bbox_pred
