"""VGG-16 convolutional trunk.

TPU-native rebuild of the reference's VGG16 chain (SURVEY.md §3.1:
``R:lib/models/vgg16.py`` — 13 conv layers, 4 max-pools, feature stride 16,
512-channel conv5_3 output; conv1_1–conv2_2 frozen during training).

Differences from the Chainer original, by design:
  * NHWC layout (TPU conv-friendly) instead of NCHW.
  * Optional bfloat16 compute (params stay fp32; matmuls/convs run on the
    MXU in bf16 with fp32 accumulation).
  * Freezing is not baked into the graph — the train step applies a
    gradient mask over the frozen parameter subtree (see
    trcnn/train/optim.py), which is the functional-JAX idiom.

Parameter names mirror the Caffe/Chainer link names (conv1_1 … conv5_3) so
the weight importer (trcnn/convert) is a pure key-mapping.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/stride-2 max pool.  reduce-window measured 2.23 ms for the b8
    pool1 (~2x the bandwidth bound), but the tempting reshape+strided-max
    form is WORSE on TPU — XLA materializes the (B,H/2,2,W/2,2,C) reshape
    as a full relayout copy (measured 3.89 ms at pool1's shape), so the
    window op stays."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))

# (block, convs-in-block, channels); pool follows each block except the last
# block's pool which Faster R-CNN omits (stride stays 16).
VGG_CFG: Tuple[Tuple[str, int, int], ...] = (
    ("conv1", 2, 64),
    ("conv2", 2, 128),
    ("conv3", 3, 256),
    ("conv4", 3, 512),
    ("conv5", 3, 512),
)

# Parameter subtrees frozen during detection training (SURVEY.md §8).
FROZEN_PREFIXES: Tuple[str, ...] = ("conv1_1", "conv1_2", "conv2_1", "conv2_2")


class VGG16(nn.Module):
    """13-conv VGG-16 trunk; returns stride-16 conv5_3 features.

    Input (B, H, W, 3) float; H and W must be multiples of 16 (the padded
    canvas guarantees this).  Output (B, H/16, W/16, 512).

    ``freeze_stem`` (default True, the reference recipe): a stop_gradient
    at the conv2_2 boundary.  conv1_1–conv2_2 are frozen during detection
    training (SURVEY.md §8), yet autodiff would still build their full
    backward — the frozen stem runs at FULL input resolution and is the
    least MXU-efficient part of the net (64-channel layers), so its dx/dW
    chain is ~25 ms of discarded work per batch-8 step.  The optimizer's
    gradient mask (trcnn/train/optim.py) makes those grads zero anyway;
    this just stops computing them.  Set False only together with a
    custom optimizer that actually trains the stem.
    """

    dtype: Any = jnp.float32  # compute dtype; use jnp.bfloat16 on TPU
    # "int8": dynamic PTQ on every conv from conv2_1 up (trcnn/ops/quant.py)
    # — inference-only, 2x MXU peak on v5e.  The fused stem stays bf16: its
    # roofline is the 3-input-channel systolic lane cap, which int8 does not
    # lift.  "none" = the fp32/bf16 parity path (default).
    quant: str = "none"
    freeze_stem: bool = True
    # "auto": the fused Pallas conv1_1+conv1_2+pool1 kernel on TPU (the
    # 64-channel stem runs ~3x off roofline under XLA's conv emitters —
    # 39.7 -> 23.4 ms/b32 measured, see trcnn/ops/stem_pallas.py); the
    # nn.Conv path elsewhere.  The kernel is forward-only, which the stem
    # is anyway under the reference's conv1/conv2 freeze; set False when
    # training with freeze_stem=False.
    fused_stem: Any = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # the fused kernel's VJP is the frozen-stem zero (see stem_pallas);
        # training the stem requires the XLA path
        use_fused = (self.freeze_stem
                     and (self.fused_stem is True or
                          (self.fused_stem == "auto"
                           and jax.default_backend() == "tpu")))
        start = 0
        if use_fused:
            from trcnn.ops.stem_pallas import fused_stem_block1

            w1, b1 = _ConvParams(3, 64, name="conv1_1")()
            w2, b2 = _ConvParams(64, 64, name="conv1_2")()
            x = fused_stem_block1(x, w1, b1, w2, b2)
            start = 1
        for bi, (name, n_convs, ch) in enumerate(VGG_CFG):
            if bi < start:
                continue
            for ci in range(n_convs):
                # int8 starts at conv2_1: block 0 stays full-precision even
                # when the fused stem is inactive (non-TPU backend or
                # fused_stem=False), so quant coverage is backend-independent
                # and the raw-pixel first layers are never quantized
                # (ADVICE r3: the docstring contract said so; now the code
                # does too).
                if self.quant == "int8" and bi >= 1:
                    x = QConv(ch, name=f"{name}_{ci + 1}",
                              dtype=self.dtype)(x)
                else:
                    x = nn.Conv(
                        ch,
                        (3, 3),
                        padding="SAME",
                        dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"{name}_{ci + 1}",
                    )(x)
                x = nn.relu(x)
            if bi == 1 and self.freeze_stem:  # conv2_2: frozen-stem boundary
                x = jax.lax.stop_gradient(x)
            if bi < len(VGG_CFG) - 1:  # no pool after conv5 block
                x = max_pool_2x2(x)
        return x


class QConv(nn.Module):
    """3x3 SAME conv running as int8 on the MXU (trcnn/ops/quant.py).

    Declares the exact kernel/bias tree of the nn.Conv it replaces — fp32
    checkpoints and the weight importers load unchanged; quantization is
    in-graph and inference-only.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from trcnn.ops.quant import qconv2d

        kh, kw = self.kernel_size
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return qconv2d(x, k, b).astype(self.dtype)


class _ConvParams(nn.Module):
    """Declares kernel/bias with nn.Conv's exact names, shapes, and default
    initializers, without running the convolution — the fused stem kernel
    consumes them raw while checkpoints/importers see an identical tree."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_ch, self.out_ch), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.out_ch,), jnp.float32)
        return k, b
