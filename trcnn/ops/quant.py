"""Dynamic int8 post-training quantization for the inference path.

Beyond-reference opt-in mode (the reference — SURVEY.md §1 — is fp32-only):
on TPU v5e the MXU's int8 peak is 2x its bf16 peak (394 vs 197 TOPS), and
the per-op roofline table in NOTES_ROUND3.md shows the bf16 detect step is
already compute-bound at >91% MXU occupancy — int8 is the only remaining
lever that moves the headline without new hardware.

MEASURED NEGATIVE RESULT on this chip's toolchain (NOTES_ROUND3.md session
log): XLA here does NOT route s8xs8->s32 contractions onto the
double-rate MXU path.  A conv4_x-shaped int8 conv measures 0.54x its bf16
twin (7.54 vs 4.05 ms, the bf16 side sitting on its 3.73 ms FLOP roofline,
so the harness is trustworthy), and an fc6-shaped s8xs8 ``dot_general``
likewise comes out slower than bf16 — the emitter widens to int32 arith
instead of using the MXU's int8 mode.  The mode therefore stays OPT-IN
and off the benchmark path; it is correct, tested, checkpoint-compatible,
and becomes profitable the day the toolchain lowers int8 contractions
natively (or on hardware/XLA versions where it already does).

Scheme (standard PTQ-dynamic, chosen to be data-free and
checkpoint-compatible):

  * weights: symmetric per-output-channel int8, quantized in-graph from the
    UNCHANGED fp32 params — checkpoints, converters, and the parameter tree
    are identical to the fp32 model; XLA hoists/CSEs the weight quantize
    (it only depends on params, and under jit params are donated constants
    per step).
  * activations: symmetric per-tensor int8 with a dynamic (per-batch)
    max-abs scale — no calibration dataset needed (this environment has
    none), at the cost of one reduce per quantized layer (bandwidth-trivial
    next to the 2x MXU win).
  * accumulation in int32 (``preferred_element_type``), dequantize +
    bias in fp32.

Gradients do not flow through ``jnp.round`` — this mode is INFERENCE-ONLY
and the model asserts so.  Accuracy: per-channel-weight dynamic int8 on
VGG-class nets is a well-characterized ≲0.3pt mAP regime, but the parity
contract (SURVEY.md §8) is defined at fp32 — int8 is opt-in
(``make_model(..., quant="int8")``) and never the default.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8: returns (q, scale) with x ≈ q * scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_channels(w: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-channel int8 along ``axis`` (the non-contracted dim)."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(w.shape[axis])


def qconv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    strides: Tuple[int, int] = (1, 1),
    padding: str = "SAME",
) -> jnp.ndarray:
    """int8 x int8 -> int32 NHWC/HWIO convolution, dequantized to fp32.

    ``kernel`` is the ordinary fp32 (kh, kw, cin, cout) parameter; per-cout
    scales are derived here so the parameter tree matches the fp32 model.
    """
    xq, sx = quantize_tensor(x)
    wq, sw = quantize_channels(kernel.astype(jnp.float32), axis=3)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def qdense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """int8 x int8 -> int32 matmul (R, D) @ (D, F), dequantized to fp32."""
    xq, sx = quantize_tensor(x)
    wq, sw = quantize_channels(kernel.astype(jnp.float32), axis=1)
    y = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
