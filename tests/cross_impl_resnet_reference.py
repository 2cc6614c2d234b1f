"""Independent pure-numpy ResNet-101-C4 forward (VERDICT r3 item 4).

The R101 backbone swap (BASELINE.json config 3) had its contract pinned
only by unit tests and self-goldens; this module is a second, independent
implementation of the C4 trunk and the C5 RoI head — scalar-derived
padding/striding, im2col matmuls, dict bookkeeping, nothing shared with
trcnn/models/resnet.py.  tests/test_cross_impl_resnet.py loads the SAME
weights into this and the production graph and diffs them stage by stage,
exactly like the VGG harness (tests/cross_impl_reference.py).

Contract being re-derived (SURVEY.md §3.1 backbone-swap rows; He et al. /
Detectron C4 lineage):
  * conv1 7x7/2 pad 3 → FrozenBN → relu → maxpool 3x3/2 pad 1;
  * res2 (3 blocks, 64) stride 1, res3 (4, 128) stride 2,
    res4 (23, 256) stride 2 → stride-16, 1024-ch feature map;
  * bottleneck = 1x1(s) → 3x3 SAME → 1x1(4x), stride carried by the
    FIRST 1x1 and the projection (style-A);
  * FrozenBN: y = x * scale/sqrt(var+eps) + (bias − mean·scale/sqrt(..));
  * C5 head: res5 (3, 512) stride 2 on the 14x14 RoI crop → 7x7x2048 →
    global average pool → cls/bbox linears.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def conv2d(x: np.ndarray, kernel: np.ndarray, stride: int = 1,
           pad: int = 0) -> np.ndarray:
    """NHWC x (H, W, C) * HWIO kernel → (H', W', O); symmetric pad,
    im2col + one matmul (nothing shared with XLA's conv lowering)."""
    kh, kw, ci, co = kernel.shape
    if pad:
        x = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    h, w, _ = x.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    cols = np.empty((oh * ow, kh * kw * ci), F32)
    i = 0
    for y in range(0, oh * stride, stride):
        for xx in range(0, ow * stride, stride):
            cols[i] = x[y:y + kh, xx:xx + kw, :].reshape(-1)
            i += 1
    out = cols @ kernel.reshape(-1, co).astype(F32)
    return out.reshape(oh, ow, co).astype(F32)


def max_pool_3x3_s2_p1(x: np.ndarray) -> np.ndarray:
    h, w, c = x.shape
    xp = np.full((h + 2, w + 2, c), -np.inf, F32)
    xp[1:h + 1, 1:w + 1] = x
    oh = (h + 2 - 3) // 2 + 1
    ow = (w + 2 - 3) // 2 + 1
    out = np.empty((oh, ow, c), F32)
    for y in range(oh):
        for xx in range(ow):
            out[y, xx] = xp[2 * y:2 * y + 3, 2 * xx:2 * xx + 3].max((0, 1))
    return out


def frozen_bn(x: np.ndarray, p: dict) -> np.ndarray:
    inv = np.asarray(p["scale"], F32) / np.sqrt(
        np.asarray(p["var"], F32) + F32(1e-5))
    return (x * inv + (np.asarray(p["bias"], F32)
                       - np.asarray(p["mean"], F32) * inv)).astype(F32)


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0).astype(F32)


def bottleneck(x: np.ndarray, p: dict, stride: int = 1,
               project: bool = False) -> np.ndarray:
    residual = x
    if project:
        residual = frozen_bn(
            conv2d(x, np.asarray(p["proj"]["kernel"], F32), stride=stride),
            p["proj_bn"])
    y = relu(frozen_bn(
        conv2d(x, np.asarray(p["conv1"]["kernel"], F32), stride=stride),
        p["bn1"]))
    y = relu(frozen_bn(
        conv2d(y, np.asarray(p["conv2"]["kernel"], F32), pad=1), p["bn2"]))
    y = frozen_bn(conv2d(y, np.asarray(p["conv3"]["kernel"], F32)), p["bn3"])
    return relu(y + residual)


def res_stage(x: np.ndarray, p: dict, blocks: int, stride: int) -> np.ndarray:
    x = bottleneck(x, p["block1"], stride=stride, project=True)
    for i in range(1, blocks):
        x = bottleneck(x, p[f"block{i + 1}"])
    return x


def resnet101_c4_features(params: dict, image: np.ndarray) -> np.ndarray:
    """(H, W, 3) mean-subtracted BGR → (H/16, W/16, 1024)."""
    x = relu(frozen_bn(
        conv2d(image.astype(F32), np.asarray(params["conv1"]["kernel"], F32),
               stride=2, pad=3), params["bn1"]))
    x = max_pool_3x3_s2_p1(x)
    x = res_stage(x, params["res2"], 3, 1)
    x = res_stage(x, params["res3"], 4, 2)
    x = res_stage(x, params["res4"], 23, 2)
    return x


def resnet_c5_head(params: dict, crops: np.ndarray):
    """(R, 14, 14, 1024) RoI crops → (cls_score (R, C), bbox_pred (R, 4C))."""
    feats = np.empty((crops.shape[0], 2048), F32)
    for r in range(crops.shape[0]):
        y = res_stage(crops[r], params["res5"], 3, 2)   # (7, 7, 2048)
        feats[r] = y.mean((0, 1))
    cls_score = (feats @ np.asarray(params["cls_score"]["kernel"], F32)
                 + np.asarray(params["cls_score"]["bias"], F32))
    bbox_pred = (feats @ np.asarray(params["bbox_pred"]["kernel"], F32)
                 + np.asarray(params["bbox_pred"]["bias"], F32))
    return cls_score.astype(F32), bbox_pred.astype(F32)
