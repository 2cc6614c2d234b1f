"""Chainer .npz ↔ Flax parameter conversion.

The reference loads ``VGG16_faster_rcnn_final`` weights with
``serializers.load_npz`` — a flat npz keyed by link path with Chainer
layouts (SURVEY.md §4.3): Convolution2D ``W`` is OIHW, Linear ``W`` is
(out, in).  This converter maps those onto the rebuild's Flax tree with
the three required fix-ups called out in SURVEY.md §4.3 / §10:

1. conv kernels OIHW → HWIO (NHWC graph);
2. fc6's (4096, 25088) kernel is re-permuted from Chainer's NCHW flatten
   order (c·49 + h·7 + w) to this graph's NHWC flatten order
   (h·7·512 + w·512 + c);
3. bbox_pred is converted from the reference's *unnormalized* test-time
   convention (raw deltas out of the linear) to this framework's invariant
   — heads always emit normalized deltas, decode always un-normalizes
   (see trcnn.models.faster_rcnn.postprocess):
       W'' = W / std_per_output,   b'' = (b − mean_per_output) / std.

Key resolution is suffix-based so either ``trunk/conv1_1/W`` or
``vgg/conv1_1/W`` style trees import unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from trcnn.config import FasterRCNNConfig
from trcnn.models.vgg16 import VGG_CFG

# (flax param path under params/, chainer key suffix)
_VGG_CONVS = [
    (("extractor", f"{name}_{i + 1}"), f"{name}_{i + 1}")
    for name, n, _ in VGG_CFG for i in range(n)
]
_RPN_CONVS = [
    (("rpn", "rpn_conv"), "rpn_conv_3x3"),
    (("rpn", "rpn_conv"), "rpn_conv"),
    (("rpn", "rpn_cls_score"), "rpn_cls_score"),
    (("rpn", "rpn_bbox_pred"), "rpn_bbox_pred"),
]
_LINEARS = [
    (("head", "fc6"), "fc6"),
    (("head", "fc7"), "fc7"),
    (("head", "cls_score"), "cls_score"),
    (("head", "bbox_pred"), "bbox_pred"),
]


def _find(npz: Dict[str, np.ndarray], suffix: str,
          leaf: str) -> Optional[np.ndarray]:
    """Find ``.../<suffix>/<leaf>`` in a flat npz key space."""
    want = f"{suffix}/{leaf}"
    for k in npz.keys():
        if k == want or k.endswith("/" + want):
            return npz[k]
    return None


def permute_fc6_kernel(w_chainer: np.ndarray, pool: int = 7,
                       channels: int = 512) -> np.ndarray:
    """(4096, C·P·P in NCHW flatten order) → (P·P·C in NHWC order, 4096)."""
    out_dim = w_chainer.shape[0]
    w = w_chainer.reshape(out_dim, channels, pool, pool)  # (O, C, H, W)
    w = w.transpose(2, 3, 1, 0)                           # (H, W, C, O)
    return w.reshape(pool * pool * channels, out_dim)


def _conv_to_flax(w: np.ndarray, b: Optional[np.ndarray]) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}  # OIHW→HWIO
    if b is not None:
        out["bias"] = b
    return out


def _linear_to_flax(w: np.ndarray, b: Optional[np.ndarray]) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(w.T)}  # (out,in) → (in,out)
    if b is not None:
        out["bias"] = b
    return out


def import_chainer_npz(
    path_or_dict,
    cfg: FasterRCNNConfig = FasterRCNNConfig(),
    normalize_bbox_pred: bool = True,
    strict: bool = True,
) -> Dict:
    """Load a Chainer Faster R-CNN npz into a Flax ``{'params': ...}`` tree.

    Args:
      path_or_dict: npz path or an already-loaded {key: array} mapping.
      normalize_bbox_pred: apply fix-up 3 (True for 'final' detection
        weights; False for trees that never baked the unnormalization in).
      strict: raise if a required tensor is missing.  With strict=False the
        returned tree is PARTIAL — it contains only the layers found in the
        npz (the ImageNet-trunk warm-start case).  It cannot be fed to
        ``model.apply`` directly; overlay it onto a full init tree with
        :func:`merge_params` first (scripts/train.py does this).
    """
    if isinstance(path_or_dict, (str, bytes)):
        npz = dict(np.load(path_or_dict, allow_pickle=False))
    else:
        npz = dict(path_or_dict)

    params: Dict = {"extractor": {}, "rpn": {}, "head": {}}

    def put(dest: Tuple[str, str], value: Dict[str, np.ndarray]):
        params[dest[0]][dest[1]] = {
            k: np.asarray(v, np.float32) for k, v in value.items()}

    missing = []
    for dest, suffix in _VGG_CONVS:
        w = _find(npz, suffix, "W")
        if w is None:
            missing.append(suffix)
            continue
        put(dest, _conv_to_flax(w, _find(npz, suffix, "b")))

    seen_rpn = set()
    for dest, suffix in _RPN_CONVS:
        if dest[1] in seen_rpn:
            continue
        w = _find(npz, suffix, "W")
        if w is None:
            continue
        seen_rpn.add(dest[1])
        put(dest, _conv_to_flax(w, _find(npz, suffix, "b")))
    for name in ("rpn_conv", "rpn_cls_score", "rpn_bbox_pred"):
        if name not in seen_rpn:
            missing.append(name)

    for dest, suffix in _LINEARS:
        w = _find(npz, suffix, "W")
        if w is None:
            missing.append(suffix)
            continue
        b = _find(npz, suffix, "b")
        if suffix == "fc6":
            out = {"kernel": permute_fc6_kernel(w)}
            if b is not None:
                out["bias"] = b
        else:
            out = _linear_to_flax(w, b)
        if suffix == "bbox_pred" and normalize_bbox_pred:
            stds = np.tile(np.asarray(cfg.proposal_targets.bbox_normalize_stds,
                                      np.float64), cfg.num_classes)
            means = np.tile(np.asarray(
                cfg.proposal_targets.bbox_normalize_means, np.float64),
                cfg.num_classes)
            out["kernel"] = (out["kernel"].astype(np.float64) /
                            stds[None, :]).astype(np.float32)
            if "bias" in out:
                out["bias"] = ((out["bias"].astype(np.float64) - means) /
                               stds).astype(np.float32)
        put(dest, out)

    if strict and missing:
        raise KeyError(f"missing tensors in chainer npz: {missing}")
    if not strict:
        # drop empty module subtrees so merge_params only overlays what the
        # npz actually provided (an ImageNet trunk npz has no rpn/head)
        params = {k: {sk: sv for sk, sv in v.items() if sv}
                  for k, v in params.items()}
        params = {k: v for k, v in params.items() if v}
    return {"params": params}


def merge_params(base, overlay):
    """Deep-merge ``overlay`` onto a copy of ``base`` (dicts recurse, any
    non-dict leaf in overlay replaces base's).  The ImageNet warm-start
    path: ``merge_params(jit(model.init)(...), import_chainer_npz(path,
    strict=False))`` keeps freshly initialized rpn/head params while the
    trunk (and fc6/fc7 when present) come from the npz."""
    if not isinstance(overlay, dict):
        return overlay
    if not isinstance(base, dict):
        raise ValueError(
            f"cannot overlay dict onto non-dict leaf {type(base).__name__}")
    out = dict(base)
    for k, v in overlay.items():
        if k in out:
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out


def export_chainer_npz(params: Dict, path: str,
                       cfg: FasterRCNNConfig = FasterRCNNConfig()) -> None:
    """Inverse mapping (Flax → Chainer npz) so trained weights round-trip
    back to the reference's format.  bbox_pred is *un*-normalized on the
    way out (the reference's final-weights convention)."""
    p = params["params"] if "params" in params else params
    flat: Dict[str, np.ndarray] = {}

    for dest, suffix in _VGG_CONVS:
        sub = p[dest[0]][dest[1]]
        flat[f"trunk/{suffix}/W"] = np.asarray(
            sub["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in sub:
            flat[f"trunk/{suffix}/b"] = np.asarray(sub["bias"])

    for name in ("rpn_conv", "rpn_cls_score", "rpn_bbox_pred"):
        sub = p["rpn"][name]
        key = "rpn_conv_3x3" if name == "rpn_conv" else name
        flat[f"rpn/{key}/W"] = np.asarray(sub["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in sub:
            flat[f"rpn/{key}/b"] = np.asarray(sub["bias"])

    for name in ("fc6", "fc7", "cls_score", "bbox_pred"):
        sub = p["head"][name]
        w = np.asarray(sub["kernel"])
        b = np.asarray(sub.get("bias")) if "bias" in sub else None
        if name == "fc6":
            hidden = w.shape[1]
            wc = w.reshape(7, 7, 512, hidden).transpose(3, 2, 0, 1)
            wc = wc.reshape(hidden, 7 * 7 * 512)
        else:
            wc = w.T
        if name == "bbox_pred":
            stds = np.tile(np.asarray(cfg.proposal_targets.bbox_normalize_stds,
                                      np.float64), cfg.num_classes)
            means = np.tile(np.asarray(
                cfg.proposal_targets.bbox_normalize_means, np.float64),
                cfg.num_classes)
            wc = (wc.astype(np.float64) * stds[:, None]).astype(np.float32)
            if b is not None:
                b = (b.astype(np.float64) * stds + means).astype(np.float32)
        flat[f"{name}/W"] = wc.astype(np.float32)
        if b is not None:
            flat[f"{name}/b"] = b
    np.savez(path, **flat)
