"""ResNet-101 pretrained-weight import (BASELINE config 3).

The reference repo is VGG-16-only; its weight-load contract
(SURVEY.md §4.3: npz keyed by link path, Convolution2D W in OIHW) is
extended here to the ResNet-101-C4 detector so config 3 can be
accuracy-validated the moment weights exist.  Two source naming schemes
are supported, covering the realistic interchange formats:

* **torchvision** — ``conv1.weight``, ``bn1.{weight,bias,running_mean,
  running_var}``, ``layerL.B.convN.weight``, ``layerL.B.downsample.{0,1}``
  (an npz produced from a PyTorch ``state_dict`` with
  ``np.savez(path, **{k: v.numpy() for k, v in sd.items()})``).
* **chainercv** — ``res2/a/conv1/W``, ``res2/a/bn1/{gamma,beta,avg_mean,
  avg_var}`` with blocks named a, b1, b2, … (Chainer's ResNet lineage).

Stage mapping: torchvision ``layer1..3`` / chainer ``res2..4`` → the C4
extractor (``extractor/res2..4``); ``layer4``/``res5`` → the C5 RoI head
(``head/res5``) per the Detectron C4 recipe.  Downsample/projection convs
map to ``proj``/``proj_bn``.

Color/normalization fold (torchvision only): torchvision models expect
RGB in [0,1] normalized by ImageNet mean/std, while this pipeline feeds
Caffe-style BGR 0–255 minus pixel means (SURVEY.md §8).  With
``fold_preprocess=True`` (default for torchvision sources) conv1 is
rewritten to consume this pipeline's input exactly:

  kernel'[:, :, c, :] = kernel[:, :, rgb(c), :] / (255 · std_rgb(c))
  bn1.mean'_o += Σ_{k,c} kernel'[k, c, o] · (255·mean_c − pixel_mean_c)

(the constant input offset lands in bn1's running mean; exact away from
the zero-padded 3-pixel border, the standard caveat of mean folding).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from trcnn.config import FasterRCNNConfig

# ImageNet normalization used by torchvision pretrained models (RGB).
_TV_MEAN_RGB = (0.485, 0.456, 0.406)
_TV_STD_RGB = (0.229, 0.224, 0.225)

_STAGE_BLOCKS = {"res2": 3, "res3": 4, "res4": 23, "res5": 3}
# chainercv block names: a, b1, b2, ...
_CHAINER_BLOCK = lambda i: "a" if i == 0 else f"b{i}"


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(2, 3, 1, 0))  # OIHW → HWIO


def detect_source(npz: Dict[str, np.ndarray]) -> str:
    keys = npz.keys()
    if any(k.startswith("layer1.") or k == "conv1.weight" for k in keys):
        return "torchvision"
    if any("res2/a/" in k or k.startswith("res2/") for k in keys):
        return "chainercv"
    raise KeyError(
        "unrecognized ResNet npz naming (expected torchvision "
        "'layer1.0.conv1.weight' or chainercv 'res2/a/conv1/W' keys)")


def _tv_bn(npz, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(npz[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(npz[f"{prefix}.bias"], np.float32),
        "mean": np.asarray(npz[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(npz[f"{prefix}.running_var"], np.float32),
    }


def _ch_bn(npz, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(npz[f"{prefix}/gamma"], np.float32),
        "bias": np.asarray(npz[f"{prefix}/beta"], np.float32),
        "mean": np.asarray(npz[f"{prefix}/avg_mean"], np.float32),
        "var": np.asarray(npz[f"{prefix}/avg_var"], np.float32),
    }


def _fold_conv1(kernel_hwio: np.ndarray, bn1: Dict[str, np.ndarray],
                pixel_means_bgr) -> None:
    """In-place: rewrite conv1 kernel + bn1 mean for BGR 0–255 − pixel-mean
    input (see module docstring).  kernel is (7, 7, 3, 64) with the input
    channel axis currently in RGB order."""
    k = kernel_hwio
    # RGB→BGR reorder of the input-channel axis, then 1/(255·std) scale
    k[:] = k[:, :, ::-1, :]
    std_bgr = np.asarray(_TV_STD_RGB[::-1], np.float32)
    mean_bgr = np.asarray(_TV_MEAN_RGB[::-1], np.float32)
    k /= (255.0 * std_bgr)[None, None, :, None]
    # constant input offset d_c = 255·mean_c − pixel_mean_c lands in
    # bn1.mean (BN subtracts the mean, so ADD the conv response to it)
    d = 255.0 * mean_bgr - np.asarray(pixel_means_bgr, np.float32)
    offset = np.einsum("hwco,c->o", k, d)
    bn1["mean"] = bn1["mean"] + offset


def import_resnet101_npz(
    path_or_dict,
    cfg: FasterRCNNConfig = FasterRCNNConfig(backbone="resnet101"),
    source: str = "auto",
    fold_preprocess: Optional[bool] = None,
    strict: bool = True,
) -> Dict:
    """Load ResNet-101 (ImageNet trunk or full-detector extras) into the
    Flax tree.  Returns ``{"params": {...}}`` — PARTIAL when strict=False
    or when head linears are absent; overlay with
    :func:`trcnn.convert.merge_params` onto a fresh init.

    Args:
      source: 'torchvision' | 'chainercv' | 'auto' (key sniffing).
      fold_preprocess: rewrite conv1/bn1 for this pipeline's BGR-mean
        input.  Default: True for torchvision, False for chainercv
        (Chainer/Caffe ResNets are already BGR 0–255).
      strict: raise on any missing backbone tensor.
    """
    if isinstance(path_or_dict, (str, bytes)):
        npz = dict(np.load(path_or_dict, allow_pickle=False))
    else:
        npz = dict(path_or_dict)
    if source == "auto":
        source = detect_source(npz)
    if fold_preprocess is None:
        fold_preprocess = source == "torchvision"

    missing = []
    extractor: Dict = {}
    head: Dict = {}

    def take(fn, *keys):
        try:
            return fn(*keys)
        except KeyError as e:
            missing.append(str(e))
            return None

    if source == "torchvision":
        w = take(lambda: _conv_hwio(npz["conv1.weight"]))
        bn1 = take(lambda: _tv_bn(npz, "bn1"))
    else:
        w = take(lambda: _conv_hwio(npz["conv1/W"]))
        bn1 = take(lambda: _ch_bn(npz, "bn1"))
    if w is not None and bn1 is not None:
        if fold_preprocess:
            _fold_conv1(w, bn1, cfg.image.pixel_means_bgr)
        extractor["conv1"] = {"kernel": w}
        extractor["bn1"] = bn1

    for si, stage in enumerate(("res2", "res3", "res4", "res5")):
        blocks: Dict = {}
        for bi in range(_STAGE_BLOCKS[stage]):
            blk: Dict = {}
            if source == "torchvision":
                p = f"layer{si + 1}.{bi}"
                for ci in (1, 2, 3):
                    kw = take(lambda c=ci: _conv_hwio(
                        npz[f"{p}.conv{c}.weight"]))
                    bb = take(lambda c=ci: _tv_bn(npz, f"{p}.bn{c}"))
                    if kw is not None:
                        blk[f"conv{ci}"] = {"kernel": kw}
                    if bb is not None:
                        blk[f"bn{ci}"] = bb
                if f"{p}.downsample.0.weight" in npz:
                    blk["proj"] = {"kernel": _conv_hwio(
                        npz[f"{p}.downsample.0.weight"])}
                    blk["proj_bn"] = _tv_bn(npz, f"{p}.downsample.1")
                elif bi == 0:
                    missing.append(f"{p}.downsample.0.weight")
            else:
                p = f"{stage}/{_CHAINER_BLOCK(bi)}"
                for ci in (1, 2, 3):
                    kw = take(lambda c=ci: _conv_hwio(npz[f"{p}/conv{c}/W"]))
                    bb = take(lambda c=ci: _ch_bn(npz, f"{p}/bn{c}"))
                    if kw is not None:
                        blk[f"conv{ci}"] = {"kernel": kw}
                    if bb is not None:
                        blk[f"bn{ci}"] = bb
                if f"{p}/conv4/W" in npz:  # chainercv projection conv name
                    blk["proj"] = {"kernel": _conv_hwio(npz[f"{p}/conv4/W"])}
                    blk["proj_bn"] = _ch_bn(npz, f"{p}/bn4")
                elif bi == 0:
                    missing.append(f"{p}/conv4/W")
            if blk:
                blocks[f"block{bi + 1}"] = blk
        if blocks:
            if stage == "res5":
                head["res5"] = blocks      # C5 RoI head (Detectron recipe)
            else:
                extractor[stage] = blocks

    # full-detector extras (rpn convs + head linears), chainer-npz style —
    # reuse the suffix finder so a combined detector npz imports in one call
    from trcnn.convert.chainer_npz import _find, _conv_to_flax, _linear_to_flax

    rpn: Dict = {}
    for name, suffixes in (("rpn_conv", ("rpn_conv_3x3", "rpn_conv")),
                           ("rpn_cls_score", ("rpn_cls_score",)),
                           ("rpn_bbox_pred", ("rpn_bbox_pred",))):
        for sfx in suffixes:
            wr = _find(npz, sfx, "W")
            if wr is not None:
                rpn[name] = _conv_to_flax(wr, _find(npz, sfx, "b"))
                break
    for name in ("cls_score", "bbox_pred"):
        wl = _find(npz, name, "W")
        if wl is not None:
            head[name] = _linear_to_flax(wl, _find(npz, name, "b"))

    if strict and missing:
        raise KeyError(f"missing tensors in ResNet-101 npz: {missing}")

    params: Dict = {}
    if extractor:
        params["extractor"] = extractor
    if rpn:
        params["rpn"] = rpn
    if head:
        params["head"] = head
    return {"params": params}
