"""ResNet-101 weight-import tests (BASELINE config 3, SURVEY.md §4.3
extended).

Structure: a synthetic torchvision-style state dict (correct R101 shapes)
must map onto exactly the slots of the real model's init tree with
matching shapes (trace-only via eval_shape — the 101-layer net is too
heavy to execute on CPU).  Numerics: the conv1 BGR/scale/mean fold must
reproduce the torchvision preprocessing pipeline away from the padded
border.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trcnn.config import FasterRCNNConfig
from trcnn.convert.resnet_npz import (_TV_MEAN_RGB, _TV_STD_RGB,
                                      detect_source, import_resnet101_npz)

_STAGES = [("layer1", 3, 64, 256), ("layer2", 4, 128, 512),
           ("layer3", 23, 256, 1024), ("layer4", 3, 512, 2048)]


def _fake_torchvision_sd(rng) -> dict:
    """Random tensors with the exact torchvision resnet101 shapes/names."""
    sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
    for part, ch in (("weight", 64), ("bias", 64), ("running_mean", 64),
                     ("running_var", 64)):
        sd[f"bn1.{part}"] = np.abs(rng.randn(ch)).astype(np.float32)
    for name, blocks, width, out_ch in _STAGES:
        in_ch = 64 if name == "layer1" else out_ch // 2
        for b in range(blocks):
            p = f"{name}.{b}"
            cin = in_ch if b == 0 else out_ch
            stride_convs = [(1, width, cin), (3, width, width),
                            (1, out_ch, width)]
            for ci, (k, o, i) in enumerate(stride_convs, start=1):
                sd[f"{p}.conv{ci}.weight"] = rng.randn(
                    o, i, k, k).astype(np.float32)
                for part in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.bn{ci}.{part}"] = np.abs(
                        rng.randn(o)).astype(np.float32)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = rng.randn(
                    out_ch, cin, 1, 1).astype(np.float32)
                for part in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.downsample.1.{part}"] = np.abs(
                        rng.randn(out_ch)).astype(np.float32)
    return sd


def _shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_torchvision_import_matches_model_tree(rng):
    sd = _fake_torchvision_sd(rng)
    assert detect_source(sd) == "torchvision"
    cfg = FasterRCNNConfig(backbone="resnet101")
    imported = import_resnet101_npz(sd, cfg)

    from trcnn.models import make_model

    model = make_model(cfg)
    init_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                           jnp.asarray([[64.0, 96.0, 1.0]])))
    want = _shapes(init_tree["params"])
    got = _shapes(imported["params"])

    # every imported tensor must be a real slot with the right shape
    for path, shape in got.items():
        assert path in want, f"unknown slot {path}"
        assert shape == want[path], f"{path}: {shape} != {want[path]}"

    # the full backbone + C5 head must be covered (only rpn/cls/bbox heads
    # are legitimately absent from an ImageNet trunk)
    missing = {p for p in want if p not in got}
    assert all(p[0] == "rpn" or p[1] in ("cls_score", "bbox_pred")
               for p in missing), f"backbone slots missing: {missing}"

    # spot-check the OIHW→HWIO transpose
    np.testing.assert_allclose(
        imported["params"]["extractor"]["res3"]["block2"]["conv2"]["kernel"],
        sd["layer2.1.conv2.weight"].transpose(2, 3, 1, 0))
    # res5 goes to the head (Detectron C4 recipe)
    assert "res5" in imported["params"]["head"]
    # frozen-BN stats mapped
    np.testing.assert_allclose(
        imported["params"]["extractor"]["bn1"]["var"],
        sd["bn1.running_var"], rtol=1e-6)


def test_conv1_preprocess_fold_matches_torchvision(rng):
    """our-pipeline input through folded conv1+bn1 ≡ torchvision-normalized
    input through original conv1+bn1 (interior pixels; border differs by
    the zero-padding convention, the documented caveat)."""
    from jax import lax

    sd = _fake_torchvision_sd(rng)
    cfg = FasterRCNNConfig(backbone="resnet101")
    imported = import_resnet101_npz(sd, cfg, fold_preprocess=True)
    kf = jnp.asarray(imported["params"]["extractor"]["conv1"]["kernel"])
    bnf = {k: jnp.asarray(v) for k, v in
           imported["params"]["extractor"]["bn1"].items()}

    img_bgr = rng.randint(0, 256, size=(1, 18, 18, 3)).astype(np.float32)

    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bn(x, s):
        inv = s["scale"] / jnp.sqrt(s["var"] + 1e-5)
        return x * inv + (s["bias"] - s["mean"] * inv)

    ours = bn(conv(jnp.asarray(
        img_bgr - np.asarray(cfg.image.pixel_means_bgr, np.float32)), kf),
        bnf)

    k0 = jnp.asarray(sd["conv1.weight"].transpose(2, 3, 1, 0))
    bn0 = {"scale": jnp.asarray(sd["bn1.weight"]),
           "bias": jnp.asarray(sd["bn1.bias"]),
           "mean": jnp.asarray(sd["bn1.running_mean"]),
           "var": jnp.asarray(sd["bn1.running_var"])}
    x_rgb = img_bgr[..., ::-1] / 255.0
    x_t = (x_rgb - np.asarray(_TV_MEAN_RGB, np.float32)) / \
        np.asarray(_TV_STD_RGB, np.float32)
    tv = bn(conv(jnp.asarray(x_t), k0), bn0)

    # interior outputs (7x7/s2/p3: o in [2, 6] reads no padding for H=18)
    np.testing.assert_allclose(np.asarray(ours)[:, 2:7, 2:7, :],
                               np.asarray(tv)[:, 2:7, 2:7, :],
                               rtol=2e-4, atol=2e-4)


def test_chainercv_naming_imports():
    rng = np.random.RandomState(1)
    sd = {
        "conv1/W": rng.randn(64, 3, 7, 7).astype(np.float32),
        "bn1/gamma": np.ones(64, np.float32),
        "bn1/beta": np.zeros(64, np.float32),
        "bn1/avg_mean": np.zeros(64, np.float32),
        "bn1/avg_var": np.ones(64, np.float32),
        "res2/a/conv1/W": rng.randn(64, 64, 1, 1).astype(np.float32),
        "res2/a/bn1/gamma": np.ones(64, np.float32),
        "res2/a/bn1/beta": np.zeros(64, np.float32),
        "res2/a/bn1/avg_mean": np.zeros(64, np.float32),
        "res2/a/bn1/avg_var": np.ones(64, np.float32),
    }
    assert detect_source(sd) == "chainercv"
    out = import_resnet101_npz(sd, strict=False)
    p = out["params"]["extractor"]
    assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert p["res2"]["block1"]["conv1"]["kernel"].shape == (1, 1, 64, 64)
    # chainer sources are Caffe-style BGR already: no fold by default
    np.testing.assert_allclose(
        p["conv1"]["kernel"], sd["conv1/W"].transpose(2, 3, 1, 0))
