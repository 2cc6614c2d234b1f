"""caffemodel import tests (SURVEY.md §3.4 weight-convert row).

No real caffemodel exists in this environment (zero egress), so the tests
hand-encode NetParameter messages on the protobuf wire format — both the
modern ``layer`` (field 100) and the py-faster-rcnn-era ``layers``
(field 2, V1LayerParameter) encodings, packed and legacy-dims blobs — and
check the parser + the full import path into the Flax tree.
"""

import struct

import numpy as np
import pytest

from trcnn.convert.caffemodel import (caffemodel_to_npz_dict,
                                      import_caffemodel, parse_caffemodel)

# fast marks are per-test: the heaviest cases (>15 s on the 1-CPU box)
# run in the full suite only, keeping `pytest -m fast` inside its
# 5-minute budget (VERDICT r3 weak 5).


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(fnum: int, wtype: int) -> bytes:
    return _varint((fnum << 3) | wtype)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def _blob(arr: np.ndarray, legacy_dims: bool = False) -> bytes:
    arr = np.asarray(arr, np.float32)
    data = _len_field(5, arr.reshape(-1).astype("<f4").tobytes())
    if legacy_dims:
        dims4 = ([1] * (4 - arr.ndim)) + list(arr.shape)
        shape_bytes = b"".join(_tag(i + 1, 0) + _varint(d)
                               for i, d in enumerate(dims4))
    else:
        packed = b"".join(_varint(d) for d in arr.shape)
        shape_bytes = _len_field(7, _len_field(1, packed))
    return shape_bytes + data


def _layer_modern(name: str, blobs) -> bytes:
    payload = _len_field(1, name.encode())
    payload += _len_field(2, b"Convolution")
    # unknown field the parser must skip (loss_weight, wire type 5)
    payload += _tag(5, 5) + struct.pack("<f", 1.0)
    for b in blobs:
        payload += _len_field(7, _blob(b))
    return _len_field(100, payload)


def _layer_v1(name: str, blobs) -> bytes:
    payload = _len_field(1, name.encode())
    for b in blobs:
        payload += _len_field(6, _blob(b, legacy_dims=True))
    return _len_field(2, payload)


@pytest.mark.fast
def test_parse_both_encodings():
    rng = np.random.RandomState(0)
    w1 = rng.randn(4, 3, 3, 3).astype(np.float32)
    b1 = rng.randn(4).astype(np.float32)
    w2 = rng.randn(6, 4).astype(np.float32)
    net = (_len_field(1, b"testnet")
           + _layer_modern("conv1_1", [w1, b1])
           + _layer_v1("fc_test", [w2]))
    layers = parse_caffemodel(net)
    assert set(layers) == {"conv1_1", "fc_test"}
    np.testing.assert_array_equal(layers["conv1_1"][0], w1)
    np.testing.assert_array_equal(layers["conv1_1"][1], b1)
    np.testing.assert_array_equal(layers["fc_test"][0], w2)

    npz = caffemodel_to_npz_dict(net)
    assert npz["conv1_1/W"].shape == (4, 3, 3, 3)
    assert npz["fc_test/W"].shape == (6, 4)


@pytest.mark.fast
def test_slash_names_normalize():
    w = np.ones((2, 2, 3, 3), np.float32)
    net = _layer_modern("rpn_conv/3x3", [w])
    npz = caffemodel_to_npz_dict(net)
    assert "rpn_conv_3x3/W" in npz


def test_full_detector_import_matches_npz_path(tmp_path):
    """A caffemodel carrying the full reference layer set must produce the
    same Flax tree as the equivalent chainer npz."""
    import jax

    from trcnn.convert import export_chainer_npz, import_chainer_npz
    from trcnn.models import make_model

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_cfg

    cfg = _tiny_cfg()
    model = make_model(cfg)
    images = np.zeros((1, cfg.image.pad_h, cfg.image.pad_w, 3), np.float32)
    im_info = np.asarray([[cfg.image.pad_h, cfg.image.pad_w, 1.0]],
                         np.float32)
    donor = jax.tree.map(np.asarray, jax.jit(model.init)(
        jax.random.PRNGKey(0), images, im_info))
    npz_path = str(tmp_path / "donor.npz")
    export_chainer_npz(donor, npz_path, cfg)
    flat = dict(np.load(npz_path))

    # rebuild the same tensors as a caffemodel (caffe name conventions)
    rename = {"trunk/": "", "rpn/rpn_conv_3x3": "rpn/rpn_conv/3x3"}
    net = b""
    layer_names = sorted({k.rsplit("/", 1)[0] for k in flat})
    for lname in layer_names:
        cname = lname
        for old, new in rename.items():
            cname = cname.replace(old, new) if old.endswith("/") else \
                (new if cname == old else cname)
        cname = cname.replace("rpn/", "")
        blobs = [flat[f"{lname}/W"]]
        if f"{lname}/b" in flat:
            blobs.append(flat[f"{lname}/b"])
        net += _layer_modern(cname, blobs)

    got = import_caffemodel(net, cfg)
    want = import_chainer_npz(npz_path, cfg)
    jax.tree.map(np.testing.assert_array_equal, got, want)
