"""Pretrained-weight import (SURVEY.md §4.3 "Model init / weight load")."""

from trcnn.convert.chainer_npz import (import_chainer_npz,
                                       export_chainer_npz,
                                       merge_params,
                                       permute_fc6_kernel)
from trcnn.convert.resnet_npz import import_resnet101_npz
from trcnn.convert.caffemodel import import_caffemodel


def import_weights(path_or_dict, cfg, strict: bool = True):
    """Format/backbone-dispatching import: ``.caffemodel`` files go
    through the wire parser, VGG npz through the chainer mapping,
    ResNet-101 through the torchvision/chainercv mapping."""
    if isinstance(path_or_dict, str) and \
            path_or_dict.endswith(".caffemodel"):
        return import_caffemodel(path_or_dict, cfg, strict=strict)
    if getattr(cfg, "backbone", "vgg16") == "resnet101":
        return import_resnet101_npz(path_or_dict, cfg, strict=strict)
    return import_chainer_npz(path_or_dict, cfg, strict=strict)


__all__ = ["import_chainer_npz", "export_chainer_npz", "merge_params",
           "permute_fc6_kernel", "import_resnet101_npz",
           "import_caffemodel", "import_weights"]
