"""Pretrained-weight import (SURVEY.md §4.3 "Model init / weight load")."""

from trcnn.convert.chainer_npz import (import_chainer_npz,
                                       export_chainer_npz,
                                       permute_fc6_kernel)

__all__ = ["import_chainer_npz", "export_chainer_npz", "permute_fc6_kernel"]
