"""trcnn — a TPU-native Faster R-CNN detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``mitmul/chainer-faster-rcnn`` (Chainer port of ``rbgirshick/py-faster-rcnn``;
see SURVEY.md for the full blueprint).  Every stage of the
image -> detections pipeline — backbone, RPN, proposal decode, top-k, NMS,
RoI pooling, classification head, per-class post-processing — runs as one
jitted, fixed-shape XLA graph.  No host round-trips, no dynamic shapes:
data-dependent counts (proposals, sampled RoIs, detections) are fixed
capacities plus validity masks.

Package map (mirrors SURVEY.md §10):

- :mod:`trcnn.ops`      — detection ops: anchors, box transforms, IoU, top-k,
                          NMS (XLA + Pallas), RoI pool/align (XLA + Pallas).
- :mod:`trcnn.models`   — flax.linen model graph: VGG-16 / ResNet-101 trunks,
                          RPN head, RoI head, FasterRCNN composite.
- :mod:`trcnn.targets`  — device-side training target assignment
                          (anchor targets, proposal targets) at fixed capacity.
- :mod:`trcnn.data`     — VOC / COCO / synthetic pipelines, device-side
                          preprocessing.
- :mod:`trcnn.train`    — training loop, optimizer, checkpointing, metrics.
- :mod:`trcnn.eval`     — VOC07 11-point AP, COCO-style AP, detection writer.
- :mod:`trcnn.parallel` — mesh construction and sharding rules (DP over a
                          ``data`` axis, optional TP of the big FC layers over
                          a ``model`` axis).
- :mod:`trcnn.utils`    — profiling / timing harnesses.
- :mod:`trcnn.convert`  — Chainer-npz / Caffe-layout weight importers.
- :mod:`trcnn.native`   — C++ host-side reference kernels (NMS, IoU) used as
                          test oracles and fast host fallbacks.
"""

__version__ = "0.1.0"

from trcnn import config  # noqa: F401
from trcnn.config import FasterRCNNConfig, coco_config, voc_config  # noqa: F401


def make_model(*args, **kwargs):
    """Convenience re-export of :func:`trcnn.models.make_model` (lazy —
    importing trcnn must not pull in flax/jax for data-only users)."""
    from trcnn.models import make_model as _mk

    return _mk(*args, **kwargs)
