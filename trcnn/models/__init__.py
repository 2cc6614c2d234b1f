"""Model graphs (flax.linen).

TPU-native rebuild of the reference's model layer (SURVEY.md §3.1:
``R:lib/models/{vgg16,rpn,faster_rcnn}.py``): NHWC layout, bfloat16-friendly,
everything traceable into one jitted graph.
"""

from trcnn.models.vgg16 import VGG16
from trcnn.models.resnet import ResNet101C4, ResNetC5Head
from trcnn.models.rpn import RPNHead, RPNOut
from trcnn.models.roi_head import VGG16RoIHead
from trcnn.models.faster_rcnn import FasterRCNN, make_model

__all__ = [
    "VGG16",
    "ResNet101C4",
    "ResNetC5Head",
    "RPNHead",
    "RPNOut",
    "VGG16RoIHead",
    "FasterRCNN",
    "make_model",
]
