from maskrcnn_tpu.models.maskrcnn import MaskRCNN, build_head, prepare_image
from maskrcnn_tpu.models.rpn import RPNHead, Proposals, generate_proposals, anchors_for
from maskrcnn_tpu.models.backbones.fpn import (
    FPNBackbone,
    C4Backbone,
    DarknetBackbone,
    build_backbone,
)
from maskrcnn_tpu.models.backbones.resnet import ResNet50, Res5Stage

__all__ = [
    "MaskRCNN",
    "build_head",
    "prepare_image",
    "RPNHead",
    "Proposals",
    "generate_proposals",
    "anchors_for",
    "FPNBackbone",
    "C4Backbone",
    "DarknetBackbone",
    "build_backbone",
    "ResNet50",
    "Res5Stage",
]
