from maskrcnn_tpu.models.heads.fpn_heads import (
    BoxBranch,
    FPNMaskHead,
    FPNKeypointHead,
)
from maskrcnn_tpu.models.heads.light_head import LightHead
from maskrcnn_tpu.models.heads.res5_head import Res5Head

__all__ = [
    "BoxBranch",
    "FPNMaskHead",
    "FPNKeypointHead",
    "LightHead",
    "Res5Head",
]
