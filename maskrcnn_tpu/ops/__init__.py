from maskrcnn_tpu.ops.boxes import (
    bbox2loc,
    loc2bbox,
    box_iou,
    clip_boxes,
    box_area,
    box_hw,
)
from maskrcnn_tpu.ops.anchors import (
    generate_anchor_base,
    shifted_anchors,
    multilevel_anchors,
)
from maskrcnn_tpu.ops.nms import nms_padded, batched_nms_padded
from maskrcnn_tpu.ops.levels import map_rois_to_fpn_levels
from maskrcnn_tpu.ops.roi_align import roi_align, multilevel_roi_align

__all__ = [
    "bbox2loc",
    "loc2bbox",
    "box_iou",
    "clip_boxes",
    "box_area",
    "box_hw",
    "generate_anchor_base",
    "shifted_anchors",
    "multilevel_anchors",
    "nms_padded",
    "batched_nms_padded",
    "map_rois_to_fpn_levels",
    "roi_align",
    "multilevel_roi_align",
]
