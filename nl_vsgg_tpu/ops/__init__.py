from .boxes import (box_area, center_size, cxcywh_to_xyxy, generalized_iou,
                    intersection_ratio, iou, union_boxes, xywh_to_cxcywh,
                    xyxy_to_cxcywh, xyxy_to_xywh)
from .nms import batched_nms_mask, nms_mask
from .roi_align import roi_align, roi_align_frames, roi_pool
from .roi_align_mm import roi_align_mm, roi_align_mm_frames
from .union_masks import draw_union_boxes

__all__ = [
    "box_area", "center_size", "cxcywh_to_xyxy", "generalized_iou",
    "intersection_ratio", "iou", "union_boxes", "xywh_to_cxcywh",
    "xyxy_to_cxcywh", "xyxy_to_xywh", "batched_nms_mask", "nms_mask",
    "roi_align", "roi_align_frames", "roi_pool", "roi_align_mm",
    "roi_align_mm_frames", "draw_union_boxes",
]
