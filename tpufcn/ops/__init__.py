from tpufcn.ops.boxes import iou_xywh, scaled_iou_xywh, rects_to_corners, corners_to_rects
from tpufcn.ops.grid_codec import encode_grid_labels, decode_gridboxes, GridLabels
from tpufcn.ops.group_rects import group_rectangles, vote_boxes
from tpufcn.ops.image import demean_bgr, preprocess_bgr, resize_bilinear
from tpufcn.ops.caffe_layers import lrn_across_channels, conv_transpose_caffe, bilinear_kernel

__all__ = [
    "iou_xywh",
    "scaled_iou_xywh",
    "rects_to_corners",
    "corners_to_rects",
    "encode_grid_labels",
    "decode_gridboxes",
    "GridLabels",
    "group_rectangles",
    "vote_boxes",
    "demean_bgr",
    "preprocess_bgr",
    "resize_bilinear",
    "lrn_across_channels",
    "conv_transpose_caffe",
    "bilinear_kernel",
]
