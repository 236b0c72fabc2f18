from ..ops.box_ops import (  # noqa: F401
    normalize_bbox, denormalize_bbox, encode_bbox, decode_bbox)
from .nms_free_coder import NMSFreeCoder  # noqa: F401
from .match_costs import bbox3d_l1_cost, bbox_bev_l1_cost, iou3d_cost  # noqa: F401
