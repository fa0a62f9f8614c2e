from . import sparse, voxelize, nms, rotated_iou
