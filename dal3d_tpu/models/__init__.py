from .registry import BACKBONES, DETECTORS, HEADS, LOSSES, NECKS, READERS
from .builder import build_detector
from .detectors.voxelnet import FPNVoxelNet, VoxelNet
from .heads.mg_head import MultiGroupHead, LossConfig, TestConfig, multi_group_loss, multi_group_predict
from .heads.mg_loss_head import (
    MultiGroupIoUHead,
    MultiGroupLossHead,
    compute_loss_loss,
    decode_iou_preds,
    multi_group_loss_with_iou,
)
from .backbones.scn import FPNSpMiddleResNetFHD, SpMiddleResNetFHD
from .backbones.image import ResNet, SENet, SSDVGG
from .necks.rpn import RPN
from .readers.voxel_encoder import VoxelFeatureExtractorV3
