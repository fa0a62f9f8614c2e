from .registry import BACKBONES, DETECTORS, HEADS, LOSSES, NECKS, READERS
from .builder import build_detector
from .detectors.voxelnet import FPNVoxelNet, VoxelNet
from .heads.mg_head import MultiGroupHead, LossConfig, TestConfig, multi_group_loss, multi_group_predict
from .backbones.scn import FPNSpMiddleResNetFHD, SpMiddleResNetFHD
from .backbones.image import ResNet, SENet, SSDVGG
from .necks.rpn import RPN
from .readers.voxel_encoder import VoxelFeatureExtractorV3
