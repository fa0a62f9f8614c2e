from .bevfusion import BEVFusion
from .swin import SwinTransformer
from .lss_fpn import GeneralizedLSSFPN
from .vtransforms import DepthLSSTransform, LSSTransform
from .second import SECOND, SECONDFPN, AddFuser, ConvFuser
from .sparse_encoder import SparseEncoder
from .transfusion import (
    TransFusionHead, TransFusionTestCfg, transfusion_decode, transfusion_loss,
)
