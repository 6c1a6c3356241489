from . import losses  # registers loss classes
from .pointnet2 import PointNet2SASSG, PointSAModule, PointFPModule, SharedMLP
from .vote_module import VoteModule
from .conv_bbox_head import BaseConvBboxHead
from .vote_head import CAVoteHead, multiclass_nms_3d
from .votenet import VoteNet
from .resnet import ResNet
from .image_neck import ChannelMapper, FPN
from .transformer import (SinePositionalEncoding,
                          MultiScaleDeformableAttention, MultiheadAttention,
                          FFN, DetrTransformerEncoderLayer,
                          DetrTransformerDecoderLayer, DeformableDetrEncoder,
                          DeMFTransformerDecoderLayer,
                          PositionEmbeddingLearned)
from .demf_head import DeMFVoteHead
from .demfnet import DeMFVoteNet
from .detr_head import DeformableDETRHead
from .vote_fusion import VoteFusion, sample_valid_seeds
from .rpn_roi import (RPNHead, StandardRoIHead, grid_anchors, delta2bbox,
                      bbox2delta, pyramid_roi_align)
from .imvotenet import ImVoteNet_Deformdetr, ImVoteNet, ImgMLP
from .mink_resnet import MinkResNet
from .fcaf3d import FCAF3D, FCAF3DHead
from .demf_fcaf3d import DeMFFcaf3D, DeMFFcaf3DHead
from ..core import coders  # registers bbox coders
