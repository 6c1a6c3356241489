from . import losses  # registers loss classes
from .pointnet2 import PointNet2SASSG, PointSAModule, PointFPModule, SharedMLP
from .vote_module import VoteModule
from .conv_bbox_head import BaseConvBboxHead
from .vote_head import CAVoteHead, multiclass_nms_3d
from .votenet import VoteNet
from ..core import coders  # registers bbox coders
