"""Shared-trunk conv prediction head (mmdet3d ``BaseConvBboxHead``).

Reference: built by the vote heads (class_agnostic_vote_head.py:14,398-403)
with cfg ``in_channels=256, shared_conv_channels=(128,128), bias=True``.
Channel-last Dense stacks (1x1 convs over points are matmuls on the MXU).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .pointnet2 import SharedMLP


class BaseConvBboxHead(nn.Module):
    in_channels: int = 0
    shared_conv_channels: Sequence[int] = (128, 128)
    num_cls_out_channels: int = 0
    num_reg_out_channels: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, features, train: bool = False):
        """features: (B, N, C) -> (cls (B, N, C_cls), reg (B, N, C_reg))."""
        x = SharedMLP(list(self.shared_conv_channels), bias=self.bias,
                      name='shared_convs')(features, train)
        cls_out = nn.Dense(self.num_cls_out_channels, name='conv_cls')(x)
        reg_out = nn.Dense(self.num_reg_out_channels, name='conv_reg')(x)
        return cls_out, reg_out
