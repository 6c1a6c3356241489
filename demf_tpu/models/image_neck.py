"""Image necks: ChannelMapper (and FPN for the ImVoteNet baseline).

Reference config sites: ChannelMapper at configs/deformdetr/
imvotenet_image.py:13-20 (1x1 convs 512/1024/2048 -> 256 x 4 levels, GN32);
FPN at configs/_base_/models/imvotenet_image.py:12-16.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..utils.registry import NECKS


@NECKS.register_module()
class ChannelMapper(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    kernel_size: int = 1
    num_outs: int = 4
    norm_cfg: Any = None
    act_cfg: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        """inputs: tuple of (B, H, W, C_i) NHWC maps -> num_outs levels."""
        assert len(inputs) == len(self.in_channels)
        num_groups = (self.norm_cfg or {}).get('num_groups', 32)
        use_norm = self.norm_cfg is not None
        outs = []
        for i, x in enumerate(inputs):
            pad = self.kernel_size // 2
            y = nn.Conv(self.out_channels,
                        (self.kernel_size, self.kernel_size),
                        padding=pad, use_bias=not use_norm,
                        name=f'convs_{i}')(x)
            if use_norm:
                # eps 1e-5 = torch GroupNorm default (flax default is 1e-6;
                # the mismatch cost 2e-3 per level in the whole-model
                # forward-parity test)
                y = nn.GroupNorm(num_groups=num_groups, epsilon=1e-5,
                                 name=f'gn_{i}')(y).astype(x.dtype)
            if self.act_cfg is not None:
                y = nn.relu(y)
            outs.append(y)
        # extra levels from the last input (stride-2 3x3, mmdet behavior)
        src = inputs[-1]
        for i in range(self.num_outs - len(inputs)):
            y = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                        use_bias=not use_norm,
                        name=f'extra_convs_{i}')(src)
            if use_norm:
                y = nn.GroupNorm(num_groups=num_groups, epsilon=1e-5,
                                 name=f'extra_gn_{i}')(y).astype(src.dtype)
            if self.act_cfg is not None:
                y = nn.relu(y)
            outs.append(y)
            src = y
        return tuple(outs)


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Any = False
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        used = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral_{i}')(x)
            for i, x in enumerate(used)]
        # top-down pathway (nearest upsample + add)
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1,
                    name=f'fpn_conv_{i}')(laterals[i])
            for i in range(len(laterals))]
        # extra levels by max-pool (mmdet default when add_extra_convs=False)
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
