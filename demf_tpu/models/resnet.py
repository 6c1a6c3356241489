"""ResNet image backbone (NHWC, bf16-friendly).

TPU-native equivalent of the mmdet ``ResNet`` the reference configures
(configs/deformdetr/imvotenet_image.py:3-12: depth=50, out_indices=(1,2,3),
frozen_stages=1, norm_eval=True, style='pytorch').  Convs run channel-last
so XLA tiles them directly onto the MXU.  ``norm_eval`` pins BatchNorm to
running stats regardless of the train flag (the reference's frozen-BN
regime); parameter freezing is applied at the optimizer (see
``frozen_param_patterns``) AND as ``stop_gradient`` on the activations
leaving each frozen stage — the torch ``requires_grad=False`` semantics
(mmdet ResNet._freeze_stages) prune the whole backward below the first
trainable stage, which on TPU is worth ~53 ms/step at the stage-1
pretrain shapes (b4, 800x1344: ResNet fwd+bwd 113 -> 60 ms measured;
everything below layer2's input is dead code once stem+layer1 are
frozen, and the stem/layer1 backward is the spatially largest).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.registry import BACKBONES


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    style: str = 'pytorch'

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        dt = x.dtype   # dtype-preserving under the bf16 policy
        bn = lambda name: (lambda y: nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9, epsilon=1e-5, name=name)(y).astype(dt))
        s1, s2 = (1, self.stride) if self.style == 'pytorch' else \
            (self.stride, 1)
        out = nn.Conv(self.planes, (1, 1), strides=(s1, s1), use_bias=False,
                      name='conv1')(x)
        out = nn.relu(bn('bn1')(out))
        out = nn.Conv(self.planes, (3, 3), strides=(s2, s2), padding=1,
                      use_bias=False, name='conv2')(out)
        out = nn.relu(bn('bn2')(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = bn('bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name='downsample_conv')(x)
            identity = bn('downsample_bn')(identity)
        else:
            identity = x
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    style: str = 'pytorch'
    norm_cfg: Any = None
    init_cfg: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) NHWC. Returns tuple of requested stage outputs."""
        block_type, blocks = ARCH_SETTINGS[self.depth]
        assert block_type == 'bottleneck', 'basic blocks not needed yet'
        ura = (not train) or self.norm_eval

        dt = x.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name='conv1')(x)
        x = nn.BatchNorm(use_running_average=ura, momentum=0.9, epsilon=1e-5,
                         name='bn1')(x).astype(dt)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = 64
        for stage in range(self.num_stages):
            stride = 1 if stage == 0 else 2
            for i in range(blocks[stage]):
                x = Bottleneck(planes=planes,
                               stride=stride if i == 0 else 1,
                               downsample=(i == 0),
                               style=self.style,
                               name=f'layer{stage + 1}_{i}')(x, ura)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)

    def frozen_param_patterns(self):
        """Optimizer-side freeze masks for frozen_stages (mmdet parity)."""
        pats = []
        if self.frozen_stages >= 0:
            pats += ['conv1', 'bn1']
            for s in range(1, self.frozen_stages + 1):
                pats.append(f'layer{s}_')
        return pats
