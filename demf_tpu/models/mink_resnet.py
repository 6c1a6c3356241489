"""Sparse-voxel ResNet backbone (MinkResNet34 / FCAF3D's HDResNet34).

TPU-native re-design of mmdet3d ``MinkResNet`` as used by FCAF3D and the
reference's DeMF-FCAF3D branch (reference README.md:55-58, SURVEY.md §2b
N12): MinkowskiEngine sparse convs become the fixed-capacity voxel-hash
ops of ops/sparse.py, batched with ``jax.vmap`` (each scene owns its own
coordinate table).  Topology mirrors mmdet3d MinkResNet(depth=34,
in_channels, num_stages=4, pool=True):

    stem:   conv(k=3, s=2) + BN + ReLU, then 2x2x2 stride-2 max-pool
            (stages land at tensor strides 8/16/32/64)
    stage i: BasicBlock x (3, 4, 6, 3), first block stride 2
    outputs: per-stage sparse tensors, channels (64, 128, 256, 512)

Statistics for BatchNorm are computed over VALID voxel rows only (padding
rows are zeros and would bias plain flax BatchNorm).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import sparse as S
from ..utils.registry import BACKBONES


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (B, M, C) sparse features, masked by validity."""
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,)))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,)))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        if train:
            w = valid[..., None].astype(jnp.float32)
            cnt = jnp.maximum(w.sum((0, 1)), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * w).sum((0, 1)) / cnt
            var = (jnp.square(xf - mean) * w).sum((0, 1)) / cnt
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


def _conv_param(module, name, k, cin, cout):
    """(K^3, Cin, Cout) kernel with fan-in He init (Minkowski default)."""
    return module.param(
        name, nn.initializers.variance_scaling(2.0, 'fan_in',
                                               'truncated_normal'),
        (k ** 3, cin, cout))


class SparseBasicBlock(nn.Module):
    """Two 3x3x3 convs + BNs with residual (ResNet BasicBlock).

    ``tensor_stride`` is the INPUT level's granularity; a stride-2 first
    conv moves the block to granularity ``2 * tensor_stride``.
    """
    channels: int
    stride: int = 1
    tensor_stride: int = 1

    @nn.compact
    def __call__(self, st, train: bool = False, nbr=None):
        """``nbr``: precomputed per-batch (B, M, 27) submanifold table at
        this block's OUTPUT coordinates (stride-1 blocks only)."""
        coords, valid, x = st
        cin = x.shape[-1]
        ts = self.tensor_stride
        if self.stride > 1:
            w1 = _conv_param(self, 'conv1', 2, cin, self.channels)
            coords_o, valid_o, y = S.strided_conv_batched(
                coords, valid, x, w1, stride=self.stride, kernel_size=2,
                max_out=max(1, coords.shape[1] // 2), tensor_stride=ts,
                sorted_input=True)
            out_ts = ts * self.stride
        else:
            w1 = _conv_param(self, 'conv1', 3, cin, self.channels)
            coords_o, valid_o = coords, valid
            y = S.submanifold_conv_batched(coords, valid, x, w1,
                                           tensor_stride=ts, nbr=nbr)
            out_ts = ts
        y = MaskedBatchNorm(name='bn1')(y, valid_o, train)
        y = nn.relu(y)
        if nbr is None:
            # build the output-level table once; conv2 (and, via the
            # return below, later blocks on this level) reuse it
            nbr = S.neighbor_table_batched(
                coords_o, valid_o, coords_o, valid_o,
                S.kernel_offsets(3), in_stride=out_ts,
                sorted_input=True)
        w2 = _conv_param(self, 'conv2', 3, self.channels, self.channels)
        y = S.submanifold_conv_batched(coords_o, valid_o, y, w2,
                                       tensor_stride=out_ts, nbr=nbr)
        y = MaskedBatchNorm(name='bn2')(y, valid_o, train)

        if self.stride > 1 or cin != self.channels:
            if self.stride > 1:
                # Minkowski downsample branch = conv(k=1, s=2): each
                # output voxel reads the input voxel AT its coordinate
                wd = _conv_param(self, 'down', 1, cin, self.channels)
                dn_nbr = S.neighbor_table_batched(
                    coords, valid, coords_o, valid_o,
                    S.kernel_offsets(1), in_stride=ts,
                    sorted_input=True)
                idn = S.sparse_conv_apply_batched(
                    x, dn_nbr, wd,
                    rev=dict(kernel_size=1, in_stride=ts,
                             out_coords=coords_o, out_valid=valid_o,
                             in_coords=coords, in_valid=valid,
                             sorted_out=True))
            else:
                idn = nn.Dense(self.channels, use_bias=False,
                               name='down')(x)
            idn = MaskedBatchNorm(name='bn_down')(idn, valid_o, train)
        else:
            idn = x
        y = nn.relu(y + idn)
        y = jnp.where(valid_o[..., None], y, 0.0)
        return (coords_o, valid_o, y), nbr


@BACKBONES.register_module()
class MinkResNet(nn.Module):
    """mmdet3d MinkResNet (34-layer default) on voxel-hash sparse ops.

    Input: (coords (B, M, 3) int32, valid (B, M), feats (B, M, C)).
    Returns a list of per-stage sparse tensors (coords, valid, feats).
    """
    depth: int = 34
    in_channels: int = 3
    num_stages: int = 4
    pool: bool = True
    norm: str = 'batch'
    stem_channels: int = 64

    def _blocks(self) -> Sequence[int]:
        return {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                50: (3, 4, 6, 3)}[self.depth][:self.num_stages]

    @nn.compact
    def __call__(self, coords, valid, feats, train: bool = False):
        # stem: conv(k=3, s=2) + BN + ReLU (+ 2x2x2 s=2 max-pool) ->
        # tensor stride 4 entering layer1, so stage outputs sit at
        # strides 8/16/32/64 (FCAF3D's 0.08..0.64 m level pyramid at
        # voxel_size=0.01)
        w = _conv_param(self, 'stem_conv', 3, feats.shape[-1],
                        self.stem_channels)
        # sorted_input: voxelize emits key-sorted, valid-prefix tables
        c_s, v_s, x = S.strided_conv_batched(
            coords, valid, feats, w, stride=2, kernel_size=3,
            max_out=max(1, coords.shape[1] // 2), tensor_stride=1,
            sorted_input=True)
        x = MaskedBatchNorm(name='stem_bn')(x, v_s, train)
        x = nn.relu(x)
        st = (c_s, v_s, jnp.where(v_s[..., None], x, 0.0))
        ts = 2
        if self.pool:
            st = S.sparse_max_pool_batched(
                *st, max_out=max(1, c_s.shape[1] // 2), tensor_stride=2,
                sorted_input=True)
            ts = 4

        outs = []
        for si, n_blocks in enumerate(self._blocks()):
            channels = self.stem_channels * (2 ** si)
            nbr = None   # per-stage submanifold table, built by block 0
            for bi in range(n_blocks):
                st, nbr = SparseBasicBlock(
                    channels=channels, stride=2 if bi == 0 else 1,
                    tensor_stride=ts,
                    name=f'layer{si + 1}_{bi}')(st, train, nbr=nbr)
                if bi == 0:
                    ts *= 2
            # 4th element: the stage's 27-tap submanifold table, shared
            # downstream (FCAF3DHead reuses it for its up/out blocks
            # instead of rebuilding — tables are ~half the backbone
            # cost, tools/bench_sparse_ops.py)
            outs.append((*st, nbr))
        return outs
