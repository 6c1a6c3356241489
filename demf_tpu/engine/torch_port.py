"""Torch checkpoint porting: mmdet3d/mmcv state_dicts -> flax params.

Covers the reference's checkpoint ecosystem (SURVEY.md §5): released DeMF /
ImVoteNet / Deformable-DETR torch checkpoints can be ported into this
framework for eval parity.  Layout rules:

    * Conv2d OIHW -> flax HWIO (transpose 2,3,1,0);
    * Conv1d OIk (k=1, the reference's 1x1 point convs) -> Dense (in, out);
    * Linear (out, in) -> Dense kernel (in, out) (transpose);
    * BatchNorm weight/bias -> scale/bias params; running stats ->
      batch_stats mean/var.

The name translation is rule-driven (regex rewrites from flax tree paths to
torch dotted keys), with the DeMF-specific stage-1 remap
(img_bbox_head.transformer.encoder -> img_encoder, reference demfnet.py:85)
available in checkpoint.remap_img_branch_keys applied on the torch side
first.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _t(x):
    return np.asarray(x)


def convert_conv2d(w):
    return _t(w).transpose(2, 3, 1, 0)


def convert_conv1d(w):
    # (out, in, 1) -> (in, out)
    return _t(w)[:, :, 0].transpose(1, 0)


def convert_linear(w):
    return _t(w).transpose(1, 0)


def flatten_params(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        key = f'{prefix}/{k}' if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = v
    return out


def unflatten_params(flat):
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split('/')
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def _bn_torch_names(torch_prefix):
    return dict(scale=f'{torch_prefix}.weight', bias=f'{torch_prefix}.bias',
                mean=f'{torch_prefix}.running_mean',
                var=f'{torch_prefix}.running_var')


class TorchPorter:
    """Rule-driven porter from a torch state_dict into flax variables.

    Usage:
        porter = TorchPorter(state_dict)
        porter.map_dense('pts_bbox_head/conv_pred0/conv_cls',
                         'pts_bbox_head.conv_pred0.conv_cls', conv1d=True)
        variables = porter.build(variables_template)
    """

    def __init__(self, state_dict: Dict[str, Any]):
        self.sd = {k: _t(v) for k, v in state_dict.items()}
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.used = set()

    def _get(self, key):
        self.used.add(key)
        return self.sd[key]

    def map_conv2d(self, flax_path, torch_prefix, bias=False):
        self.params[f'{flax_path}/kernel'] = convert_conv2d(
            self._get(f'{torch_prefix}.weight'))
        if bias or f'{torch_prefix}.bias' in self.sd:
            self.params[f'{flax_path}/bias'] = self._get(
                f'{torch_prefix}.bias')

    def map_dense(self, flax_path, torch_prefix, conv1d=False):
        w = self._get(f'{torch_prefix}.weight')
        if w.ndim == 4:   # 1x1 Conv2d used as a pointwise Dense
            assert w.shape[2] == w.shape[3] == 1, w.shape
            self.params[f'{flax_path}/kernel'] = \
                w[:, :, 0, 0].transpose(1, 0)
        elif conv1d or w.ndim == 3:
            self.params[f'{flax_path}/kernel'] = convert_conv1d(w)
        else:
            self.params[f'{flax_path}/kernel'] = convert_linear(w)
        if f'{torch_prefix}.bias' in self.sd:
            self.params[f'{flax_path}/bias'] = self._get(
                f'{torch_prefix}.bias')

    def map_bn(self, flax_path, torch_prefix):
        names = _bn_torch_names(torch_prefix)
        self.params[f'{flax_path}/scale'] = self._get(names['scale'])
        self.params[f'{flax_path}/bias'] = self._get(names['bias'])
        self.batch_stats[f'{flax_path}/mean'] = self._get(names['mean'])
        self.batch_stats[f'{flax_path}/var'] = self._get(names['var'])

    def map_groupnorm(self, flax_path, torch_prefix):
        self.params[f'{flax_path}/scale'] = self._get(
            f'{torch_prefix}.weight')
        self.params[f'{flax_path}/bias'] = self._get(f'{torch_prefix}.bias')

    def map_layernorm(self, flax_path, torch_prefix):
        self.params[f'{flax_path}/scale'] = self._get(
            f'{torch_prefix}.weight')
        self.params[f'{flax_path}/bias'] = self._get(f'{torch_prefix}.bias')

    def map_raw(self, flax_path, torch_key, convert=None):
        v = self._get(torch_key)
        self.params[flax_path] = convert(v) if convert else _t(v)

    # -- composite helpers for this framework's modules -------------------
    def map_shared_mlp(self, flax_path, torch_prefix, n_layers,
                       torch_layer_fmt='{p}.layer{i}'):
        """SharedMLP (Dense+BN stacks) <- mmcv ConvModule sequences."""
        for i in range(n_layers):
            tp = torch_layer_fmt.format(p=torch_prefix, i=i)
            self.map_dense(f'{flax_path}/Dense_{i}', f'{tp}.conv',
                           conv1d=True)
            self.map_bn(f'{flax_path}/BatchNorm_{i}', f'{tp}.bn')

    def map_mha(self, flax_path, torch_prefix, heads):
        """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.

        in_proj rows are [q; k; v]; flax kernels are (in, heads, head_dim)
        with the output dimension split head-major (both frameworks agree).
        """
        w = self._get(f'{torch_prefix}.in_proj_weight')   # (3E, E)
        b = self._get(f'{torch_prefix}.in_proj_bias')
        e = w.shape[1]
        hd = e // heads
        for i, name in enumerate(('query', 'key', 'value')):
            wi = w[i * e:(i + 1) * e]                     # (E_out, E_in)
            self.params[f'{flax_path}/{name}/kernel'] = \
                wi.transpose(1, 0).reshape(e, heads, hd)
            self.params[f'{flax_path}/{name}/bias'] = \
                b[i * e:(i + 1) * e].reshape(heads, hd)
        wo = self._get(f'{torch_prefix}.out_proj.weight')
        self.params[f'{flax_path}/out/kernel'] = \
            wo.transpose(1, 0).reshape(heads, hd, e)
        self.params[f'{flax_path}/out/bias'] = self._get(
            f'{torch_prefix}.out_proj.bias')

    def map_msda(self, flax_path, torch_prefix):
        """mmcv MultiScaleDeformableAttention projections (4 Linears)."""
        for name in ('sampling_offsets', 'attention_weights', 'value_proj',
                     'output_proj'):
            self.map_dense(f'{flax_path}/{name}', f'{torch_prefix}.{name}')

    def map_detr_encoder_layer(self, flax_path, torch_prefix):
        """mmcv BaseTransformerLayer (self_attn=MSDA, norm, ffn, norm).

        Torch children: attentions.0 (MSDA), ffns.0 (mmcv FFN:
        layers.0.0 / layers.1 Linears), norms.0/1 (LayerNorm).
        """
        self.map_msda(f'{flax_path}/self_attn', f'{torch_prefix}.attentions.0')
        self.map_dense(f'{flax_path}/ffn/fc1',
                       f'{torch_prefix}.ffns.0.layers.0.0')
        self.map_dense(f'{flax_path}/ffn/fc2',
                       f'{torch_prefix}.ffns.0.layers.1')
        self.map_layernorm(f'{flax_path}/norm1', f'{torch_prefix}.norms.0')
        self.map_layernorm(f'{flax_path}/norm2', f'{torch_prefix}.norms.1')

    def map_detr_decoder_layer(self, flax_path, torch_prefix, heads=8):
        """mmcv DetrTransformerDecoderLayer with MSDA cross-attention.

        Torch children: attentions.0 (MultiheadAttention self-attn, inner
        module `.attn`), attentions.1 (MSDA cross-attn), ffns.0,
        norms.0/1/2.
        """
        self.map_mha(f'{flax_path}/self_attn/attn',
                     f'{torch_prefix}.attentions.0.attn', heads)
        self.map_msda(f'{flax_path}/cross_attn',
                      f'{torch_prefix}.attentions.1')
        self.map_dense(f'{flax_path}/ffn/fc1',
                       f'{torch_prefix}.ffns.0.layers.0.0')
        self.map_dense(f'{flax_path}/ffn/fc2',
                       f'{torch_prefix}.ffns.0.layers.1')
        for i in range(3):
            self.map_layernorm(f'{flax_path}/norm{i + 1}',
                               f'{torch_prefix}.norms.{i}')

    def map_posembed(self, flax_path, torch_prefix):
        """DeMF PositionEmbeddingLearned: Conv1d-BN1d-ReLU-Conv1d.

        Reference demf/modeling/layers/transformer.py:18-36
        (position_embedding_head Sequential indices 0, 1, 3).
        """
        self.map_dense(f'{flax_path}/fc1',
                       f'{torch_prefix}.position_embedding_head.0')
        self.map_bn(f'{flax_path}/bn',
                    f'{torch_prefix}.position_embedding_head.1')
        self.map_dense(f'{flax_path}/fc2',
                       f'{torch_prefix}.position_embedding_head.3')

    def map_deform_detr_encoder(self, flax_path='img_encoder',
                                torch_prefix='img_encoder', num_layers=6):
        """DeformableDetrEncoder (reference deform_detr_encoder.py:24-29):
        6 MSDA self-attn layers + learned level embeds (sine positional
        encoding has no parameters)."""
        for i in range(num_layers):
            self.map_detr_encoder_layer(
                f'{flax_path}/layers_{i}',
                f'{torch_prefix}.encoder.layers.{i}')
        self.map_raw(f'{flax_path}/level_embeds',
                     f'{torch_prefix}.level_embeds')

    def map_channel_mapper(self, flax_path='img_neck',
                           torch_prefix='img_neck', num_ins=3,
                           num_extra=1):
        """mmdet ChannelMapper: 1x1 ConvModules with GN (+ 3x3 extras)."""
        for i in range(num_ins):
            self.map_conv2d(f'{flax_path}/convs_{i}',
                            f'{torch_prefix}.convs.{i}.conv')
            self.map_groupnorm(f'{flax_path}/gn_{i}',
                               f'{torch_prefix}.convs.{i}.gn')
        for i in range(num_extra):
            self.map_conv2d(f'{flax_path}/extra_convs_{i}',
                            f'{torch_prefix}.extra_convs.{i}.conv')
            self.map_groupnorm(f'{flax_path}/extra_gn_{i}',
                               f'{torch_prefix}.extra_convs.{i}.gn')

    def map_vote_module(self, flax_path, torch_prefix, n_convs=2):
        """mmdet3d VoteModule: vote_conv ConvModule stack + conv_out."""
        self.map_shared_mlp(f'{flax_path}/vote_conv',
                            f'{torch_prefix}.vote_conv', n_convs,
                            torch_layer_fmt='{p}.{i}')
        self.map_dense(f'{flax_path}/conv_out', f'{torch_prefix}.conv_out')

    def map_base_conv_bbox_head(self, flax_path, torch_prefix, n_shared=2):
        """mmdet3d BaseConvBboxHead: shared ConvModules + cls/reg Conv1d."""
        self.map_shared_mlp(f'{flax_path}/shared_convs',
                            f'{torch_prefix}.shared_convs', n_shared)
        self.map_dense(f'{flax_path}/conv_cls', f'{torch_prefix}.conv_cls')
        self.map_dense(f'{flax_path}/conv_reg', f'{torch_prefix}.conv_reg')

    def map_point_sa_mlps(self, flax_path, torch_prefix, n_layers,
                          scale=0):
        """PointSAModule shared MLP (torch: Conv2d 1x1 ConvModules inside
        mlps.{scale}); our SSG modules keep a single MLP stack."""
        for i in range(n_layers):
            tp = f'{torch_prefix}.mlps.{scale}.layer{i}'
            self.map_dense(f'{flax_path}/mlps/Dense_{i}', f'{tp}.conv')
            self.map_bn(f'{flax_path}/mlps/BatchNorm_{i}', f'{tp}.bn')

    def map_pointnet2(self, flax_path='pts_backbone',
                      torch_prefix='pts_backbone', num_sa=4, num_fp=2,
                      sa_layers=3, fp_layers=2):
        """mmdet3d PointNet2SASSG: SA_modules (Conv2d MLPs) + FP_modules."""
        for i in range(num_sa):
            self.map_point_sa_mlps(f'{flax_path}/SA_modules_{i}',
                                   f'{torch_prefix}.SA_modules.{i}',
                                   sa_layers)
        for i in range(num_fp):
            for j in range(fp_layers):
                tp = f'{torch_prefix}.FP_modules.{i}.mlps.layer{j}'
                self.map_dense(
                    f'{flax_path}/FP_modules_{i}/mlps/Dense_{j}',
                    f'{tp}.conv')
                self.map_bn(
                    f'{flax_path}/FP_modules_{i}/mlps/BatchNorm_{j}',
                    f'{tp}.bn')

    def map_demf_vote_head(self, flax_path='pts_bbox_head',
                           torch_prefix='pts_bbox_head',
                           num_decoder_layers=1, agg_layers=3):
        """DeMFVoteHead (reference class_agnostic_vote_head.py:382-403):
        VoteModule + vote_aggregation PointSAModule + N decoder layers
        (attribute ``decoder.{i}`` wrapping ``.layer`` + ``.posembed``) +
        N+1 BaseConvBboxHeads registered as ``conv_pred{i}``."""
        self.map_vote_module(f'{flax_path}/vote_module',
                             f'{torch_prefix}.vote_module')
        self.map_point_sa_mlps(f'{flax_path}/vote_aggregation',
                               f'{torch_prefix}.vote_aggregation',
                               agg_layers)
        for i in range(num_decoder_layers):
            self.map_detr_decoder_layer(
                f'{flax_path}/decoder_{i}/layer',
                f'{torch_prefix}.decoder.{i}.layer')
            self.map_posembed(f'{flax_path}/decoder_{i}/posembed',
                              f'{torch_prefix}.decoder.{i}.posembed')
        for i in range(num_decoder_layers + 1):
            self.map_base_conv_bbox_head(f'{flax_path}/conv_pred{i}',
                                         f'{torch_prefix}.conv_pred{i}')

    def map_ca_vote_head(self, flax_path, torch_prefix, agg_layers=3):
        """CAVoteHead (no decoder): VoteModule + aggregation + conv_pred."""
        self.map_vote_module(f'{flax_path}/vote_module',
                             f'{torch_prefix}.vote_module')
        self.map_point_sa_mlps(f'{flax_path}/vote_aggregation',
                               f'{torch_prefix}.vote_aggregation',
                               agg_layers)
        self.map_base_conv_bbox_head(f'{flax_path}/conv_pred',
                                     f'{torch_prefix}.conv_pred')

    def map_fpn(self, flax_path='img_neck', torch_prefix='img_neck',
                n_levels=4):
        """mmdet FPN (ImVoteNet's image neck, imvotenet_image.py): 1x1
        lateral convs + 3x3 fpn convs, bias, no norm; num_outs=5's extra
        level is a parameter-free max-pool on both sides."""
        for i in range(n_levels):
            self.map_conv2d(f'{flax_path}/lateral_{i}',
                            f'{torch_prefix}.lateral_convs.{i}.conv',
                            bias=True)
            self.map_conv2d(f'{flax_path}/fpn_conv_{i}',
                            f'{torch_prefix}.fpn_convs.{i}.conv',
                            bias=True)

    def map_rpn_head(self, flax_path='img_rpn_head',
                     torch_prefix='img_rpn_head'):
        """mmdet RPNHead: 3x3 shared conv + 1x1 cls/reg convs (all bias)."""
        for name in ('rpn_conv', 'rpn_cls', 'rpn_reg'):
            self.map_conv2d(f'{flax_path}/{name}',
                            f'{torch_prefix}.{name}', bias=True)

    def map_roi_head(self, flax_path='img_roi_head',
                     torch_prefix='img_roi_head', roi_size=7, channels=256):
        """mmdet Shared2FCBBoxHead under StandardRoIHead.

        shared_fcs.0 consumes the flattened RoI feature; torch flattens
        (C, S, S) c-major while our RoI align emits (S, S, C) hwc-major
        (rpn_roi.py StandardRoIHead), so its kernel rows are PERMUTED
        (out, C*S*S) -> (S*S*C, out) via an (out, C, S, S) view."""
        w = self._get(f'{torch_prefix}.bbox_head.shared_fcs.0.weight')
        out_dim = w.shape[0]
        w4 = w.reshape(out_dim, channels, roi_size, roi_size)
        self.params[f'{flax_path}/shared_fc1/kernel'] = \
            w4.transpose(2, 3, 1, 0).reshape(
                roi_size * roi_size * channels, out_dim)
        self.params[f'{flax_path}/shared_fc1/bias'] = self._get(
            f'{torch_prefix}.bbox_head.shared_fcs.0.bias')
        self.map_dense(f'{flax_path}/shared_fc2',
                       f'{torch_prefix}.bbox_head.shared_fcs.1')
        self.map_dense(f'{flax_path}/fc_cls',
                       f'{torch_prefix}.bbox_head.fc_cls')
        self.map_dense(f'{flax_path}/fc_reg',
                       f'{torch_prefix}.bbox_head.fc_reg')

    def map_resnet50(self, flax_path='img_backbone',
                     torch_prefix='img_backbone'):
        self.map_conv2d(f'{flax_path}/conv1', f'{torch_prefix}.conv1')
        self.map_bn(f'{flax_path}/bn1', f'{torch_prefix}.bn1')
        blocks = (3, 4, 6, 3)
        for s, n in enumerate(blocks):
            for i in range(n):
                fp = f'{flax_path}/layer{s + 1}_{i}'
                tp = f'{torch_prefix}.layer{s + 1}.{i}'
                for c in (1, 2, 3):
                    self.map_conv2d(f'{fp}/conv{c}', f'{tp}.conv{c}')
                    self.map_bn(f'{fp}/bn{c}', f'{tp}.bn{c}')
                if i == 0:
                    self.map_conv2d(f'{fp}/downsample_conv',
                                    f'{tp}.downsample.0')
                    self.map_bn(f'{fp}/downsample_bn', f'{tp}.downsample.1')

    def build(self, variables_template):
        """Assemble flax variables, validating shapes against the template."""
        import jax
        tmpl_params = flatten_params(variables_template['params'])
        tmpl_stats = flatten_params(
            variables_template.get('batch_stats', {}))
        out_params = dict(tmpl_params)
        out_stats = dict(tmpl_stats)
        missing, mismatched = [], []
        for k, v in self.params.items():
            if k not in tmpl_params:
                missing.append(k)
                continue
            if tuple(tmpl_params[k].shape) != tuple(v.shape):
                mismatched.append((k, tmpl_params[k].shape, v.shape))
                continue
            out_params[k] = v.astype(np.asarray(tmpl_params[k]).dtype)
        for k, v in self.batch_stats.items():
            if k in tmpl_stats and \
                    tuple(tmpl_stats[k].shape) == tuple(v.shape):
                out_stats[k] = v.astype(np.asarray(tmpl_stats[k]).dtype)
            else:
                missing.append(f'stats:{k}')
        if mismatched:
            raise ValueError(f'shape mismatches: {mismatched[:5]}')
        variables = {'params': unflatten_params(out_params)}
        if out_stats:
            variables['batch_stats'] = unflatten_params(out_stats)
        report = dict(
            ported=len(self.params) - len(missing),
            unmatched_flax_keys=missing,
            unused_torch_keys=sorted(set(self.sd) - self.used)[:20])
        return jax.tree_util.tree_map(np.asarray, variables), report


def _me_tap_perm(k, axis0_fastest=True):
    """Permutation from MinkowskiEngine kernel-tap order to ours.

    Our ``ops.sparse.kernel_offsets`` enumerates taps with the LAST axis
    fastest (t = (i0*k + i1)*k + i2).  MinkowskiEngine's HYPER_CUBE
    kernel region enumerates the FIRST axis fastest.  If a real
    checkpoint disagrees (cannot be probed in this sandbox — the
    DeMF_fcaf branch and its weights are unavailable), pass
    ``axis0_fastest=False`` to fall back to identity.
    """
    import itertools
    perm = []
    if not axis0_fastest:
        return list(range(k ** 3))
    # ME index t_me enumerates (i0 fastest): i0 + k*i1 + k^2*i2 over
    # (axis0, axis1, axis2); ours is (i0*k + i1)*k + i2.
    for i2, i1, i0 in itertools.product(range(k), range(k), range(k)):
        perm.append((i0 * k + i1) * k + i2)
    return perm


class MinkPorter(TorchPorter):
    """TorchPorter extension for MinkowskiEngine sparse-conv modules
    (mmdet3d MinkResNet + FCAF3DHead — the DeMF-FCAF3D base family).

    ME ``MinkowskiConvolution`` kernels are stored as
    ``(K^3, C_in, C_out)`` (or ``(C_in, C_out)`` for kernel_size=1),
    matching our ``ops.sparse`` weight layout up to tap ORDER (see
    ``_me_tap_perm``); ``MinkowskiBatchNorm`` nests a BatchNorm1d under
    ``.bn``.
    """

    def map_mink_conv(self, flax_path, torch_key, kernel_size,
                      axis0_fastest=True, as_dense=True):
        w = self._get(torch_key)
        if w.ndim == 3:
            perm = _me_tap_perm(kernel_size, axis0_fastest)
            out = np.empty_like(w)
            for t_me, t_ours in enumerate(perm):
                out[t_ours] = w[t_me]
            self.params[flax_path] = out
        elif as_dense:              # k=1 (C_in, C_out) -> nn.Dense kernel
            self.params[f'{flax_path}/kernel'] = _t(w)
        else:                       # k=1 -> our (1, C_in, C_out) tap form
            self.params[flax_path] = _t(w)[None]

    def map_mink_bn(self, flax_path, torch_prefix):
        self.map_bn(flax_path, f'{torch_prefix}.bn')

    def map_mink_resnet(self, flax_path='backbone',
                        torch_prefix='backbone', depth=34):
        """mmdet3d MinkResNet: conv1/norm1 stem + layer{1..4} BasicBlocks
        (conv1/norm1/conv2/norm2 + downsample.{0,1} on stride blocks)."""
        self.map_mink_conv(f'{flax_path}/stem_conv',
                           f'{torch_prefix}.conv1.kernel', 3)
        self.map_mink_bn(f'{flax_path}/stem_bn', f'{torch_prefix}.norm1')
        blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}[depth]
        for s, n in enumerate(blocks):
            for i in range(n):
                fp = f'{flax_path}/layer{s + 1}_{i}'
                tp = f'{torch_prefix}.layer{s + 1}.{i}'
                k1 = 2 if i == 0 else 3
                self.map_mink_conv(f'{fp}/conv1', f'{tp}.conv1.kernel',
                                   k1)
                self.map_mink_bn(f'{fp}/bn1', f'{tp}.norm1')
                self.map_mink_conv(f'{fp}/conv2', f'{tp}.conv2.kernel', 3)
                self.map_mink_bn(f'{fp}/bn2', f'{tp}.norm2')
                if f'{tp}.downsample.0.kernel' in self.sd:
                    self.map_mink_conv(f'{fp}/down',
                                       f'{tp}.downsample.0.kernel', 1,
                                       as_dense=False)
                    self.map_mink_bn(f'{fp}/bn_down',
                                     f'{tp}.downsample.1')

    def map_fcaf3d_head(self, flax_path='head', torch_prefix='head',
                        n_levels=4):
        """mmdet3d FCAF3DHead: up_block_{i} (Sequential tconv/bn/elu/
        conv/bn/elu), out_block_{i} (conv/bn/elu), shared k=1 prediction
        convs (centerness_conv / reg_conv / cls_conv)."""
        for i in range(1, n_levels):
            tp = f'{torch_prefix}.up_block_{i}'
            fp = f'{flax_path}/up_block_{i}'
            self.map_mink_conv(f'{fp}_tconv', f'{tp}.0.kernel', 2)
            self.map_mink_bn(f'{fp}_tbn', f'{tp}.1')
            self.map_mink_conv(f'{fp}_conv', f'{tp}.3.kernel', 3)
            self.map_mink_bn(f'{fp}_bn', f'{tp}.4')
        for i in range(n_levels):
            tp = f'{torch_prefix}.out_block_{i}'
            fp = f'{flax_path}/out_block_{i}'
            self.map_mink_conv(f'{fp}_conv', f'{tp}.0.kernel', 3)
            self.map_mink_bn(f'{fp}_bn', f'{tp}.1')
        self.map_mink_conv(f'{flax_path}/conv_center',
                           f'{torch_prefix}.centerness_conv.kernel', 1)
        self.map_mink_conv(f'{flax_path}/conv_reg',
                           f'{torch_prefix}.reg_conv.kernel', 1)
        self.map_mink_conv(f'{flax_path}/conv_cls',
                           f'{torch_prefix}.cls_conv.kernel', 1)
        if f'{torch_prefix}.cls_conv.bias' in self.sd:
            self.params[f'{flax_path}/conv_cls/bias'] = self._get(
                f'{torch_prefix}.cls_conv.bias').reshape(-1)


def _strict_check(porter, variables_template, report):
    """Raise unless the port covered every template leaf and consumed every
    torch key (num_batches_tracked counters excepted)."""
    tmpl_params = flatten_params(variables_template['params'])
    tmpl_stats = flatten_params(variables_template.get('batch_stats', {}))
    missing_tmpl = (set(tmpl_params) - set(porter.params)) | {
        k for k in tmpl_stats if k not in porter.batch_stats}
    unused = {k for k in set(porter.sd) - porter.used
              if not k.endswith('num_batches_tracked')}
    if report['unmatched_flax_keys'] or missing_tmpl or unused:
        raise ValueError(
            'incomplete port: '
            f'unmatched={report["unmatched_flax_keys"][:5]} '
            f'missing_template={sorted(missing_tmpl)[:5]} '
            f'unused_torch={sorted(unused)[:5]} '
            f'(counts: {len(report["unmatched_flax_keys"])}/'
            f'{len(missing_tmpl)}/{len(unused)})')


def port_fcaf3d_checkpoint(state_dict, variables_template, depth=34,
                           n_levels=4, strict=True):
    """Port an mmdet3d FCAF3D state_dict (MinkResNet + FCAF3DHead) into
    this framework's FCAF3D variables.

    The reference's DeMF_fcaf branch (README.md:55-58) builds on exactly
    this detector; its released weights are not downloadable here, so
    the map is validated structurally (every template leaf covered, no
    unused torch keys) against a synthesized mmdet3d-named state_dict —
    see tests/test_demf_port.py.
    """
    porter = MinkPorter(state_dict)
    porter.map_mink_resnet(depth=depth)
    porter.map_fcaf3d_head(n_levels=n_levels)
    variables, report = porter.build(variables_template)
    if strict:
        _strict_check(porter, variables_template, report)
    return variables, report


def port_demf_checkpoint(state_dict, variables_template,
                         num_decoder_layers=1, strict=True):
    """Port a full DeMF-VoteNet torch state_dict into flax variables.

    Covers every module of the flagship model
    (reference configs/demf/demf_votenet.py): PointNet2SASSG point
    backbone, DeMFVoteHead (VoteModule, vote aggregation, DETR-style
    decoder layers with learned position embedding, N+1 conv_pred heads),
    frozen ResNet-50 + ChannelMapper + Deformable-DETR encoder image
    branch.  The released checkpoints (reference README.md:43-46) use
    exactly these key names; for a stage-1 Deformable-DETR checkpoint
    apply ``checkpoint.remap_img_branch_keys`` semantics first (torch-side
    keys ``img_bbox_head.transformer.{encoder,level_embeds}`` ->
    ``img_encoder``, reference demfnet.py:85-101).

    Returns (variables, report).  With ``strict`` the port must cover
    every template leaf and consume every torch key.
    """
    porter = TorchPorter(state_dict)
    porter.map_pointnet2()
    porter.map_demf_vote_head(num_decoder_layers=num_decoder_layers)
    porter.map_resnet50()
    porter.map_channel_mapper()
    porter.map_deform_detr_encoder()
    variables, report = porter.build(variables_template)
    if strict:
        _strict_check(porter, variables_template, report)
    return variables, report


def port_imvotenet_checkpoint(state_dict, variables_template, strict=True):
    """Port a full mmdet3d ImVoteNet state_dict into flax variables.

    Covers the released stage-2 checkpoint (reference README.md:43-46,
    64.4 mAP baseline): frozen Faster R-CNN image branch (ResNet-50 +
    FPN + RPNHead + Shared2FCBBoxHead RoI head), PointNet2SASSG point
    backbone, the three CAVoteHead towers ``pts_bbox_head_{joint,pts,
    img}`` and the 18-cue ``img_mlp`` (reference
    configs/baseline/imvotenet.py).  VoteFusion has no parameters.

    Returns (variables, report); ``strict`` enforces 100% template
    coverage with zero unused torch keys.
    """
    porter = TorchPorter(state_dict)
    porter.map_resnet50()
    porter.map_fpn()
    porter.map_rpn_head()
    porter.map_roi_head()
    porter.map_pointnet2()
    for tower in ('joint', 'pts', 'img'):
        porter.map_ca_vote_head(f'pts_bbox_head_{tower}',
                                f'pts_bbox_head_{tower}')
    porter.map_shared_mlp('img_mlp/mlp', 'img_mlp.mlp', 2)
    variables, report = porter.build(variables_template)
    if strict:
        _strict_check(porter, variables_template, report)
    return variables, report


def port_stage1_into_demf(state_dict, variables_template):
    """Warm-start a DeMF model's IMAGE branch from a stage-1 DETR-pretrain
    torch checkpoint (the released 2D pretrain ckpt, reference
    README.md:45).

    Torch-side key remap mirrors reference demfnet.py:85-101:
    ``img_bbox_head.transformer.{encoder,level_embeds}`` moves to
    ``img_encoder`` and every other ``img_bbox_head`` key (the DETR
    decoder / classifier, unused by DeMF) is dropped; the point branch
    keeps its template init.  Returns (variables, report).
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith('img_bbox_head.transformer.encoder.') or \
                k.startswith('img_bbox_head.transformer.level_embeds'):
            sd[k.replace('img_bbox_head.transformer', 'img_encoder', 1)] = v
        elif k.startswith('img_bbox_head.') or k.startswith('pts_'):
            continue  # DETR head dropped (demfnet.py:98); pts not pretrained
        else:
            sd[k] = v
    porter = TorchPorter(sd)
    porter.map_resnet50()
    porter.map_channel_mapper()
    porter.map_deform_detr_encoder()
    variables, report = porter.build(variables_template)
    # the whole surviving torch tree must land in the template
    unused = {k for k in set(porter.sd) - porter.used
              if not k.endswith('num_batches_tracked')}
    if report['unmatched_flax_keys'] or unused:
        raise ValueError(
            'incomplete stage-1 warm-start port: '
            f'unmatched={report["unmatched_flax_keys"][:5]} '
            f'unused_torch={sorted(unused)[:5]}')
    return variables, report


def load_torch_state_dict(path):
    """Load a .pth checkpoint without CUDA (cpu map_location)."""
    import torch
    ckpt = torch.load(path, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt)
    return {k: v.numpy() for k, v in sd.items()}
