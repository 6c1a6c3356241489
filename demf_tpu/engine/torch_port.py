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
from typing import Any, Callable, Dict, List, Tuple

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


# Rules: (flax-path regex, torch key template with \1.. backrefs,
#         value converter applied to torch weights)
Rule = Tuple[str, str, Callable]


def default_rules() -> List[Rule]:
    """Name-translation rules for the shipped model families."""
    return [
        # --- ResNet (mmdet naming) -------------------------------------
        (r'^(img_backbone)/conv1/kernel$', r'\1.conv1.weight', convert_conv2d),
        (r'^(img_backbone)/bn1/(scale|bias)$', None, None),  # handled below
        (r'^(img_backbone)/layer(\d+)_(\d+)/conv(\d)/kernel$',
         r'\1.layer\2.\3.conv\4.weight', convert_conv2d),
        (r'^(img_backbone)/layer(\d+)_(\d+)/downsample_conv/kernel$',
         r'\1.layer\2.\3.downsample.0.weight', convert_conv2d),
    ]


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
        if conv1d or w.ndim == 3:
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


def load_torch_state_dict(path):
    """Load a .pth checkpoint without CUDA (cpu map_location)."""
    import torch
    ckpt = torch.load(path, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt)
    return {k: v.numpy() for k, v in sd.items()}
