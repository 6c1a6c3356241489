"""Fold BatchNorm into the preceding Dense/Conv at inference time.

The reference exposes this as ``eval.py --fuse-conv-bn`` (mmcv
``fuse_conv_bn``, eval.py:4,88-89).  Here the fold is a pure transform on the
variables pytree: for every (linear, BN) sibling pair we rewrite the linear's
kernel/bias with the BN affine+stats and reset the BN to identity, so the
module graph is unchanged but the normalization becomes a no-op.
"""
from __future__ import annotations

import numpy as np

# sibling (linear, bn) name pairs used across this framework's modules
_PAIR_RULES = [
    (lambda n: n.startswith('Dense_'),
     lambda n: 'BatchNorm_' + n.split('_')[1]),
    (lambda n: n.startswith('conv') and n[4:].isdigit(),
     lambda n: 'bn' + n[4:]),
    (lambda n: n == 'downsample_conv', lambda n: 'downsample_bn'),
    (lambda n: n == 'fc1', lambda n: 'bn'),  # PositionEmbeddingLearned
]


def fuse_conv_bn(variables, eps=1e-5):
    """Returns new variables with BN folded into preceding linears."""
    import jax
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get('batch_stats', {}))
    n_fused = _fuse_scope(params, stats, eps)
    out = {'params': params}
    if 'batch_stats' in variables:
        out['batch_stats'] = stats
    return out, n_fused


def _fuse_scope(params, stats, eps):
    n = 0
    for name in list(params.keys()):
        sub = params[name]
        if not isinstance(sub, dict):
            continue
        n += _fuse_scope(sub, stats.get(name, {}), eps)
    for lin_match, bn_name_fn in _PAIR_RULES:
        for name in list(params.keys()):
            if not (isinstance(params[name], dict) and lin_match(name)):
                continue
            bn_name = bn_name_fn(name)
            if bn_name not in params or bn_name not in stats:
                continue
            lin = params[name]
            bn = params[bn_name]
            st = stats[bn_name]
            if 'kernel' not in lin or 'scale' not in bn:
                continue
            factor = bn['scale'] / np.sqrt(st['var'] + eps)
            # fold the multiplicative part into the linear; keep the shift
            # in the (now identity-scale) BN so bias-free linears stay valid
            lin['kernel'] = lin['kernel'] * factor  # broadcast on out-dim
            if 'bias' in lin:
                lin['bias'] = lin['bias'] * factor
            bn['bias'] = bn['bias'] - st['mean'] * factor
            bn['scale'] = np.ones_like(bn['scale'])
            st['mean'] = np.zeros_like(st['mean'])
            st['var'] = np.ones_like(st['var']) - eps
            n += 1
    return n
