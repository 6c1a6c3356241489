"""Optimizer + LR schedule construction from config.

Reproduces the reference's optimizer surface (configs/demf/
demf_votenet.py:16-24, configs/_base_/schedules/schedule_3x.py:4-7): AdamW
with ``paramwise_cfg.custom_keys`` lr multipliers, global-norm grad clipping,
and a step LR policy over epochs — expressed as a single optax chain so the
whole update is one fused XLA program inside the jitted train step.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import optax


def step_lr_schedule(base_lr, steps_per_epoch, milestones, gamma=0.1,
                     warmup=None, warmup_iters=500, warmup_ratio=1.0 / 3):
    """mmcv ``StepLrUpdaterHook`` equivalent as an optax schedule."""
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup is None:
        return sched
    if warmup != 'linear':
        raise NotImplementedError(warmup)

    def with_warmup(count):
        frac = jax.numpy.clip(count / max(warmup_iters, 1), 0.0, 1.0)
        k = warmup_ratio + (1.0 - warmup_ratio) * frac
        return sched(count) * jax.numpy.where(count < warmup_iters, k, 1.0)

    return with_warmup


def _lr_mult_tree(params, custom_keys):
    """Per-leaf lr multiplier from mmcv-style substring-matched custom keys.

    mmcv matches ``key in param_name`` on the dotted torch name; we match on
    the '/'-joined flax path, which preserves the reference semantics for the
    keys actually used ('decoder', 'img_backbone', 'sampling_offsets',
    'reference_points').
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return '/'.join(str(getattr(k, 'key', k)) for k in path)

    mults = {}
    for path, leaf in flat:
        name = path_str(path)
        mult = 1.0
        for key, spec in (custom_keys or {}).items():
            if key in name:
                mult = spec.get('lr_mult', 1.0)
                break
        mults[name] = mult
    treedef = jax.tree_util.tree_structure(params)
    leaves = [mults[path_str(p)] for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def scale_updates_by_tree(mult_tree):
    """GradientTransformation multiplying updates leaf-wise (lr_mult)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, m: u * m, updates, mult_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(optimizer_cfg: Dict[str, Any], params,
                    lr_schedule=None, grad_clip: Dict[str, Any] = None):
    """Build the optax chain from an mmcv-style optimizer config.

    Args:
        optimizer_cfg: dict(type='AdamW', lr=..., weight_decay=...,
            paramwise_cfg=dict(custom_keys={...})).
        params: param pytree (for lr_mult path matching).
        lr_schedule: optional schedule overriding the scalar lr.
        grad_clip: optional dict(max_norm=..., norm_type=2).
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type', 'AdamW')
    lr = cfg.pop('lr', 1e-3)
    wd = cfg.pop('weight_decay', 0.0)
    paramwise = cfg.pop('paramwise_cfg', None) or {}
    custom_keys = paramwise.get('custom_keys', {})
    betas = cfg.pop('betas', (0.9, 0.999))
    eps = cfg.pop('eps', 1e-8)

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip['max_norm']))

    if opt_type == 'AdamW':
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if custom_keys:
            # lr_mult scales the effective group lr (adam step AND decay),
            # matching torch param groups
            chain.append(scale_updates_by_tree(
                _lr_mult_tree(params, custom_keys)))
        chain.append(optax.scale_by_learning_rate(
            lr_schedule if lr_schedule is not None else lr))
    elif opt_type == 'Adam':
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if custom_keys:
            chain.append(scale_updates_by_tree(
                _lr_mult_tree(params, custom_keys)))
        chain.append(optax.scale_by_learning_rate(
            lr_schedule if lr_schedule is not None else lr))
    elif opt_type == 'SGD':
        momentum = cfg.pop('momentum', 0.9)
        chain.append(optax.trace(decay=momentum))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_learning_rate(
            lr_schedule if lr_schedule is not None else lr))
    else:
        raise NotImplementedError(opt_type)
    return optax.chain(*chain)
