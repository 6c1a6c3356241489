"""Loss functions with mmdet weighting semantics, pure JAX.

Replicates the loss calculus the reference configures
(configs/demf/demf_votenet.py:116-141, configs/deformdetr/
imvotenet_image.py:65-72): every loss is elementwise, multiplied by a
caller-provided ``weight`` tensor, reduced (sum/mean/none) and scaled by
``loss_weight``.  The reference normalizes weights globally *before* the sum
reduction, which makes the sum batch-size invariant — we keep that contract.

Losses are registered as factory classes returning callables so configs with
``type='SmoothL1Loss'`` etc. port verbatim.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import LOSSES


def _reduce(loss, reduction):
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return jnp.sum(loss)
    if reduction == 'mean':
        return jnp.mean(loss)
    raise ValueError(reduction)


def weight_reduce_loss(loss, weight=None, reduction='mean', avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return _reduce(loss, reduction)
    if reduction == 'mean':
        return jnp.sum(loss) / avg_factor
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor only supported with mean/none reduction')


@LOSSES.register_module()
class CrossEntropyLoss:
    """Softmax CE over logits with optional per-class weights.

    ``pred`` is (..., num_classes) logits, ``label`` integer targets.
    (The reference passes (B, C, N)-transposed preds; we take class-last.)
    """

    def __init__(self, use_sigmoid=False, class_weight=None, reduction='mean',
                 loss_weight=1.0):
        self.use_sigmoid = use_sigmoid
        self.class_weight = (np.asarray(class_weight, np.float32)
                             if class_weight is not None else None)
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, label, weight=None, avg_factor=None):
        if self.use_sigmoid:
            label_oh = jax.nn.one_hot(label, pred.shape[-1],
                                      dtype=pred.dtype)
            loss = optax_sigmoid_ce(pred, label_oh).sum(-1)
        else:
            logp = jax.nn.log_softmax(pred, -1)
            loss = -jnp.take_along_axis(logp, label[..., None], -1)[..., 0]
            if self.class_weight is not None:
                cw = jnp.asarray(self.class_weight, pred.dtype)
                loss = loss * cw[label]
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction='mean', loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        diff = jnp.abs(pred - target)
        if self.beta <= 0:
            loss = diff
        else:
            loss = jnp.where(diff < self.beta,
                             0.5 * diff * diff / self.beta,
                             diff - 0.5 * self.beta)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * weight_reduce_loss(
            jnp.abs(pred - target), weight, self.reduction, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    """Sigmoid focal loss (mmdet semantics, used by DeformableDETRHead)."""

    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction='mean', loss_weight=1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        """pred: (N, C) logits; target: (N,) int labels where label == C
        means background (mmdet convention)."""
        num_classes = pred.shape[-1]
        t = jax.nn.one_hot(target, num_classes, dtype=pred.dtype)
        p = jax.nn.sigmoid(pred)
        ce = optax_sigmoid_ce(pred, t)
        pt = p * t + (1 - p) * (1 - t)
        alpha_t = self.alpha * t + (1 - self.alpha) * (1 - t)
        loss = alpha_t * ((1 - pt) ** self.gamma) * ce
        if weight is not None and weight.ndim == 1:
            weight = weight[:, None]
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class AxisAlignedIoULoss:
    """1 - IoU of axis-aligned 3D corner boxes (x1y1z1x2y2z2)."""

    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        lt = jnp.maximum(pred[..., :3], target[..., :3])
        rb = jnp.minimum(pred[..., 3:], target[..., 3:])
        inter = jnp.clip(rb - lt, 0, None).prod(-1)
        vol_p = jnp.clip(pred[..., 3:] - pred[..., :3], 0, None).prod(-1)
        vol_t = jnp.clip(target[..., 3:] - target[..., :3], 0, None).prod(-1)
        iou = inter / jnp.clip(vol_p + vol_t - inter, 1e-8, None)
        return self.loss_weight * weight_reduce_loss(
            1.0 - iou, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class GIoULoss:
    """Generalized IoU loss over (N, 4) xyxy 2D boxes."""

    def __init__(self, reduction='mean', loss_weight=1.0, eps=1e-7):
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.eps = eps

    def __call__(self, pred, target, weight=None, avg_factor=None):
        lt = jnp.maximum(pred[..., :2], target[..., :2])
        rb = jnp.minimum(pred[..., 2:], target[..., 2:])
        inter = jnp.clip(rb - lt, 0, None).prod(-1)
        area_p = jnp.clip(pred[..., 2:] - pred[..., :2], 0, None).prod(-1)
        area_t = jnp.clip(target[..., 2:] - target[..., :2], 0, None).prod(-1)
        union = area_p + area_t - inter + self.eps
        iou = inter / union
        elt = jnp.minimum(pred[..., :2], target[..., :2])
        erb = jnp.maximum(pred[..., 2:], target[..., 2:])
        enclose = jnp.clip(erb - elt, 0, None).prod(-1) + self.eps
        giou = iou - (enclose - union) / enclose
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        return self.loss_weight * weight_reduce_loss(
            1.0 - giou, weight, self.reduction, avg_factor)


def chamfer_distance(src, dst, src_weight=1.0, dst_weight=1.0, mode='l2',
                     dst_valid=None):
    """Pairwise min-distance assignment (mmdet3d ``chamfer_distance``).

    The reference uses this both as a loss and as the proposal->GT assigner
    (class_agnostic_vote_head.py:248,882).

    Args:
        src: (B, N, C), dst: (B, M, C).
        dst_valid: optional (B, M) bool; invalid dst never gets assigned.
    Returns:
        (loss_src (B, N), loss_dst (B, M), indices1 (B, N), indices2 (B, M))
    """
    diff = src[:, :, None, :] - dst[:, None, :, :]
    if mode == 'l2':
        distance = jnp.sum(diff * diff, -1)
    elif mode == 'l1':
        distance = jnp.sum(jnp.abs(diff), -1)
    elif mode == 'smooth_l1':
        d = jnp.abs(diff)
        distance = jnp.sum(
            jnp.where(d < 1.0, 0.5 * d * d, d - 0.5), -1)
    else:
        raise ValueError(mode)
    if dst_valid is not None:
        distance = jnp.where(dst_valid[:, None, :], distance, 1e10)
    src2dst = jnp.min(distance, -1)
    indices1 = jnp.argmin(distance, -1).astype(jnp.int32)
    dst2src = jnp.min(distance, -2)
    indices2 = jnp.argmin(distance, -2).astype(jnp.int32)
    return (src2dst * src_weight, dst2src * dst_weight, indices1, indices2)


@LOSSES.register_module()
class ChamferDistance:
    def __init__(self, mode='l2', reduction='mean', loss_src_weight=1.0,
                 loss_dst_weight=1.0):
        self.mode = mode
        self.reduction = reduction
        self.loss_src_weight = loss_src_weight
        self.loss_dst_weight = loss_dst_weight

    def __call__(self, src, dst, src_weight=1.0, dst_weight=1.0,
                 dst_valid=None, return_indices=False):
        ls, ld, i1, i2 = chamfer_distance(
            src, dst, src_weight, dst_weight, self.mode, dst_valid)
        ls = ls * self.loss_src_weight
        ld = ld * self.loss_dst_weight
        if self.reduction == 'sum':
            ls, ld = jnp.sum(ls), jnp.sum(ld)
        elif self.reduction == 'mean':
            ls, ld = jnp.mean(ls), jnp.mean(ld)
        if return_indices:
            return ls, ld, i1, i2
        return ls, ld
