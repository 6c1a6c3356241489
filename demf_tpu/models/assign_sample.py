"""2D training assignment + sampling (MaxIoUAssigner / RandomSampler).

TPU-native, fixed-shape equivalents of the mmdet components the ImVoteNet
baseline's Faster R-CNN branch trains with
(configs/_base_/models/imvotenet_image.py:57-96).  mmdet's index-list
semantics become masks: the assigner returns a per-anchor code
(-2 ignore / -1 negative / >=0 gt index) and the sampler returns weight
masks drawn by random top-k, so everything runs inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_2d(a, b):
    """(A, 4) x (G, 4) xyxy IoU matrix."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area_a = jnp.clip(a[:, 2:] - a[:, :2], 0, None).prod(-1)
    area_b = jnp.clip(b[:, 2:] - b[:, :2], 0, None).prod(-1)
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter,
                            1e-7, None)


def max_iou_assign(ious, gt_valid, pos_iou_thr, neg_iou_thr, min_pos_iou=0.,
                   match_low_quality=True):
    """mmdet ``MaxIoUAssigner.assign`` on a fixed-shape IoU matrix.

    Args:
        ious: (A, G); gt_valid: (G,) bool.
    Returns:
        (A,) int32: -2 ignore (between thresholds), -1 negative, >=0 gt idx.
    """
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_iou = jnp.max(ious, axis=1)
    argmax_gt = jnp.argmax(ious, axis=1).astype(jnp.int32)

    assigned = jnp.full(ious.shape[:1], -2, jnp.int32)
    assigned = jnp.where(max_iou < neg_iou_thr, -1, assigned)
    assigned = jnp.where(max_iou >= pos_iou_thr, argmax_gt, assigned)

    if match_low_quality:
        # each gt claims the anchors achieving its best IoU (>= min_pos_iou)
        gt_best = jnp.max(ious, axis=0)                       # (G,)
        claims = (ious == gt_best[None, :]) & \
            (gt_best[None, :] >= min_pos_iou) & gt_valid[None, :]
        any_claim = jnp.any(claims, axis=1)
        # later gts override earlier (mmdet iterates gts in order)
        g = ious.shape[1]
        last_claim = (g - 1) - jnp.argmax(claims[:, ::-1], axis=1)
        assigned = jnp.where(any_claim, last_claim.astype(jnp.int32),
                             assigned)
    return assigned


def random_sample(assigned, num, pos_fraction, rng, neg_pos_ub=-1):
    """mmdet ``RandomSampler``: masks for <=num samples, pos_fraction caps
    positives, negatives fill the remainder.

    Returns:
        pos_mask (A,) bool, neg_mask (A,) bool.
    """
    a = assigned.shape[0]
    pos = assigned >= 0
    neg = assigned == -1
    num_expected_pos = min(int(num * pos_fraction), a)

    kp, kn = jax.random.split(rng)
    # random top-k with static k (scales to 100k+ RPN anchors)
    pos_key = jnp.where(pos, jax.random.uniform(kp, (a,)), -1.0)
    topv, topi = jax.lax.top_k(pos_key, num_expected_pos)
    pos_mask = jnp.zeros((a,), bool).at[topi].set(topv > 0)
    n_pos = jnp.sum(pos_mask)

    k_neg = min(num, a)
    neg_key = jnp.where(neg, jax.random.uniform(kn, (a,)), -1.0)
    topv_n, topi_n = jax.lax.top_k(neg_key, k_neg)
    take = (jnp.arange(k_neg) < (num - n_pos)) & (topv_n > 0)
    neg_mask = jnp.zeros((a,), bool).at[topi_n].set(take)
    return pos_mask, neg_mask
