"""Fixed-shape greedy NMS ops (3D aligned + 2D), device-native.

TPU-native replacement for the mmdet3d/mmcv CUDA NMS kernels
(``aligned_3d_nms`` invoked via VoteHead.multiclass_nms_single at
class_agnostic_vote_head.py:743, cfg nms_thr=0.25 at
configs/demf/demf_votenet.py:178-181; 2D ``nms`` at
configs/_base_/models/imvotenet_image.py:79,103,107).

Everything is pad+mask with static N: an O(N^2) IoU matrix plus a greedy
fori_loop sweep — no host sync, no dynamic shapes, jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _greedy_suppress(iou, scores, thresh, valid):
    """Greedy score-ordered suppression over a precomputed IoU matrix.

    Args:
        iou: (N, N) pairwise IoU (already class-masked if needed).
        scores: (N,) selection scores.
        thresh: suppression threshold (suppress when iou > thresh).
        valid: (N,) bool, invalid entries are never kept.
    Returns:
        (N,) bool keep mask in the original order.
    """
    n = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou_s = iou[order][:, order]
    valid_s = valid[order]
    pos = jnp.arange(n)

    def body(i, keep):
        k = keep[i]
        sup = (iou_s[i] > thresh) & (pos > i)
        return keep & ~(k & sup)

    keep_s = jax.lax.fori_loop(0, n, body, valid_s)
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_s)
    return keep


def aligned_3d_nms(boxes, scores, classes, thresh, valid=None):
    """Axis-aligned 3D NMS with same-class-only suppression.

    Matches mmdet3d ``aligned_3d_nms``: boxes (N, 6) as
    (x1, y1, z1, x2, y2, z2); boxes of different classes never suppress each
    other.

    Returns:
        (N,) bool keep mask.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    lt = jnp.maximum(boxes[:, None, :3], boxes[None, :, :3])
    rb = jnp.minimum(boxes[:, None, 3:], boxes[None, :, 3:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    vol = jnp.clip(boxes[:, 3:] - boxes[:, :3], 0, None).prod(-1)
    iou = inter / jnp.clip(vol[:, None] + vol[None, :] - inter, 1e-8, None)
    iou = iou * (classes[:, None] == classes[None, :])
    return _greedy_suppress(iou, scores, thresh, valid)


def nms_2d(boxes, scores, thresh, valid=None):
    """Classic 2D NMS over (N, 4) xyxy boxes. Returns (N,) bool keep mask."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if n > _MATRIX_NMS_MAX:
        return _greedy_suppress_rowwise_2d(boxes, scores, None, thresh,
                                           valid)
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area = jnp.clip(boxes[:, 2:] - boxes[:, :2], 0, None).prod(-1)
    iou = inter / jnp.clip(area[:, None] + area[None, :] - inter, 1e-8, None)
    return _greedy_suppress(iou, scores, thresh, valid)


def _greedy_suppress_rowwise_2d(boxes, scores, idxs, thresh, valid):
    """Greedy 2D NMS with O(N) memory: the IoU ROW of the current pivot
    is computed inside the loop body instead of materializing the (N, N)
    matrix — required at RPN-proposal scale (5 levels x nms_pre=2000 =
    10k candidates would need a 400 MB matrix per image; the row form
    peaks at one (N, 4) buffer)."""
    n = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    bx = boxes[order]
    ids = idxs[order] if idxs is not None else None
    valid_s = valid[order]
    area = jnp.clip(bx[:, 2:] - bx[:, :2], 0, None).prod(-1)
    pos = jnp.arange(n)

    def body(i, keep):
        piv = bx[i]
        lt = jnp.maximum(bx[:, :2], piv[:2])
        rb = jnp.minimum(bx[:, 2:], piv[2:])
        inter = jnp.clip(rb - lt, 0, None).prod(-1)
        piv_area = jnp.clip(piv[2:] - piv[:2], 0, None).prod(-1)
        iou = inter / jnp.clip(area + piv_area - inter, 1e-8, None)
        if ids is not None:
            iou = jnp.where(ids == ids[i], iou, 0.0)
        sup = (iou > thresh) & (pos > i)
        return keep & ~(keep[i] & sup)

    keep_s = jax.lax.fori_loop(0, n, body, valid_s)
    return jnp.zeros((n,), bool).at[order].set(keep_s)


# above this candidate count the (N, N) IoU matrix becomes the memory
# bottleneck and the row-wise loop takes over
_MATRIX_NMS_MAX = 4096


def batched_nms_2d(boxes, scores, idxs, thresh, valid=None):
    """Category-separated 2D NMS (boxes of different idxs never interact)."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if n > _MATRIX_NMS_MAX:
        return _greedy_suppress_rowwise_2d(boxes, scores, idxs, thresh,
                                           valid)
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area = jnp.clip(boxes[:, 2:] - boxes[:, :2], 0, None).prod(-1)
    iou = inter / jnp.clip(area[:, None] + area[None, :] - inter, 1e-8, None)
    iou = iou * (idxs[:, None] == idxs[None, :])
    return _greedy_suppress(iou, scores, thresh, valid)
