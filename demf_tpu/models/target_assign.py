"""Vectorized training-target assignment for the vote heads.

The reference computes targets with host-side per-sample python loops
(``multi_apply`` over ``get_targets_single``,
class_agnostic_vote_head.py:184-316 and :818-941) — flagged as a CPU
bottleneck in SURVEY.md §3.  Here the whole assignment is a single fused,
vmapped device computation over padded fixed-shape GT (pad + ``gt_valid``
mask), so it lives inside the jitted train step with no host sync.

Semantics replicated exactly:
  * vote targets: per point, offsets to the gravity centers of the first,
    second, and *last* (>=3rd) GT boxes containing it, in box-index order;
    unfilled slots repeat the first vote (the reference's j==0 broadcast +
    ``clamp(idx+1, max=2)`` overwrite rule);
  * proposal->GT assignment: nearest GT gravity-center (chamfer argmin);
  * objectness: positive iff within ``pos_distance_thr`` AND the proposal
    center lies inside the assigned (possibly rotated) box;
  * empty samples: a single fake zero-box with label 0 participates, exactly
    like the reference's fake-box path (ref :764-778).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as box_ops


def _vote_targets_single(points_xyz, gt_boxes, gt_valid, gt_per_seed):
    """Per-sample vote targets. points_xyz (P, 3), gt (G, 7)/(G,)."""
    in_box = box_ops.points_in_boxes(points_xyz, gt_boxes) & gt_valid[None]
    centers = box_ops.gravity_center(gt_boxes)            # (G, 3)
    g = in_box.shape[1]
    cnt_excl = jnp.cumsum(in_box, 1) - in_box              # earlier hits
    has1 = jnp.any(in_box, 1)
    first = jnp.argmax(in_box, 1)
    v_first = jnp.take(centers, first, axis=0) - points_xyz

    slots = [v_first]
    for k in range(1, gt_per_seed):
        if k < gt_per_seed - 1:
            mk = in_box & (cnt_excl == k)
        else:
            # last slot: the LAST box with >= k earlier hits (overwrite rule)
            mk = in_box & (cnt_excl >= k)
        hask = jnp.any(mk, 1)
        if k < gt_per_seed - 1:
            idxk = jnp.argmax(mk, 1)
        else:
            idxk = (g - 1) - jnp.argmax(mk[:, ::-1], 1)
        vk = jnp.take(centers, idxk, axis=0) - points_xyz
        slots.append(jnp.where(hask[:, None], vk, v_first))
    vote_targets = jnp.concatenate(slots, -1) * has1[:, None]
    return vote_targets, has1.astype(jnp.int32)


def _assign_single(gt_boxes, gt_labels, gt_valid, aggregated_points, coder,
                   pos_thr, neg_thr, num_dir_bins, half_size_inside):
    """Per-sample proposal->GT assignment and regression targets."""
    (center_t, size_t, dir_cls_t, dir_res_t, dir_t) = coder.encode(
        gt_boxes, gt_labels, ret_dir_target=True)

    d2 = jnp.sum((aggregated_points[:, None] - center_t[None]) ** 2, -1)
    d2 = jnp.where(gt_valid[None], d2, 1e10)
    assignment = jnp.argmin(d2, -1).astype(jnp.int32)
    euclid = jnp.sqrt(jnp.min(d2, -1) + 1e-6)

    objectness_masks = ((euclid < pos_thr) | (euclid > neg_thr)).astype(
        jnp.float32)

    take = lambda x: jnp.take(x, assignment, axis=0)
    center_a = take(center_t)
    size_a = take(size_t)
    dir_cls_a = take(dir_cls_t)
    dir_res_a = take(dir_res_t) / (np.pi / num_dir_bins)
    dir_a = take(dir_t)
    mask_targets = take(gt_labels).astype(jnp.int32)
    yaw_a = take(gt_boxes[:, 6])

    canonical = aggregated_points - center_a
    if coder.with_rot:
        canonical = box_ops.rotation_3d_in_axis(
            canonical[:, None], -yaw_a, axis=2)[:, 0]

    half = size_a / 2.0 if half_size_inside else size_a
    distance_targets = jnp.concatenate([
        half - canonical, half + canonical], -1)
    inside = jnp.all(distance_targets >= 0., -1)
    objectness_targets = ((euclid < pos_thr) & inside).astype(jnp.int32)

    return dict(center_targets=center_a, size_targets=size_a,
                dir_class_targets=dir_cls_a, dir_res_targets=dir_res_a,
                dir_targets=dir_a, mask_targets=mask_targets,
                objectness_targets=objectness_targets,
                objectness_masks=objectness_masks,
                distance_targets=distance_targets)


def get_vote_head_targets(points, gt_bboxes_3d, gt_labels_3d, gt_valid,
                          aggregated_points, coder, train_cfg, gt_per_seed,
                          mode='ca'):
    """Batched targets for CAVoteHead ('ca') / DeMFVoteHead ('demf').

    Args:
        points: (B, P, >=3) input clouds.
        gt_bboxes_3d: (B, G, 7) padded bottom-center boxes.
        gt_labels_3d: (B, G) int labels (zeros on padding).
        gt_valid: (B, G) bool.
        aggregated_points: (B, N, 3) proposal centers.
        coder: box coder instance.
        train_cfg: dict with pos/neg_distance_thr.
        mode: 'ca' (half-size coder output, ref :184-316) or 'demf'
              (full-size coder output + half-size inside test, ref :818-941).
    Returns:
        dict of batched target arrays incl. normalized loss weights.
    """
    # empty-GT handling: force slot 0 valid as a fake zero box with label 0
    any_valid = jnp.any(gt_valid, axis=1, keepdims=True)
    first_slot = jnp.zeros_like(gt_valid).at[:, 0].set(True)
    gt_valid = jnp.where(any_valid, gt_valid, first_slot)
    gt_bboxes_3d = jnp.where(gt_valid[..., None], gt_bboxes_3d, 0.)
    gt_labels_3d = jnp.where(gt_valid, gt_labels_3d, 0)

    vote_targets, vote_target_masks = jax.vmap(
        lambda p, b, v: _vote_targets_single(p, b, v, gt_per_seed))(
            points[..., :3], gt_bboxes_3d, gt_valid)

    half_size_inside = (mode == 'demf')
    assign = jax.vmap(
        lambda b, l, v, a: _assign_single(
            b, l, v, a, coder, train_cfg['pos_distance_thr'],
            train_cfg['neg_distance_thr'], coder.num_dir_bins,
            half_size_inside))(
        gt_bboxes_3d, gt_labels_3d, gt_valid, aggregated_points)

    if mode == 'ca':
        # FCOS-style clipped distances + centerness (ref :301-309)
        dist = jnp.clip(assign['distance_targets'], 0, None)
        assign['distance_targets'] = dist
        deltas = jnp.stack([dist[..., 0:3], dist[..., 3:6]], -1)
        nom = deltas.min(-1).prod(-1)
        den = deltas.max(-1).prod(-1) + 1e-6
        centerness = jnp.clip((nom / den + 1e-6) ** (1. / 3), 0., 1.)
        assign['centerness_targets'] = centerness

    obj_w = assign['objectness_masks']
    assign['objectness_weights'] = obj_w / (jnp.sum(obj_w) + 1e-6)
    obj_t = assign['objectness_targets'].astype(jnp.float32)
    assign['box_loss_weights'] = obj_t / (jnp.sum(obj_t) + 1e-6)
    assign['vote_targets'] = vote_targets
    assign['vote_target_masks'] = vote_target_masks
    return assign
