"""Golden-value test: vectorized target assignment vs a direct numpy
transcription of the reference's per-sample loops
(class_agnostic_vote_head.py:818-941, DeMF variant)."""
import numpy as np
import jax.numpy as jnp

from demf_tpu.core.coders import DeMFClassAgnosticBBoxCoder
from demf_tpu.models.target_assign import get_vote_head_targets


def _np_rot_neg_yaw(p, yaw):
    """rotation_3d_in_axis(p[None], -yaw, axis=2) for a single point."""
    c, s = np.cos(-yaw), np.sin(-yaw)
    return np.array([p[0] * c + p[1] * s, -p[0] * s + p[1] * c, p[2]])


def _np_in_box(points, box):
    """points_in_boxes with the corners-consistent convention."""
    cx, cy, cz = box[0], box[1], box[2] + box[5] / 2
    sx, sy, sz = points[:, 0] - cx, points[:, 1] - cy, points[:, 2] - cz
    c, s = np.cos(box[6]), np.sin(box[6])
    lx = sx * c - sy * s
    ly = sx * s + sy * c
    return ((np.abs(lx) <= box[3] / 2 + 1e-6) &
            (np.abs(ly) <= box[4] / 2 + 1e-6) &
            (np.abs(sz) <= box[5] / 2 + 1e-6))


def _np_targets_single(points, boxes, labels, agg, pos_thr, neg_thr,
                       num_dir_bins=12, gt_per_seed=3):
    npts = len(points)
    # --- vote targets (reference loop semantics) -----------------------
    vote_targets = np.zeros((npts, 3 * gt_per_seed), np.float32)
    vote_mask = np.zeros(npts, np.int64)
    vote_idx = np.zeros(npts, np.int64)
    centers = np.concatenate(
        [boxes[:, :2], boxes[:, 2:3] + boxes[:, 5:6] / 2], -1)
    for i in range(len(boxes)):
        inds = np.where(_np_in_box(points, boxes[i]))[0]
        vote_mask[inds] = 1
        votes = centers[i][None] - points[inds, :3]
        for j in range(gt_per_seed):
            col = inds[vote_idx[inds] == j]
            v = centers[i][None] - points[col, :3]
            vote_targets[col, j * 3:j * 3 + 3] = v
            if j == 0:
                vote_targets[col] = np.tile(v, (1, gt_per_seed))
        vote_idx[inds] = np.clip(vote_idx[inds] + 1, None, 2)

    # --- assignment ------------------------------------------------------
    d2 = np.sum((agg[:, None] - centers[None]) ** 2, -1)
    assignment = np.argmin(d2, -1)
    euclid = np.sqrt(d2.min(-1) + 1e-6)
    obj_mask = ((euclid < pos_thr) | (euclid > neg_thr)).astype(np.float32)

    center_t = centers[assignment]
    size_t = boxes[assignment, 3:6]
    yaw = boxes[assignment, 6]
    # angle2class
    ang = boxes[:, 6] % (2 * np.pi)
    per = 2 * np.pi / num_dir_bins
    shifted = (ang + per / 2) % (2 * np.pi)
    dir_cls = (shifted // per).astype(np.int64)[assignment]
    # the reference normalizes residuals by pi/num_dir_bins (half a bin
    # period), class_agnostic_vote_head.py:898
    dir_res = (shifted - ((shifted // per) * per + per / 2))[assignment] / (
        np.pi / num_dir_bins)

    canonical = np.stack([_np_rot_neg_yaw(agg[k] - center_t[k], yaw[k])
                          for k in range(len(agg))])
    half = size_t / 2
    dist = np.concatenate([half - canonical, half + canonical], -1)
    inside = (dist >= 0).all(-1)
    obj_t = ((euclid < pos_thr) & inside).astype(np.int64)
    return dict(vote_targets=vote_targets, vote_mask=vote_mask,
                assignment=assignment, center=center_t, size=size_t,
                dir_cls=dir_cls, dir_res=dir_res, obj=obj_t,
                obj_mask=obj_mask, labels=labels[assignment])


def test_demf_targets_match_reference_transcription():
    rng = np.random.RandomState(0)
    P, G, N = 300, 7, 24
    points = (rng.rand(P, 4) * 6 - 3).astype(np.float32)
    boxes = np.zeros((G, 7), np.float32)
    boxes[:, :3] = rng.rand(G, 3) * 3 - 1.5
    boxes[:, 3:6] = rng.rand(G, 3) * 1.5 + 0.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, G)
    labels = rng.randint(0, 10, G)
    agg = (rng.rand(N, 3) * 4 - 2).astype(np.float32)
    # put some proposals exactly near centers so positives exist
    agg[:4] = boxes[:4, :3] + [0, 0, 0.2]

    coder = DeMFClassAgnosticBBoxCoder(num_dir_bins=12, with_rot=True)
    got = get_vote_head_targets(
        jnp.asarray(points)[None], jnp.asarray(boxes)[None],
        jnp.asarray(labels)[None], jnp.ones((1, G), bool),
        jnp.asarray(agg)[None], coder,
        dict(pos_distance_thr=0.3, neg_distance_thr=0.6), 3, mode='demf')

    ref = _np_targets_single(points, boxes, labels, agg, 0.3, 0.6)

    np.testing.assert_array_equal(
        np.asarray(got['vote_target_masks'])[0], ref['vote_mask'])
    np.testing.assert_allclose(
        np.asarray(got['vote_targets'])[0], ref['vote_targets'], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got['center_targets'])[0], ref['center'], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got['size_targets'])[0], ref['size'], atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got['dir_class_targets'])[0], ref['dir_cls'])
    np.testing.assert_allclose(
        np.asarray(got['dir_res_targets'])[0], ref['dir_res'], atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(got['objectness_targets'])[0], ref['obj'])
    np.testing.assert_allclose(
        np.asarray(got['objectness_masks'])[0], ref['obj_mask'], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got['mask_targets'])[0], ref['labels'])
    assert ref['obj'].sum() >= 2  # some planted positives made it through
