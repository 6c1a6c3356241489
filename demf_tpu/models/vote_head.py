"""Class-agnostic vote head (CAVoteHead) — proposal generation + losses.

TPU-native re-design of the reference head
(/root/reference/demf/modeling/heads/class_agnostic_vote_head.py:24-332):
vote -> aggregate -> shared conv head -> face-distance box regression, with
chamfer proposal->GT assignment and FCOS-style distance targets.  All target
math is vectorized in ``target_assign.py``; inference decoding is fixed-shape
(pad + valid mask) through ``multiclass_nms_3d``.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import boxes as box_ops
from ..ops.nms import aligned_3d_nms
from ..ops.sampling import furthest_point_sample
from ..utils.registry import HEADS, build_bbox_coder, build_loss
from .conv_bbox_head import BaseConvBboxHead
from .pointnet2 import PointSAModule
from .target_assign import get_vote_head_targets
from .vote_module import VoteModule


def multiclass_nms_3d(obj_scores, sem_scores, bbox3d, points, test_cfg):
    """Fixed-shape multiclass 3D NMS (mmdet3d VoteHead.multiclass_nms_single
    semantics, invoked by the reference at class_agnostic_vote_head.py:743).

    Args:
        obj_scores: (B, N) objectness probabilities.
        sem_scores: (B, N, C) semantic probabilities.
        bbox3d: (B, N, 7) gravity-center boxes.
        points: (B, P, >=3) input clouds (for the nonempty-box test).
        test_cfg: dict with nms_thr / score_thr / per_class_proposal.
    Returns:
        dict of padded results: boxes (B, K, 7), scores (B, K),
        labels (B, K), valid (B, K) with K = N * C (per-class proposal) or N.
    """
    nms_thr = test_cfg['nms_thr']
    score_thr = test_cfg['score_thr']
    per_class = test_cfg.get('per_class_proposal', False)

    def single(obj, sem, boxes, pts):
        n, c = sem.shape
        bottom = boxes.at[..., 2].add(-boxes[..., 5] / 2.)
        in_box = box_ops.points_in_boxes(pts[:, :3], bottom)   # (P, N)
        nonempty = jnp.sum(in_box, 0) > 5
        minmax = box_ops.corners_minmax(bottom)
        classes = jnp.argmax(sem, -1)
        keep = aligned_3d_nms(minmax, obj, classes, nms_thr, valid=nonempty)
        selected = keep & (obj > score_thr)
        if per_class:
            out_boxes = jnp.tile(boxes, (c, 1))                 # (C*N, 7)
            out_scores = (obj[None, :] * sem.T).reshape(-1)     # (C*N,)
            out_labels = jnp.repeat(jnp.arange(c), n)
            out_valid = jnp.tile(selected, (c,))
        else:
            out_boxes = boxes
            out_scores = obj * jnp.take_along_axis(
                sem, classes[:, None], -1)[:, 0]
            out_labels = classes
            out_valid = selected
        return out_boxes, out_scores, out_labels, out_valid

    boxes, scores, labels, valid = jax.vmap(single)(
        obj_scores, sem_scores, bbox3d, points)
    return dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels,
                valid=valid)


@HEADS.register_module()
class CAVoteHead(nn.Module):
    """Class-agnostic VoteNet head (reference CAVoteHead)."""
    num_classes: int = 10
    bbox_coder: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    vote_module_cfg: Any = None
    vote_aggregation_cfg: Any = None
    pred_layer_cfg: Any = None
    conv_cfg: Any = None
    norm_cfg: Any = None
    objectness_loss: Any = None
    center_loss: Any = None
    dir_class_loss: Any = None
    dir_res_loss: Any = None
    size_class_loss: Any = None
    size_res_loss: Any = None
    semantic_loss: Any = None
    iou_loss: Any = None

    @property
    def coder(self):
        return build_bbox_coder(self.bbox_coder)

    @property
    def gt_per_seed(self):
        return self.vote_module_cfg['gt_per_seed']

    @property
    def num_proposal(self):
        return self.vote_aggregation_cfg['num_point']

    @property
    def with_semantic(self):
        return self.semantic_loss is not None

    def _cls_out_channels(self):
        return self.num_classes + 2 if self.with_semantic else 2

    def _reg_out_channels(self):
        return 6 + self.bbox_coder['num_dir_bins'] * 2

    # -- forward -----------------------------------------------------------
    def _vote_and_aggregate(self, feat_dict, sample_mod, train):
        seed_points = feat_dict['seed_points']
        seed_features = feat_dict['seed_features']
        seed_indices = feat_dict['seed_indices']

        vm = VoteModule(**self.vote_module_cfg, name='vote_module')
        vote_points, vote_features, vote_offset = vm(
            seed_points, seed_features, train)
        results = dict(seed_points=seed_points, seed_indices=seed_indices,
                       vote_points=vote_points, vote_features=vote_features,
                       vote_offset=vote_offset)

        agg = dict(self.vote_aggregation_cfg)
        agg.pop('type', None)
        sa = PointSAModule(
            mlp_channels=list(agg['mlp_channels']),
            num_point=agg['num_point'], radius=agg['radius'],
            num_sample=agg['num_sample'], use_xyz=agg.get('use_xyz', True),
            normalize_xyz=agg.get('normalize_xyz', False),
            ball_query_exact=agg.get('ball_query_exact', False),
            name='vote_aggregation')

        if sample_mod == 'vote':
            new_xyz, feats, _ = sa(vote_points, vote_features, train=train)
        elif sample_mod == 'seed':
            idx = furthest_point_sample(seed_points, self.num_proposal)
            new_xyz, feats, _ = sa(vote_points, vote_features, indices=idx,
                                   train=train)
        elif sample_mod == 'random':
            b, n = seed_points.shape[:2]
            idx = jax.random.randint(
                self.make_rng('sample'), (b, self.num_proposal), 0, n,
                dtype=jnp.int32)
            new_xyz, feats, _ = sa(vote_points, vote_features, indices=idx,
                                   train=train)
        elif sample_mod == 'spec':
            new_xyz, feats, _ = sa(seed_points, seed_features,
                                   target_xyz=vote_points, train=train)
        else:
            raise NotImplementedError(
                f'Sample mode {sample_mod} is not supported!')
        results['aggregated_points'] = new_xyz
        return results, feats

    @nn.compact
    def __call__(self, feat_dict, sample_mod, train: bool = False):
        results, feats = self._vote_and_aggregate(feat_dict, sample_mod,
                                                  train)
        head = BaseConvBboxHead(
            **self.pred_layer_cfg,
            num_cls_out_channels=self._cls_out_channels(),
            num_reg_out_channels=self._reg_out_channels(),
            name='conv_pred')
        cls_pred, reg_pred = head(feats, train)
        decode_res = self.coder.split_pred(
            jnp.swapaxes(cls_pred, 1, 2), jnp.swapaxes(reg_pred, 1, 2),
            results['aggregated_points'])
        results.update(decode_res)
        return results

    # -- loss ----------------------------------------------------------------
    def loss(self, results, points, gt_bboxes_3d, gt_labels_3d, gt_valid):
        """Reference CAVoteHead.loss (ref :39-121), fully vectorized."""
        coder = self.coder
        tcfg = self.train_cfg
        targets = get_vote_head_targets(
            points, gt_bboxes_3d, gt_labels_3d, gt_valid,
            results['aggregated_points'], coder, tcfg, self.gt_per_seed,
            mode='ca')

        vm = VoteModule(**self.vote_module_cfg, parent=None)
        losses = {}
        losses['vote_loss'] = vm.get_loss(
            results['seed_points'], results['vote_points'],
            results['seed_indices'], targets['vote_target_masks'],
            targets['vote_targets'])

        losses['objectness_loss'] = build_loss(self.objectness_loss)(
            results['obj_scores'], targets['objectness_targets'],
            weight=targets['objectness_weights'])

        blw = targets['box_loss_weights']
        losses['size_res_loss'] = build_loss(self.size_res_loss)(
            results['distance'], targets['distance_targets'],
            weight=blw[..., None])

        losses['dir_class_loss'] = build_loss(self.dir_class_loss)(
            results['dir_class'], targets['dir_class_targets'], weight=blw)

        dir_res_norm = jnp.take_along_axis(
            results['dir_res_norm'],
            targets['dir_class_targets'][..., None], -1)[..., 0]
        losses['dir_res_loss'] = build_loss(self.dir_res_loss)(
            dir_res_norm, targets['dir_res_targets'], weight=blw)

        if self.with_semantic:
            losses['semantic_loss'] = build_loss(self.semantic_loss)(
                results['sem_scores'], targets['mask_targets'], weight=blw)

        if self.iou_loss is not None:
            corners_pred = coder.decode_corners(
                results['distance'], results['ref_points'])
            corners_target = coder.decode_corners(
                targets['distance_targets'], results['ref_points'])
            losses['iou_loss'] = build_loss(self.iou_loss)(
                corners_pred, corners_target, weight=blw)
        return losses

    # -- inference -----------------------------------------------------------
    def get_bboxes(self, points, results):
        obj_scores = jax.nn.softmax(results['obj_scores'], -1)[..., -1]
        sem_scores = jax.nn.softmax(results['sem_scores'], -1)
        bbox3d = self.coder.decode(results)
        return multiclass_nms_3d(obj_scores, sem_scores, bbox3d, points,
                                 self.test_cfg)


@HEADS.register_module()
class VoteHead(CAVoteHead):
    """Standard VoteNet head (mmdet3d ``VoteHead``).

    The parent class of the reference's heads (class_agnostic_vote_head.py:9,
    25; configured at configs/_base_/models/votenet.py): per-class mean-size
    regression (PartialBinBasedBBoxCoder), chamfer center loss (both
    directions), size class + normalized size residual losses, and
    distance-only objectness (no inside-box test).
    """

    def _cls_out_channels(self):
        return self.num_classes + 2

    def _reg_out_channels(self):
        nb = self.bbox_coder['num_dir_bins']
        ns = self.bbox_coder['num_sizes']
        return 3 + nb * 2 + ns * 4

    def loss(self, results, points, gt_bboxes_3d, gt_labels_3d, gt_valid):
        import numpy as np
        from .target_assign import _vote_targets_single
        from .losses import chamfer_distance

        coder = self.coder
        tcfg = self.train_cfg
        aggregated_points = results['aggregated_points']

        # empty-GT handling (fake zero box with label 0, ref :764-778)
        any_valid = jnp.any(gt_valid, axis=1, keepdims=True)
        first_slot = jnp.zeros_like(gt_valid).at[:, 0].set(True)
        gt_valid = jnp.where(any_valid, gt_valid, first_slot)
        gt_bboxes_3d = jnp.where(gt_valid[..., None], gt_bboxes_3d, 0.)
        gt_labels_3d = jnp.where(gt_valid, gt_labels_3d, 0)

        vote_targets, vote_target_masks = jax.vmap(
            lambda p, b, v: _vote_targets_single(p, b, v,
                                                 self.gt_per_seed))(
            points[..., :3], gt_bboxes_3d, gt_valid)

        (center_t, size_cls_t, size_res_t, dir_cls_t,
         dir_res_t) = coder.encode(gt_bboxes_3d, gt_labels_3d)

        d2 = jnp.sum(
            (aggregated_points[:, :, None] - center_t[:, None]) ** 2, -1)
        d2 = jnp.where(gt_valid[:, None, :], d2, 1e10)
        assignment = jnp.argmin(d2, -1)
        euclid = jnp.sqrt(jnp.min(d2, -1) + 1e-6)

        objectness_targets = (euclid < tcfg['pos_distance_thr']).astype(
            jnp.int32)
        objectness_masks = ((euclid < tcfg['pos_distance_thr']) |
                            (euclid > tcfg['neg_distance_thr'])).astype(
            jnp.float32)
        obj_w = objectness_masks / (jnp.sum(objectness_masks) + 1e-6)
        blw = objectness_targets.astype(jnp.float32)
        blw = blw / (jnp.sum(blw) + 1e-6)

        gather = lambda x: jnp.take_along_axis(
            x, assignment[..., None] if x.ndim == 3 else assignment, axis=1)
        center_a = jnp.take_along_axis(
            center_t, assignment[..., None], axis=1)
        size_cls_a = jnp.take_along_axis(size_cls_t, assignment, axis=1)
        size_res_a = jnp.take_along_axis(
            size_res_t, assignment[..., None], axis=1)
        dir_cls_a = jnp.take_along_axis(dir_cls_t, assignment, axis=1)
        dir_res_a = jnp.take_along_axis(dir_res_t, assignment, axis=1) / (
            np.pi / coder.num_dir_bins)
        mask_targets = jnp.take_along_axis(gt_labels_3d, assignment, axis=1)

        vm = VoteModule(**self.vote_module_cfg, parent=None)
        losses = {}
        losses['vote_loss'] = vm.get_loss(
            results['seed_points'], results['vote_points'],
            results['seed_indices'], vote_target_masks, vote_targets)

        losses['objectness_loss'] = build_loss(self.objectness_loss)(
            results['obj_scores'], objectness_targets, weight=obj_w)

        # chamfer center loss (both directions, ref VoteNet semantics)
        valid_w = gt_valid.astype(jnp.float32)
        valid_w = valid_w / (jnp.sum(valid_w) + 1e-6)
        ccfg = dict(self.center_loss)
        src2dst, dst2src, _, _ = chamfer_distance(
            results['center'], center_t, mode=ccfg.get('mode', 'l2'),
            dst_valid=gt_valid)
        losses['center_loss'] = (
            jnp.sum(src2dst * blw) * ccfg.get('loss_src_weight', 1.0) +
            jnp.sum(jnp.where(gt_valid, dst2src, 0.) * valid_w) *
            ccfg.get('loss_dst_weight', 1.0))

        losses['dir_class_loss'] = build_loss(self.dir_class_loss)(
            results['dir_class'], dir_cls_a, weight=blw)
        dir_res_norm = jnp.take_along_axis(
            results['dir_res_norm'], dir_cls_a[..., None], -1)[..., 0]
        losses['dir_res_loss'] = build_loss(self.dir_res_loss)(
            dir_res_norm, dir_res_a, weight=blw)

        losses['size_class_loss'] = build_loss(self.size_class_loss)(
            results['size_class'], size_cls_a, weight=blw)
        size_res_norm_pred = jnp.take_along_axis(
            results['size_res_norm'],
            size_cls_a[..., None, None].repeat(3, -1), -2)[..., 0, :]
        mean = jnp.asarray(coder.mean_sizes)[size_cls_a]
        size_res_target_norm = size_res_a / jnp.clip(mean, 1e-6, None)
        losses['size_res_loss'] = build_loss(self.size_res_loss)(
            size_res_norm_pred, size_res_target_norm,
            weight=blw[..., None])

        losses['semantic_loss'] = build_loss(self.semantic_loss)(
            results['sem_scores'], mask_targets, weight=blw)
        return losses
