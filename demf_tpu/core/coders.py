"""Box codecs: ClassAgnosticBBoxCoder / DeMFClassAgnosticBBoxCoder.

Functional JAX re-design of the reference coders
(/root/reference/demf/core/bbox/coders/class_agnostic_bbox_coder.py:8-251).
Coders hold only static hyper-parameters, so instances are safe to close over
inside jitted functions.  All methods are batched (leading batch dims) and
fixed-shape.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.registry import BBOX_CODERS
from . import boxes as box_ops


@BBOX_CODERS.register_module()
class ClassAgnosticBBoxCoder:
    """Face-distance box codec for CAVoteHead.

    Raw regression layout (split_pred, ref :88-127): 6 exp()'d face distances,
    ``num_dir_bins`` direction-class logits, ``num_dir_bins`` normalized
    direction residuals.  Classification layout: 2 objectness (+ semantic
    logits when present).
    """

    def __init__(self, num_dir_bins, with_rot=True, num_sizes=0,
                 mean_sizes=None, **kwargs):
        self.num_dir_bins = num_dir_bins
        self.with_rot = with_rot
        self.num_sizes = num_sizes
        self.mean_sizes = np.asarray(mean_sizes) if mean_sizes else None

    # -- encode ------------------------------------------------------------
    def encode(self, gt_bboxes_3d, gt_labels_3d, ret_dir_target=False):
        """GT boxes (..., 7) -> (center, half-dims, dir_class, dir_res[, dir]).

        Mirrors ref :16-40 (half dims; DeMF variant overrides with full dims).
        """
        center_target = box_ops.gravity_center(gt_bboxes_3d)
        size_res_target = gt_bboxes_3d[..., 3:6] / 2
        yaw = gt_bboxes_3d[..., 6]
        if self.with_rot:
            dir_class_target, dir_res_target = box_ops.angle2class(
                yaw, self.num_dir_bins)
            dir_target = yaw
        else:
            dir_class_target = jnp.zeros(yaw.shape, jnp.int32)
            dir_res_target = jnp.zeros_like(yaw)
            dir_target = jnp.zeros_like(yaw)
        if ret_dir_target:
            return (center_target, size_res_target, dir_class_target,
                    dir_res_target, dir_target)
        return (center_target, size_res_target, dir_class_target,
                dir_res_target)

    # -- decode ------------------------------------------------------------
    def _decode_angle(self, bbox_out):
        dir_class = jnp.argmax(bbox_out['dir_class'], -1)
        dir_res = jnp.take_along_axis(
            bbox_out['dir_res'], dir_class[..., None], axis=-1)[..., 0]
        dir_angle = box_ops.class2angle(dir_class, dir_res, self.num_dir_bins)
        return dir_angle % (2 * np.pi)

    def decode(self, bbox_out, mode='rpn'):
        """Face distances + ref points -> (B, N, 7) boxes (ref :42-86)."""
        distance = bbox_out['distance']  # (B, N, 6)
        if self.with_rot:
            dir_angle = self._decode_angle(bbox_out)[..., None]
        else:
            dir_angle = jnp.zeros(distance.shape[:-1] + (1,), distance.dtype)

        bbox_size = jnp.clip(distance[..., 0:3] + distance[..., 3:6],
                             0.1, None)
        canonical_xyz = (distance[..., 3:6] - distance[..., 0:3]) / 2
        shape = canonical_xyz.shape
        canonical_xyz = box_ops.rotation_3d_in_axis(
            canonical_xyz.reshape(-1, 1, 3), dir_angle.reshape(-1),
            axis=2).reshape(shape)
        center = bbox_out['ref_points'] - canonical_xyz
        return jnp.concatenate([center, bbox_size, dir_angle], -1)

    def split_pred(self, cls_preds, reg_preds, ref_points):
        """Slice raw conv outputs into named fields (ref :88-127).

        Args:
            cls_preds: (B, C_cls, N) raw classification conv output.
            reg_preds: (B, C_reg, N) raw regression conv output.
            ref_points: (B, N, 3) aggregated points.
        """
        cls_t = jnp.swapaxes(cls_preds, -1, -2)   # (B, N, C_cls)
        reg_t = jnp.swapaxes(reg_preds, -1, -2)   # (B, N, C_reg)
        results = {}
        nb = self.num_dir_bins
        results['distance'] = jnp.exp(reg_t[..., 0:6])
        results['dir_class'] = reg_t[..., 6:6 + nb]
        dir_res_norm = reg_t[..., 6 + nb:6 + 2 * nb]
        results['dir_res_norm'] = dir_res_norm
        results['dir_res'] = dir_res_norm * (np.pi / nb)
        results['obj_scores'] = cls_t[..., 0:2]
        if cls_t.shape[-1] > 2:
            results['sem_scores'] = cls_t[..., 2:]
        results['ref_points'] = ref_points
        return results

    def decode_corners(self, distance, ref_points):
        """(B, N, 6) min/max corners from face distances (ref :129-137)."""
        corner1 = ref_points - distance[..., 3:6]
        corner2 = ref_points + distance[..., 0:3]
        return jnp.concatenate([corner1, corner2], -1)


@BBOX_CODERS.register_module()
class PartialBinBasedBBoxCoder:
    """Classic VoteNet codec: per-class mean sizes + binned directions.

    The parent class of the reference coders (mmdet3d
    ``PartialBinBasedBBoxCoder``, subclassed at
    class_agnostic_bbox_coder.py:9); used directly by the standard
    ``VoteHead`` (configs/_base_/models/votenet.py).
    """

    def __init__(self, num_dir_bins, num_sizes, mean_sizes, with_rot=True,
                 **kwargs):
        self.num_dir_bins = num_dir_bins
        self.num_sizes = num_sizes
        self.mean_sizes = np.asarray(mean_sizes, np.float32)
        self.with_rot = with_rot

    def encode(self, gt_bboxes_3d, gt_labels_3d):
        center_target = box_ops.gravity_center(gt_bboxes_3d)
        size_class_target = gt_labels_3d
        mean = jnp.asarray(self.mean_sizes)[gt_labels_3d]
        size_res_target = gt_bboxes_3d[..., 3:6] - mean
        yaw = gt_bboxes_3d[..., 6]
        if self.with_rot:
            dir_class_target, dir_res_target = box_ops.angle2class(
                yaw, self.num_dir_bins)
        else:
            dir_class_target = jnp.zeros(yaw.shape, jnp.int32)
            dir_res_target = jnp.zeros_like(yaw)
        return (center_target, size_class_target, size_res_target,
                dir_class_target, dir_res_target)

    def split_pred(self, cls_preds, reg_preds, base_xyz):
        cls_t = jnp.swapaxes(cls_preds, -1, -2)
        reg_t = jnp.swapaxes(reg_preds, -1, -2)
        results = {}
        nb, ns = self.num_dir_bins, self.num_sizes
        start = 0
        results['center'] = base_xyz + reg_t[..., start:start + 3]
        start += 3
        results['dir_class'] = reg_t[..., start:start + nb]
        start += nb
        dir_res_norm = reg_t[..., start:start + nb]
        start += nb
        results['dir_res_norm'] = dir_res_norm
        results['dir_res'] = dir_res_norm * (np.pi / nb)
        results['size_class'] = reg_t[..., start:start + ns]
        start += ns
        size_res_norm = reg_t[..., start:start + 3 * ns]
        start += 3 * ns
        shape = size_res_norm.shape[:-1] + (ns, 3)
        results['size_res_norm'] = size_res_norm.reshape(shape)
        results['size_res'] = results['size_res_norm'] * \
            jnp.asarray(self.mean_sizes)[None, None]
        results['obj_scores'] = cls_t[..., 0:2]
        results['sem_scores'] = cls_t[..., 2:]
        return results

    def decode(self, bbox_out, mode='rpn'):
        center = bbox_out['center']
        if self.with_rot:
            dir_class = jnp.argmax(bbox_out['dir_class'], -1)
            dir_res = jnp.take_along_axis(
                bbox_out['dir_res'], dir_class[..., None], -1)[..., 0]
            dir_angle = box_ops.class2angle(
                dir_class, dir_res, self.num_dir_bins)[..., None]
        else:
            dir_angle = jnp.zeros(center.shape[:-1] + (1,), center.dtype)
        size_class = jnp.argmax(bbox_out['size_class'], -1)
        size_res = jnp.take_along_axis(
            bbox_out['size_res'],
            size_class[..., None, None].repeat(3, -1), -2)[..., 0, :]
        mean = jnp.asarray(self.mean_sizes)[size_class]
        bbox_size = jnp.clip(mean + size_res, 0.1, None)
        return jnp.concatenate([center, bbox_size, dir_angle], -1)


@BBOX_CODERS.register_module()
class DeMFClassAgnosticBBoxCoder(ClassAgnosticBBoxCoder):
    """Center+size codec for DeMFVoteHead (ref :140-251)."""

    def encode(self, gt_bboxes_3d, gt_labels_3d, ret_dir_target=False):
        """Same as parent but with *full* dims (ref :147)."""
        out = ClassAgnosticBBoxCoder.encode(
            self, gt_bboxes_3d, gt_labels_3d, ret_dir_target)
        out = list(out)
        out[1] = gt_bboxes_3d[..., 3:6]
        return tuple(out)

    def decode(self, bbox_out, mode='rpn'):
        center = bbox_out['center']
        bbox_size = bbox_out['size']
        if self.with_rot:
            dir_angle = self._decode_angle(bbox_out)[..., None]
        else:
            dir_angle = jnp.zeros(center.shape[:-1] + (1,), center.dtype)
        return jnp.concatenate([center, bbox_size, dir_angle], -1)

    def split_pred(self, cls_preds, reg_preds, base_xyz):
        cls_t = jnp.swapaxes(cls_preds, -1, -2)
        reg_t = jnp.swapaxes(reg_preds, -1, -2)
        results = {}
        nb = self.num_dir_bins
        results['center'] = base_xyz + reg_t[..., 0:3]
        results['size'] = reg_t[..., 3:6]
        results['dir_class'] = reg_t[..., 6:6 + nb]
        dir_res_norm = reg_t[..., 6 + nb:6 + 2 * nb]
        results['dir_res_norm'] = dir_res_norm
        results['dir_res'] = dir_res_norm * (np.pi / nb)
        results['obj_scores'] = cls_t[..., 0:2]
        if cls_t.shape[-1] > 2:
            results['sem_scores'] = cls_t[..., 2:]
        return results

    def decode_corners(self, center, size):
        half = size / 2.0
        return jnp.concatenate([center - half, center + half], -1)
