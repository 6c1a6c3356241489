"""FCAF3D: anchor-free single-stage sparse-voxel detector (SUN RGB-D).

TPU-native rebuild of the reference's DeMF-FCAF3D base detector
(``DeMF_fcaf`` branch, reference README.md:55-58; mmdet3d
``MinkSingleStage3DDetector`` + ``FCAF3DHead`` as configured by
fcaf3d_sunrgbd): MinkResNet34 backbone levels at strides 8/16/32/64, a
top-down decoder (generative transpose conv + skip add + out block), a
shared per-voxel head (centerness / 8-dof regression with the Mobius yaw
parametrization / classification), FCOS-style multi-level target
assignment (pts_assign_threshold / pts_center_threshold), focal + BCE +
rotated-IoU losses, and rotated-NMS inference.

Deliberate fixed-shape deviations from the MinkowskiEngine original,
each noted inline:
  * decoder voxels = the skip level's occupied coordinate set (the
    generative transpose conv's speculative children that carry no point
    evidence are dropped; the original prunes most of them by score);
  * score-based ``_prune`` (pts_prune_threshold) is structural here —
    capacities are static per level;
  * NMS keeps per-class semantics by reusing one rotated-IoU matrix over
    the top-``nms_pre`` candidates for every class's greedy pass.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.rotated_iou import iou3d_aligned, rotated_nms_3d
from ..ops import sparse as S
from ..ops.nms import _greedy_suppress
from ..utils.precision import cast_compute
from ..utils.registry import BACKBONES, DETECTORS, HEADS, build_from_cfg
from .losses import FocalLoss, weight_reduce_loss
from .mink_resnet import MaskedBatchNorm, MinkResNet, _conv_param

FLOAT_MAX = 1e8


@HEADS.register_module()
class FCAF3DHead(nn.Module):
    """mmdet3d FCAF3DHead (sunrgbd: n_reg_outs=8, with yaw)."""
    in_channels: Sequence[int] = (64, 128, 256, 512)
    out_channels: int = 128
    n_classes: int = 10
    n_reg_outs: int = 8
    voxel_size: float = 0.01
    pc_start: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    pts_assign_threshold: int = 27
    pts_center_threshold: int = 18
    pts_prune_threshold: int = 100000   # structural here (static caps)
    center_loss_weight: float = 1.0
    bbox_loss_weight: float = 1.0
    cls_loss_weight: float = 1.0
    test_cfg: Any = None

    @staticmethod
    def _level_nbr(coords, valid, tensor_stride):
        """27-tap submanifold table for one level, built once per level
        and shared by the up-block conv and the out-block conv."""
        return S.neighbor_table_batched(
            coords, valid, coords, valid, S.kernel_offsets(3),
            in_stride=tensor_stride, sorted_input=True)

    def _out_block(self, st, cin, tensor_stride, name, train, nbr=None):
        coords, valid, x = st
        w = _conv_param(self, f'{name}_conv', 3, cin, self.out_channels)
        y = S.submanifold_conv_batched(coords, valid, x, w,
                                       tensor_stride=tensor_stride,
                                       nbr=nbr)
        y = MaskedBatchNorm(name=f'{name}_bn')(y, valid, train)
        y = nn.elu(y)
        return coords, valid, jnp.where(valid[..., None], y, 0.0)

    def _up_block(self, coarse_st, fine_coords, fine_valid, cin, cout,
                  fine_stride, name, train, nbr=None):
        """Generative transpose conv (k=2, s=2) restricted to the skip's
        occupied set + conv3 block, per FCAF3D's ``_make_up_block``."""
        cc, cv, cf = coarse_st
        wt = _conv_param(self, f'{name}_tconv', 2, cin, cout)
        y = S.transposed_conv_to_batched(fine_coords, fine_valid, cc, cv,
                                         cf, wt,
                                         tensor_stride=fine_stride,
                                         sorted_input=True,
                                         sorted_fine=True)
        y = MaskedBatchNorm(name=f'{name}_tbn')(y, fine_valid, train)
        y = nn.elu(y)
        w = _conv_param(self, f'{name}_conv', 3, cout, cout)
        y = S.submanifold_conv_batched(fine_coords, fine_valid, y, w,
                                       tensor_stride=fine_stride, nbr=nbr)
        y = MaskedBatchNorm(name=f'{name}_bn')(y, fine_valid, train)
        y = nn.elu(y)
        return jnp.where(fine_valid[..., None], y, 0.0)

    @nn.compact
    def __call__(self, backbone_outs, train: bool = False):
        """backbone_outs: list of (coords, valid, feats), fine->coarse.

        Returns per-level dicts with centerness/bbox_pred/cls_scores and
        the level geometry (points in metres, valid).
        """
        n = len(backbone_outs)
        strides = [8 * (2 ** i) for i in range(n)]
        # head prediction convs are shared across levels (k=1 convs ==
        # per-voxel Dense; FCAF3DHead conv_center/conv_reg/conv_cls)
        center_conv = nn.Dense(1, use_bias=False, name='conv_center')
        reg_conv = nn.Dense(self.n_reg_outs, use_bias=False,
                            name='conv_reg')
        cls_conv = nn.Dense(
            self.n_classes, name='conv_cls',
            bias_init=nn.initializers.constant(
                -float(np.log((1 - 0.01) / 0.01))))

        outs = []
        x_st = None
        for i in range(n - 1, -1, -1):
            entry = backbone_outs[i]
            coords, valid, feats = entry[:3]
            # reuse the backbone stage's submanifold table when provided
            # (MinkResNet returns it as a 4th element)
            nbr = (entry[3] if len(entry) > 3 else
                   self._level_nbr(coords, valid, strides[i]))
            if i == n - 1:
                x_st = (coords, valid, feats)
            else:
                up = self._up_block(x_st, coords, valid,
                                    self.in_channels[i + 1],
                                    self.in_channels[i], strides[i],
                                    f'up_block_{i + 1}', train, nbr=nbr)
                x_st = (coords, valid, feats + up)
            oc, ov, of = self._out_block(x_st, self.in_channels[i],
                                         strides[i], f'out_block_{i}',
                                         train, nbr=nbr)
            centerness = center_conv(of)[..., 0]               # (B, M)
            reg = reg_conv(of)                                 # (B, M, 8)
            bbox_pred = jnp.concatenate(
                [jnp.exp(reg[..., :6]), reg[..., 6:]], -1)
            cls_scores = cls_conv(of)                          # (B, M, C)
            points = oc.astype(jnp.float32) * self.voxel_size + \
                jnp.asarray(self.pc_start)                     # metres
            outs.append(dict(centerness=centerness, bbox_pred=bbox_pred,
                             cls_scores=cls_scores, points=points,
                             valid=ov, features=of))
        return outs[::-1]    # fine -> coarse

    # -- decode ----------------------------------------------------------
    @staticmethod
    def bbox_pred_to_bbox(points, bbox_pred):
        """FCAF3D 8-dof decode (mmdet3d _bbox_pred_to_bbox, with angle):
        face distances + Mobius scale-invariant yaw."""
        x = points[..., 0] + (bbox_pred[..., 1] - bbox_pred[..., 0]) / 2
        y = points[..., 1] + (bbox_pred[..., 3] - bbox_pred[..., 2]) / 2
        z = points[..., 2] + (bbox_pred[..., 5] - bbox_pred[..., 4]) / 2
        scale = (bbox_pred[..., 0] + bbox_pred[..., 1] +
                 bbox_pred[..., 2] + bbox_pred[..., 3])
        # eps keeps sqrt/atan2 gradients finite at the exact origin
        # (zero-feature padding rows with bias-free convs land there)
        q1 = bbox_pred[..., 6]
        q2 = bbox_pred[..., 7]
        q = jnp.exp(jnp.sqrt(q1 ** 2 + q2 ** 2 + 1e-12))
        alpha = 0.5 * jnp.arctan2(q1, jnp.where(
            (jnp.abs(q1) + jnp.abs(q2)) < 1e-8, 1e-8, q2))
        dx = scale / (1 + q)
        dy = scale * q / (1 + q)
        dz = bbox_pred[..., 5] + bbox_pred[..., 4]
        # bottom-z convention: z here is the gravity center
        return jnp.stack([x, y, z - dz / 2, dx, dy, dz, alpha], -1)

    # -- targets ---------------------------------------------------------
    def _face_distances(self, points, boxes):
        """(N, 3) pts x (G, 7) boxes -> (N, G, 6) signed face distances
        in each box's yaw frame (mmdet3d _get_face_distances)."""
        centers = boxes[:, :3] + jnp.concatenate(
            [jnp.zeros_like(boxes[:, :2]), boxes[:, 5:6] / 2], -1)
        shift = points[:, None, :] - centers[None, :, :]     # (N, G, 3)
        yaw = boxes[:, 6]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        lx = shift[..., 0] * c[None] - shift[..., 1] * s[None]
        ly = shift[..., 0] * s[None] + shift[..., 1] * c[None]
        lz = shift[..., 2]
        half = boxes[:, 3:6] / 2
        return jnp.stack([half[None, :, 0] + lx, half[None, :, 0] - lx,
                          half[None, :, 1] + ly, half[None, :, 1] - ly,
                          half[None, :, 2] + lz, half[None, :, 2] - lz],
                         -1)

    @staticmethod
    def _centerness(face_dist):
        """sqrt of per-axis min/max distance-ratio product (FCOS 3D)."""
        x = face_dist[..., 0:2]
        y = face_dist[..., 2:4]
        z = face_dist[..., 4:6]
        r = (x.min(-1) / jnp.clip(x.max(-1), 1e-6) *
             y.min(-1) / jnp.clip(y.max(-1), 1e-6) *
             z.min(-1) / jnp.clip(z.max(-1), 1e-6))
        return jnp.sqrt(jnp.clip(r, 0.0, None))

    def get_targets(self, points, levels, pt_valid, gt_bboxes, gt_labels,
                    gt_valid):
        """Single scene.  points (N, 3) concat over levels, levels (N,)
        int, gt (G, 7)/(G,).  Returns (centerness_t (N,), bbox_t (N, 7),
        labels (N,) with -1 background)."""
        n_levels = len(self.in_channels)
        face = self._face_distances(points, gt_bboxes)       # (N, G, 6)
        inside = (face.min(-1) > 0) & gt_valid[None, :] & pt_valid[:, None]

        # level selection per box: coarsest level with >= threshold
        # inside points (mmdet3d lower_limit_mask semantics)
        n_pos = jnp.stack([
            jnp.sum(inside & (levels == l)[:, None], 0)
            for l in range(n_levels)])                       # (L, G)
        too_few = n_pos < self.pts_assign_threshold          # (L, G)
        first_fail = jnp.argmax(too_few, 0)                  # (G,)
        any_fail = jnp.any(too_few, 0)
        best = jnp.where(any_fail,
                         jnp.maximum(first_fail - 1, 0), n_levels - 1)
        level_ok = best[None, :] == levels[:, None]          # (N, G)

        centerness = self._centerness(face)                  # (N, G)
        cand = inside & level_ok
        cent_masked = jnp.where(cand, centerness, -1.0)
        # top-(k+1) centerness per box -> threshold
        k = self.pts_center_threshold
        top = jax.lax.top_k(cent_masked.T, k + 1)[0][:, -1]  # (G,)
        cond3 = cand & (cent_masked > top[None, :])

        volumes = gt_bboxes[:, 3] * gt_bboxes[:, 4] * gt_bboxes[:, 5]
        vol = jnp.where(cond3, volumes[None, :], FLOAT_MAX)  # (N, G)
        min_vol = vol.min(-1)
        min_idx = vol.argmin(-1)
        pos = min_vol < FLOAT_MAX
        labels = jnp.where(pos, gt_labels[min_idx], -1)
        centerness_t = jnp.where(
            pos, jnp.take_along_axis(centerness, min_idx[:, None],
                                     1)[:, 0], 0.0)
        bbox_t = gt_bboxes[min_idx]
        return centerness_t, bbox_t, labels

    # -- loss ------------------------------------------------------------
    def loss(self, head_outs, gt_bboxes, gt_labels, gt_valid):
        """Batched loss over all levels (mmdet3d FCAF3DHead._loss)."""
        cent = jnp.concatenate([o['centerness'] for o in head_outs], 1)
        bbox_pred = jnp.concatenate([o['bbox_pred'] for o in head_outs],
                                    1)
        cls = jnp.concatenate([o['cls_scores'] for o in head_outs], 1)
        points = jnp.concatenate([o['points'] for o in head_outs], 1)
        valid = jnp.concatenate([o['valid'] for o in head_outs], 1)
        levels = jnp.concatenate([
            jnp.full(o['points'].shape[1:2], i, jnp.int32)
            for i, o in enumerate(head_outs)])               # (N,)

        def single(cent_b, bbox_b, cls_b, pts_b, val_b, gtb, gtl, gtv):
            cent_t, bbox_t, labels = self.get_targets(
                pts_b, levels, val_b, gtb, gtl, gtv)
            pos = (labels >= 0) & val_b
            n_pos = jnp.maximum(pos.sum(), 1)

            # focal classification over every valid location
            focal = FocalLoss(use_sigmoid=True, gamma=2.0, alpha=0.25,
                              reduction='sum')
            cls_loss = focal(
                cls_b, jnp.where(pos, labels, self.n_classes),
                weight=val_b.astype(jnp.float32)) / n_pos

            # centerness BCE on positives
            bce = optax_bce(cent_b, cent_t)
            center_loss = jnp.sum(jnp.where(pos, bce, 0.0)) / n_pos

            # rotated-IoU bbox loss on positives, centerness-weighted;
            # non-positive rows are replaced by a fixed dummy box before
            # decode so their (masked-out) gradients stay finite
            dummy = jnp.asarray([0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.1, 0.1],
                                bbox_b.dtype)
            bbox_safe = jnp.where(pos[:, None], bbox_b, dummy)
            decoded = self.bbox_pred_to_bbox(pts_b, bbox_safe)
            safe_t = jnp.where(pos[:, None], bbox_t,
                               jax.lax.stop_gradient(decoded))
            iou = iou3d_aligned(decoded, jax.lax.stop_gradient(safe_t))
            w = jnp.where(pos, cent_t, 0.0)
            bbox_loss = jnp.sum((1.0 - iou) * w) / \
                jnp.maximum(w.sum(), 1e-6)
            return cls_loss, center_loss, bbox_loss

        cls_l, cen_l, box_l = jax.vmap(single)(
            cent, bbox_pred, cls, points, valid, gt_bboxes, gt_labels,
            gt_valid)
        return dict(loss_cls=self.cls_loss_weight * cls_l.mean(),
                    loss_centerness=self.center_loss_weight * cen_l.mean(),
                    loss_bbox=self.bbox_loss_weight * box_l.mean())

    # -- inference -------------------------------------------------------
    def get_bboxes(self, head_outs):
        tcfg = dict(self.test_cfg or {})
        nms_pre = int(tcfg.get('nms_pre', 256))
        iou_thr = float(tcfg.get('iou_thr', 0.5))
        score_thr = float(tcfg.get('score_thr', 0.01))

        cent = jnp.concatenate([o['centerness'] for o in head_outs], 1)
        bbox_pred = jnp.concatenate([o['bbox_pred'] for o in head_outs],
                                    1)
        cls = jnp.concatenate([o['cls_scores'] for o in head_outs], 1)
        points = jnp.concatenate([o['points'] for o in head_outs], 1)
        valid = jnp.concatenate([o['valid'] for o in head_outs], 1)

        def single(cent_b, bbox_b, cls_b, pts_b, val_b):
            probs = jax.nn.sigmoid(cls_b) * \
                jax.nn.sigmoid(cent_b)[:, None]              # (N, C)
            best = jnp.where(val_b, probs.max(-1), -1.0)
            k = min(nms_pre, best.shape[0])
            topv, topi = jax.lax.top_k(best, k)
            sel_probs = probs[topi]                          # (k, C)
            sel_boxes = self.bbox_pred_to_bbox(pts_b[topi], bbox_b[topi])
            sel_valid = topv > 0
            # one IoU matrix reused for every class's greedy pass
            from ..core.rotated_iou import iou3d_matrix
            iou = iou3d_matrix(sel_boxes, sel_boxes)
            outs = []
            for c in range(self.n_classes):
                sc = sel_probs[:, c]
                keep = _greedy_suppress(
                    iou, sc, iou_thr, sel_valid & (sc > score_thr))
                outs.append((sel_boxes, sc,
                             jnp.full(sc.shape, c, jnp.int32),
                             keep & (sc > score_thr)))
            boxes = jnp.concatenate([o[0] for o in outs])
            scores = jnp.concatenate([o[1] for o in outs])
            labels = jnp.concatenate([o[2] for o in outs])
            keep = jnp.concatenate([o[3] for o in outs])
            return boxes, scores, labels, keep

        boxes, scores, labels, keep = jax.vmap(single)(
            cent, bbox_pred, cls, points, valid)
        return dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels,
                    valid=keep)


def optax_bce(logits, targets):
    """Elementwise binary cross-entropy with logits."""
    return jnp.clip(logits, 0, None) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


@DETECTORS.register_module()
class FCAF3D(nn.Module):
    """MinkSingleStage3DDetector: voxelize -> MinkResNet -> FCAF3DHead.

    Batch contract mirrors the other detectors: ``points`` (B, P, >=6:
    xyz + rgb features), gt_bboxes_3d / gt_labels_3d / gt_valid.
    """
    backbone: Any = None
    head: Any = None
    voxel_size: float = 0.01
    max_voxels: int = 24576
    pc_start: Tuple[float, float, float] = (-3.2, -0.2, -2.0)
    train_cfg: Any = None
    test_cfg: Any = None

    def _build_head(self, name=None):
        """name inside compact; name=None -> unparented pure-math helper
        (loss / get_bboxes need no params) — repo detector idiom."""
        cfg = dict(self.head or {})
        cfg.setdefault('test_cfg', self.test_cfg)
        cfg.setdefault('pc_start', self.pc_start)
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    def _voxelize(self, points):
        def single(p):
            return S.voxelize(p[:, :3], p[:, 3:6], self.voxel_size,
                              jnp.asarray(self.pc_start),
                              self.max_voxels)
        return jax.vmap(single)(points)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        coords, feats, valid = self._voxelize(batch['points'])
        # voxel coords came from fp32 points; only the pooled features go
        # onto the policy compute dtype (utils/precision.py)
        feats = cast_compute(feats)
        bcfg = dict(self.backbone or {})
        backbone = build_from_cfg(bcfg, BACKBONES, {'name': 'backbone'})
        outs = backbone(coords, valid, feats, train=train)
        head = self._build_head(name='head')
        return dict(head_outs=head(outs, train=train))

    def loss(self, results, batch):
        return self._build_head().loss(results['head_outs'],
                                       batch['gt_bboxes_3d'],
                                       batch['gt_labels_3d'],
                                       batch['gt_valid'])

    def get_bboxes(self, results, batch=None):
        return self._build_head().get_bboxes(results['head_outs'])
