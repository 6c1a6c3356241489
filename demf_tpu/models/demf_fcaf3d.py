"""DeMF-FCAF3D: deformable image-feature fusion on the FCAF3D detector.

Rebuild of the reference's ``DeMF_fcaf`` branch variant (reference
README.md:55-58: 67.4/51.2 mAP — the branch itself is not in the
checkout, so this is a re-derivation from the DeMF paper's recipe as
implemented for VoteNet in this repo): take the base detector's
top-scoring proposals, cross-attend their features into the multi-level
image-encoder features with multi-scale deformable attention at the
projected 3D reference points (models/demf_head.py fusion stage), and
predict a refined second stage; train with the (N+1)-stage mean loss and
ensemble both stages at test time — exactly the DeMF-VoteNet pattern
(reference class_agnostic_vote_head.py:382-403, demfnet.py) applied to
FCAF3D's per-voxel head.

Image branch, frozen-branch caching, and the 3D->2D reference-point
bridge are shared with DeMFVoteNet.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.rotated_iou import iou3d_aligned
from ..core.transforms import project_points_to_image
from ..ops import sparse as S
from ..utils.precision import cast_compute
from ..utils.registry import (BACKBONES, DETECTORS, HEADS, NECKS,
                              build_from_cfg)
from .fcaf3d import FCAF3DHead, optax_bce
from .losses import FocalLoss
from .mink_resnet import MinkResNet
from .transformer import (DeMFTransformerDecoderLayer, get_valid_ratios,
                          make_level_masks)


@HEADS.register_module()
class DeMFFcaf3DHead(FCAF3DHead):
    """FCAF3DHead + DeMF deformable-fusion refinement stage."""
    num_queries: int = 256
    embed_dims: int = 256
    decoder: Any = None          # dict(transformerlayers=..., posembed=...)

    def num_decoder_layers(self):
        return int(dict(self.decoder or {}).get('num_layers', 1))

    @nn.compact
    def __call__(self, backbone_outs, img_dict=None, train: bool = False):
        head_outs = FCAF3DHead.__call__(self, backbone_outs, train=train)
        results = dict(head_outs=head_outs)
        if img_dict is None or self.decoder is None:
            return results

        # ---- select top-K proposals across all levels ------------------
        cent = jnp.concatenate([o['centerness'] for o in head_outs], 1)
        cls = jnp.concatenate([o['cls_scores'] for o in head_outs], 1)
        feats = jnp.concatenate([o['features'] for o in head_outs], 1)
        points = jnp.concatenate([o['points'] for o in head_outs], 1)
        bbox_pred = jnp.concatenate(
            [o['bbox_pred'] for o in head_outs], 1)
        valid = jnp.concatenate([o['valid'] for o in head_outs], 1)
        score = jax.nn.sigmoid(cls).max(-1) * jax.nn.sigmoid(cent)
        score = jnp.where(valid, score, -1.0)
        k = min(self.num_queries, score.shape[1])
        _, sel = jax.lax.top_k(score, k)                     # (B, K)

        take = lambda x: jnp.take_along_axis(
            x, sel.reshape(sel.shape + (1,) * (x.ndim - 2)), 1)
        sel_feats = take(feats)                              # (B, K, C)
        sel_points = take(points)                            # (B, K, 3)
        sel_valid = jnp.take_along_axis(valid, sel, 1)
        base_box = self.bbox_pred_to_bbox(sel_points, take(bbox_pred))

        # ---- deformable fusion (DeMF decoder stage) --------------------
        mlvl_feats = img_dict['img_features']
        meta = img_dict['img_meta']
        spatial_shapes = tuple(
            (f.shape[1], f.shape[2]) for f in mlvl_feats)
        batch_hw = (mlvl_feats[0].shape[1] * 8, mlvl_feats[0].shape[2] * 8)
        masks = make_level_masks(meta['img_shape'], batch_hw,
                                 spatial_shapes)
        valid_ratios = get_valid_ratios(masks)
        feat_flatten = jnp.concatenate(
            [f.reshape(f.shape[0], -1, f.shape[-1]) for f in mlvl_feats],
            1)
        mask_flatten = jnp.concatenate(
            [m.reshape(m.shape[0], -1) for m in masks], 1)
        # reference points: proposal centers projected into the image
        centers = base_box[..., :3].at[..., 2].add(base_box[..., 5] / 2)
        reference_points = project_points_to_image(centers, meta)

        query = nn.Dense(self.embed_dims, name='query_proj')(sel_feats)
        query_pos_input = jax.lax.stop_gradient(jnp.concatenate(
            [centers, base_box[..., 3:6]], -1))
        dcfg = dict(self.decoder or {})
        fused_all = []
        for i in range(self.num_decoder_layers()):
            query = DeMFTransformerDecoderLayer(
                transformerlayers=dcfg.get('transformerlayers'),
                posembed=dcfg.get('posembed'),
                name=f'decoder_{i}')(
                    query, feat_flatten,
                    query_pos_input=query_pos_input,
                    key_padding_mask=mask_flatten,
                    reference_points=reference_points,
                    spatial_shapes=spatial_shapes,
                    valid_ratios=valid_ratios, train=train)
            fused_all.append(query)

        # ---- refined prediction head (stage 1..N) ----------------------
        stages = []
        for i, q in enumerate(fused_all):
            h = nn.Dense(self.out_channels, name=f'fuse_proj{i}')(q)
            h = nn.elu(h)
            centerness = nn.Dense(1, use_bias=False,
                                  name=f'conv_center{i + 1}')(h)[..., 0]
            reg = nn.Dense(self.n_reg_outs, use_bias=False,
                           name=f'conv_reg{i + 1}')(h)
            bp = jnp.concatenate([jnp.exp(reg[..., :6]), reg[..., 6:]],
                                 -1)
            cls_s = nn.Dense(
                self.n_classes, name=f'conv_cls{i + 1}',
                bias_init=nn.initializers.constant(
                    -float(np.log((1 - 0.01) / 0.01))))(h)
            stages.append(dict(centerness=centerness, bbox_pred=bp,
                               cls_scores=cls_s, points=sel_points,
                               valid=sel_valid))
        results['fusion_stages'] = stages
        results['sel_idx'] = sel
        return results

    def loss(self, results_or_outs, gt_bboxes, gt_labels, gt_valid):
        if isinstance(results_or_outs, dict):
            head_outs = results_or_outs['head_outs']
            stages = results_or_outs.get('fusion_stages', [])
            sel = results_or_outs.get('sel_idx')
        else:
            head_outs, stages, sel = results_or_outs, [], None
        losses = FCAF3DHead.loss(self, head_outs, gt_bboxes, gt_labels,
                                 gt_valid)
        if not stages:
            return losses
        # fusion-stage losses: targets gathered at the selected voxels
        points = jnp.concatenate([o['points'] for o in head_outs], 1)
        valid = jnp.concatenate([o['valid'] for o in head_outs], 1)
        levels = jnp.concatenate([
            jnp.full(o['points'].shape[1:2], i, jnp.int32)
            for i, o in enumerate(head_outs)])

        def single_targets(pts_b, val_b, gtb, gtl, gtv, sel_b):
            cent_t, bbox_t, labels = self.get_targets(
                pts_b, levels, val_b, gtb, gtl, gtv)
            return (cent_t[sel_b], bbox_t[sel_b], labels[sel_b])

        cent_t, bbox_t, labels_t = jax.vmap(single_targets)(
            points, valid, gt_bboxes, gt_labels, gt_valid, sel)

        n_stage = len(stages) + 1
        for si, st in enumerate(stages):
            def single_loss(cent_b, bbox_b, cls_b, pts_b, val_b, ct, bt,
                            lt):
                pos = (lt >= 0) & val_b
                n_pos = jnp.maximum(pos.sum(), 1)
                focal = FocalLoss(use_sigmoid=True, gamma=2.0, alpha=0.25,
                                  reduction='sum')
                cls_loss = focal(
                    cls_b, jnp.where(pos, lt, self.n_classes),
                    weight=val_b.astype(jnp.float32)) / n_pos
                center_loss = jnp.sum(jnp.where(
                    pos, optax_bce(cent_b, ct), 0.0)) / n_pos
                dummy = jnp.asarray(
                    [0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.1, 0.1],
                    bbox_b.dtype)
                bbox_safe = jnp.where(pos[:, None], bbox_b, dummy)
                decoded = self.bbox_pred_to_bbox(pts_b, bbox_safe)
                safe_t = jnp.where(pos[:, None], bt,
                                   jax.lax.stop_gradient(decoded))
                iou = iou3d_aligned(decoded,
                                    jax.lax.stop_gradient(safe_t))
                w = jnp.where(pos, ct, 0.0)
                bbox_loss = jnp.sum((1.0 - iou) * w) / \
                    jnp.maximum(w.sum(), 1e-6)
                return cls_loss, center_loss, bbox_loss

            cl, ce, bl = jax.vmap(single_loss)(
                st['centerness'], st['bbox_pred'], st['cls_scores'],
                st['points'], st['valid'], cent_t, bbox_t, labels_t)
            suffix = f'.f{si}'
            losses[f'loss_cls{suffix}'] = self.cls_loss_weight * cl.mean()
            losses[f'loss_centerness{suffix}'] = \
                self.center_loss_weight * ce.mean()
            losses[f'loss_bbox{suffix}'] = \
                self.bbox_loss_weight * bl.mean()
        # (N+1)-stage mean, as DeMFVoteHead averages stage losses
        return {k: v / n_stage for k, v in losses.items()}

    def get_bboxes(self, results_or_outs):
        if isinstance(results_or_outs, dict) and \
                'fusion_stages' in results_or_outs:
            head_outs = results_or_outs['head_outs']
            stages = results_or_outs['fusion_stages']
            # test_cfg['fusion_ensemble'] — the config-driven analogue
            # of DeMFVoteHead's ensemble_layers:
            #   'selected_base+fusion' (default): the SELECTED base
            #       candidates (stage 0 = the very proposals the fusion
            #       stages refine) + fusion stages — equal-size pools,
            #       the DeMF-VoteNet ensemble pattern.  Decoding ALL
            #       base levels alongside the 256 refined candidates
            #       floods the NMS pool 15:1 with unrefined predictions
            #       and measured BELOW the fusion stage alone.
            #   'fusion_only': refined stages only (highest on the
            #       fresh-scene gen-eval ablations).
            #   'all': full base levels + fusion pools.
            mode = str((self.test_cfg or {}).get(
                'fusion_ensemble', 'selected_base+fusion'))
            sel = results_or_outs.get('sel_idx')
            if mode == 'fusion_only':
                sel = None
                pools = []
            elif sel is not None and mode != 'all':
                cat = {k: jnp.concatenate([o[k] for o in head_outs], 1)
                       for k in ('centerness', 'bbox_pred', 'cls_scores',
                                 'points', 'valid')}
                take = lambda x: jnp.take_along_axis(
                    x, sel.reshape(sel.shape + (1,) * (x.ndim - 2)), 1)
                base_sel = dict(
                    centerness=take(cat['centerness']),
                    bbox_pred=take(cat['bbox_pred']),
                    cls_scores=take(cat['cls_scores']),
                    points=take(cat['points']),
                    valid=jnp.take_along_axis(cat['valid'], sel, 1))
                pools = [base_sel]
            else:
                pools = list(head_outs)
            extra = [dict(centerness=s['centerness'],
                          bbox_pred=s['bbox_pred'],
                          cls_scores=s['cls_scores'],
                          points=s['points'], valid=s['valid'])
                     for s in stages]
            return FCAF3DHead.get_bboxes(self, pools + extra)
        if isinstance(results_or_outs, dict):
            return FCAF3DHead.get_bboxes(self,
                                         results_or_outs['head_outs'])
        return FCAF3DHead.get_bboxes(self, results_or_outs)


@DETECTORS.register_module()
class DeMFFcaf3D(nn.Module):
    """FCAF3D + frozen image branch + deformable fusion head."""
    backbone: Any = None
    head: Any = None
    img_backbone: Any = None
    img_neck: Any = None
    img_encoder: Any = None
    # accepted for config-surface parity (inherited from the deformdetr
    # base config whose DETR head the fusion model does not use)
    img_bbox_head: Any = None
    freeze_img_branch: bool = True
    pretrained: Any = None
    init_cfg: Any = None
    voxel_size: float = 0.01
    max_voxels: int = 24576
    pc_start: Tuple[float, float, float] = (-3.2, -0.2, -2.0)
    train_cfg: Any = None
    test_cfg: Any = None

    def _build_head(self, name=None):
        cfg = dict(self.head or {})
        cfg.setdefault('test_cfg', self.test_cfg)
        cfg.setdefault('pc_start', self.pc_start)
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    def extract_img_feat(self, img, img_shape, train):
        img_train = train and not self.freeze_img_branch
        backbone = build_from_cfg(dict(self.img_backbone), BACKBONES,
                                  {'name': 'img_backbone'})
        x = backbone(img, train=img_train)
        if self.img_neck is not None:
            neck = build_from_cfg(dict(self.img_neck), NECKS,
                                  {'name': 'img_neck'})
            x = neck(x, train=img_train)
        if self.img_encoder is not None:
            encoder = build_from_cfg(dict(self.img_encoder), HEADS,
                                     {'name': 'img_encoder'})
            x = encoder(x, img_shape, train=img_train)
        if self.freeze_img_branch:
            x = jax.lax.stop_gradient(x)
        return x

    def _voxelize(self, points):
        def single(p):
            return S.voxelize(p[:, :3], p[:, 3:6], self.voxel_size,
                              jnp.asarray(self.pc_start), self.max_voxels)
        return jax.vmap(single)(points)

    @nn.compact
    def __call__(self, batch, train: bool = False,
                 img_feat_only: bool = False):
        meta = batch['img_meta']
        if 'img_features' in batch:
            img_features = jax.lax.stop_gradient(
                tuple(batch['img_features']))
        else:
            img_features = self.extract_img_feat(
                batch['img'], meta['img_shape'], train)
        if img_feat_only:
            return img_features

        coords, feats, valid = self._voxelize(batch['points'])
        # coords from fp32 points; pooled features go to the policy dtype
        feats = cast_compute(feats)
        backbone = build_from_cfg(dict(self.backbone), BACKBONES,
                                  {'name': 'backbone'})
        outs = backbone(coords, valid, feats, train=train)
        head = self._build_head(name='head')
        return head(outs, img_dict=dict(img_features=img_features,
                                        img_meta=meta), train=train)

    def loss(self, results, batch):
        return self._build_head().loss(results, batch['gt_bboxes_3d'],
                                       batch['gt_labels_3d'],
                                       batch['gt_valid'])

    def get_bboxes(self, results, batch=None):
        return self._build_head().get_bboxes(results)

    def frozen_param_patterns(self):
        if not self.freeze_img_branch:
            return []
        return ['img_backbone', 'img_neck', 'img_encoder']
