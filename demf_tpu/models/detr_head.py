"""Deformable-DETR 2D detection head (stage-1 image-branch pretrain).

TPU-native re-design of mmdet's ``DeformableDETRHead`` +
``DeformableDetrTransformer`` as configured by the reference
(configs/deformdetr/imvotenet_image.py:21-79): 300 learned queries, 6-layer
MSDA encoder + 6-layer decoder (shared prediction branches, no two-stage /
box refine), focal classification, L1 + GIoU box losses over every decoder
layer, Hungarian assignment.

Fixed shapes throughout: GT is padded to MAX_GT with a validity mask.  The
Hungarian solve runs ON DEVICE by default (ops/assignment.py epsilon-scaled
auction — no per-step host round-trip, unlike the reference which syncs to
host per image via scipy, SURVEY.md §3.5); ``assigner.solver='scipy'``
selects the bit-exact ``jax.pure_callback`` host path for parity checks.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import HEADS, build_loss
from .transformer import (DetrTransformerDecoderLayer,
                          DetrTransformerEncoderLayer, SinePositionalEncoding,
                          encoder_reference_points, get_valid_ratios,
                          make_level_masks)


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def box_xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


def giou_2d(a, b):
    """GIoU matrix between (N, 4) and (M, 4) xyxy boxes."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area_a = jnp.clip(a[:, 2:] - a[:, :2], 0, None).prod(-1)
    area_b = jnp.clip(b[:, 2:] - b[:, :2], 0, None).prod(-1)
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / jnp.clip(union, 1e-7, None)
    elt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    erb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    enclose = jnp.clip(erb - elt, 0, None).prod(-1)
    return iou - (enclose - union) / jnp.clip(enclose, 1e-7, None)


def hungarian_match(cost):
    """Batched Hungarian assignment on host (scipy), fixed shapes.

    Args:
        cost: (B, Q, G) cost matrix (pad invalid G columns with large cost).
    Returns:
        (B, G) int32: assigned query index per gt column.
    """
    def _solve(c):
        from scipy.optimize import linear_sum_assignment
        c = np.asarray(c)
        out = np.zeros(c.shape[:1] + c.shape[2:3], np.int32)
        for b in range(c.shape[0]):
            row, col = linear_sum_assignment(c[b])
            out[b, col] = row.astype(np.int32)
        return out

    b, q, g = cost.shape
    return jax.pure_callback(
        _solve, jax.ShapeDtypeStruct((b, g), jnp.int32), cost,
        vmap_method='sequential')


class DetrMLP(nn.Module):
    hidden: int = 256
    out: int = 4
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f'l{i}')(x))
        return nn.Dense(self.out, name=f'l{self.layers - 1}')(x)


@HEADS.register_module()
class DeformableDETRHead(nn.Module):
    num_query: int = 300
    num_classes: int = 10
    in_channels: int = 2048
    embed_dims: int = 256
    sync_cls_avg_factor: bool = True
    as_two_stage: bool = False
    with_box_refine: bool = False
    transformer: Any = None
    positional_encoding: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    loss_iou: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def _cfgs(self):
        t = dict(self.transformer or {})
        enc = dict(t.get('encoder', {}))
        dec = dict(t.get('decoder', {}))
        return enc, dec

    @nn.compact
    def __call__(self, mlvl_feats, img_shape, train: bool = False):
        """
        Args:
            mlvl_feats: tuple of NHWC maps (4 levels).
            img_shape: (B, 2) valid [h, w] at input resolution.
        Returns:
            dict: cls_scores (L_dec, B, Q, C), bbox_preds (L_dec, B, Q, 4)
            normalized cxcywh.
        """
        enc_cfg, dec_cfg = self._cfgs()
        pe_cfg = dict(self.positional_encoding or {})
        pe_cfg.pop('type', None)
        pos_enc = SinePositionalEncoding(**pe_cfg)

        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in mlvl_feats)
        batch_hw = (mlvl_feats[0].shape[1] * 8, mlvl_feats[0].shape[2] * 8)
        masks = make_level_masks(img_shape, batch_hw, spatial_shapes)
        valid_ratios = get_valid_ratios(masks)

        level_embeds = self.param('level_embeds',
                                  nn.initializers.normal(1.0),
                                  (len(mlvl_feats), self.embed_dims))
        feat_flat, mask_flat, pos_flat = [], [], []
        for lvl, (feat, mask) in enumerate(zip(mlvl_feats, masks)):
            b, h, w, c = feat.shape
            pos = pos_enc(mask) + level_embeds[lvl]
            feat_flat.append(feat.reshape(b, h * w, c))
            pos_flat.append(pos.reshape(b, h * w, c))
            mask_flat.append(mask.reshape(b, h * w))
        x = jnp.concatenate(feat_flat, 1)
        pos = jnp.concatenate(pos_flat, 1)
        key_padding_mask = jnp.concatenate(mask_flat, 1)

        enc_tl = dict(enc_cfg.get('transformerlayers', {}))
        enc_attn = dict(enc_tl.get('attn_cfgs', {}))
        enc_refs = encoder_reference_points(spatial_shapes, valid_ratios)
        for i in range(enc_cfg.get('num_layers', 6)):
            x = DetrTransformerEncoderLayer(
                embed_dims=self.embed_dims,
                num_heads=enc_attn.get('num_heads', 8),
                num_levels=len(mlvl_feats),
                num_points=enc_attn.get('num_points', 4),
                feedforward_channels=enc_tl.get('feedforward_channels', 1024),
                ffn_dropout=enc_tl.get('ffn_dropout', 0.1),
                attn_dropout=enc_attn.get('dropout', 0.1),
                name=f'encoder_{i}')(
                    x, pos=pos, key_padding_mask=key_padding_mask,
                    reference_points=enc_refs,
                    spatial_shapes=spatial_shapes, train=train)

        # learned queries: embedding split into (query_pos, query)
        query_embed = self.param('query_embedding',
                                 nn.initializers.normal(1.0),
                                 (self.num_query, 2 * self.embed_dims))
        b = x.shape[0]
        query_pos, query = jnp.split(query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (b,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (b,) + query.shape)

        ref = nn.Dense(2, name='reference_points_fc')(query_pos)
        reference_points = jax.nn.sigmoid(ref)          # (B, Q, 2)

        dec_tl = dict(dec_cfg.get('transformerlayers', {}))
        attn_cfgs = dec_tl.get('attn_cfgs', [{}, {}])
        self_cfg = dict(attn_cfgs[0])
        cross_cfg = dict(attn_cfgs[1])

        cls_branch = nn.Dense(self.num_classes, name='fc_cls',
                              bias_init=nn.initializers.constant(
                                  float(-np.log((1 - 0.01) / 0.01))))
        reg_branch = DetrMLP(self.embed_dims, 4, 3, name='fc_reg')

        cls_all, bbox_all = [], []
        for i in range(dec_cfg.get('num_layers', 6)):
            ref_input = reference_points[:, :, None, :] * \
                valid_ratios[:, None]
            query = DetrTransformerDecoderLayer(
                embed_dims=self.embed_dims,
                num_heads=cross_cfg.get('num_heads', 8),
                num_levels=len(mlvl_feats),
                num_points=cross_cfg.get('num_points', 4),
                feedforward_channels=dec_tl.get('feedforward_channels', 1024),
                ffn_dropout=dec_tl.get('ffn_dropout', 0.1),
                self_attn_dropout=self_cfg.get('dropout', 0.1),
                cross_attn_dropout=cross_cfg.get('dropout', 0.1),
                name=f'decoder_{i}')(
                    query, x, query_pos=query_pos,
                    key_padding_mask=key_padding_mask,
                    reference_points=ref_input,
                    spatial_shapes=spatial_shapes, train=train)
            cls_all.append(cls_branch(query))
            tmp = reg_branch(query)
            tmp = tmp.at[..., :2].add(inverse_sigmoid(reference_points))
            bbox_all.append(jax.nn.sigmoid(tmp))
        return dict(cls_scores=jnp.stack(cls_all),
                    bbox_preds=jnp.stack(bbox_all))

    # -- training --------------------------------------------------------
    def loss(self, preds, gt_bboxes, gt_labels, gt_valid, img_shape):
        """Per-decoder-layer Hungarian assignment + focal/L1/GIoU losses.

        Args:
            preds: forward output dict.
            gt_bboxes: (B, G, 4) xyxy in input-resolution pixels.
            gt_labels: (B, G) int.
            gt_valid: (B, G) bool.
            img_shape: (B, 2) [h, w].
        """
        tcfg = dict(self.train_cfg or {})
        assigner = dict(tcfg.get('assigner', {}))
        cls_w = dict(assigner.get('cls_cost', {})).get('weight', 1.0)
        reg_w = dict(assigner.get('reg_cost', {})).get('weight', 1.0)
        iou_w = dict(assigner.get('iou_cost', {})).get('weight', 1.0)
        solver = assigner.get('solver', 'auction')

        factor = jnp.stack([img_shape[:, 1], img_shape[:, 0],
                            img_shape[:, 1], img_shape[:, 0]],
                           -1).astype(jnp.float32)        # (B, 4) whwh
        gt_norm_xyxy = gt_bboxes / factor[:, None]
        gt_norm_cxcywh = box_xyxy_to_cxcywh(gt_norm_xyxy)

        losses = {}
        num_layers = preds['cls_scores'].shape[0]
        for layer in range(num_layers):
            cls = preds['cls_scores'][layer]                  # (B, Q, C)
            bbox = preds['bbox_preds'][layer]                 # (B, Q, 4) n.
            l = self._loss_single(cls, bbox, gt_norm_cxcywh, gt_labels,
                                  gt_valid, factor,
                                  (cls_w, reg_w, iou_w), solver)
            suffix = '' if layer == num_layers - 1 else f'.d{layer}'
            for k, v in l.items():
                losses[f'{k}{suffix}'] = v
        return losses

    def _loss_single(self, cls, bbox, gt_norm_cxcywh, gt_labels, gt_valid,
                     factor, cost_weights, solver='auction'):
        cls_w, reg_w, iou_w = cost_weights
        b, q, c = cls.shape
        g = gt_labels.shape[1]

        def sample_cost(cls_b, bbox_b, gt_box_b, gt_lab_b, valid_b, fac_b):
            # focal cls cost (mmdet FocalLossCost)
            prob = jax.nn.sigmoid(cls_b)
            alpha, gamma, eps = 0.25, 2.0, 1e-12
            neg = (1 - alpha) * (prob ** gamma) * (-jnp.log(1 - prob + eps))
            pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + eps))
            cls_cost = (pos - neg)[:, gt_lab_b]               # (Q, G)
            reg_cost = jnp.sum(jnp.abs(
                bbox_b[:, None] - gt_box_b[None]), -1)        # (Q, G)
            xyxy_pred = box_cxcywh_to_xyxy(bbox_b) * fac_b[None]
            xyxy_gt = box_cxcywh_to_xyxy(gt_box_b) * fac_b[None]
            iou_cost = -giou_2d(xyxy_pred, xyxy_gt)
            cost = cls_w * cls_cost + reg_w * reg_cost + iou_w * iou_cost
            return jnp.where(valid_b[None], cost, 1e6)

        cost = jax.vmap(sample_cost)(cls, bbox, gt_norm_cxcywh, gt_labels,
                                     gt_valid, factor)
        if solver == 'auction':
            from ..ops.assignment import auction_match
            match = auction_match
        else:
            match = hungarian_match
        assigned_q = match(jax.lax.stop_gradient(cost))       # (B, G)

        # scatter gt onto queries
        labels = jnp.full((b, q), self.num_classes, jnp.int32)  # bg
        bbox_targets = jnp.zeros((b, q, 4), jnp.float32)
        weights = jnp.zeros((b, q), jnp.float32)

        def scatter(labels_b, bt_b, w_b, asg_b, lab_b, box_b, val_b):
            labels_b = labels_b.at[asg_b].set(
                jnp.where(val_b, lab_b, labels_b[asg_b]))
            bt_b = bt_b.at[asg_b].set(
                jnp.where(val_b[:, None], box_b, bt_b[asg_b]))
            w_b = w_b.at[asg_b].set(jnp.where(val_b, 1.0, w_b[asg_b]))
            return labels_b, bt_b, w_b

        labels, bbox_targets, weights = jax.vmap(scatter)(
            labels, bbox_targets, weights, assigned_q, gt_labels,
            gt_norm_cxcywh, gt_valid)

        num_pos = jnp.sum(weights)
        cls_avg = jnp.maximum(num_pos, 1.0)
        loss_cls = build_loss(self.loss_cls)(
            cls.reshape(-1, cls.shape[-1]), labels.reshape(-1),
            avg_factor=cls_avg)
        loss_bbox = build_loss(self.loss_bbox)(
            bbox, bbox_targets, weight=weights[..., None],
            avg_factor=jnp.maximum(num_pos, 1.0))
        xyxy_pred = box_cxcywh_to_xyxy(bbox) * factor[:, None]
        xyxy_tgt = box_cxcywh_to_xyxy(bbox_targets) * factor[:, None]
        loss_iou = build_loss(self.loss_iou)(
            xyxy_pred, xyxy_tgt, weight=weights,
            avg_factor=jnp.maximum(num_pos, 1.0))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_iou=loss_iou)

    # -- inference -------------------------------------------------------
    def get_bboxes(self, preds, img_shape, scale_factor=None, rescale=False):
        """Top max_per_img detections from the last decoder layer.

        Returns fixed-shape (B, K, 5) [xyxy, score] + (B, K) labels.
        """
        max_per_img = dict(self.test_cfg or {}).get('max_per_img', 100)
        cls = preds['cls_scores'][-1]
        bbox = preds['bbox_preds'][-1]
        b, q, c = cls.shape
        scores = jax.nn.sigmoid(cls).reshape(b, q * c)
        topv, topi = jax.lax.top_k(scores, max_per_img)
        query_idx = topi // c
        labels = topi % c
        boxes = jnp.take_along_axis(bbox, query_idx[..., None], 1)
        factor = jnp.stack([img_shape[:, 1], img_shape[:, 0],
                            img_shape[:, 1], img_shape[:, 0]],
                           -1).astype(jnp.float32)
        xyxy = box_cxcywh_to_xyxy(boxes) * factor[:, None]
        if rescale and scale_factor is not None:
            sf = jnp.concatenate([scale_factor, scale_factor], -1)
            xyxy = xyxy / sf[:, None]
        return dict(bboxes=jnp.concatenate([xyxy, topv[..., None]], -1),
                    labels=labels)
