"""DeMFVoteHead: deformable cross-attention fusion head.

TPU-native re-design of the reference head
(class_agnostic_vote_head.py:335-941): vote -> aggregate -> initial
proposals, then N decoder layers of {self-attn over proposals, multi-scale
deformable cross-attention into flattened image features at the proposals'
projected 2D locations}, each followed by re-prediction; the loss averages
over all N+1 prediction stages; inference ensembles configured stages before
3D NMS.

The 3D->2D reference-point bridge (inverse aug -> depth2img -> 2D transform,
ref :524-547) is fully batched/vmapped (core/transforms.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.transforms import project_points_to_image
from ..utils.registry import HEADS, build_loss
from .conv_bbox_head import BaseConvBboxHead
from .target_assign import get_vote_head_targets
from .transformer import (DeMFTransformerDecoderLayer, get_valid_ratios,
                          make_level_masks)
from .vote_head import CAVoteHead, multiclass_nms_3d
from .vote_module import VoteModule


@HEADS.register_module()
class DeMFVoteHead(CAVoteHead):
    """CAVoteHead + image-fusion transformer decoder (ref :335-466)."""
    decoder: Any = None

    @property
    def num_decoder_layers(self):
        return self.decoder['num_layers']

    def _pred_cfg(self):
        cfg = dict(self.pred_layer_cfg)
        conv_pred_layers = cfg.pop('conv_pred_layers')
        assert conv_pred_layers == self.num_decoder_layers + 1, (
            'conv_pred_layers must equal num_decoder_layers + 1 (ref :395)')
        return cfg, conv_pred_layers

    @nn.compact
    def __call__(self, feat_dict, sample_mod, img_dict,
                 train: bool = False):
        """
        Args:
            feat_dict: seed_points/features/indices from the point backbone.
            img_dict: dict with 'img_features' (tuple of NHWC maps),
                'img_meta' (batched meta arrays incl. img_shape, depth2img,
                aug records).
        Returns:
            results dict with 'decode_res_all' (list over stages).
        """
        results, feats = self._vote_and_aggregate(feat_dict, sample_mod,
                                                  train)
        aggregated_points = results['aggregated_points']
        coder = self.coder
        pred_cfg, n_stages = self._pred_cfg()

        heads = [BaseConvBboxHead(
            **pred_cfg,
            num_cls_out_channels=self._cls_out_channels(),
            num_reg_out_channels=self._reg_out_channels(),
            name=f'conv_pred{i}') for i in range(n_stages)]

        def predict(stage, query_feats):
            cls_pred, reg_pred = heads[stage](query_feats, train)
            return coder.split_pred(
                jnp.swapaxes(cls_pred, 1, 2), jnp.swapaxes(reg_pred, 1, 2),
                aggregated_points)

        decode_res_all = [predict(0, feats)]

        # ---- decoder inputs (ref prepare_decoder_inputs :549-594) --------
        mlvl_feats = img_dict['img_features']
        meta = img_dict['img_meta']
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in mlvl_feats)
        batch_hw = (mlvl_feats[0].shape[1] * 8, mlvl_feats[0].shape[2] * 8)
        masks = make_level_masks(meta['img_shape'], batch_hw, spatial_shapes)
        valid_ratios = get_valid_ratios(masks)
        feat_flatten = jnp.concatenate(
            [f.reshape(f.shape[0], -1, f.shape[-1]) for f in mlvl_feats], 1)
        mask_flatten = jnp.concatenate(
            [m.reshape(m.shape[0], -1) for m in masks], 1)
        reference_points = project_points_to_image(aggregated_points, meta)

        query = feats
        for i in range(self.num_decoder_layers):
            dec = decode_res_all[-1]
            query_pos_input = jax.lax.stop_gradient(jnp.concatenate(
                [dec['center'], dec['size']], -1))
            query = DeMFTransformerDecoderLayer(
                transformerlayers=self.decoder.get('transformerlayers'),
                posembed=self.decoder.get('posembed'),
                name=f'decoder_{i}')(
                    query, feat_flatten,
                    query_pos_input=query_pos_input,
                    key_padding_mask=mask_flatten,
                    reference_points=reference_points,
                    spatial_shapes=spatial_shapes,
                    valid_ratios=valid_ratios, train=train)
            decode_res_all.append(predict(i + 1, query))

        results['decode_res_all'] = decode_res_all
        return results

    # -- loss ----------------------------------------------------------------
    def loss(self, results, points, gt_bboxes_3d, gt_labels_3d, gt_valid):
        """Mean over all prediction stages of the DeMF per-stage loss
        (ref :596-620; per-stage math :622-712).  Targets depend only on the
        (shared) aggregated points, so they are computed once."""
        coder = self.coder
        targets = get_vote_head_targets(
            points, gt_bboxes_3d, gt_labels_3d, gt_valid,
            results['aggregated_points'], coder, self.train_cfg,
            self.gt_per_seed, mode='demf')

        vm = VoteModule(**self.vote_module_cfg, parent=None)
        vote_loss = vm.get_loss(
            results['seed_points'], results['vote_points'],
            results['seed_indices'], targets['vote_target_masks'],
            targets['vote_targets'])

        stages = results['decode_res_all']
        n = len(stages)
        losses = {}

        def acc(key, value):
            losses[key] = losses.get(key, 0.) + value / n

        blw = targets['box_loss_weights']
        for dec in stages:
            acc('vote_loss', vote_loss)
            acc('objectness_loss', build_loss(self.objectness_loss)(
                dec['obj_scores'], targets['objectness_targets'],
                weight=targets['objectness_weights']))
            acc('size_res_loss', build_loss(self.size_res_loss)(
                dec['size'], targets['size_targets'], weight=blw[..., None]))
            acc('center_loss', build_loss(self.center_loss)(
                dec['center'], targets['center_targets'],
                weight=blw[..., None]))
            acc('dir_class_loss', build_loss(self.dir_class_loss)(
                dec['dir_class'], targets['dir_class_targets'], weight=blw))
            dir_res_norm = jnp.take_along_axis(
                dec['dir_res_norm'],
                targets['dir_class_targets'][..., None], -1)[..., 0]
            acc('dir_res_loss', build_loss(self.dir_res_loss)(
                dir_res_norm, targets['dir_res_targets'], weight=blw))
            if self.with_semantic:
                acc('semantic_loss', build_loss(self.semantic_loss)(
                    dec['sem_scores'], targets['mask_targets'], weight=blw))
            if self.iou_loss is not None:
                corners_pred = coder.decode_corners(dec['center'],
                                                    dec['size'])
                corners_target = coder.decode_corners(
                    targets['center_targets'], targets['size_targets'])
                acc('iou_loss', build_loss(self.iou_loss)(
                    corners_pred, corners_target, weight=blw))
        return losses

    # -- inference -------------------------------------------------------
    def get_bboxes(self, points, results):
        """Ensemble configured stages then multiclass 3D NMS (ref :714-754)."""
        coder = self.coder
        stages = results['decode_res_all']
        obj_scores, sem_scores, bbox3d = [], [], []
        for i in self.test_cfg['ensemble_layers']:
            dec = stages[i]
            obj_scores.append(jax.nn.softmax(dec['obj_scores'], -1)[..., -1])
            sem_scores.append(jax.nn.softmax(dec['sem_scores'], -1))
            bbox3d.append(coder.decode(dec))
        obj_scores = jnp.concatenate(obj_scores, 1)
        sem_scores = jnp.concatenate(sem_scores, 1)
        bbox3d = jnp.concatenate(bbox3d, 1)
        return multiclass_nms_3d(obj_scores, sem_scores, bbox3d, points,
                                 self.test_cfg)
