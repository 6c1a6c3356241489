"""ImVoteNet detectors: the Deformable-DETR variant (and shared machinery).

TPU-native re-design of the reference's ``ImVoteNet_Deformdetr``
(demf/modeling/detectors/imvotenet_deform.py): dual-mode detector —
image-only 2D pretrain when the batch has no points (ref :300-305), full
PC+RGB fusion otherwise (ref :306-385).  The fusion path: frozen 2D
inference -> score filter (0.09) -> train-time random half-drop -> VoteFusion
18-dim imvotes -> fixed-shape seed sampling -> MLP + concat -> three vote
towers (joint/pts/img) with weighted loss combine [0.4, 0.3, 0.3].
All the reference's per-sample host loops (``sample_valid_seeds``, box
filtering) are fixed-shape device ops here.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.registry import (BACKBONES, DETECTORS, HEADS, NECKS,
                              build_from_cfg)
from .pointnet2 import SharedMLP, gather_points_last
from .vote_fusion import VoteFusion, sample_valid_seeds

from .rpn_roi import RPNHead, StandardRoIHead  # noqa: E402 (registration)

MAX_2D_BOXES = 100  # static capacity = DETR test_cfg max_per_img


class ImgMLP(nn.Module):
    """mmdet3d ``MLP``: Conv1d(18->256)+BN+ReLU -> Conv1d(256->256)+BN+ReLU
    (cfg configs/baseline/imvotenet.py img_mlp)."""
    conv_channels: Any = (256, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return SharedMLP(list(self.conv_channels), name='mlp')(x, train)


@DETECTORS.register_module()
class ImVoteNet_Deformdetr(nn.Module):
    pts_backbone: Any = None
    pts_bbox_heads: Any = None
    pts_neck: Any = None
    img_backbone: Any = None
    img_neck: Any = None
    img_bbox_head: Any = None
    img_mlp: Any = None
    freeze_img_branch: bool = False
    fusion_layer: Any = None
    num_sampled_seed: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None
    init_cfg: Any = None

    # -- submodule builders -------------------------------------------------
    def _img_head(self, name=None):
        cfg = dict(self.img_bbox_head)
        cfg['train_cfg'] = self.train_cfg
        cfg['test_cfg'] = self.test_cfg
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    def _tower_cfgs(self):
        heads = dict(self.pts_bbox_heads)
        common = dict(heads['common'])
        common['train_cfg'] = (self.train_cfg or {}).get('pts')
        common['test_cfg'] = (self.test_cfg or {}).get('pts')
        towers = {}
        for tower in ('joint', 'pts', 'img'):
            cfg = dict(common)
            cfg.update(dict(heads[tower]))
            towers[tower] = cfg
        return towers, list(heads['loss_weights'])

    def _tower_head(self, tower, name=None):
        cfg = self._tower_cfgs()[0][tower]
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    # -- image branch ---------------------------------------------------
    def extract_img_feat(self, img, train):
        img_train = train and not self.freeze_img_branch
        backbone = build_from_cfg(dict(self.img_backbone), BACKBONES,
                                  {'name': 'img_backbone'})
        x = backbone(img, train=img_train)
        if self.img_neck is not None:
            neck = build_from_cfg(dict(self.img_neck), NECKS,
                                  {'name': 'img_neck'})
            x = neck(x, train=img_train)
        return x

    def extract_bboxes_2d(self, img, meta, train):
        """Frozen 2D inference -> (B, K, 6) score-sorted padded boxes + mask
        (ref :180-248: filter at 0.09, sort, drop half at train)."""
        feats = self.extract_img_feat(img, train=False)
        head = self._img_head(name='img_bbox_head')
        preds = head(feats, meta['img_shape'], train=False)
        det = head.get_bboxes(preds, meta['img_shape'])
        det = jax.lax.stop_gradient(det)
        boxes = jnp.concatenate(
            [det['bboxes'],
             det['labels'][..., None].astype(det['bboxes'].dtype)], -1)
        valid = det['bboxes'][..., 4] > 0.09
        if train:
            # keep a random half of the valid boxes (ceil(count/2)),
            # vectorized: rank valid boxes by random key, keep low ranks
            rng = self.make_rng('sample')
            u = jax.random.uniform(rng, valid.shape)
            key = jnp.where(valid, u, jnp.inf)
            rank = jnp.sum(key[..., None, :] < key[..., :, None], -1)
            count = jnp.sum(valid, -1, keepdims=True)
            keep = rank < ((count + 1) // 2)
            valid = valid & keep
        return boxes, valid

    # -- forward ----------------------------------------------------------
    @nn.compact
    def __call__(self, batch, train: bool = False, sample_mod=None):
        return self._forward_impl(batch, train, sample_mod)

    def _forward_impl(self, batch, train: bool = False, sample_mod=None):
        meta = batch['img_meta']
        if 'points' not in batch:  # stage-1 image-only 2D pretrain
            feats = self.extract_img_feat(batch['img'], train)
            head = self._img_head(name='img_bbox_head')
            return dict(img_preds=head(feats, meta['img_shape'], train))

        boxes_2d, box_valid = self.extract_bboxes_2d(
            batch['img'], meta, train)

        pts_backbone = build_from_cfg(dict(self.pts_backbone), BACKBONES,
                                      {'name': 'pts_backbone'})
        x = pts_backbone(batch['points'], train)
        seeds_3d = x['fp_xyz'][-1]
        seed_feats = x['fp_features'][-1]
        seed_indices = x['fp_indices'][-1]
        b, n = seeds_3d.shape[:2]

        fusion_cfg = dict(self.fusion_layer or {})
        fusion_cfg.pop('type', None)
        fusion = VoteFusion(**fusion_cfg)
        img_votes, vote_mask = fusion(batch['img'], boxes_2d, box_valid,
                                      seeds_3d, meta)

        rng = (self.make_rng('sample') if train
               else jax.random.PRNGKey(0))
        inds = sample_valid_seeds(vote_mask, self.num_sampled_seed, rng)
        img_votes = gather_points_last(img_votes, inds)   # (B, S, 18)
        seed_inds = inds % n
        seeds_3d = gather_points_last(seeds_3d, seed_inds)
        seed_feats = gather_points_last(seed_feats, seed_inds)
        seed_indices = jnp.take_along_axis(seed_indices, seed_inds, 1)

        mlp_cfg = dict(self.img_mlp or {})
        img_feats = ImgMLP(conv_channels=mlp_cfg.get('conv_channels',
                                                     (256, 256)),
                           name='img_mlp')(img_votes, train)
        fused = jnp.concatenate([seed_feats, img_feats], -1)

        feat_dicts = dict(
            joint=dict(seed_points=seeds_3d, seed_features=fused,
                       seed_indices=seed_indices),
            pts=dict(seed_points=seeds_3d, seed_features=seed_feats,
                     seed_indices=seed_indices),
            img=dict(seed_points=seeds_3d, seed_features=img_feats,
                     seed_indices=seed_indices))

        if sample_mod is None:
            cfg = self.train_cfg if train else self.test_cfg
            sample_mod = cfg['pts']['sample_mod']

        tower_cfgs, _ = self._tower_cfgs()
        results = {}
        for tower in ('joint', 'pts', 'img'):
            head = build_from_cfg(tower_cfgs[tower], HEADS,
                                  {'name': f'pts_bbox_head_{tower}'})
            results[tower] = head(feat_dicts[tower], sample_mod, train)
        results['bboxes_2d'] = boxes_2d
        results['bboxes_2d_valid'] = box_valid
        return results

    # -- losses --------------------------------------------------------
    def loss(self, results, batch):
        if 'img_preds' in results:  # stage-1
            head = self._img_head()
            return head.loss(results['img_preds'], batch['gt_bboxes'],
                             batch['gt_labels'], batch['gt_bboxes_valid'],
                             batch['img_meta']['img_shape'])
        _, loss_weights = self._tower_cfgs()
        towers = ('joint', 'pts', 'img')
        combined = {}
        for w, tower in zip(loss_weights, towers):
            head = self._tower_head(tower)
            losses = head.loss(results[tower], batch['points'],
                               batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                               batch['gt_valid'])
            for k, v in losses.items():
                combined[k] = combined.get(k, 0.) + v * w
        return combined

    def get_bboxes(self, results, batch):
        if 'img_preds' in results:
            head = self._img_head()
            return head.get_bboxes(results['img_preds'],
                                   batch['img_meta']['img_shape'])
        head = self._tower_head('joint')
        return head.get_bboxes(batch['points'], results['joint'])

    def frozen_param_patterns(self):
        if not self.freeze_img_branch:
            return []
        return ['img_backbone', 'img_neck', 'img_bbox_head']


@DETECTORS.register_module()
class ImVoteNet(ImVoteNet_Deformdetr):
    """ImVoteNet baseline: Faster R-CNN 2D branch + 3-tower vote fusion.

    TPU-native equivalent of mmdet3d ``ImVoteNet``
    (configs/baseline/imvotenet.py: caffe ResNet-50 + FPN + RPN + RoIAlign +
    Shared2FCBBoxHead, frozen at stage 2; 64.4/43.3 mAP).  Shares all fusion
    machinery with the Deformable-DETR variant; only the 2D extraction path
    differs.  The 2D branch runs inference-only (the published workflow
    warm-starts it from a ported upstream checkpoint).
    """
    img_rpn_head: Any = None
    img_roi_head: Any = None

    def _rpn_head(self, name=None):
        cfg = dict(self.img_rpn_head)
        cfg['train_cfg'] = (self.train_cfg or {}).get('img_rpn')
        cfg['test_cfg'] = (self.test_cfg or {}).get('img_rpn')
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    def _roi_head(self, name=None):
        cfg = dict(self.img_roi_head)
        cfg['train_cfg'] = (self.train_cfg or {}).get('img_rcnn')
        cfg['test_cfg'] = (self.test_cfg or {}).get('img_rcnn')
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    def extract_bboxes_2d(self, img, meta, train):
        """RPN proposals -> RoI head -> (B, K, 6) padded sorted boxes."""
        feats = self.extract_img_feat(img, train=False)
        rpn = self._rpn_head(name='img_rpn_head')
        outs = rpn(feats, train=False)
        proposal_cfg = (self.test_cfg or {}).get('img_rpn') or {}
        proposals, p_scores, p_valid = rpn.get_proposals(
            outs, meta['img_shape'], dict(proposal_cfg))
        roi = self._roi_head(name='img_roi_head')
        cls_logits, bbox_deltas = roi(feats, proposals, p_valid,
                                      train=False)
        det = roi.get_bboxes(cls_logits, bbox_deltas, proposals, p_valid,
                             meta['img_shape'])
        det = jax.lax.stop_gradient(det)
        boxes = jnp.concatenate(
            [det['bboxes'],
             det['labels'][..., None].astype(det['bboxes'].dtype)], -1)
        score_thr = ((self.test_cfg or {}).get('img_rcnn') or {}).get(
            'score_thr', 0.05)
        valid = det['valid'] & (det['bboxes'][..., 4] > score_thr)
        if train:
            rng = self.make_rng('sample')
            u = jax.random.uniform(rng, valid.shape)
            key = jnp.where(valid, u, jnp.inf)
            rank = jnp.sum(key[..., None, :] < key[..., :, None], -1)
            count = jnp.sum(valid, -1, keepdims=True)
            keep = rank < ((count + 1) // 2)
            valid = valid & keep
        return boxes, valid

    @nn.compact
    def __call__(self, batch, train: bool = False, sample_mod=None):
        if 'points' in batch:
            return self._forward_impl(batch, train, sample_mod)
        # image-only Faster R-CNN training/inference path
        from .rpn_roi import sample_rcnn_rois
        feats = self.extract_img_feat(batch['img'], train)
        rpn = self._rpn_head(name='img_rpn_head')
        outs = rpn(feats, train)
        results = {'rpn_outs': outs}
        meta = batch['img_meta']
        proposal_cfg = dict((self.train_cfg if train else self.test_cfg)
                            .get('img_rpn_proposal' if train else 'img_rpn')
                            or {})
        proposals, _, p_valid = rpn.get_proposals(
            outs, meta['img_shape'], proposal_cfg)
        roi = self._roi_head(name='img_roi_head')
        if train and 'gt_bboxes' in batch:
            rng = self.make_rng('sample')
            results['sample_rng'] = jax.random.fold_in(rng, 99)
            sampled = sample_rcnn_rois(
                jax.lax.stop_gradient(proposals), p_valid,
                batch['gt_bboxes'], batch['gt_labels'],
                batch['gt_bboxes_valid'],
                dict((self.train_cfg or {}).get('img_rcnn') or {}),
                dict(self.img_roi_head['bbox_head']).get('num_classes', 10),
                rng)
            cls_logits, bbox_deltas = roi(feats, sampled['rois'],
                                          sampled['chosen'], train)
            results.update(rcnn_sampled=sampled, rcnn_cls=cls_logits,
                           rcnn_deltas=bbox_deltas)
        else:
            cls_logits, bbox_deltas = roi(feats, proposals, p_valid,
                                          train=False)
            results.update(proposals=proposals, proposal_valid=p_valid,
                           rcnn_cls=cls_logits, rcnn_deltas=bbox_deltas)
        return results

    def loss(self, results, batch):
        if 'rpn_outs' in results:  # image-only 2D training
            from .rpn_roi import rcnn_loss, rpn_loss
            rpn_cfg = dict(self.img_rpn_head)
            losses = rpn_loss(
                results['rpn_outs'], dict(rpn_cfg['anchor_generator']),
                dict(rpn_cfg['bbox_coder']),
                batch['gt_bboxes'], batch['gt_bboxes_valid'],
                dict((self.train_cfg or {}).get('img_rpn') or {}),
                dict(rpn_cfg['loss_cls']), dict(rpn_cfg['loss_bbox']),
                results.get('sample_rng', jax.random.PRNGKey(0)))
            roi_cfg = dict(self.img_roi_head)
            head_cfg = dict(roi_cfg['bbox_head'])
            losses.update(rcnn_loss(
                results['rcnn_cls'], results['rcnn_deltas'],
                results['rcnn_sampled'], dict(head_cfg['bbox_coder']),
                head_cfg.get('num_classes', 10),
                dict(head_cfg['loss_cls']), dict(head_cfg['loss_bbox'])))
            return losses
        return ImVoteNet_Deformdetr.loss(self, results, batch)

    def get_bboxes(self, results, batch):
        if 'proposals' in results:  # image-only FRCNN inference
            roi = self._roi_head()
            return roi.get_bboxes(
                results['rcnn_cls'], results['rcnn_deltas'],
                results['proposals'], results['proposal_valid'],
                batch['img_meta']['img_shape'])
        return ImVoteNet_Deformdetr.get_bboxes(self, results, batch)

    def frozen_param_patterns(self):
        if not self.freeze_img_branch:
            return []
        return ['img_backbone', 'img_neck', 'img_rpn_head', 'img_roi_head']
