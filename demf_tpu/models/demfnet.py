"""DeMFVoteNet detector: frozen image branch + point branch + fusion head.

TPU-native re-design of the reference detector
(demf/modeling/detectors/demfnet.py): ResNet-50 -> ChannelMapper ->
Deformable-DETR encoder (frozen: run in eval mode under stop_gradient,
mirroring @torch.no_grad + .eval() + requires_grad=False, ref :103-132),
PointNet++ point branch, DeMFVoteHead fusion.  The stage-1 checkpoint remap
(img_bbox_head.transformer.encoder -> img_encoder, ref :85-101) lives in
engine/checkpoint.remap_img_branch_keys.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from ..utils.registry import (BACKBONES, DETECTORS, HEADS, NECKS,
                              build_from_cfg)


@DETECTORS.register_module()
class DeMFVoteNet(nn.Module):
    pts_backbone: Any = None
    pts_bbox_head: Any = None
    pts_neck: Any = None
    img_backbone: Any = None
    img_neck: Any = None
    img_encoder: Any = None
    # accepted for config-surface parity (the demf config inherits the
    # deformdetr base whose DETR head DeMF does not use, ref demfnet.py:27)
    img_bbox_head: Any = None
    freeze_img_branch: bool = False
    num_sampled_seed: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None
    init_cfg: Any = None

    def _build_head(self, name=None):
        cfg = dict(self.pts_bbox_head)
        cfg['train_cfg'] = (self.train_cfg or {}).get('pts')
        cfg['test_cfg'] = (self.test_cfg or {}).get('pts')
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    def extract_img_feat(self, img, img_shape, train):
        """Image branch; frozen => eval mode + stop_gradient (ref :124-132)."""
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

    @nn.compact
    def __call__(self, batch, train: bool = False, sample_mod=None,
                 img_feat_only: bool = False):
        """batch needs 'points', 'img_meta' and either 'img' (HxWx3 images)
        or 'img_features' (precomputed frozen-branch features — the frozen
        image branch output is deterministic per scene, so a TPU-first
        training loop computes it once per scene and caches it; see
        engine/feature_cache.py).  ``img_feat_only=True`` runs just the
        image branch (the cache-fill pass)."""
        meta = batch['img_meta']

        if 'img_features' in batch:
            img_features = jax.lax.stop_gradient(
                tuple(batch['img_features']))
        else:
            img_features = self.extract_img_feat(
                batch['img'], meta['img_shape'], train)
        if img_feat_only:
            return img_features
        points = batch['points']

        pts_backbone = build_from_cfg(dict(self.pts_backbone), BACKBONES,
                                      {'name': 'pts_backbone'})
        x = pts_backbone(points, train)
        feat_dict = dict(
            seed_points=x['fp_xyz'][-1],
            seed_features=x['fp_features'][-1],
            seed_indices=x['fp_indices'][-1])
        img_dict = dict(img_features=img_features, img_meta=meta)

        if sample_mod is None:
            cfg = self.train_cfg if train else self.test_cfg
            sample_mod = cfg['pts']['sample_mod']
        head = self._build_head(name='pts_bbox_head')
        return head(feat_dict, sample_mod, img_dict, train)

    def loss(self, results, batch):
        head = self._build_head()
        return head.loss(results, batch['points'], batch['gt_bboxes_3d'],
                         batch['gt_labels_3d'], batch['gt_valid'])

    def get_bboxes(self, results, batch):
        head = self._build_head()
        return head.get_bboxes(batch['points'], results)

    def frozen_param_patterns(self):
        """Param-path substrings to freeze in the optimizer when
        freeze_img_branch (the lr-side half of ref :103-112)."""
        if not self.freeze_img_branch:
            return []
        return ['img_backbone', 'img_neck', 'img_encoder']
