"""VoteNet detector: PointNet++ backbone + CAVoteHead.

TPU-native equivalent of the reference's PC-only baseline
(configs/baseline/votenet.py; mmdet3d ``VoteNet`` detector referenced at
configs/_base_/models/votenet.py:2).  Train/test forwards are single jitted
functions over fixed-shape padded batches.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..utils.registry import DETECTORS, build_from_cfg, BACKBONES, HEADS


@DETECTORS.register_module()
class VoteNet(nn.Module):
    backbone: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None
    init_cfg: Any = None

    def _build_head(self, name=None):
        """name='bbox_head' inside compact; name=None -> unparented module
        for pure-math helpers (loss / get_bboxes need no params)."""
        cfg = dict(self.bbox_head)
        cfg['train_cfg'] = self.train_cfg
        cfg['test_cfg'] = self.test_cfg
        extra = {'name': name} if name else {'parent': None}
        return build_from_cfg(cfg, HEADS, extra)

    @nn.compact
    def __call__(self, batch, train: bool = False, sample_mod=None):
        """batch: dict with 'points' (B, P, C_in). Returns head results."""
        points = batch['points'] if isinstance(batch, dict) else batch
        backbone = build_from_cfg(dict(self.backbone), BACKBONES,
                                  {'name': 'backbone'})
        x = backbone(points, train)
        feat_dict = dict(
            seed_points=x['fp_xyz'][-1],
            seed_features=x['fp_features'][-1],
            seed_indices=x['fp_indices'][-1])
        if sample_mod is None:
            sample_mod = (self.train_cfg['sample_mod'] if train
                          else self.test_cfg['sample_mod'])
        head = self._build_head(name='bbox_head')
        return head(feat_dict, sample_mod, train)

    # plain (non-flax) helpers usable outside apply()
    def loss(self, results, batch):
        head = self._build_head()
        return head.loss(results, batch['points'], batch['gt_bboxes_3d'],
                         batch['gt_labels_3d'], batch['gt_valid'])

    def get_bboxes(self, results, batch):
        head = self._build_head()
        return head.get_bboxes(batch['points'], results)
