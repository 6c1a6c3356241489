"""Tests for the Faster R-CNN image branch components + ImVoteNet baseline."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import demf_tpu.models  # noqa: F401
from demf_tpu.models.rpn_roi import (bbox2delta, delta2bbox, grid_anchors,
                                     pyramid_roi_align)
from demf_tpu.utils.config import Config
from demf_tpu.utils.registry import DETECTORS, build_from_cfg
from test_demf import demf_batch


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.abs(rng.rand(10, 4)) * 50
    anchors[:, 2:] += anchors[:, :2] + 5
    boxes = anchors + rng.randn(10, 4) * 2
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(anchors), jnp.asarray(boxes), stds=stds)
    rec = delta2bbox(jnp.asarray(anchors), deltas, stds=stds)
    np.testing.assert_allclose(np.asarray(rec), boxes, atol=1e-3)


def test_grid_anchors_shapes_and_center():
    a = np.asarray(grid_anchors((4, 6), 8, [8], [0.5, 1.0, 2.0]))
    assert a.shape == (4 * 6 * 3, 4)
    # the square anchor at cell (0, 0) is centered at stride/2
    sq = a[1]  # ratio 1.0
    np.testing.assert_allclose([(sq[0] + sq[2]) / 2, (sq[1] + sq[3]) / 2],
                               [4.0, 4.0], atol=1e-4)
    np.testing.assert_allclose(sq[2] - sq[0], 64.0, atol=1e-4)  # 8 * 8


def test_pyramid_roi_align_constant_map():
    # constant feature maps -> pooled value equals the level's constant
    feats = tuple(jnp.full((h, w, 3), float(lvl + 1))
                  for lvl, (h, w) in enumerate([(16, 16), (8, 8)]))
    rois = jnp.asarray([[4., 4., 28., 28.], [0., 0., 60., 60.]])
    lvl = jnp.asarray([0, 1], jnp.int32)
    out = np.asarray(pyramid_roi_align(feats, rois, lvl, [4, 8], 7))
    np.testing.assert_allclose(out[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 2.0, atol=1e-5)


def tiny_imvotenet_cfg():
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(__file__), '..', 'configs/baseline/imvotenet.py'))
    m = dict(cfg.model)
    # shrink for CPU: tiny backbone/towers, keep the real RPN/RoI wiring
    m['img_neck'] = dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                         out_channels=16, num_outs=5)
    m['img_rpn_head'] = dict(m['img_rpn_head'], in_channels=16,
                             feat_channels=16)
    roi = dict(m['img_roi_head'])
    roi['bbox_head'] = dict(roi['bbox_head'], in_channels=16,
                            fc_out_channels=32)
    m['img_roi_head'] = roi
    m['pts_backbone'] = dict(
        type='PointNet2SASSG', in_channels=4, num_points=(64, 32, 16, 8),
        radius=(0.2, 0.4, 0.8, 1.2), num_samples=(8, 8, 4, 4),
        sa_channels=((16, 16, 16), (16, 16, 16), (16, 16, 16), (16, 16, 16)),
        fp_channels=((16, 16), (16, 16)), norm_cfg=dict(type='BN2d'),
        sa_cfg=dict(type='PointSAModule', pool_mod='max', use_xyz=True,
                    normalize_xyz=True))
    heads = dict(m['pts_bbox_heads'])
    heads['common'] = dict(heads['common'], pred_layer_cfg=dict(
        in_channels=16, shared_conv_channels=(16, 16), bias=True))

    def tower(in_ch):
        return dict(
            vote_module_cfg=dict(
                in_channels=in_ch, vote_per_seed=1, gt_per_seed=3,
                conv_channels=(in_ch, in_ch), norm_feats=True,
                vote_loss=dict(type='ChamferDistance', mode='l1',
                               reduction='none', loss_dst_weight=10.0)),
            vote_aggregation_cfg=dict(
                type='PointSAModule', num_point=8, radius=0.3, num_sample=4,
                mlp_channels=[in_ch, 16, 16, 16], use_xyz=True,
                normalize_xyz=True))

    heads['joint'] = tower(32)
    heads['pts'] = tower(16)
    heads['img'] = tower(16)
    m['pts_bbox_heads'] = heads
    m['img_mlp'] = dict(in_channel=18, conv_channels=(16, 16))
    m['num_sampled_seed'] = 32
    # smaller RPN candidate budget for test speed
    tc = dict(m['test_cfg'])
    tc['img_rpn'] = dict(tc['img_rpn'], nms_pre=32, max_per_img=16)
    tc['img_rcnn'] = dict(tc['img_rcnn'], max_per_img=8)
    m['test_cfg'] = tc
    return m


def test_imvotenet_baseline_fusion():
    model = build_from_cfg(tiny_imvotenet_cfg(), DETECTORS)
    batch = demf_batch(np.random.RandomState(2))
    variables = jax.jit(lambda r, b: model.init(
        {'params': r, 'sample': jax.random.fold_in(r, 1)}, b,
        train=False))(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd_loss(variables, batch, rng):
        results, _ = model.apply(
            variables, batch, train=True, mutable=['batch_stats'],
            rngs={'dropout': rng, 'sample': jax.random.fold_in(rng, 3)})
        return results, model.loss(results, batch)

    results, losses = fwd_loss(variables, batch, jax.random.PRNGKey(1))
    assert results['bboxes_2d'].shape[-1] == 6
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))

    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch, train=False,
                              rngs={'sample': jax.random.PRNGKey(0)})
        return model.get_bboxes(results, batch)

    det = infer(variables, batch)
    assert det['boxes_3d'].shape == (2, 80, 7)
    assert np.isfinite(np.asarray(det['scores_3d'])).all()


def test_max_iou_assign_semantics():
    from demf_tpu.models.assign_sample import max_iou_assign, iou_2d
    anchors = jnp.asarray([[0, 0, 10, 10], [0, 0, 9, 9], [50, 50, 60, 60],
                           [100, 100, 101, 101]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [52, 52, 58, 58]], jnp.float32)
    valid = jnp.ones(2, bool)
    ious = iou_2d(anchors, gt)
    out = np.asarray(max_iou_assign(ious, valid, 0.7, 0.3, 0.3, True))
    assert out[0] == 0          # exact match -> gt 0
    assert out[1] == 0          # high IoU -> gt 0
    assert out[2] == 1          # low-quality match claims gt 1's best anchor
    assert out[3] == -1         # background


def test_random_sample_counts():
    from demf_tpu.models.assign_sample import random_sample
    assigned = jnp.asarray([0] * 10 + [-1] * 100 + [-2] * 20)
    pos, neg = random_sample(assigned, 32, 0.5, jax.random.PRNGKey(0))
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 10           # all 10 positives (< 16 cap)
    assert neg.sum() == 22           # fill to 32
    assert not (pos & neg).any()
    assert not pos[110:].any() and not neg[110:].any()  # ignores excluded


def test_frcnn_image_only_training():
    """RPN + RCNN losses through the ImVoteNet image-only path."""
    from test_detr_imvotenet import img_only_batch
    cfg = tiny_imvotenet_cfg()
    # small proposal budget for test speed
    tc = dict(cfg['train_cfg'])
    tc['img_rpn_proposal'] = dict(nms_pre=16, max_per_img=16,
                                  nms=dict(type='nms', iou_threshold=0.7))
    tc['img_rcnn'] = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False),
        sampler=dict(type='RandomSampler', num=16, pos_fraction=0.25))
    tc['img_rpn'] = dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      match_low_quality=True),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5))
    cfg['train_cfg'] = tc
    model = build_from_cfg(cfg, DETECTORS)
    batch = img_only_batch(np.random.RandomState(5))
    variables = jax.jit(lambda r, b: model.init(
        {'params': r, 'sample': jax.random.fold_in(r, 2)}, b,
        train=True))(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd_loss(variables, batch, rng):
        results, _ = model.apply(
            variables, batch, train=True, mutable=['batch_stats'],
            rngs={'dropout': rng, 'sample': jax.random.fold_in(rng, 3)})
        return model.loss(results, batch)

    losses = fwd_loss(variables, batch, jax.random.PRNGKey(1))
    assert {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls',
            'loss_bbox'} <= set(losses)
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))

    # grads flow into RPN and RoI heads
    def loss_fn(params):
        results, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(0),
                  'sample': jax.random.PRNGKey(4)})
        return sum(jnp.sum(v) for v in model.loss(results, batch).values())

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    g_rpn = float(sum(jnp.sum(jnp.abs(x)) for x in
                      jax.tree_util.tree_leaves(grads['img_rpn_head'])))
    g_roi = float(sum(jnp.sum(jnp.abs(x)) for x in
                      jax.tree_util.tree_leaves(grads['img_roi_head'])))
    assert g_rpn > 0 and g_roi > 0
