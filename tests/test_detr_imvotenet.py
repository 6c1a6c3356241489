"""Tests: Deformable-DETR head (stage-1) and ImVoteNet_Deformdetr fusion."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import demf_tpu.models  # noqa: F401
from demf_tpu.utils.registry import DETECTORS, build_from_cfg
from test_demf import demf_batch

pytestmark = pytest.mark.slow  # heavy-compile e2e tier


def tiny_imvotenet_deform_cfg():
    head_common = dict(
        type='CAVoteHead', num_classes=10,
        bbox_coder=dict(type='ClassAgnosticBBoxCoder', num_dir_bins=12,
                        with_rot=True, num_sizes=10),
        pred_layer_cfg=dict(in_channels=16, shared_conv_channels=(16, 16),
                            bias=True),
        objectness_loss=dict(type='CrossEntropyLoss', class_weight=[0.2, 0.8],
                             reduction='sum', loss_weight=5.0),
        dir_class_loss=dict(type='CrossEntropyLoss', reduction='sum',
                            loss_weight=1.0),
        dir_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                          loss_weight=10.0),
        size_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                           loss_weight=10.0, beta=0.15),
        iou_loss=dict(type='AxisAlignedIoULoss', reduction='sum',
                      loss_weight=4.0),
        semantic_loss=dict(type='CrossEntropyLoss', reduction='sum',
                           loss_weight=1.0))

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

    return dict(
        type='ImVoteNet_Deformdetr',
        img_backbone=dict(type='ResNet', depth=50, num_stages=4,
                          out_indices=(1, 2, 3), frozen_stages=1,
                          norm_eval=True, style='pytorch'),
        img_neck=dict(type='ChannelMapper', in_channels=[512, 1024, 2048],
                      kernel_size=1, out_channels=32, act_cfg=None,
                      norm_cfg=dict(type='GN', num_groups=8), num_outs=4),
        img_bbox_head=dict(
            type='DeformableDETRHead', num_query=20, num_classes=10,
            in_channels=2048, sync_cls_avg_factor=True, as_two_stage=False,
            embed_dims=32,
            transformer=dict(
                type='DeformableDetrTransformer',
                encoder=dict(
                    type='DetrTransformerEncoder', num_layers=1,
                    transformerlayers=dict(
                        type='BaseTransformerLayer',
                        attn_cfgs=dict(type='MultiScaleDeformableAttention',
                                       embed_dims=32),
                        feedforward_channels=64, ffn_dropout=0.1,
                        operation_order=('self_attn', 'norm', 'ffn',
                                         'norm'))),
                decoder=dict(
                    type='DeformableDetrTransformerDecoder', num_layers=2,
                    return_intermediate=True,
                    transformerlayers=dict(
                        type='DetrTransformerDecoderLayer',
                        attn_cfgs=[
                            dict(type='MultiheadAttention', embed_dims=32,
                                 num_heads=4, dropout=0.1),
                            dict(type='MultiScaleDeformableAttention',
                                 embed_dims=32)],
                        feedforward_channels=64, ffn_dropout=0.1,
                        operation_order=('self_attn', 'norm', 'cross_attn',
                                         'norm', 'ffn', 'norm')))),
            positional_encoding=dict(type='SinePositionalEncoding',
                                     num_feats=16, normalize=True,
                                     offset=-0.5),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=2.0),
            loss_bbox=dict(type='L1Loss', loss_weight=5.0),
            loss_iou=dict(type='GIoULoss', loss_weight=2.0)),
        pts_backbone=dict(
            type='PointNet2SASSG', in_channels=4, num_points=(64, 32, 16, 8),
            radius=(0.2, 0.4, 0.8, 1.2), num_samples=(8, 8, 4, 4),
            sa_channels=((16, 16, 16), (16, 16, 16), (16, 16, 16),
                         (16, 16, 16)),
            fp_channels=((16, 16), (16, 16)), norm_cfg=dict(type='BN2d'),
            sa_cfg=dict(type='PointSAModule', pool_mod='max', use_xyz=True,
                        normalize_xyz=True)),
        pts_bbox_heads=dict(
            common=head_common,
            joint=tower(32),   # 16 pts + 16 img
            pts=tower(16),
            img=tower(16),
            loss_weights=[0.4, 0.3, 0.3]),
        img_mlp=dict(in_channel=18, conv_channels=(16, 16)),
        fusion_layer=dict(type='VoteFusion', num_classes=10,
                          max_imvote_per_pixel=3),
        num_sampled_seed=32,
        freeze_img_branch=True,
        train_cfg=dict(
            assigner=dict(
                type='HungarianAssigner',
                cls_cost=dict(type='FocalLossCost', weight=2.0),
                reg_cost=dict(type='BBoxL1Cost', weight=5.0,
                              box_format='xywh'),
                iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0)),
            pts=dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                     sample_mod='seed')),
        test_cfg=dict(max_per_img=100,
                      pts=dict(sample_mod='seed', nms_thr=0.25,
                               score_thr=0.05, per_class_proposal=True)))


def img_only_batch(rng, b=2, hw=(64, 96), g=4):
    h, w = hw
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, w / 2, (b, g))
    boxes[..., 1] = rng.uniform(0, h / 2, (b, g))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, w / 2, (b, g))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, h / 2, (b, g))
    valid = np.ones((b, g), bool)
    valid[1, 2:] = False
    return dict(
        img=jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        img_meta=dict(img_shape=jnp.asarray(
            np.tile(np.array([[h, w]], np.int32), (b, 1)))),
        gt_bboxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 10, (b, g))),
        gt_bboxes_valid=jnp.asarray(valid))


@pytest.fixture(scope='module')
def model():
    return build_from_cfg(tiny_imvotenet_deform_cfg(), DETECTORS)


def test_detr_pretrain_forward_and_loss(model):
    batch = img_only_batch(np.random.RandomState(0))
    variables = jax.jit(lambda r, b: model.init(
        r, b, train=False))(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd_loss(variables, batch, rng):
        results, _ = model.apply(variables, batch, train=True,
                                 mutable=['batch_stats'],
                                 rngs={'dropout': rng, 'sample': rng})
        return results, model.loss(results, batch)

    results, losses = fwd_loss(variables, batch, jax.random.PRNGKey(1))
    assert results['img_preds']['cls_scores'].shape == (2, 2, 20, 10)
    assert results['img_preds']['bbox_preds'].shape == (2, 2, 20, 4)
    # per-decoder-layer losses (last layer unsuffixed)
    assert 'loss_cls' in losses and 'loss_cls.d0' in losses
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))

    # 2D inference decode
    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch, train=False)
        return model.get_bboxes(results, batch)

    det = infer(variables, batch)
    assert det['bboxes'].shape == (2, 100, 5)
    assert np.isfinite(np.asarray(det['bboxes'])).all()


def test_imvotenet_fusion_forward_and_loss(model):
    batch = demf_batch(np.random.RandomState(1))
    variables = jax.jit(lambda r, b: model.init(
        {'params': r, 'sample': jax.random.fold_in(r, 9)}, b,
        train=False))(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd_loss(variables, batch, rng):
        results, _ = model.apply(
            variables, batch, train=True, mutable=['batch_stats'],
            rngs={'dropout': rng, 'sample': jax.random.fold_in(rng, 7)})
        return results, model.loss(results, batch)

    results, losses = fwd_loss(variables, batch, jax.random.PRNGKey(1))
    assert set(results) >= {'joint', 'pts', 'img'}
    assert results['joint']['aggregated_points'].shape == (2, 8, 3)
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))

    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch, train=False,
                              rngs={'sample': jax.random.PRNGKey(0)})
        return model.get_bboxes(results, batch)

    det = infer(variables, batch)
    assert det['boxes_3d'].shape == (2, 80, 7)


def test_sample_valid_seeds_fill_rule():
    from demf_tpu.models.vote_fusion import sample_valid_seeds
    mask = jnp.zeros((1, 96), bool).at[0, 40:50].set(True)  # 10 valid
    inds = np.asarray(sample_valid_seeds(mask, 32, jax.random.PRNGKey(0)))[0]
    # all 10 valid imvotes must be selected
    assert set(range(40, 50)) <= set(inds.tolist())
    # fill comes from [0, 32)
    fill = [i for i in inds if not (40 <= i < 50)]
    assert all(0 <= i < 32 for i in fill)
    assert len(set(inds.tolist())) == 32  # no duplicates
