"""Model zoo helpers: build models from the shipped configs + synthetic
batches with the right shapes (used by __graft_entry__, bench.py, tests).
"""
from __future__ import annotations

import os

import numpy as np

CFG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')

_DEPTH2CAM = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)


def load_model_cfg(rel_path):
    from .utils.config import Config
    return Config.fromfile(os.path.join(CFG_DIR, rel_path))


def build_detector_from_cfg(rel_path):
    import demf_tpu.models  # noqa: F401
    from .utils.registry import DETECTORS, build_from_cfg
    cfg = load_model_cfg(rel_path)
    return build_from_cfg(cfg.model, DETECTORS), cfg


def tiny_demf_model_cfg():
    """Scaled-down DeMF for CPU dryruns (same topology, small dims)."""
    return dict(
        type='DeMFVoteNet',
        img_backbone=dict(type='ResNet', depth=50, num_stages=4,
                          out_indices=(1, 2, 3), frozen_stages=1,
                          norm_eval=True, style='pytorch'),
        img_neck=dict(type='ChannelMapper', in_channels=[512, 1024, 2048],
                      kernel_size=1, out_channels=32, act_cfg=None,
                      norm_cfg=dict(type='GN', num_groups=8), num_outs=4),
        img_encoder=dict(
            type='DeformableDetrEncoder',
            encoder=dict(
                type='DetrTransformerEncoder', num_layers=2,
                transformerlayers=dict(
                    type='BaseTransformerLayer',
                    attn_cfgs=dict(type='MultiScaleDeformableAttention',
                                   embed_dims=32),
                    feedforward_channels=64, ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'ffn', 'norm'))),
            positional_encoding=dict(type='SinePositionalEncoding',
                                     num_feats=16, normalize=True,
                                     offset=-0.5),
            num_feature_levels=4, embed_dims=32),
        pts_backbone=dict(
            type='PointNet2SASSG', in_channels=4,
            num_points=(64, 32, 16, 8), radius=(0.2, 0.4, 0.8, 1.2),
            num_samples=(8, 8, 4, 4),
            sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32),
                         (32, 32, 32)),
            fp_channels=((32, 32), (32, 32)), norm_cfg=dict(type='BN2d'),
            sa_cfg=dict(type='PointSAModule', pool_mod='max', use_xyz=True,
                        normalize_xyz=True)),
        pts_bbox_head=dict(
            type='DeMFVoteHead', num_classes=10,
            pred_layer_cfg=dict(in_channels=32,
                                shared_conv_channels=(32, 32), bias=True,
                                conv_pred_layers=2),
            decoder=dict(
                type='DeMFTransformerDecoderLayer', num_layers=1,
                transformerlayers=dict(
                    type='DetrTransformerDecoderLayer',
                    attn_cfgs=[
                        dict(type='MultiheadAttention', embed_dims=32,
                             num_heads=4, dropout=0.4),
                        dict(type='MultiScaleDeformableAttention',
                             num_heads=4, num_levels=4, num_points=2,
                             dropout=0.4, embed_dims=32)],
                    feedforward_channels=64, ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'cross_attn',
                                     'norm', 'ffn', 'norm')),
                posembed=dict(input_channel=6, num_pos_feats=32)),
            bbox_coder=dict(type='DeMFClassAgnosticBBoxCoder',
                            num_dir_bins=12, with_rot=True, num_sizes=10),
            objectness_loss=dict(type='CrossEntropyLoss',
                                 class_weight=[0.2, 0.8], reduction='sum',
                                 loss_weight=5.0),
            dir_class_loss=dict(type='CrossEntropyLoss', reduction='sum',
                                loss_weight=1.0),
            dir_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                              loss_weight=10.0),
            size_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                               loss_weight=10.0, beta=0.0625),
            center_loss=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                             reduction='sum', loss_weight=10.0),
            iou_loss=dict(type='AxisAlignedIoULoss', reduction='sum',
                          loss_weight=4.0),
            semantic_loss=dict(type='CrossEntropyLoss', reduction='sum',
                               loss_weight=1.0),
            vote_module_cfg=dict(
                in_channels=32, vote_per_seed=1, gt_per_seed=3,
                conv_channels=(32, 32), norm_feats=True,
                vote_loss=dict(type='ChamferDistance', mode='l1',
                               reduction='none', loss_dst_weight=10.0)),
            vote_aggregation_cfg=dict(
                type='PointSAModule', num_point=16, radius=0.3,
                num_sample=4, mlp_channels=[32, 32, 32, 32], use_xyz=True,
                normalize_xyz=True)),
        num_sampled_seed=1024,
        freeze_img_branch=True,
        train_cfg=dict(pts=dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                                sample_mod='seed')),
        test_cfg=dict(img_rcnn=dict(score_thr=0.1),
                      pts=dict(ensemble_layers=[0, 1], sample_mod='seed',
                               nms_thr=0.25, score_thr=0.05,
                               per_class_proposal=True)))


def synth_points_batch(b, p, g=32, seed=0):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    points = rng.rand(b, p, 4).astype(np.float32) * 6 - 3
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :3] = rng.rand(b, g, 3) * 4 - 2
    boxes[..., 3:6] = rng.rand(b, g, 3) * 1.2 + 0.3
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    return dict(points=jnp.asarray(points),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(rng.randint(0, 10, (b, g))),
                gt_valid=jnp.asarray(rng.rand(b, g) < 0.5))


def synth_detr2d_batch(b, hw=(800, 1344), g=20, seed=0):
    """Synthetic image-only batch for the stage-1 DETR 2D pretrain path
    (mirrors the reference's imvotenet_deform.py stage-1 inputs)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    h, w = hw
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, w / 2, (b, g))
    boxes[..., 1] = rng.uniform(0, h / 2, (b, g))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(16, w / 2, (b, g))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(16, h / 2, (b, g))
    return dict(
        img=jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        img_meta=dict(img_shape=jnp.asarray(
            np.tile(np.array([list(hw)], np.int32), (b, 1)))),
        gt_bboxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 10, (b, g))),
        gt_bboxes_valid=jnp.asarray(rng.rand(b, g) < 0.8))


def synth_fcaf3d_batch(b, p=20000, g=16, seed=0):
    """Synthetic 6-dim (xyz+rgb) point batch for the FCAF3D family."""
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, p, 6), np.float32)
    pts[..., 0] = rng.uniform(-3, 3, (b, p))
    pts[..., 1] = rng.uniform(0, 6, (b, p))
    pts[..., 2] = rng.uniform(-1.8, 1.0, (b, p))
    pts[..., 3:] = rng.rand(b, p, 3)
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :3] = rng.rand(b, g, 3) * 4 - 2
    boxes[..., 1] += 2.5
    boxes[..., 3:6] = rng.rand(b, g, 3) + 0.3
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    return dict(points=jnp.asarray(pts), gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(rng.randint(0, 10, (b, g))),
                gt_valid=jnp.asarray(np.ones((b, g), bool)))


def synth_demf_batch(b, p=20000, g=32, hw=(800, 1344), seed=0,
                     valid_hw=None):
    """Synthetic full DeMF batch: points + image + calib/aug meta."""
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    h, w = hw
    vh, vw = valid_hw or (h - 16, w - 32)
    batch = synth_points_batch(b, p, g, seed)
    k = np.array([[529.5, 0, vw / 2], [0, 529.5, vh / 2], [0, 0, 1]],
                 np.float32)
    d2i = np.eye(4, dtype=np.float32)
    d2i[:3, :3] = k @ _DEPTH2CAM
    meta = dict(
        img_shape=np.tile(np.array([[vh, vw]], np.int32), (b, 1)),
        scale_factor=np.ones((b, 2), np.float32),
        flip=np.zeros((b,), bool),
        depth2img=np.tile(d2i[None], (b, 1, 1)),
        pcd_rotation=np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1)),
        pcd_scale_factor=np.ones((b,), np.float32),
        pcd_trans=np.zeros((b, 3), np.float32),
        pcd_horizontal_flip=np.zeros((b,), bool))
    batch['img'] = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    batch['img_meta'] = {k_: jnp.asarray(v) for k_, v in meta.items()}
    return batch
