# Tiny DeMF-FCAF3D on synthetic RGB-D scenes — CLI smoke config for the
# sparse-voxel fusion pipeline (+ frozen image-feature cache).
class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

model = dict(
    type='DeMFFcaf3D',
    voxel_size=0.1,
    max_voxels=512,
    pc_start=(-4.2, -0.2, -2.0),
    freeze_img_branch=True,
    backbone=dict(type='MinkResNet', in_channels=3, depth=18,
                  stem_channels=16),
    img_backbone=dict(type='ResNet', depth=50, num_stages=4,
                      out_indices=(1, 2, 3), frozen_stages=1,
                      norm_eval=True, style='pytorch'),
    img_neck=dict(type='ChannelMapper', in_channels=[512, 1024, 2048],
                  kernel_size=1, out_channels=32, act_cfg=None,
                  norm_cfg=dict(type='GN', num_groups=8), num_outs=4),
    img_encoder=dict(
        type='DeformableDetrEncoder',
        encoder=dict(
            type='DetrTransformerEncoder', num_layers=1,
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
    head=dict(
        type='DeMFFcaf3DHead', in_channels=(16, 32, 64, 128),
        out_channels=32, voxel_size=0.1,
        pts_assign_threshold=8, pts_center_threshold=6,
        n_classes=10, n_reg_outs=8, num_queries=16, embed_dims=32,
        decoder=dict(
            num_layers=1,
            transformerlayers=dict(
                type='DeMFTransformerDecoderLayer',
                attn_cfgs=[
                    dict(type='MultiheadAttention', embed_dims=32,
                         num_heads=4, dropout=0.1),
                    dict(type='MultiScaleDeformableAttention',
                         embed_dims=32, num_heads=4, num_levels=4,
                         num_points=4, dropout=0.1)],
                feedforward_channels=64, ffn_dropout=0.1,
                operation_order=('self_attn', 'norm', 'cross_attn',
                                 'norm', 'ffn', 'norm')),
            posembed=dict(input_channel=6, num_pos_feats=32))),
    train_cfg=dict(),
    test_cfg=dict(nms_pre=16, iou_thr=0.5, score_thr=0.01))

_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=False,
         load_dim=6, use_dim=[0, 1, 2, 3, 4, 5]),
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations3D'),
    dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.0),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='PointSample', num_points=512),
    dict(type='DefaultFormatBundle3D', class_names=class_names),
    dict(type='Collect3D', keys=['img', 'points', 'gt_bboxes_3d',
                                 'gt_labels_3d']),
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=1,
    train=dict(type='SyntheticSUNRGBD', num_scenes=8, num_raw_points=1024,
               max_boxes=4, image_hw=(64, 96), pipeline=_pipeline, seed=31),
    val=dict(type='SyntheticSUNRGBD', num_scenes=4, num_raw_points=1024,
             max_boxes=4, image_hw=(64, 96), pipeline=_pipeline, seed=32,
             test_mode=True),
    test=dict(type='SyntheticSUNRGBD', num_scenes=4, num_raw_points=1024,
              max_boxes=4, image_hw=(64, 96), pipeline=_pipeline, seed=32,
              test_mode=True))

max_gt = 8
cached_img_features = True
optimizer = dict(
    type='AdamW', lr=0.001, weight_decay=0.0001,
    paramwise_cfg=dict(custom_keys={
        'decoder': dict(lr_mult=0.05, decay_mult=1.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[2])
runner = dict(type='EpochBasedRunner', max_epochs=1)
checkpoint_config = dict(interval=1, max_keep_ckpts=1)
log_config = dict(interval=1)
evaluation = dict(interval=0)
