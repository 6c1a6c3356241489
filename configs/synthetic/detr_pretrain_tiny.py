# Tiny Deformable-DETR 2D pretrain on synthetic images — CLI smoke config.
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.0),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]

model = dict(
    type='ImVoteNet_Deformdetr',
    img_backbone=dict(type='ResNet', depth=50, num_stages=4,
                      out_indices=(1, 2, 3), frozen_stages=1, norm_eval=True,
                      style='pytorch'),
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
                    operation_order=('self_attn', 'norm', 'ffn', 'norm'))),
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
        positional_encoding=dict(type='SinePositionalEncoding', num_feats=16,
                                 normalize=True, offset=-0.5),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type='L1Loss', loss_weight=5.0),
        loss_iou=dict(type='GIoULoss', loss_weight=2.0)),
    train_cfg=dict(
        assigner=dict(
            type='HungarianAssigner',
            cls_cost=dict(type='FocalLossCost', weight=2.0),
            reg_cost=dict(type='BBoxL1Cost', weight=5.0, box_format='xywh'),
            iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0))),
    test_cfg=dict(max_per_img=20))

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=1,
    train=dict(type='SyntheticSUNRGBD', num_scenes=8, num_raw_points=256,
               max_boxes=4, image_hw=(64, 96), pipeline=_pipeline, seed=11),
    val=dict(type='SyntheticSUNRGBD', num_scenes=4, num_raw_points=256,
             max_boxes=4, image_hw=(64, 96), pipeline=_pipeline, seed=12,
             test_mode=True),
    test=dict(type='SyntheticSUNRGBD', num_scenes=4, num_raw_points=256,
              max_boxes=4, image_hw=(64, 96), pipeline=_pipeline, seed=12,
              test_mode=True))

max_gt = 8
lr = 2e-4
optimizer = dict(
    type='AdamW', lr=lr, weight_decay=0.0001,
    paramwise_cfg=dict(custom_keys={
        'backbone': dict(lr_mult=0.1, decay_mult=1.0),
        'sampling_offsets': dict(lr_mult=0.1, decay_mult=1.0),
        'reference_points': dict(lr_mult=0.1, decay_mult=1.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(policy='step', step=[7, 9])
runner = dict(type='EpochBasedRunner', max_epochs=1)
checkpoint_config = dict(interval=1)
log_config = dict(interval=1)
evaluation = dict(interval=0)
