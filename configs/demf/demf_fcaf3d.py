# DeMF-FCAF3D: deformable image fusion on the FCAF3D base detector
# (parity target: reference DeMF_fcaf branch, README.md:55-58 —
# 67.4 / 51.2 mAP on SUN RGB-D val; the branch is not in the reference
# checkout, so the fusion construction follows the DeMF-VoteNet recipe —
# see demf_tpu/models/demf_fcaf3d.py).
_base_ = ['../_base_/default_runtime.py',
          '../deformdetr/imvotenet_image.py']

load_from = None  # stage-1 pretrained image branch

class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

model = dict(
    type='DeMFFcaf3D',
    voxel_size=0.01,
    max_voxels=32768,
    pc_start=(-3.2, -0.2, -2.0),
    freeze_img_branch=True,
    backbone=dict(type='MinkResNet', in_channels=3, depth=34),
    img_encoder=dict(
        type='DeformableDetrEncoder',
        encoder=dict(
            type='DetrTransformerEncoder', num_layers=6,
            transformerlayers=dict(
                type='BaseTransformerLayer',
                attn_cfgs=dict(type='MultiScaleDeformableAttention',
                               embed_dims=256),
                feedforward_channels=1024, ffn_dropout=0.1,
                operation_order=('self_attn', 'norm', 'ffn', 'norm'))),
        positional_encoding=dict(type='SinePositionalEncoding',
                                 num_feats=128, normalize=True,
                                 offset=-0.5),
        num_feature_levels=4, embed_dims=256),
    head=dict(
        type='DeMFFcaf3DHead',
        in_channels=(64, 128, 256, 512),
        out_channels=128,
        voxel_size=0.01,
        pts_prune_threshold=100000,
        pts_assign_threshold=27,
        pts_center_threshold=18,
        n_classes=10,
        n_reg_outs=8,
        num_queries=256,
        embed_dims=256,
        decoder=dict(
            num_layers=1,
            transformerlayers=dict(
                type='DetrTransformerDecoderLayer',
                attn_cfgs=[
                    dict(type='MultiheadAttention', embed_dims=256,
                         num_heads=8, dropout=0.4),
                    dict(type='MultiScaleDeformableAttention', num_heads=8,
                         num_levels=4, num_points=2, dropout=0.4,
                         embed_dims=256)],
                feedforward_channels=512, ffn_dropout=0.4,
                operation_order=('self_attn', 'norm', 'cross_attn', 'norm',
                                 'ffn', 'norm')),
            posembed=dict(input_channel=6, num_pos_feats=256))),
    train_cfg=dict(),
    test_cfg=dict(nms_pre=256, iou_thr=0.5, score_thr=0.01))

dataset_type = 'SUNRGBDDataset'
data_root = 'data/sunrgbd/'

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=False,
         load_dim=6, use_dim=[0, 1, 2, 3, 4, 5]),
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations3D'),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.0),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.523599, 0.523599],
         scale_ratio_range=[0.85, 1.15], translation_std=[0.1, 0.1, 0.1],
         shift_height=False),
    dict(type='PointSample', num_points=100000),
    dict(type='DefaultFormatBundle3D', class_names=class_names),
    dict(type='Collect3D', keys=['img', 'points', 'gt_bboxes_3d',
                                 'gt_labels_3d']),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=False,
         load_dim=6, use_dim=[0, 1, 2, 3, 4, 5]),
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug3D', img_scale=(1333, 800),
         pts_scale_ratio=1, flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip', flip_ratio=0.0),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='Pad', size_divisor=32),
             dict(type='PointSample', num_points=100000),
             dict(type='DefaultFormatBundle3D', class_names=class_names,
                  with_label=False),
             dict(type='Collect3D', keys=['img', 'points']),
         ]),
]

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=4,
    train=dict(
        type='RepeatDataset', times=3,
        dataset=dict(type=dataset_type, data_root=data_root,
                     ann_file=data_root + 'sunrgbd_infos_train.pkl',
                     pipeline=train_pipeline, classes=class_names,
                     filter_empty_gt=True, box_type_3d='Depth')),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'sunrgbd_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=True,
             box_type_3d='Depth'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'sunrgbd_infos_val.pkl',
              pipeline=test_pipeline, classes=class_names, test_mode=True,
              box_type_3d='Depth'))

lr = 0.001
optimizer = dict(
    type='AdamW', lr=lr, weight_decay=0.0001,
    paramwise_cfg=dict(custom_keys={
        'decoder': dict(lr_mult=0.05, decay_mult=1.0),
    }))
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[8, 11])
runner = dict(type='EpochBasedRunner', max_epochs=12)
evaluation = dict(interval=12)
checkpoint_config = dict(interval=1, max_keep_ckpts=1)
