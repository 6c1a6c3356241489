# Tiny VoteNet on the synthetic dataset — CI smoke config for the CLIs.
class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')

_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='LoadAnnotations3D'),
    dict(type='PointSample', num_points=256),
    dict(type='DefaultFormatBundle3D', class_names=class_names),
    dict(type='Collect3D', keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]

model = dict(
    type='VoteNet',
    backbone=dict(
        type='PointNet2SASSG', in_channels=4, num_points=(64, 32, 16, 8),
        radius=(0.2, 0.4, 0.8, 1.2), num_samples=(8, 8, 4, 4),
        sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
        fp_channels=((64, 64), (64, 64)), norm_cfg=dict(type='BN2d'),
        sa_cfg=dict(type='PointSAModule', pool_mod='max', use_xyz=True,
                    normalize_xyz=True)),
    bbox_head=dict(
        type='CAVoteHead', num_classes=10,
        bbox_coder=dict(type='ClassAgnosticBBoxCoder', num_dir_bins=12,
                        with_rot=True, num_sizes=10),
        vote_module_cfg=dict(
            in_channels=64, vote_per_seed=1, gt_per_seed=3,
            conv_channels=(64, 64), norm_feats=True,
            vote_loss=dict(type='ChamferDistance', mode='l1',
                           reduction='none', loss_dst_weight=10.0)),
        vote_aggregation_cfg=dict(
            type='PointSAModule', num_point=16, radius=0.3, num_sample=4,
            mlp_channels=[64, 32, 32, 32], use_xyz=True, normalize_xyz=True),
        pred_layer_cfg=dict(in_channels=32, shared_conv_channels=(32, 32),
                            bias=True),
        objectness_loss=dict(type='CrossEntropyLoss', class_weight=[0.2, 0.8],
                             reduction='sum', loss_weight=5.0),
        dir_class_loss=dict(type='CrossEntropyLoss', reduction='sum',
                            loss_weight=1.0),
        dir_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                          loss_weight=10.0),
        size_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                           loss_weight=10.0, beta=0.15),
        semantic_loss=dict(type='CrossEntropyLoss', reduction='sum',
                           loss_weight=1.0),
        iou_loss=dict(type='AxisAlignedIoULoss', reduction='sum',
                      loss_weight=4.0)),
    train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                   sample_mod='seed'),
    test_cfg=dict(sample_mod='seed', nms_thr=0.25, score_thr=0.05,
                  per_class_proposal=True))

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=1,
    train=dict(type='SyntheticSUNRGBD', num_scenes=16, num_raw_points=512,
               max_boxes=4, pipeline=_pipeline, seed=3),
    val=dict(type='SyntheticSUNRGBD', num_scenes=8, num_raw_points=512,
             max_boxes=4, pipeline=_pipeline, seed=4, test_mode=True),
    test=dict(type='SyntheticSUNRGBD', num_scenes=8, num_raw_points=512,
              max_boxes=4, pipeline=_pipeline, seed=4, test_mode=True))

max_gt = 8
lr = 0.004
optimizer = dict(type='AdamW', lr=lr, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[2])
runner = dict(type='EpochBasedRunner', max_epochs=2)
checkpoint_config = dict(interval=1, max_keep_ckpts=1)
log_config = dict(interval=1)
evaluation = dict(interval=2)
