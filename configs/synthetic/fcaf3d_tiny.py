# Tiny FCAF3D on the synthetic dataset — CI smoke config for the CLIs.
class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')

_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=False,
         load_dim=6, use_dim=[0, 1, 2, 3, 4, 5]),
    dict(type='LoadAnnotations3D'),
    dict(type='PointSample', num_points=1024),
    dict(type='DefaultFormatBundle3D', class_names=class_names),
    dict(type='Collect3D', keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
_test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=False,
         load_dim=6, use_dim=[0, 1, 2, 3, 4, 5]),
    dict(type='PointSample', num_points=1024),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         with_label=False),
    dict(type='Collect3D', keys=['points']),
]

model = dict(
    type='FCAF3D',
    voxel_size=0.1,
    max_voxels=1024,
    pc_start=(-4.2, -0.2, -2.0),
    backbone=dict(type='MinkResNet', in_channels=3, depth=18,
                  stem_channels=16),
    head=dict(type='FCAF3DHead', in_channels=(16, 32, 64, 128),
              out_channels=32, voxel_size=0.1,
              pts_assign_threshold=8, pts_center_threshold=6,
              n_classes=10, n_reg_outs=8),
    train_cfg=dict(),
    test_cfg=dict(nms_pre=64, iou_thr=0.5, score_thr=0.01))

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=1,
    train=dict(type='SyntheticSUNRGBD', num_scenes=8, num_raw_points=2048,
               max_boxes=4, pipeline=_pipeline, seed=3),
    val=dict(type='SyntheticSUNRGBD', num_scenes=4, num_raw_points=2048,
             max_boxes=4, pipeline=_test_pipeline, seed=4, test_mode=True),
    test=dict(type='SyntheticSUNRGBD', num_scenes=4, num_raw_points=2048,
              max_boxes=4, pipeline=_test_pipeline, seed=4, test_mode=True))

max_gt = 8
optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[2])
runner = dict(type='EpochBasedRunner', max_epochs=2)
checkpoint_config = dict(interval=1, max_keep_ckpts=1)
log_config = dict(interval=1)
evaluation = dict(interval=2)
