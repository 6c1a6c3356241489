# FCAF3D on SUN RGB-D (parity: mmdet3d fcaf3d_2xb8_sunrgbd-3d-10class —
# the base detector of the reference's DeMF-FCAF3D branch,
# reference README.md:55-58).  Voxel 0.01 m, MinkResNet34 levels at
# strides 8/16/32/64, anchor-free head with Mobius yaw regression.
_base_ = ['../_base_/default_runtime.py']

class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')

model = dict(
    type='FCAF3D',
    voxel_size=0.01,
    max_voxels=32768,
    pc_start=(-3.2, -0.2, -2.0),
    backbone=dict(type='MinkResNet', in_channels=3, depth=34),
    head=dict(
        type='FCAF3DHead',
        in_channels=(64, 128, 256, 512),
        out_channels=128,
        voxel_size=0.01,
        pts_prune_threshold=100000,
        pts_assign_threshold=27,
        pts_center_threshold=18,
        n_classes=10,
        n_reg_outs=8),
    train_cfg=dict(),
    test_cfg=dict(nms_pre=256, iou_thr=0.5, score_thr=0.01))

dataset_type = 'SUNRGBDDataset'
data_root = 'data/sunrgbd/'

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=False,
         load_dim=6, use_dim=[0, 1, 2, 3, 4, 5]),
    dict(type='LoadAnnotations3D'),
    dict(type='RandomFlip3D', sync_2d=False, flip_ratio_bev_horizontal=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.523599, 0.523599],
         scale_ratio_range=[0.85, 1.15], translation_std=[0.1, 0.1, 0.1],
         shift_height=False),
    dict(type='PointSample', num_points=100000),
    dict(type='DefaultFormatBundle3D', class_names=class_names),
    dict(type='Collect3D', keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=False,
         load_dim=6, use_dim=[0, 1, 2, 3, 4, 5]),
    dict(type='PointSample', num_points=100000),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         with_label=False),
    dict(type='Collect3D', keys=['points']),
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

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[8, 11])
runner = dict(type='EpochBasedRunner', max_epochs=12)
evaluation = dict(interval=12)
checkpoint_config = dict(interval=1, max_keep_ckpts=1)
