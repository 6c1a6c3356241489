# PC-only baseline: VoteNet + class-agnostic head (parity: reference
# configs/baseline/votenet.py — 60.0 / 41.3 mAP on SUN RGB-D val).
_base_ = [
    '../_base_/datasets/sunrgbd-3d-10class.py',
    '../_base_/models/votenet.py',
    '../_base_/schedules/schedule_3x.py',
    '../_base_/default_runtime.py',
]

model = dict(
    bbox_head=dict(
        type='CAVoteHead',
        num_classes=10,
        bbox_coder=dict(
            type='ClassAgnosticBBoxCoder',
            num_dir_bins=12,
            with_rot=True,
            num_sizes=10,
            mean_sizes=[
                [2.114256, 1.620300, 0.927272], [0.791118, 1.279516, 0.718182],
                [0.923508, 1.867419, 0.845495], [0.591958, 0.552978, 0.827272],
                [0.699104, 0.454178, 0.75625], [0.69519, 1.346299, 0.736364],
                [0.528526, 1.002642, 1.172878], [0.500618, 0.632163, 0.683424],
                [0.404671, 1.071108, 1.688889], [0.76584, 1.398258, 0.472728],
            ]),
        size_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                           loss_weight=10.0, beta=0.15),
        iou_loss=dict(type='AxisAlignedIoULoss', reduction='sum',
                      loss_weight=12.0 / 3.0),
    ),
    train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                   sample_mod='seed'),
)
