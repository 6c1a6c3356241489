"""Real-data-path tests on the checked-in miniature SUN RGB-D fixture.

VERDICT round-1 #7: exercises ``SUNRGBDDataset`` on genuine mmdet3d-format
files (pkl infos + per-scene .bin points + jpg) — reader, calib/depth2img
math, ``filter_empty_gt``, the full DeMF train pipeline, fixed-shape
collation, and the eval driver — all without network access.

Fixture: tests/fixtures/sunrgbd_mini (3 scenes, scene 2 empty), generated
by tests/fixtures/make_sunrgbd_fixture.py.  Schema matches mmdet3d's
sunrgbd converter output consumed by the reference
(/root/reference/configs/_base_/datasets/sunrgbd-3d-10class.py:1-9).
"""
import os

import numpy as np
import pytest

from demf_tpu.data import build_dataset, build_dataloader
from demf_tpu.data.sunrgbd import SUNRGBDDataset, SUNRGBD_CLASSES

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'sunrgbd_mini')
ANN = os.path.join(FIXTURE, 'sunrgbd_infos_mini.pkl')

img_norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)

# the reference DeMF train pipeline (configs/demf/demf_votenet.py:132-149)
# at fixture scale: same transform sequence, smaller resize/sample budget
PIPELINE = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations3D'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(260, 200), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.0),
    dict(type='Normalize', **img_norm),
    dict(type='Pad', size_divisor=32),
    dict(type='RandomFlip3D', sync_2d=False, flip_ratio_bev_horizontal=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.523599, 0.523599],
         scale_ratio_range=[0.85, 1.15], shift_height=True),
    dict(type='PointSample', num_points=2048),
    dict(type='DefaultFormatBundle3D', class_names=SUNRGBD_CLASSES),
    dict(type='Collect3D', keys=['img', 'gt_bboxes', 'gt_labels', 'points',
                                 'gt_bboxes_3d', 'gt_labels_3d']),
]


def test_filter_empty_gt_and_lengths():
    train = SUNRGBDDataset(FIXTURE, ANN, test_mode=False,
                           filter_empty_gt=True)
    test = SUNRGBDDataset(FIXTURE, ANN, test_mode=True,
                          filter_empty_gt=True)
    unfiltered = SUNRGBDDataset(FIXTURE, ANN, test_mode=False,
                                filter_empty_gt=False)
    assert len(train) == 2      # scene 2 has gt_num=0
    assert len(test) == 3       # eval keeps every scene
    assert len(unfiltered) == 3


def test_reader_fields_and_calib():
    ds = SUNRGBDDataset(FIXTURE, ANN, test_mode=True)
    sample = ds.get_data_info(0)
    assert os.path.exists(sample['pts_filename'])
    assert os.path.exists(sample['img_filename'])
    d2i = sample['depth2img']
    assert d2i.shape == (4, 4)

    # calib math: GT corners projected through the reader's depth2img must
    # land on the annotated 2D boxes (the mmdet3d K @ (depth2cam @ Rt.T)
    # convention, reference mmdet3d sunrgbd_dataset.get_data_info)
    import jax.numpy as jnp
    from demf_tpu.core.boxes import box_corners
    ann = sample['ann_info']
    corners = np.asarray(box_corners(jnp.asarray(ann['gt_bboxes_3d'])))
    hom = np.concatenate([corners, np.ones_like(corners[..., :1])], -1)
    p = hom @ d2i.T
    uv = p[..., :2] / np.clip(p[..., 2:3], 1e-3, None)
    x1, y1 = uv[..., 0].min(-1), uv[..., 1].min(-1)
    x2, y2 = uv[..., 0].max(-1), uv[..., 1].max(-1)
    proj = np.stack([x1.clip(0, 207), y1.clip(0, 159),
                     x2.clip(0, 207), y2.clip(0, 159)], -1)
    ref = ann['bboxes']
    inter = (np.minimum(proj[:, 2:], ref[:, 2:]) -
             np.maximum(proj[:, :2], ref[:, :2])).clip(0).prod(-1)
    union = ((proj[:, 2:] - proj[:, :2]).prod(-1) +
             (ref[:, 2:] - ref[:, :2]).prod(-1) - inter)
    assert (inter / np.maximum(union, 1e-6) > 0.99).all()


def test_full_train_pipeline_on_real_files():
    np.random.seed(0)
    ds = SUNRGBDDataset(FIXTURE, ANN, pipeline=PIPELINE, test_mode=False,
                        filter_empty_gt=True)
    sample = ds[0]
    pts = sample['points']
    assert pts.shape == (2048, 4)       # xyz + shift_height
    img = sample['img']
    assert img.ndim == 3 and img.shape[0] % 32 == 0 \
        and img.shape[1] % 32 == 0
    assert np.isfinite(img).all() and abs(img).mean() < 10  # normalized
    boxes = sample['gt_bboxes_3d']
    assert boxes.ndim == 2 and boxes.shape[1] == 7 and len(boxes) == 3
    assert sample['gt_bboxes'].shape[1] == 4
    assert 'depth2img' in sample['img_meta']

    # aug consistency: the fixture's object points are sampled ON the gt
    # boxes, and GlobalRotScaleTrans/RandomFlip3D must transform points
    # and boxes together, so a large fraction must remain inside
    import jax.numpy as jnp
    from demf_tpu.core.boxes import points_in_boxes
    inside = np.asarray(points_in_boxes(
        jnp.asarray(pts[:, :3]), jnp.asarray(boxes)))
    frac = inside.any(-1).mean()
    assert frac > 0.25, frac


def test_loader_fixed_shapes_and_eval_driver():
    np.random.seed(0)
    ds = build_dataset(dict(
        type='RepeatDataset', times=3,
        dataset=dict(type='SUNRGBDDataset', data_root=FIXTURE,
                     ann_file=ANN, pipeline=PIPELINE,
                     filter_empty_gt=True)))
    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=0,
                              shuffle=True, max_gt=10)
    it = iter(loader)
    b1, b2 = next(it), next(it)
    for b in (b1, b2):
        assert b['points'].shape == (2, 2048, 4)
        assert b['gt_bboxes_3d'].shape == (2, 10, 7)
        assert b['gt_valid'].shape == (2, 10)
        assert b['gt_valid'].sum() > 0
    assert b1['img'].shape == b2['img'].shape

    # eval driver: feeding the GT back as detections must score mAP 1.0
    eval_ds = SUNRGBDDataset(FIXTURE, ANN, test_mode=True)
    results = []
    for gt in eval_ds.get_gt_annos():
        results.append(dict(boxes_3d=gt['gt_boxes'],
                            scores_3d=np.ones(len(gt['gt_boxes'])),
                            labels_3d=gt['gt_labels']))
    metrics = eval_ds.evaluate(results, iou_thr=(0.25, 0.5))
    assert metrics['mAP_0.25'] == pytest.approx(1.0, abs=1e-6)


def test_show_results_obj_dump(tmp_path):
    """--show-dir visualization surface: per-scene obj wireframe dumps."""
    from demf_tpu.engine.visualize import show_dataset_results
    eval_pipeline = [
        dict(type='LoadPointsFromFile', coord_type='DEPTH',
             load_dim=6, use_dim=[0, 1, 2]),
        dict(type='DefaultFormatBundle3D'),
        dict(type='Collect3D', keys=['points']),
    ]
    ds = SUNRGBDDataset(FIXTURE, ANN, pipeline=eval_pipeline,
                        test_mode=True)
    results = []
    for gt in ds.get_gt_annos():
        results.append(dict(boxes_3d=gt['gt_boxes'],
                            scores_3d=np.ones(len(gt['gt_boxes'])),
                            labels_3d=gt['gt_labels']))
    out = show_dataset_results(ds, results, str(tmp_path / 'show'))
    files = sorted(os.listdir(out))
    assert '000000_points.obj' in files and '000000_pred.obj' in files
    txt = open(os.path.join(out, '000000_pred.obj')).read()
    assert txt.count('\nl ') + txt.startswith('l ') >= 12  # wireframe lines
    # empty scene 2 -> empty pred obj, still written points
    assert '000002_points.obj' in files


def test_format_results(tmp_path):
    """dataset.format_results writes a self-contained pkl (reference
    eval.py:119-121 -> mmdet3d Custom3DDataset.format_results)."""
    import pickle

    ds = SUNRGBDDataset(data_root=FIXTURE, ann_file=ANN, pipeline=None,
                        test_mode=True, filter_empty_gt=False)
    results = [dict(boxes_3d=np.zeros((2, 7), np.float32),
                    scores_3d=np.array([0.9, 0.4], np.float32),
                    labels_3d=np.array([1, 3], np.int64))
               for _ in range(len(ds))]
    _, out_file = ds.format_results(
        results, pklfile_prefix=str(tmp_path / 'res'))
    with open(out_file, 'rb') as f:
        dumped = pickle.load(f)
    assert dumped['classes'] == list(SUNRGBD_CLASSES)
    assert len(dumped['results']) == len(ds)
    assert dumped['results'][0]['scores_3d'].shape == (2,)
    assert 'sample_idx' in dumped['results'][0]
    # prefix omitted -> a temp file is still produced
    _, tmp_file = ds.format_results(results)
    assert os.path.isfile(tmp_file)
