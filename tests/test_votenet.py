"""End-to-end VoteNet slice on tiny synthetic data (SURVEY.md §7 phase 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import demf_tpu.models  # noqa: F401  (populate registries)
from demf_tpu.utils.registry import DETECTORS, build_from_cfg


def tiny_votenet_cfg():
    return dict(
        type='VoteNet',
        backbone=dict(
            type='PointNet2SASSG',
            in_channels=4,
            num_points=(64, 32, 16, 8),
            radius=(0.2, 0.4, 0.8, 1.2),
            num_samples=(8, 8, 4, 4),
            sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                         (32, 32, 64)),
            fp_channels=((64, 64), (64, 64)),
            norm_cfg=dict(type='BN2d'),
            sa_cfg=dict(type='PointSAModule', pool_mod='max', use_xyz=True,
                        normalize_xyz=True)),
        bbox_head=dict(
            type='CAVoteHead',
            num_classes=10,
            bbox_coder=dict(type='ClassAgnosticBBoxCoder', num_dir_bins=12,
                            with_rot=True, num_sizes=10),
            vote_module_cfg=dict(
                in_channels=64, vote_per_seed=1, gt_per_seed=3,
                conv_channels=(64, 64), norm_feats=True,
                vote_loss=dict(type='ChamferDistance', mode='l1',
                               reduction='none', loss_dst_weight=10.0)),
            vote_aggregation_cfg=dict(
                type='PointSAModule', num_point=16, radius=0.3, num_sample=4,
                mlp_channels=[64, 32, 32, 32], use_xyz=True,
                normalize_xyz=True),
            pred_layer_cfg=dict(in_channels=32, shared_conv_channels=(32, 32),
                                bias=True),
            objectness_loss=dict(type='CrossEntropyLoss',
                                 class_weight=[0.2, 0.8], reduction='sum',
                                 loss_weight=5.0),
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


def synth_batch(rng, b=2, p=256, g=6):
    points = rng.rand(b, p, 4).astype(np.float32) * 4 - 2
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :3] = rng.rand(b, g, 3) * 2 - 1
    boxes[..., 3:6] = rng.rand(b, g, 3) * 0.8 + 0.4
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    labels = rng.randint(0, 10, (b, g))
    valid = np.ones((b, g), bool)
    valid[1, 3:] = False  # ragged GT
    return dict(points=jnp.asarray(points),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_valid=jnp.asarray(valid))


@pytest.fixture(scope='module')
def model_and_vars():
    model = build_from_cfg(tiny_votenet_cfg(), DETECTORS)
    batch = synth_batch(np.random.RandomState(0))
    variables = jax.jit(lambda r, p: model.init(r, p, train=True))(
        jax.random.PRNGKey(0), batch['points'])
    return model, variables, batch


def test_votenet_train_forward_and_loss(model_and_vars):
    model, variables, batch = model_and_vars
    @jax.jit
    def fwd_loss(variables, batch):
        results, mutated = model.apply(variables, batch['points'],
                                       train=True, mutable=['batch_stats'])
        return results, model.loss(results, batch)

    results, losses = fwd_loss(variables, batch)
    assert results['aggregated_points'].shape == (2, 16, 3)
    assert results['obj_scores'].shape == (2, 16, 2)
    assert results['distance'].shape == (2, 16, 6)
    expect = {'vote_loss', 'objectness_loss', 'size_res_loss',
              'dir_class_loss', 'dir_res_loss', 'semantic_loss', 'iou_loss'}
    assert expect <= set(losses)
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))


def test_votenet_grads_flow(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        results, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch['points'], train=True, mutable=['batch_stats'])
        return sum(jnp.sum(v) for v in model.loss(results, batch).values())

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # at least some gradient mass everywhere except BN of unused branches
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.7


def test_votenet_inference(model_and_vars):
    model, variables, batch = model_and_vars
    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch['points'], train=False)
        return model.get_bboxes(results, batch)

    det = infer(variables, batch)
    # per-class proposals: K = num_proposal * num_classes
    assert det['boxes_3d'].shape == (2, 160, 7)
    assert det['scores_3d'].shape == (2, 160)
    assert det['valid'].dtype == bool
    assert np.all(np.isfinite(np.asarray(det['scores_3d'])))


def test_empty_gt_sample(model_and_vars):
    model, variables, batch = model_and_vars
    batch = dict(batch)
    batch['gt_valid'] = jnp.zeros_like(batch['gt_valid'])  # all empty
    @jax.jit
    def fwd_loss(variables, batch):
        results, _ = model.apply(variables, batch['points'], train=True,
                                 mutable=['batch_stats'])
        return model.loss(results, batch)

    losses = fwd_loss(variables, batch)
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))
