"""End-to-end DeMF fusion slice on tiny shapes (SURVEY.md §7 phase 7)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import demf_tpu.models  # noqa: F401
from demf_tpu.utils.registry import DETECTORS, build_from_cfg

pytestmark = pytest.mark.slow  # heavy-compile e2e tier


def tiny_demf_cfg():
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
            type='DeMFVoteHead',
            num_classes=10,
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


def demf_batch(rng, b=2, p=128, g=4, hw=(64, 96)):
    h, w = hw
    points = rng.rand(b, p, 4).astype(np.float32) * 4 - 2
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :3] = rng.rand(b, g, 3) * 2 - 1
    boxes[..., 3:6] = rng.rand(b, g, 3) * 0.8 + 0.4
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    k = np.array([[60., 0, w / 2], [0, 60., h / 2], [0, 0, 1]], np.float32)
    d2i = np.eye(4, dtype=np.float32)
    d2i[:3, :3] = k @ np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                               np.float32)
    meta = dict(
        img_shape=np.tile(np.array([[h - 4, w - 8]], np.int32), (b, 1)),
        scale_factor=np.ones((b, 2), np.float32),
        flip=np.zeros((b,), bool),
        depth2img=np.tile(d2i[None], (b, 1, 1)),
        pcd_rotation=np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1)),
        pcd_scale_factor=np.ones((b,), np.float32),
        pcd_trans=np.zeros((b, 3), np.float32),
        pcd_horizontal_flip=np.zeros((b,), bool))
    return dict(points=jnp.asarray(points),
                img=jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
                img_meta={k_: jnp.asarray(v) for k_, v in meta.items()},
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(rng.randint(0, 10, (b, g))),
                gt_valid=jnp.asarray(np.ones((b, g), bool)))


@pytest.fixture(scope='module')
def demf_model_and_vars():
    model = build_from_cfg(tiny_demf_cfg(), DETECTORS)
    batch = demf_batch(np.random.RandomState(0))
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_demf_forward_and_loss(demf_model_and_vars):
    model, variables, batch = demf_model_and_vars

    @jax.jit
    def fwd_loss(variables, batch, rng):
        results, _ = model.apply(variables, batch, train=True,
                                 mutable=['batch_stats'],
                                 rngs={'dropout': rng})
        return results, model.loss(results, batch)

    results, losses = fwd_loss(variables, batch, jax.random.PRNGKey(1))
    assert len(results['decode_res_all']) == 2  # 1 decoder layer + initial
    expect = {'vote_loss', 'objectness_loss', 'size_res_loss', 'center_loss',
              'dir_class_loss', 'dir_res_loss', 'semantic_loss', 'iou_loss'}
    assert expect <= set(losses)
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))


def test_demf_img_branch_frozen(demf_model_and_vars):
    model, variables, batch = demf_model_and_vars

    def loss_fn(params):
        results, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(0)})
        return sum(jnp.sum(v) for v in model.loss(results, batch).values())

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    # frozen image branch gets exactly zero gradient (stop_gradient)
    img_leaves = []
    pts_leaves = []
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in flat:
        name = '/'.join(str(getattr(p, 'key', p)) for p in path)
        if name.startswith(('img_backbone', 'img_neck', 'img_encoder')):
            img_leaves.append(float(jnp.sum(jnp.abs(leaf))))
        else:
            pts_leaves.append(float(jnp.sum(jnp.abs(leaf))))
    assert img_leaves and max(img_leaves) == 0.0
    assert sum(g > 0 for g in pts_leaves) > len(pts_leaves) * 0.5


def test_demf_inference_ensemble(demf_model_and_vars):
    model, variables, batch = demf_model_and_vars

    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch, train=False)
        return model.get_bboxes(results, batch)

    det = infer(variables, batch)
    # ensemble of 2 stages x 16 proposals x 10 classes
    assert det['boxes_3d'].shape == (2, 320, 7)
    assert np.isfinite(np.asarray(det['scores_3d'])).all()


def test_reference_point_projection_center():
    """A point on the optical axis must project to the principal point."""
    from demf_tpu.core.transforms import project_points_to_image
    b = 1
    h, w = 64, 96
    k = np.array([[60., 0, w / 2], [0, 60., h / 2], [0, 0, 1]], np.float32)
    d2i = np.eye(4, dtype=np.float32)
    d2i[:3, :3] = k @ np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                               np.float32)
    meta = dict(
        img_shape=jnp.asarray([[h, w]], jnp.int32),
        scale_factor=jnp.ones((b, 2)),
        flip=jnp.zeros((b,), bool),
        depth2img=jnp.asarray(d2i)[None],
        pcd_rotation=jnp.eye(3)[None],
        pcd_scale_factor=jnp.ones((b,)) * 2.0,  # aug: scaled by 2
        pcd_trans=jnp.zeros((b, 3)),
        pcd_horizontal_flip=jnp.zeros((b,), bool))
    # depth-frame point straight ahead: (0, depth, z) with z chosen so the
    # camera-frame point lies on the axis: cam = depth2cam(depth pt)
    pts = jnp.asarray([[[0., 4.0, 0.]]]) * 2.0  # augmented frame (scaled)
    uv = np.asarray(project_points_to_image(pts, meta))[0, 0]
    np.testing.assert_allclose(uv[0], (w / 2) / (w - 1), atol=1e-3)
    np.testing.assert_allclose(uv[1], (h / 2) / (h - 1), atol=1e-3)


def test_demf_cached_features_match_recompute(demf_model_and_vars):
    """'img_features' path must reproduce the recompute path exactly."""
    model, variables, batch = demf_model_and_vars
    from demf_tpu.engine.feature_cache import compute_image_features
    feats = compute_image_features(model, variables, batch)
    cached = dict(batch)
    cached['img_features'] = feats
    cached.pop('img')

    @jax.jit
    def infer(variables, b):
        results = model.apply(variables, b, train=False)
        return model.get_bboxes(results, b)

    det_full = infer(variables, batch)
    det_cached = infer(variables, cached)
    np.testing.assert_allclose(np.asarray(det_full['scores_3d']),
                               np.asarray(det_cached['scores_3d']),
                               rtol=1e-5, atol=1e-6)


def test_feature_cache_roundtrip(tmp_path, demf_model_and_vars):
    from demf_tpu.engine.feature_cache import FeatureCache
    cache = FeatureCache(str(tmp_path / 'cache'))
    feats = [np.random.rand(4, 6, 8).astype(np.float32) for _ in range(3)]
    cache.save(7, feats)
    assert cache.has(7) and not cache.has(8)
    loaded = cache.load(7)
    for a, b in zip(feats, loaded):
        np.testing.assert_allclose(a, b, atol=1e-3)  # fp16 storage
