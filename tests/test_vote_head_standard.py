"""Standard VoteHead (PartialBinBased coder) — the _base_ votenet model."""
import numpy as np
import jax
import jax.numpy as jnp

import demf_tpu.models  # noqa: F401
from demf_tpu.utils.registry import DETECTORS, build_from_cfg
from test_votenet import synth_batch

MEAN_SIZES = [[0.8, 0.9, 1.0]] * 10


def tiny_std_votenet_cfg():
    return dict(
        type='VoteNet',
        backbone=dict(
            type='PointNet2SASSG', in_channels=4, num_points=(64, 32, 16, 8),
            radius=(0.2, 0.4, 0.8, 1.2), num_samples=(8, 8, 4, 4),
            sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                         (32, 32, 64)),
            fp_channels=((64, 64), (64, 64)), norm_cfg=dict(type='BN2d'),
            sa_cfg=dict(type='PointSAModule', pool_mod='max', use_xyz=True,
                        normalize_xyz=True)),
        bbox_head=dict(
            type='VoteHead',
            num_classes=10,
            bbox_coder=dict(type='PartialBinBasedBBoxCoder', num_dir_bins=12,
                            num_sizes=10, mean_sizes=MEAN_SIZES,
                            with_rot=True),
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
            center_loss=dict(type='ChamferDistance', mode='l2',
                             reduction='sum', loss_src_weight=10.0,
                             loss_dst_weight=10.0),
            dir_class_loss=dict(type='CrossEntropyLoss', reduction='sum',
                                loss_weight=1.0),
            dir_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                              loss_weight=10.0),
            size_class_loss=dict(type='CrossEntropyLoss', reduction='sum',
                                 loss_weight=1.0),
            size_res_loss=dict(type='SmoothL1Loss', reduction='sum',
                               loss_weight=10.0 / 3.0),
            semantic_loss=dict(type='CrossEntropyLoss', reduction='sum',
                               loss_weight=1.0)),
        train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                       sample_mod='vote'),
        test_cfg=dict(sample_mod='seed', nms_thr=0.25, score_thr=0.05,
                      per_class_proposal=True))


def test_std_votehead_train_and_infer():
    model = build_from_cfg(tiny_std_votenet_cfg(), DETECTORS)
    batch = synth_batch(np.random.RandomState(3))
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), {'points': batch['points']})

    @jax.jit
    def fwd_loss(variables, batch):
        results, _ = model.apply(variables, batch, train=True,
                                 mutable=['batch_stats'])
        return results, model.loss(results, batch)

    results, losses = fwd_loss(variables, batch)
    assert results['size_res_norm'].shape == (2, 16, 10, 3)
    expect = {'vote_loss', 'objectness_loss', 'center_loss',
              'dir_class_loss', 'dir_res_loss', 'size_class_loss',
              'size_res_loss', 'semantic_loss'}
    assert expect <= set(losses)
    total = sum(jnp.asarray(v) for v in losses.values())
    assert np.isfinite(float(total))

    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch, train=False)
        return model.get_bboxes(results, batch)

    det = infer(variables, batch)
    assert det['boxes_3d'].shape == (2, 160, 7)
    assert np.isfinite(np.asarray(det['boxes_3d'])).all()


def test_partial_bin_coder_roundtrip():
    from demf_tpu.core.coders import PartialBinBasedBBoxCoder
    coder = PartialBinBasedBBoxCoder(num_dir_bins=12, num_sizes=10,
                                     mean_sizes=MEAN_SIZES, with_rot=True)
    rng = np.random.RandomState(0)
    n = 6
    gt = np.concatenate([
        rng.randn(n, 3), rng.rand(n, 3) + 0.5,
        rng.uniform(-np.pi, np.pi, (n, 1))], -1).astype(np.float32)
    labels = rng.randint(0, 10, n)
    center, scls, sres, dcls, dres = coder.encode(
        jnp.asarray(gt), jnp.asarray(labels))
    # rebuild a prediction dict that should decode back to the gt boxes
    out = dict(
        center=jnp.asarray(center)[None],
        dir_class=jax.nn.one_hot(dcls, 12)[None] * 10,
        dir_res=jnp.tile(np.asarray(dres)[:, None], (1, 12))[None],
        size_class=jax.nn.one_hot(scls, 10)[None] * 10,
        size_res=jnp.tile(np.asarray(sres)[:, None, :], (1, 10, 1))[None])
    dec = np.asarray(coder.decode(out))[0]
    gravity = gt[:, :3] + np.array([0, 0, 0.5]) * gt[:, 5:6] * np.array(
        [0, 0, 1])
    np.testing.assert_allclose(dec[:, :3], np.asarray(center), atol=1e-5)
    np.testing.assert_allclose(dec[:, 3:6], gt[:, 3:6], atol=1e-4)
