"""DeMF-FCAF3D: deformable image fusion on FCAF3D (tiny e2e).

Re-derivation of the reference's DeMF_fcaf branch variant (reference
README.md:55-58; branch absent from the checkout — see
models/demf_fcaf3d.py docstring for the construction).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import demf_tpu.models  # noqa: F401
from demf_tpu.utils.registry import DETECTORS, build_from_cfg
from test_fcaf3d import synth_batch

pytestmark = pytest.mark.slow  # heavy-compile e2e tier


def tiny_cfg():
    return dict(
        type='DeMFFcaf3D',
        voxel_size=0.1,
        max_voxels=1024,
        pc_start=(-3.2, -0.2, -2.0),
        freeze_img_branch=True,
        backbone=dict(type='MinkResNet', in_channels=3, depth=18,
                      stem_channels=16),
        img_backbone=dict(type='ResNet', depth=50, num_stages=4,
                          out_indices=(1, 2, 3), frozen_stages=1,
                          norm_eval=True, style='pytorch'),
        img_neck=dict(type='ChannelMapper', in_channels=[512, 1024, 2048],
                      kernel_size=1, out_channels=32, act_cfg=None,
                      norm_cfg=dict(type='GN', num_groups=8), num_outs=4),
        img_encoder=dict(
            type='DeformableDetrEncoder',
            encoder=dict(
                type='DetrTransformerEncoder', num_layers=1,
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
        head=dict(
            type='DeMFFcaf3DHead', in_channels=(16, 32, 64, 128),
            out_channels=32, voxel_size=0.1,
            pts_assign_threshold=8, pts_center_threshold=6,
            n_classes=10, n_reg_outs=8, num_queries=32, embed_dims=32,
            decoder=dict(
                num_layers=1,
                transformerlayers=dict(
                    type='DeMFTransformerDecoderLayer',
                    attn_cfgs=[
                        dict(type='MultiheadAttention', embed_dims=32,
                             num_heads=4, dropout=0.1),
                        dict(type='MultiScaleDeformableAttention',
                             embed_dims=32, num_heads=4, num_levels=4,
                             num_points=4, dropout=0.1)],
                    feedforward_channels=64, ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'cross_attn',
                                     'norm', 'ffn', 'norm')),
                posembed=dict(input_channel=6, num_pos_feats=32))),
        test_cfg=dict(nms_pre=32, iou_thr=0.5, score_thr=0.01))


def fusion_batch(rng, b=2, p=3000, g=3, hw=(64, 96)):
    batch = synth_batch(rng, b=b, p=p, g=g)
    h, w = hw
    k = np.array([[60., 0, w / 2], [0, 60., h / 2], [0, 0, 1]], np.float32)
    d2c = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    d2i = np.eye(4, dtype=np.float32)
    d2i[:3, :3] = k @ d2c
    meta = dict(
        img_shape=np.tile(np.array([[h, w]], np.int32), (b, 1)),
        scale_factor=np.ones((b, 2), np.float32),
        flip=np.zeros((b,), bool),
        depth2img=np.tile(d2i[None], (b, 1, 1)),
        pcd_rotation=np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1)),
        pcd_scale_factor=np.ones((b,), np.float32),
        pcd_trans=np.zeros((b, 3), np.float32),
        pcd_horizontal_flip=np.zeros((b,), bool))
    batch['img'] = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    batch['img_meta'] = {kk: jnp.asarray(v) for kk, v in meta.items()}
    return batch


@pytest.fixture(scope='module')
def model_and_batch():
    rng = np.random.RandomState(0)
    batch = fusion_batch(rng)
    model = build_from_cfg(tiny_cfg(), DETECTORS)
    variables = jax.jit(lambda r, b: model.init(
        {'params': r}, b, train=False))(jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_fusion_forward_loss_grads(model_and_batch):
    model, variables, batch = model_and_batch

    @jax.jit
    def loss_fn(params):
        results, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(1)})
        losses = model.loss(results, batch)
        return sum(jnp.asarray(v) for v in losses.values()), losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables['params'])
    # base + one fusion stage of each loss kind
    assert {'loss_cls', 'loss_cls.f0', 'loss_bbox.f0',
            'loss_centerness.f0'} <= set(losses)
    assert np.isfinite(float(total))
    # grads flow into the fusion decoder but NOT the frozen image branch
    flat = jax.tree_util.tree_leaves_with_path(grads)
    dec_sum = sum(float(jnp.abs(g).sum()) for p, g in flat
                  if 'decoder_0' in jax.tree_util.keystr(p))
    img_sum = sum(float(jnp.abs(g).sum()) for p, g in flat
                  if 'img_backbone' in jax.tree_util.keystr(p))
    assert np.isfinite(dec_sum) and dec_sum > 0
    assert img_sum == 0.0


def test_fusion_inference_and_cache_path(model_and_batch):
    model, variables, batch = model_and_batch

    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch, train=False)
        return model.get_bboxes(results, batch)

    det = infer(variables, batch)
    assert det['boxes_3d'].shape[0] == 2
    assert np.isfinite(np.asarray(det['boxes_3d'])).all()

    # frozen-branch feature-cache path: precompute then feed img_features
    @jax.jit
    def feats_only(variables, batch):
        return model.apply(variables, batch, train=False,
                           img_feat_only=True)

    feats = feats_only(variables, batch)
    cbatch = dict(batch)
    cbatch['img_features'] = feats
    cbatch.pop('img')
    det2 = infer(variables, cbatch)
    np.testing.assert_allclose(np.asarray(det['boxes_3d']),
                               np.asarray(det2['boxes_3d']), atol=1e-5)
