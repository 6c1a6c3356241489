"""MinkResNet34 sparse backbone: stride pyramid, masking, grads.

Mirrors mmdet3d MinkResNet as FCAF3D consumes it (reference DeMF_fcaf
branch, SURVEY.md §2b N12): 4 stage outputs at tensor strides 8/16/32/64
with channels 64/128/256/512.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from demf_tpu.models.mink_resnet import MinkResNet
from demf_tpu.ops import sparse as S

pytestmark = pytest.mark.slow  # heavy-compile e2e tier


def _batch(rng, b=2, n_pts=2000, cap=1024):
    pts = (rng.rand(b, n_pts, 3) * 5).astype(np.float32)
    feats = rng.randn(b, n_pts, 3).astype(np.float32)
    coords, vfeats, valid = jax.vmap(
        lambda p, f: S.voxelize(p, f, 0.05, jnp.zeros(3), cap))(
        jnp.asarray(pts), jnp.asarray(feats))
    return coords, valid, vfeats


def test_stage_pyramid_and_masking():
    rng = np.random.RandomState(0)
    coords, valid, feats = _batch(rng)
    model = MinkResNet(depth=34, in_channels=3)
    variables = model.init(jax.random.PRNGKey(0), coords, valid, feats,
                           train=False)
    outs = model.apply(variables, coords, valid, feats, train=False)
    assert len(outs) == 4
    want_c = (64, 128, 256, 512)
    stride = 8
    for (oc, ov, of, _nbr), c in zip(outs, want_c):
        ov_np, oc_np, of_np = (np.asarray(ov), np.asarray(oc),
                               np.asarray(of))
        assert of.shape[-1] == c
        assert ov_np.any()
        # all valid coords are multiples of the level's tensor stride
        assert (oc_np[ov_np] % stride == 0).all(), stride
        # padding rows are exactly zero
        assert (of_np[~ov_np] == 0).all()
        assert np.isfinite(of_np).all()
        stride *= 2
    # each level's coordinate set is the downsample of the previous
    (c1, v1), (c2, v2) = outs[0][:2], outs[1][:2]
    s1 = {tuple(c) for c in np.asarray(c1)[np.asarray(v1)] // 16 * 16}
    s2 = {tuple(c) for c in np.asarray(c2)[np.asarray(v2)]}
    assert s2 == s1


def test_train_mode_updates_stats_and_grads_flow():
    rng = np.random.RandomState(1)
    coords, valid, feats = _batch(rng, b=1, n_pts=500, cap=256)
    model = MinkResNet(depth=18, in_channels=3, stem_channels=16)
    variables = model.init(jax.random.PRNGKey(0), coords, valid, feats,
                           train=True)

    def loss_fn(params):
        outs, upd = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            coords, valid, feats, train=True, mutable=['batch_stats'])
        return sum(jnp.sum(o[2] ** 2) for o in outs), upd

    (val, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params'])
    assert np.isfinite(float(val))
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert gsum > 0
    # running stats moved away from init
    m0 = variables['batch_stats']['stem_bn']['mean']
    m1 = upd['batch_stats']['stem_bn']['mean']
    assert float(jnp.abs(m1 - m0).sum()) > 0


def test_tensor_stride_submanifold_taps():
    """At tensor stride 2, kernel taps must step by 2 fine units: two
    voxels 2 apart interact, voxels 1 apart (impossible at that level)
    would not."""
    coords = jnp.asarray([[[0, 0, 0], [0, 0, 2], [0, 0, 4]]], jnp.int32)
    valid = jnp.ones((1, 3), bool)
    feats = jnp.asarray([[[1.0], [10.0], [100.0]]])
    w = jnp.ones((27, 1, 1))
    out = jax.vmap(lambda c, v, f: S.submanifold_conv(
        c, v, f, w, tensor_stride=2))(coords, valid, feats)
    # middle voxel sees all three; ends see two each
    np.testing.assert_allclose(np.asarray(out)[0, :, 0],
                               [11.0, 111.0, 110.0])
