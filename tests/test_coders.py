"""Golden-value tests for box coders (reference math transcribed to numpy)."""
import numpy as np
import jax.numpy as jnp

from demf_tpu.core import boxes as box_ops
from demf_tpu.core.coders import (ClassAgnosticBBoxCoder,
                                  DeMFClassAgnosticBBoxCoder)


def test_angle2class_roundtrip():
    angles = jnp.asarray(np.linspace(-3 * np.pi, 3 * np.pi, 97))
    cls, res = box_ops.angle2class(angles, 12)
    rec = box_ops.class2angle(cls, res, 12)
    # recovered angle must equal original mod 2pi (mapped into (-pi, pi])
    diff = np.asarray((rec - angles) % (2 * np.pi))
    diff = np.minimum(diff, 2 * np.pi - diff)
    assert diff.max() < 1e-5


def test_rotation_3d_in_axis_convention():
    # mmdet3d 0.18 axis=2: x' = x cos + y sin; y' = -x sin + y cos
    pts = jnp.asarray([[[1.0, 0.0, 0.0]]])
    out = np.asarray(box_ops.rotation_3d_in_axis(pts, jnp.asarray([np.pi / 2])))
    np.testing.assert_allclose(out[0, 0], [0, -1, 0], atol=1e-6)


def test_gravity_center_and_corners():
    box = jnp.asarray([[1., 2., 3., 2., 4., 6., 0.]])
    gc = np.asarray(box_ops.gravity_center(box))
    np.testing.assert_allclose(gc[0], [1, 2, 6])
    corners = np.asarray(box_ops.box_corners(box))
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[0].min(0), [0, 0, 3], atol=1e-6)
    np.testing.assert_allclose(corners[0].max(0), [2, 4, 9], atol=1e-6)


def test_ca_coder_encode_decode_roundtrip():
    """decode(split-like dict built from targets) must reproduce GT boxes."""
    coder = ClassAgnosticBBoxCoder(num_dir_bins=12, with_rot=True)
    rng = np.random.RandomState(0)
    n = 8
    gt = np.concatenate([
        rng.randn(n, 3), rng.rand(n, 3) * 2 + 0.3,
        rng.uniform(-np.pi, np.pi, (n, 1))], -1).astype(np.float32)
    gt_j = jnp.asarray(gt)[None]
    center, half, dir_cls, dir_res = coder.encode(gt_j[0],
                                                  jnp.zeros(n, jnp.int32))
    # build face distances for aggregated points = gravity centers shifted
    agg = np.asarray(center) + rng.randn(n, 3).astype(np.float32) * 0.05
    yaw = gt[:, 6]
    canonical = np.asarray(box_ops.rotation_3d_in_axis(
        jnp.asarray(agg - np.asarray(center))[:, None], jnp.asarray(-yaw),
        axis=2))[:, 0]
    half_np = np.asarray(half)
    dist = np.stack([
        half_np[:, 0] - canonical[:, 0], half_np[:, 1] - canonical[:, 1],
        half_np[:, 2] - canonical[:, 2], half_np[:, 0] + canonical[:, 0],
        half_np[:, 1] + canonical[:, 1], half_np[:, 2] + canonical[:, 2]],
        -1)
    dir_onehot = np.eye(12)[np.asarray(dir_cls)] * 10.0
    dir_res_full = np.tile(np.asarray(dir_res)[:, None], (1, 12))
    bbox_out = dict(
        distance=jnp.asarray(dist)[None],
        dir_class=jnp.asarray(dir_onehot)[None],
        dir_res=jnp.asarray(dir_res_full)[None],
        ref_points=jnp.asarray(agg)[None],
    )
    dec = np.asarray(coder.decode(bbox_out))[0]
    gravity = np.asarray(box_ops.gravity_center(gt_j))[0]
    np.testing.assert_allclose(dec[:, :3], gravity, atol=1e-4)
    np.testing.assert_allclose(dec[:, 3:6], gt[:, 3:6], atol=1e-4)
    # yaw equal mod pi conventions
    dyaw = (dec[:, 6] - gt[:, 6]) % (2 * np.pi)
    dyaw = np.minimum(dyaw, 2 * np.pi - dyaw)
    assert dyaw.max() < 1e-4


def test_split_pred_layout():
    coder = ClassAgnosticBBoxCoder(num_dir_bins=12, with_rot=True)
    b, n = 2, 4
    cls_preds = jnp.asarray(np.random.randn(b, 12, n).astype(np.float32))
    reg_preds = jnp.asarray(np.random.randn(b, 30, n).astype(np.float32))
    ref = jnp.zeros((b, n, 3))
    out = coder.split_pred(cls_preds, reg_preds, ref)
    assert out['distance'].shape == (b, n, 6)
    assert out['dir_class'].shape == (b, n, 12)
    assert out['dir_res'].shape == (b, n, 12)
    assert out['obj_scores'].shape == (b, n, 2)
    assert out['sem_scores'].shape == (b, n, 10)
    assert np.all(np.asarray(out['distance']) > 0)  # exp()'d


def test_demf_coder_center_size():
    coder = DeMFClassAgnosticBBoxCoder(num_dir_bins=12, with_rot=True)
    b, n = 1, 3
    cls_preds = jnp.asarray(np.random.randn(b, 12, n).astype(np.float32))
    reg_preds = jnp.asarray(np.random.randn(b, 30, n).astype(np.float32))
    base = jnp.asarray(np.random.randn(b, n, 3).astype(np.float32))
    out = coder.split_pred(cls_preds, reg_preds, base)
    np.testing.assert_allclose(
        np.asarray(out['center']),
        np.asarray(base) + np.asarray(jnp.swapaxes(reg_preds, 1, 2))[..., :3],
        rtol=1e-6)
    dec = coder.decode(out)
    assert dec.shape == (b, n, 7)
    # encode returns full dims (not halved)
    gt = jnp.asarray([[[0, 0, 0, 2., 4., 6., 0.]]])
    _, size, _, _ = coder.encode(gt[0], jnp.zeros(1, jnp.int32))
    np.testing.assert_allclose(np.asarray(size)[0], [2, 4, 6])
