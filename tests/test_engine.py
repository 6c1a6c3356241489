"""Engine tests: data pipeline -> loader -> sharded train step -> eval."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import demf_tpu.models  # noqa: F401
import demf_tpu.data  # noqa: F401
from demf_tpu.data import build_dataset, build_dataloader
from demf_tpu.engine import (build_optimizer, create_train_state,
                             make_train_step, make_eval_step,
                             step_lr_schedule)
from demf_tpu.parallel import make_mesh, shard_batch, replicate
from demf_tpu.utils.registry import DETECTORS, build_from_cfg

from test_votenet import tiny_votenet_cfg


def tiny_pipeline(train=True):
    pipe = [
        dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
             load_dim=6, use_dim=[0, 1, 2]),
        dict(type='LoadAnnotations3D'),
    ]
    if train:
        pipe += [
            dict(type='RandomFlip3D', sync_2d=False,
                 flip_ratio_bev_horizontal=0.5),
            dict(type='GlobalRotScaleTrans', rot_range=[-0.523599, 0.523599],
                 scale_ratio_range=[0.85, 1.15], shift_height=True),
        ]
    pipe += [
        dict(type='PointSample', num_points=256),
        dict(type='DefaultFormatBundle3D'),
        dict(type='Collect3D', keys=['points', 'gt_bboxes_3d',
                                     'gt_labels_3d']),
    ]
    return pipe


@pytest.fixture(scope='module')
def loader():
    ds = build_dataset(dict(type='SyntheticSUNRGBD', num_scenes=16,
                            num_raw_points=512, max_boxes=4,
                            pipeline=tiny_pipeline()))
    return build_dataloader(ds, samples_per_gpu=8, shuffle=True, max_gt=8)


def test_pipeline_and_collate(loader):
    batch = next(iter(loader))
    assert batch['points'].shape == (8, 256, 4)
    assert batch['gt_bboxes_3d'].shape == (8, 8, 7)
    assert batch['gt_valid'].dtype == bool
    assert batch['gt_valid'].any()
    assert 'pcd_rotation' in batch['img_meta']
    assert np.isfinite(batch['points']).all()


def test_sharded_train_step_8dev(loader):
    """Full DP train step over the virtual 8-device CPU mesh."""
    assert len(jax.devices()) == 8
    model = build_from_cfg(tiny_votenet_cfg(), DETECTORS)
    batch = next(iter(loader))
    mesh = make_mesh()
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), {'points': jnp.asarray(batch['points'])})

    sched = step_lr_schedule(0.008, steps_per_epoch=2, milestones=[24, 32])
    tx = build_optimizer(dict(type='AdamW', lr=0.008, weight_decay=0.01),
                         variables['params'], lr_schedule=sched,
                         grad_clip=dict(max_norm=10, norm_type=2))
    state = create_train_state(model, tx, variables)
    state = replicate(state, mesh)
    train_step = make_train_step(model, tx)

    sbatch = shard_batch(batch, mesh)
    losses = []
    for i in range(3):
        state, metrics = train_step(state, sbatch, jax.random.PRNGKey(i))
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    # params actually moved
    eval_step = make_eval_step(model)
    det = eval_step(state, sbatch)
    assert det['boxes_3d'].shape[0] == 8


def test_eval_plumbing_to_map(loader):
    """Detections -> dataset.evaluate -> finite mAP numbers."""
    ds = loader.dataset
    model = build_from_cfg(tiny_votenet_cfg(), DETECTORS)
    batch = next(iter(loader))
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), {'points': jnp.asarray(batch['points'])})
    tx = build_optimizer(dict(type='AdamW', lr=1e-3), variables['params'])
    state = create_train_state(model, tx, variables)
    eval_step = make_eval_step(model)
    det = jax.device_get(eval_step(state, batch))
    results = []
    for i in range(det['boxes_3d'].shape[0]):
        v = det['valid'][i]
        results.append(dict(boxes_3d=det['boxes_3d'][i][v],
                            scores_3d=det['scores_3d'][i][v],
                            labels_3d=det['labels_3d'][i][v]))
    # evaluate over the scenes in this batch only
    gt = [ds.get_gt_annos()[j] for j in batch['sample_idx']]
    from demf_tpu.core.eval3d import indoor_eval
    res = indoor_eval(gt, results, (0.25,), ds.CLASSES)
    assert 'mAP_0.25' in res and np.isfinite(res['mAP_0.25'])


def test_lr_schedule_steps():
    sched = step_lr_schedule(0.008, steps_per_epoch=10, milestones=[24, 32])
    assert abs(float(sched(0)) - 0.008) < 1e-9
    assert abs(float(sched(239)) - 0.008) < 1e-9
    assert abs(float(sched(240)) - 0.0008) < 1e-9
    assert abs(float(sched(320)) - 0.00008) < 1e-9


def test_optimizer_lr_mult():
    params = {'decoder': {'w': jnp.ones(3)}, 'other': {'w': jnp.ones(3)}}
    tx = build_optimizer(
        dict(type='AdamW', lr=1.0, weight_decay=0.0,
             paramwise_cfg=dict(custom_keys={'decoder': dict(lr_mult=0.05)})),
        params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ratio = float(updates['decoder']['w'][0] / updates['other']['w'][0])
    assert abs(ratio - 0.05) < 1e-5


def test_aug_test_flip_ensemble(loader):
    """Flip TTA doubles the candidate set and stays geometrically sane."""
    from demf_tpu.engine.aug_test import aug_test_3d
    model = build_from_cfg(tiny_votenet_cfg(), DETECTORS)
    batch = next(iter(loader))
    batch = {k: (jnp.asarray(v) if not isinstance(v, dict) else
                 {kk: jnp.asarray(vv) for kk, vv in v.items()})
             for k, v in batch.items()}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    det = aug_test_3d(model, variables, batch)
    single = jax.jit(lambda v, b: model.get_bboxes(
        model.apply(v, b, train=False), b))(variables, batch)
    assert det['boxes_3d'].shape[1] == 2 * single['boxes_3d'].shape[1]
    assert np.isfinite(np.asarray(det['boxes_3d'])).all()


def test_bf16_policy_train_step():
    """bf16 mixed-precision policy (N11): finite loss close to the f32
    step, fp32 grads, fp32 batch_stats, unchanged master params dtype."""
    from demf_tpu.zoo import synth_demf_batch, tiny_demf_model_cfg

    model = build_from_cfg(tiny_demf_model_cfg(), DETECTORS)
    batch = synth_demf_batch(b=2, p=128, g=8, hw=(64, 96),
                             valid_hw=(60, 88))
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    tx = build_optimizer(dict(type='AdamW', lr=1e-3), variables['params'])

    losses = {}
    for name, dt in (('f32', None), ('bf16', 'bfloat16')):
        state = create_train_state(model, tx, variables)
        step = make_train_step(model, tx, compute_dtype=dt, donate=False)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[name] = float(metrics['loss'])
        assert np.isfinite(losses[name])
        leaves = jax.tree_util.tree_leaves(new_state.params)
        assert all(l.dtype == jnp.float32 for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.inexact))
        stats = jax.tree_util.tree_leaves(new_state.batch_stats)
        assert all(l.dtype == jnp.float32 for l in stats)
    # bf16 rounding can flip chamfer argmin assignments on a random-init
    # model, so the loss only has to stay in the same ballpark here; the
    # real quality guard is the overfit-convergence check
    assert abs(losses['bf16'] - losses['f32']) / abs(losses['f32']) < 0.2, \
        losses


def test_bf16_policy_eval_step():
    from demf_tpu.zoo import synth_demf_batch, tiny_demf_model_cfg

    model = build_from_cfg(tiny_demf_model_cfg(), DETECTORS)
    batch = synth_demf_batch(b=2, p=128, g=8, hw=(64, 96),
                             valid_hw=(60, 88))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = create_train_state(
        model, build_optimizer(dict(type='AdamW', lr=1e-3),
                               variables['params']), variables)
    det32 = make_eval_step(model)(state, batch)
    det16 = make_eval_step(model, compute_dtype='bfloat16')(state, batch)
    assert det16['boxes_3d'].dtype == det32['boxes_3d'].dtype
    # same top-score box class/validity plumbing survives the cast
    assert det16['boxes_3d'].shape == det32['boxes_3d'].shape
    assert bool(np.isfinite(np.asarray(det16['scores_3d'])).all())


def test_bf16_policy_keeps_points_fp32():
    """Advisor round 2: bf16 has 8 mantissa bits — at 5 m the quantization
    step (~2 cm) exceeds FCAF3D's 1 cm voxel, so raw points must stay fp32
    through coordinate math; only derived features take the policy dtype
    (utils/precision.py)."""
    from demf_tpu.utils.precision import (cast_batch, cast_compute,
                                          compute_dtype_scope)
    pts = jnp.asarray(np.linspace(4.0, 5.0, 256, dtype=np.float32))
    batch = {'points': pts, 'img': jnp.zeros((2, 4, 4, 3), jnp.float32)}
    out = cast_batch(batch, 'bfloat16')
    assert out['points'].dtype == jnp.float32
    assert out['img'].dtype == jnp.bfloat16
    # the hazard is real: bf16 round-trip shifts 1 cm voxel coords
    c32 = np.floor(np.asarray(pts) / 0.01)
    c16 = np.floor(np.asarray(
        pts.astype(jnp.bfloat16).astype(jnp.float32)) / 0.01)
    assert (c32 != c16).any()
    # derived features cast only inside the policy scope
    x = jnp.zeros((4,), jnp.float32)
    with compute_dtype_scope('bfloat16'):
        assert cast_compute(x).dtype == jnp.bfloat16
    assert cast_compute(x).dtype == jnp.float32


def test_checkpoint_meta_roundtrip(tmp_path):
    """Self-describing checkpoints (reference train.py:127-137 embeds config
    text / CLASSES / versions; eval.py:90-98 reads CLASSES back)."""
    from demf_tpu.engine.checkpoint import (load_meta, restore_checkpoint,
                                            save_checkpoint)
    state = {'params': {'w': jnp.arange(4, dtype=jnp.float32)},
             'opt': jnp.zeros((2,))}
    meta = dict(config='model = dict(type="VoteNet")',
                CLASSES=['bed', 'chair'], demf_tpu_version='0.1.0', seed=3)
    save_checkpoint(str(tmp_path), state, epoch=0, meta=meta)
    ckpt = str(tmp_path / 'checkpoints' / 'epoch_1')
    m = load_meta(ckpt)
    assert m['CLASSES'] == ['bed', 'chair']
    assert m['epoch'] == 0 and m['seed'] == 3
    assert 'VoteNet' in m['config']
    restored, epoch = restore_checkpoint(ckpt, state)
    assert epoch == 0
    np.testing.assert_array_equal(np.asarray(restored['params']['w']),
                                  np.arange(4, dtype=np.float32))
    # checkpoints without a sidecar are still loadable (meta is None)
    assert load_meta(str(tmp_path / 'nope')) is None
