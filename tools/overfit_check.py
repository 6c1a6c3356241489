#!/usr/bin/env python
"""End-to-end learning sanity: overfit VoteNet or FCAF3D on synthetic
scenes.

Trains the full-size model on a small synthetic SUN-RGB-D-format set and
reports indoor mAP before/after — evidence that ops, targets, losses,
optimizer and the eval stack close the loop (SURVEY.md §7 phase 4/5
check; FCAF3D mode covers the sparse-conv family the same way).

Usage: python tools/overfit_check.py [--steps 200] [--model votenet|fcaf3d]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(steps=200, batch_size=16, model_kind='votenet'):
    import jax
    import demf_tpu.models  # noqa: F401
    import demf_tpu.data  # noqa: F401
    from demf_tpu.data import build_dataset, build_dataloader
    from demf_tpu.engine import (build_optimizer, create_train_state,
                                 make_train_step)
    from demf_tpu.engine.evaluation import run_dataset_inference
    from demf_tpu.parallel import make_mesh, replicate, shard_batch
    from demf_tpu.utils.config import Config
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg

    if model_kind == 'fcaf3d':
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/fcaf3d/fcaf3d_sunrgbd.py'))
        cfg.model['max_voxels'] = 16384
        pipeline = [
            dict(type='LoadPointsFromFile', coord_type='DEPTH',
                 shift_height=False, load_dim=6,
                 use_dim=[0, 1, 2, 3, 4, 5]),
            dict(type='LoadAnnotations3D'),
            dict(type='PointSample', num_points=20000),
            dict(type='DefaultFormatBundle3D'),
            dict(type='Collect3D', keys=['points', 'gt_bboxes_3d',
                                         'gt_labels_3d']),
        ]
        lr, wd = 1e-3, 1e-4
        batch_size = min(batch_size, 8)
    else:
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/baseline/votenet.py'))
        pipeline = [
            dict(type='LoadPointsFromFile', coord_type='DEPTH',
                 shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
            dict(type='LoadAnnotations3D'),
            dict(type='PointSample', num_points=20000),
            dict(type='DefaultFormatBundle3D'),
            dict(type='Collect3D', keys=['points', 'gt_bboxes_3d',
                                         'gt_labels_3d']),
        ]
        lr, wd = 4e-3, 0.01
    ds = build_dataset(dict(type='SyntheticSUNRGBD', num_scenes=32,
                            num_raw_points=24000, max_boxes=6,
                            pipeline=pipeline, seed=7))
    loader = build_dataloader(ds, samples_per_gpu=batch_size, shuffle=True,
                              max_gt=16)

    model = build_from_cfg(cfg.model, DETECTORS)
    batch0 = next(iter(loader))
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), batch0)
    tx = build_optimizer(dict(type='AdamW', lr=lr, weight_decay=wd),
                         variables['params'],
                         grad_clip=dict(max_norm=10, norm_type=2))
    mesh = make_mesh()
    state = replicate(create_train_state(model, tx, variables), mesh)
    train_step = make_train_step(model, tx)

    def eval_map(state):
        results = run_dataset_inference(model, state, ds,
                                        batch_size=batch_size, max_gt=16)
        return ds.evaluate(results, iou_thr=(0.25,))['mAP_0.25']

    map_before = eval_map(state)
    print(f'mAP@0.25 before: {map_before:.4f}', flush=True)

    rng = jax.random.PRNGKey(0)
    it = 0
    t0 = time.perf_counter()
    losses = []
    while it < steps:
        for batch in loader:
            if it >= steps:
                break
            sbatch = shard_batch(batch, mesh)
            state, metrics = train_step(state, sbatch,
                                        jax.random.fold_in(rng, it))
            it += 1
            if it % 25 == 0:
                losses.append(float(metrics['loss']))
                print(f'step {it}: loss={losses[-1]:.3f} '
                      f'({(time.perf_counter() - t0) / it * 1000:.0f} '
                      f'ms/step avg)', flush=True)

    map_after = eval_map(state)
    print(f'mAP@0.25 after {steps} steps: {map_after:.4f}', flush=True)
    print(f'loss trajectory: {losses}')
    assert map_after > map_before + 0.1, 'model failed to learn'
    print('OVERFIT CHECK PASSED')


if __name__ == '__main__':
    steps = 200
    kind = 'votenet'
    if '--steps' in sys.argv:
        steps = int(sys.argv[sys.argv.index('--steps') + 1])
    if '--model' in sys.argv:
        kind = sys.argv[sys.argv.index('--model') + 1]
    main(steps=steps, model_kind=kind)
