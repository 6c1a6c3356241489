#!/usr/bin/env python
"""Profile the FCAF3D train step (xplane + component timings).

Round-3 plan item 1 (NOTES.md): find where the ~1.1 s/step at b8/16k
voxels goes — voxelize, backbone convs, head decode, targets/IoU loss,
NMS-free train path.

Usage: python tools/profile_fcaf3d.py [--trace] [--batch 8]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(batch_size=8, do_trace=False, max_voxels=16384, num_points=20000):
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    import demf_tpu.models  # noqa: F401
    from demf_tpu.engine import (build_optimizer, create_train_state,
                                 make_train_step)
    from demf_tpu.parallel import make_mesh, replicate, shard_batch
    from demf_tpu.utils.config import Config
    from demf_tpu.utils.profiling import time_fn, trace
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from demf_tpu.ops import sparse as S

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(__file__), '..', 'configs/fcaf3d/fcaf3d_sunrgbd.py'))
    cfg.model['max_voxels'] = max_voxels
    model = build_from_cfg(cfg.model, DETECTORS)

    rng = np.random.RandomState(0)
    pts = np.zeros((batch_size, num_points, 6), np.float32)
    pts[..., :3] = rng.rand(batch_size, num_points, 3) * 5 - 2.5
    pts[..., 1] += 2.5
    pts[..., 3:] = rng.rand(batch_size, num_points, 3)
    g = 16
    boxes = np.zeros((batch_size, g, 7), np.float32)
    boxes[..., :3] = rng.rand(batch_size, g, 3) * 3 - 1.5
    boxes[..., 1] += 2
    boxes[..., 3:6] = rng.rand(batch_size, g, 3) + 0.3
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (batch_size, g))
    batch = dict(points=jnp.asarray(pts), gt_bboxes_3d=jnp.asarray(boxes),
                 gt_labels_3d=jnp.asarray(rng.randint(0, 10,
                                                      (batch_size, g))),
                 gt_valid=jnp.asarray(np.ones((batch_size, g), bool)))

    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), batch)
    tx = build_optimizer(dict(cfg.optimizer), variables['params'],
                         grad_clip=dict(max_norm=10, norm_type=2))
    mesh = make_mesh()
    state = replicate(create_train_state(model, tx, variables), mesh)
    compute_dtype = 'bfloat16' if '--bf16' in sys.argv else None
    step = make_train_step(model, tx, donate=False,
                           compute_dtype=compute_dtype)
    sbatch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)

    dt = time_fn(lambda: step(state, sbatch, key), iters=5, warmup=2,
                 name=f'full train step (compute={compute_dtype})')
    print(f'=> {batch_size / dt:.1f} scenes/s')

    # component timings (forward-only pieces)
    vox = jax.jit(jax.vmap(lambda p: S.voxelize(
        p[:, :3], p[:, 3:6], model.voxel_size,
        jnp.asarray(model.pc_start), model.max_voxels)))
    time_fn(lambda: vox(batch['points']), iters=5, warmup=2,
            name='voxelize')

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    time_fn(lambda: fwd(variables, batch), iters=3, warmup=1,
            name='model forward (eval mode)')

    def loss_only(v, b):
        results = model.apply(v, b, train=False)
        return sum(jnp.asarray(x)
                   for x in model.loss(results, b).values())
    time_fn(lambda: jax.jit(loss_only)(variables, batch), iters=3,
            warmup=1, name='forward + loss')

    infer = jax.jit(lambda v, b: model.get_bboxes(
        model.apply(v, b, train=False), b))
    time_fn(lambda: infer(variables, batch), iters=3, warmup=1,
            name='forward + decode + NMS')

    if '--detail' in sys.argv:
        from demf_tpu.utils.precision import cast_floating, \
            compute_dtype_scope
        from demf_tpu.utils.registry import BACKBONES
        cd = compute_dtype or 'float32'
        bf_params = cast_floating(variables['params'], cd)

        # backbone-only (incl. voxelize) in the policy dtype
        bb = build_from_cfg(dict(cfg.model['backbone']), BACKBONES)
        bb_vars = {'params': bf_params['backbone'],
                   'batch_stats': variables['batch_stats']['backbone']}

        def bb_fwd(v, pts):
            coords, feats, valid = jax.vmap(lambda p: S.voxelize(
                p[:, :3], p[:, 3:6], model.voxel_size,
                jnp.asarray(model.pc_start), model.max_voxels))(pts)
            with compute_dtype_scope(cd):
                return bb.apply(v, coords, valid,
                                feats.astype(jnp.dtype(cd)), train=False)
        jbb = jax.jit(bb_fwd)
        time_fn(lambda: jbb(bb_vars, batch['points']), iters=3,
                warmup=1, name=f'voxelize + backbone ({cd})')
        bouts = jbb(bb_vars, batch['points'])

        # head-only on frozen backbone outs
        def head_fwd(params, bo):
            from demf_tpu.utils.registry import HEADS as _H
            hcfg = dict(cfg.model['head'])
            hcfg.setdefault('test_cfg', model.test_cfg)
            hcfg.setdefault('pc_start', model.pc_start)
            hm = build_from_cfg(hcfg, _H)
            with compute_dtype_scope(cd):
                return hm.apply({'params': params,
                                 'batch_stats':
                                     variables['batch_stats']['head']},
                                bo, train=False)
        jh = jax.jit(lambda p, bo: head_fwd(p, bo))
        time_fn(lambda: jh(bf_params['head'], bouts), iters=3,
                warmup=1, name=f'head fwd ({cd})')
        houts = jh(bf_params['head'], bouts)

        # loss math only (targets + focal + IoU) on frozen head outs
        def loss_only_fn(ho, b):
            hcfg = dict(cfg.model['head'])
            hcfg.setdefault('test_cfg', model.test_cfg)
            hcfg.setdefault('pc_start', model.pc_start)
            from demf_tpu.utils.registry import HEADS as _H
            hm = build_from_cfg(hcfg, _H, {'parent': None})
            losses = hm.loss(ho, b['gt_bboxes_3d'], b['gt_labels_3d'],
                             b['gt_valid'])
            return sum(jnp.asarray(x) for x in losses.values())
        jl = jax.jit(loss_only_fn)
        time_fn(lambda: jl(houts, batch), iters=3, warmup=1,
                name='targets + loss math')

    if do_trace:
        with trace('/tmp/fcaf3d_trace') as d:
            for i in range(3):
                out = step(state, sbatch, jax.random.fold_in(key, i))
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
        print(f'xplane trace in {d}')


if __name__ == '__main__':
    kw = {}
    if '--batch' in sys.argv:
        kw['batch_size'] = int(sys.argv[sys.argv.index('--batch') + 1])
    if '--trace' in sys.argv:
        kw['do_trace'] = True
    main(**kw)
