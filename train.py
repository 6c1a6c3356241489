#!/usr/bin/env python
"""Training entry point.

TPU-native counterpart of the reference's train CLI (train.py there):
config load/merge + work_dir dump, seeding, linear LR autoscaling, model +
dataset build, then the SPMD runner.  ``--launcher jax`` initializes
multi-host via jax.distributed; within a host, all local devices are always
used (SPMD), so no per-GPU process spawning is needed.
"""
from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from demf_tpu.engine.cli import parse_args
    args = parse_args(argv)

    from demf_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    if args.launcher != 'none':
        # every launcher maps to jax.distributed coordinator discovery
        # (reference init_dist accepts pytorch/slurm/mpi: default.py:54-58);
        # missing launcher env raises — never a silent single-process run
        from demf_tpu.parallel.mesh import init_distributed
        init_distributed(launcher=args.launcher)

    import jax
    import demf_tpu.models  # noqa: F401
    import demf_tpu.data  # noqa: F401
    from demf_tpu.data import build_dataset, build_dataloader
    from demf_tpu.engine import (Runner, build_optimizer, step_lr_schedule,
                                 load_params)
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg

    if args.work_dir:
        cfg.work_dir = args.work_dir
    elif not cfg.get('work_dir'):
        cfg.work_dir = os.path.join(
            'work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(cfg.work_dir, exist_ok=True)
    cfg.dump(os.path.join(cfg.work_dir, os.path.basename(args.config)))

    log_file = os.path.join(cfg.work_dir,
                            time.strftime('%Y%m%d_%H%M%S') + '.log')
    log_fh = open(log_file, 'a')

    def logger(msg):
        line = f'{time.strftime("%Y-%m-%d %H:%M:%S")} - {msg}'
        print(line)
        log_fh.write(line + '\n')
        log_fh.flush()

    logger(f'devices: {jax.devices()}')
    logger(f'config: {args.config}')

    if args.autoscale_lr:
        cfg.optimizer['lr'] = (cfg.optimizer['lr'] *
                               len(jax.devices()) / 8.0)
        logger(f'autoscaled lr to {cfg.optimizer["lr"]}')

    np.random.seed(args.seed)

    dataset = build_dataset(cfg.data['train'])
    loader = build_dataloader(
        dataset, samples_per_gpu=cfg.data['samples_per_gpu'],
        workers_per_gpu=cfg.data.get('workers_per_gpu', 4),
        shuffle=True, seed=args.seed,
        max_gt=cfg.get('max_gt', 64))

    model = build_from_cfg(cfg.model, DETECTORS)
    batch0 = next(iter(loader))
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(args.seed), batch0)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(variables['params']))
    logger(f'model params: {n_params / 1e6:.2f}M')

    if cfg.get('load_from'):
        params = load_params(cfg.load_from, variables['params'])
        variables = dict(variables)
        variables['params'] = params
        logger(f'warm-started from {cfg.load_from}')

    if cfg.get('cached_img_features'):
        # frozen image branch + deterministic image pipeline => encode each
        # scene once and train the fusion stage from the cache
        from demf_tpu.engine.feature_cache import (
            CachedFeatureLoader, FeatureCache, precompute_dataset_features)
        cache = FeatureCache(os.path.join(cfg.work_dir, 'img_feat_cache'))
        base_ds = getattr(dataset, 'dataset', dataset)
        logger('filling frozen image-feature cache ...')
        precompute_dataset_features(
            model, variables, base_ds, cache,
            batch_size=cfg.data['samples_per_gpu'],
            max_gt=cfg.get('max_gt', 64),
            progress_cb=lambda d, n: logger(f'  cache {d}/{n}'))
        loader = CachedFeatureLoader(loader, cache)
        logger('image-feature cache active')

    max_epochs = cfg.runner['max_epochs']
    lr_cfg = cfg.get('lr_config') or {}
    schedule = step_lr_schedule(
        cfg.optimizer['lr'], steps_per_epoch=max(len(loader), 1),
        milestones=lr_cfg.get('step', []),
        warmup=lr_cfg.get('warmup'),
        warmup_iters=lr_cfg.get('warmup_iters', 500),
        warmup_ratio=lr_cfg.get('warmup_ratio', 1.0 / 3))
    grad_clip = (cfg.get('optimizer_config') or {}).get('grad_clip')
    optimizer_cfg = dict(cfg.optimizer)
    frozen = getattr(model, 'frozen_param_patterns', lambda: [])()
    if frozen:
        pw = dict(optimizer_cfg.get('paramwise_cfg') or {})
        keys = dict(pw.get('custom_keys') or {})
        for pat in frozen:
            keys[pat] = dict(lr_mult=0.0, decay_mult=0.0)
        pw['custom_keys'] = keys
        optimizer_cfg['paramwise_cfg'] = pw
        logger(f'frozen param patterns: {frozen}')
    tx = build_optimizer(optimizer_cfg, variables['params'],
                         lr_schedule=schedule, grad_clip=grad_clip)

    eval_fn = None
    if not args.no_validate and cfg.get('evaluation', {}).get('interval'):
        val_ds = build_dataset(cfg.data['val'])
        from demf_tpu.engine.evaluation import make_dataset_eval_fn
        eval_fn = make_dataset_eval_fn(
            model, val_ds, cfg.data['samples_per_gpu'], logger)

    runner_cfg = dict(
        log_interval=cfg.get('log_config', {}).get('interval', 50),
        checkpoint_interval=cfg.get('checkpoint_config', {}).get(
            'interval', 1),
        max_keep_ckpts=cfg.get('checkpoint_config', {}).get(
            'max_keep_ckpts', -1),
        eval_interval=cfg.get('evaluation', {}).get('interval', 0)
        if not args.no_validate else 0,
        max_epochs=max_epochs,
        seed=args.seed,
        # reference fp16 surface (eval.py:84-86) -> bf16 policy on TPU
        fp16=cfg.get('fp16'), bf16=cfg.get('bf16'))
    # self-describing checkpoints (reference train.py:127-137 embeds the
    # config text, CLASSES and versions into checkpoint meta)
    import demf_tpu
    ckpt_meta = dict(
        config=cfg.dump(),
        config_file=os.path.basename(args.config),
        CLASSES=list(getattr(dataset, 'CLASSES', []) or []),
        demf_tpu_version=demf_tpu.__version__,
        jax_version=jax.__version__,
        seed=args.seed,
        time=time.strftime('%Y-%m-%d %H:%M:%S'))
    runner = Runner(model, tx, variables, loader, runner_cfg,
                    work_dir=cfg.work_dir, eval_fn=eval_fn, logger=logger,
                    meta=ckpt_meta)
    if args.resume_from:
        runner.resume(args.resume_from)
        logger(f'resumed from {args.resume_from}')
    runner.run()
    logger('training finished')


if __name__ == '__main__':
    main()
