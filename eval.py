#!/usr/bin/env python
"""Evaluation entry point (the reference's ``eval.py`` CLI surface).

Builds the test dataloader, restores a checkpoint, runs jitted batched
inference over the dataset and reports indoor mAP via
``dataset.evaluate(metric='mAP')``.
"""
from __future__ import annotations

import pickle


def main(argv=None):
    from demf_tpu.engine.cli import parse_args_test
    args = parse_args_test(argv)

    from demf_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    if args.launcher != 'none':
        from demf_tpu.parallel.mesh import init_distributed
        init_distributed(launcher=args.launcher)

    import jax
    import numpy as np
    import demf_tpu.models  # noqa: F401
    import demf_tpu.data  # noqa: F401
    from demf_tpu.data import build_dataset
    from demf_tpu.data.loader import collate_fixed
    from demf_tpu.engine import load_params
    from demf_tpu.engine.evaluation import run_dataset_inference
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg

    dataset = build_dataset(cfg.data['test'])

    # self-describing checkpoints: recover CLASSES recorded at train time
    # (reference eval.py:90-98 reads checkpoint['meta']['CLASSES'])
    from demf_tpu.engine.checkpoint import load_meta
    ckpt_meta = load_meta(args.checkpoint)
    if ckpt_meta:
        info = {k: ckpt_meta[k] for k in
                ('config_file', 'demf_tpu_version', 'seed', 'time', 'epoch')
                if k in ckpt_meta}
        print(f'checkpoint meta: {info}')
        classes = ckpt_meta.get('CLASSES')
        if classes and tuple(classes) != tuple(
                getattr(dataset, 'CLASSES', ()) or ()):
            print(f'using CLASSES from checkpoint meta: {classes}')
            ds = getattr(dataset, 'dataset', dataset)
            ds.CLASSES = tuple(classes)
            if ds is not dataset:
                dataset.CLASSES = tuple(classes)

    model = build_from_cfg(cfg.model, DETECTORS)

    batch0 = collate_fixed([dataset[0]], max_gt=cfg.get('max_gt', 64))
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(args.seed), batch0)
    params, batch_stats = load_params(args.checkpoint,
                                      with_batch_stats=True)
    if not batch_stats:
        batch_stats = variables.get('batch_stats', {})
    variables = {'params': params, 'batch_stats': batch_stats}
    if args.fuse_conv_bn:
        from demf_tpu.engine.fuse_bn import fuse_conv_bn
        variables, n_fused = fuse_conv_bn(variables)
        print(f'fused {n_fused} conv+BN pairs')

    def progress(done, total):
        if done % (10 * cfg.data['samples_per_gpu']) < \
                cfg.data['samples_per_gpu']:
            print(f'[{done}/{total}]', flush=True)

    from demf_tpu.utils.precision import resolve_compute_dtype
    results = run_dataset_inference(
        model, variables, dataset,
        batch_size=cfg.data['samples_per_gpu'],
        max_gt=cfg.get('max_gt', 64), progress_cb=progress,
        # reference wrap_fp16_model surface (eval.py:84-86) -> bf16 policy
        compute_dtype=resolve_compute_dtype(cfg))

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
        print(f'results written to {args.out}')
    if args.show or args.show_dir:
        # reference --show/--show-dir surface (demf/engine/default.py:
        # 134-140); headless hosts always save .obj dumps
        from demf_tpu.engine.visualize import show_dataset_results
        out_dir = args.show_dir or 'show_results'
        show_dataset_results(dataset, results, out_dir)
        print(f'visualizations written to {out_dir}')
    if args.format_only:
        # reference eval.py:119-121: dataset.format_results(results, **kw)
        prefix = (args.eval_options or {}).get('pklfile_prefix')
        _, out_file = dataset.format_results(results,
                                             pklfile_prefix=prefix)
        print(f'formatted results written to {out_file}')
        return
    if args.eval:
        metrics = dataset.evaluate(results, metric=args.eval,
                                   **(args.eval_options or {}))
        for k, v in metrics.items():
            print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
