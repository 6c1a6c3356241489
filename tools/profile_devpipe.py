#!/usr/bin/env python
"""Attribute the devpipe gap: e2e_device vs cached headline (VERDICT r5#2).

BENCH_r04: demf_devpipe 63.08 vs headline 70.84 scenes/s at b16 —
~25 ms/step of fused-preprocess overhead. This tool measures, at bench
shapes, (a) the cached step, (b) the step with the fused device
preprocess, (c) jit(preprocess) alone, and (d) preprocess stage ablations
(quantile / aug / subsample-gather) to find where the gap lives.

Usage: python tools/profile_devpipe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(f, *args, iters=5, warmup=2):
    import jax
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(b=16, p=20000):
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    import bench
    from demf_tpu.data.device_pipeline import build_device_pipeline
    from demf_tpu.engine import make_train_step
    from demf_tpu.engine.feature_cache import compute_image_features
    from demf_tpu.parallel import shard_batch
    from demf_tpu.zoo import load_model_cfg, synth_demf_batch

    rng = jax.random.PRNGKey(0)
    batch = synth_demf_batch(b=b, p=p, g=64, hw=(800, 1344))
    model, variables, state, step, mesh, tx = bench._make_state_and_step(
        'demf/demf_votenet.py', batch, 'bfloat16')
    feats = compute_image_features(model, variables, batch)
    cbatch = dict(batch)
    cbatch['img_features'] = feats
    cbatch.pop('img')
    cbatch = shard_batch(cbatch, mesh)

    cfg = load_model_cfg('demf/demf_votenet.py')
    pipeline = cfg.data['train']['dataset']['pipeline']
    pts_ops = {'LoadPointsFromFile', 'LoadAnnotations3D', 'RandomFlip3D',
               'GlobalRotScaleTrans', 'PointSample',
               'DefaultFormatBundle3D', 'Collect3D'}
    raw_cfg = [t for t in pipeline if t['type'] in pts_ops]
    _hl, _cr, device_fn, spec = build_device_pipeline(
        raw_cfg, points_cap=p, max_gt=64)
    rawb = dict(cbatch)
    rawb['raw_points'] = batch['points'][..., :3]
    rawb['raw_points_count'] = np.full((b,), p, np.int32)
    rawb.pop('points')
    rawb = shard_batch(rawb, mesh)

    # (c) preprocess alone
    pre = jax.jit(lambda r, k: device_fn(r, k))
    t = timeit(lambda: pre(rawb, rng))
    print(f'preprocess alone            {t * 1e3:8.2f} ms', flush=True)

    # (c2) preprocess stage ablations (separate jits, same raw batch)
    def make_partial(**off):
        import copy
        sp = copy.deepcopy(spec)
        for k, v in off.items():
            setattr(sp, k, v)
        from demf_tpu.data.device_pipeline import make_device_preprocess
        return jax.jit(make_device_preprocess(sp))

    for name, kw in (
            ('no shift_height quantile', dict(shift_height=False)),
            ('no rot/scale aug', dict(rot_range=None)),
            ('no subsample gather', dict(num_points=None)),
    ):
        try:
            fn = make_partial(**kw)
            t = timeit(lambda: fn(rawb, rng))
            print(f'preprocess minus {name:<24} {t * 1e3:8.2f} ms',
                  flush=True)
        except Exception as e:
            print(f'preprocess minus {name}: {type(e).__name__}: {e}',
                  flush=True)

    # (a) cached step baseline (non-donating so state survives)
    step_nd = make_train_step(model, tx, donate=False,
                              compute_dtype='bfloat16')
    t = timeit(lambda: step_nd(state, cbatch, rng), iters=5, warmup=2)
    print(f'cached step (no devpipe)    {t * 1e3:8.2f} ms  '
          f'{b / t:6.2f} scenes/s', flush=True)

    # (b) fused preprocess step
    pstep = make_train_step(model, tx, donate=False,
                            compute_dtype='bfloat16',
                            preprocess=device_fn)
    t = timeit(lambda: pstep(state, rawb, rng), iters=5, warmup=2)
    print(f'devpipe step (fused)        {t * 1e3:8.2f} ms  '
          f'{b / t:6.2f} scenes/s', flush=True)

    # (b2) two-stage: preprocess as its OWN jit, then the cached step
    # (tests whether fusing preprocess INTO the step hurts scheduling)
    def two_stage(state, rawb, rng):
        nb = pre(rawb, rng)
        nb = {k: v for k, v in nb.items()}
        nb['img_features'] = rawb['img_features']
        return step_nd(state, nb, rng)
    t = timeit(lambda: two_stage(state, rawb, rng), iters=5, warmup=2)
    print(f'devpipe step (two-jit)      {t * 1e3:8.2f} ms  '
          f'{b / t:6.2f} scenes/s', flush=True)


if __name__ == '__main__':
    main()
