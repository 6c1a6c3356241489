#!/usr/bin/env python
"""Time ONLY the full stage-1 DETR pretrain train step at bench shapes.

Usage: python tools/step_detr.py [--b 4]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(b=4, hw=(800, 1344)):
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    import bench
    from demf_tpu.engine import make_train_step
    from demf_tpu.parallel import shard_batch
    from demf_tpu.utils.profiling import sync
    from demf_tpu.zoo import synth_detr2d_batch

    dbatch = synth_detr2d_batch(b=b, hw=hw)
    model, variables, state, _dstep, mesh, tx = bench._make_state_and_step(
        'deformdetr/imvotenet_deform.py', dbatch, 'bfloat16',
        frozen=False, grad_clip=dict(max_norm=0.1, norm_type=2))
    step = make_train_step(model, tx, donate=False,
                           compute_dtype='bfloat16')
    sbatch = shard_batch(dbatch, mesh)
    rng = jax.random.PRNGKey(0)
    out = None
    for _ in range(2):
        out = step(state, sbatch, rng)
    sync(out)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = step(state, sbatch, rng)
    sync(out)
    t = (time.perf_counter() - t0) / iters
    print(f'full train step  {t * 1e3:8.1f} ms  {b / t:6.2f} scenes/s',
          flush=True)


if __name__ == '__main__':
    kw = {}
    if '--b' in sys.argv:
        kw['b'] = int(sys.argv[sys.argv.index('--b') + 1])
    main(**kw)
