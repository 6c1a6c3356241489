#!/usr/bin/env python
"""Segment timing of the stage-1 DETR pretrain step (VERDICT r2 item 6).

Attributes the trainable-image-branch step (ResNet-50 + ChannelMapper +
6x deformable encoder + DETR head w/ Hungarian) at bench shapes so the
``detr_pretrain`` extra can be optimized where it actually hurts.

Usage: python tools/profile_detr.py [--b 4]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(f, *args, iters=3, warmup=1, **kw):
    from demf_tpu.utils.profiling import sync
    for _ in range(warmup):
        out = f(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(b=4, hw=(800, 1344)):
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    import bench
    from demf_tpu.parallel import shard_batch
    from demf_tpu.utils.precision import (cast_batch, cast_floating,
                                          compute_dtype_scope)
    from demf_tpu.zoo import synth_detr2d_batch

    from demf_tpu.engine import make_train_step

    dbatch = synth_detr2d_batch(b=b, hw=hw)
    model, variables, state, _dstep, mesh, tx = bench._make_state_and_step(
        'deformdetr/imvotenet_deform.py', dbatch, 'bfloat16',
        frozen=False, grad_clip=dict(max_norm=0.1, norm_type=2))
    step = make_train_step(model, tx, donate=False,
                           compute_dtype='bfloat16')
    sbatch = shard_batch(dbatch, mesh)
    rng = jax.random.PRNGKey(0)

    if '--skip-step' not in sys.argv:
        t = timeit(lambda: step(state, sbatch, rng), iters=3, warmup=2)
        print(f'full train step       {t * 1e3:8.1f} ms  '
              f'{b / t:6.2f} scenes/s', flush=True)

    def loss_fn(params, batch, key, bwd_mask=None):
        params = cast_floating(params, 'bfloat16')
        net_batch = cast_batch(batch, 'bfloat16')
        if bwd_mask:
            # stop grads into chosen top-level param subtrees
            params = {k: (jax.lax.stop_gradient(v) if k in bwd_mask else v)
                      for k, v in params.items()}
        variables = {'params': params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        with compute_dtype_scope('bfloat16'):
            results, _ = model.apply(
                variables, net_batch, train=True,
                mutable=['batch_stats'],
                rngs={'sample': key,
                      'dropout': jax.random.fold_in(key, 1)})
        results = cast_floating(results, 'float32')
        losses = model.loss(results, batch)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(losses))

    params = state.params
    floss = jax.jit(loss_fn)
    t = timeit(floss, params, sbatch, rng, iters=3, warmup=1)
    print(f'forward + loss        {t * 1e3:8.1f} ms', flush=True)

    g = jax.jit(jax.grad(loss_fn))
    t = timeit(g, params, sbatch, rng, iters=3, warmup=1)
    print(f'fwd + loss + bwd      {t * 1e3:8.1f} ms', flush=True)

    # encoder-only isolation at the same shapes
    import numpy as np
    from demf_tpu.models.transformer import DeformableDetrEncoder
    enc = DeformableDetrEncoder(encoder=dict(num_layers=6))
    h0, w0 = hw[0] // 8, hw[1] // 8
    feats = [jnp.asarray(np.random.RandomState(i).randn(
        b, h0 // (2 ** i), w0 // (2 ** i), 256), jnp.bfloat16)
        for i in range(4)]
    img_shape = jnp.tile(jnp.asarray([[hw[0], hw[1]]], jnp.float32),
                         (b, 1))
    evars = enc.init(jax.random.PRNGKey(0), feats, img_shape)
    eparams = cast_floating(evars['params'], 'bfloat16')

    def enc_loss(p, f):
        with compute_dtype_scope('bfloat16'):
            outs = enc.apply({'params': p}, f, img_shape, train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    t = timeit(jax.jit(lambda p, f: enc_loss(p, f)), eparams, feats,
               iters=3, warmup=1)
    print(f'encoder fwd only      {t * 1e3:8.1f} ms', flush=True)
    t = timeit(jax.jit(jax.grad(enc_loss)), eparams, feats,
               iters=3, warmup=1)
    print(f'encoder fwd+bwd       {t * 1e3:8.1f} ms', flush=True)

    top = sorted(params.keys())
    print(f'param subtrees: {top}', flush=True)
    for mask_keys in (('img_encoder',), ('img_backbone', 'img_neck'),
                      ('img_bbox_head',)):
        mask = frozenset(k for k in mask_keys if k in params)
        if not mask:
            continue
        gm = jax.jit(lambda p, bb, k, m=mask: jax.grad(
            lambda pp: loss_fn(pp, bb, k, bwd_mask=m))(p))
        t = timeit(gm, params, sbatch, rng, iters=3, warmup=1)
        print(f'bwd minus {str(sorted(mask)):<38} {t * 1e3:8.1f} ms',
              flush=True)


if __name__ == '__main__':
    kw = {}
    if '--b' in sys.argv:
        kw['b'] = int(sys.argv[sys.argv.index('--b') + 1])
    main(**kw)
