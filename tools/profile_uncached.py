#!/usr/bin/env python
"""Segment-level timing of the uncached DeMF step (VERDICT round-2 weak #1).

Breaks the reference-convention (no feature cache) train step into its
device segments — ResNet-50 fwd, ChannelMapper, encoder (6x MSDA
self-attn), cached-path train step — so the 'demf_uncached' bench number
can be attributed before optimizing.

Usage: python tools/profile_uncached.py [--b 16] [--hw 800 1344]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(f, *args, iters=3, warmup=1, **kw):
    # tunnel-safe hard sync (block_until_ready can return early over the
    # remote-TPU tunnel; see demf_tpu.utils.profiling)
    from demf_tpu.utils.profiling import sync
    for _ in range(warmup):
        out = f(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(b=16, hw=(800, 1344)):
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    import demf_tpu.models  # noqa: F401
    from demf_tpu.utils.registry import (BACKBONES, DETECTORS, HEADS,
                                         NECKS, build_from_cfg)
    from demf_tpu.engine import (build_optimizer, create_train_state,
                                 make_train_step)
    from demf_tpu.engine.feature_cache import compute_image_features
    from demf_tpu.utils.precision import cast_floating
    from demf_tpu.zoo import load_model_cfg, synth_demf_batch

    cfg = load_model_cfg('demf/demf_votenet.py')
    model = build_from_cfg(cfg.model, DETECTORS)
    batch = synth_demf_batch(b=b, p=20000, g=64, hw=hw)
    variables = jax.jit(lambda r, g_: model.init(r, g_, train=True))(
        jax.random.PRNGKey(0), batch)
    # bf16 compute as in bench
    bf_params = cast_floating(variables['params'], 'bfloat16')
    img16 = batch['img'].astype(jnp.bfloat16)

    rn = build_from_cfg(dict(cfg.model['img_backbone']), BACKBONES)
    rn_vars = {'params': bf_params['img_backbone'],
               'batch_stats': variables['batch_stats']['img_backbone']}
    rn_fwd = jax.jit(lambda v, x: rn.apply(v, x, train=False))
    t = timeit(rn_fwd, rn_vars, img16)
    print(f'resnet50 fwd:      {t*1e3:8.1f} ms')
    c345 = rn_fwd(rn_vars, img16)

    cm = build_from_cfg(dict(cfg.model['img_neck']), NECKS)
    cm_fwd = jax.jit(lambda v, x: cm.apply(v, x, train=False))
    cm_vars = {'params': bf_params['img_neck']}
    t = timeit(cm_fwd, cm_vars, c345)
    print(f'channel mapper:    {t*1e3:8.1f} ms')
    lvls = cm_fwd(cm_vars, c345)

    enc = build_from_cfg(dict(cfg.model['img_encoder']), HEADS)
    enc_vars = {'params': bf_params['img_encoder']}
    enc_fwd = jax.jit(lambda v, x, s: enc.apply(v, x, s, train=False))
    t = timeit(enc_fwd, enc_vars, lvls, batch['img_meta']['img_shape'])
    print(f'encoder (6L MSDA): {t*1e3:8.1f} ms')

    img_feat_fn = jax.jit(lambda v, g_: model.apply(
        v, g_, train=False, img_feat_only=True))
    fvars = {'params': bf_params,
             'batch_stats': variables['batch_stats']}
    bb = dict(batch)
    bb['img'] = img16
    t = timeit(img_feat_fn, fvars, bb)
    print(f'whole img branch:  {t*1e3:8.1f} ms')

    tx = build_optimizer(dict(cfg.optimizer), variables['params'],
                         grad_clip=dict(max_norm=10, norm_type=2))
    state = create_train_state(model, tx, variables)
    step = make_train_step(model, tx, compute_dtype='bfloat16',
                           donate=False)
    feats = compute_image_features(model, variables, batch)
    cb = dict(batch)
    cb['img_features'] = feats
    cb.pop('img')
    rng = jax.random.PRNGKey(1)
    t = timeit(lambda s_, b_: step(s_, b_, rng)[1]['loss'], state, cb)
    print(f'cached train step: {t*1e3:8.1f} ms')
    t = timeit(lambda s_, b_: step(s_, b_, rng)[1]['loss'], state, batch)
    print(f'uncached step:     {t*1e3:8.1f} ms')

    if '--cached-detail' in sys.argv:
        # inside the cached step: pts backbone, full fwd, fwd+loss, grad
        from demf_tpu.utils.precision import cast_batch, compute_dtype_scope
        pb = build_from_cfg(dict(cfg.model['pts_backbone']), BACKBONES)
        pb_vars = {'params': bf_params['pts_backbone'],
                   'batch_stats':
                       variables['batch_stats']['pts_backbone']}
        pts16 = batch['points']          # points stay f32 (policy)
        pb_fwd = jax.jit(lambda v, p: pb.apply(v, p, train=False))
        t = timeit(pb_fwd, pb_vars, pts16)
        print(f'  pts backbone fwd:  {t*1e3:8.1f} ms')

        def fwd_only(params, b_, key):
            params = cast_floating(params, 'bfloat16')
            nb = cast_batch(b_, 'bfloat16')
            with compute_dtype_scope('bfloat16'):
                return model.apply(
                    {'params': params,
                     'batch_stats': variables['batch_stats']}, nb,
                    train=True, mutable=['batch_stats'],
                    rngs={'sample': key,
                          'dropout': jax.random.fold_in(key, 1)})

        jf = jax.jit(fwd_only)
        t = timeit(jf, state.params, cb, rng)
        print(f'  full fwd (cached): {t*1e3:8.1f} ms')

        def loss_fn(params, b_, key):
            results, _ = fwd_only(params, b_, key)
            results = cast_floating(results, 'float32')
            losses = model.loss(results, b_)
            return sum(jnp.sum(x)
                       for x in jax.tree_util.tree_leaves(losses))

        jl = jax.jit(loss_fn)
        t = timeit(jl, state.params, cb, rng)
        print(f'  fwd + loss:        {t*1e3:8.1f} ms')
        jg = jax.jit(jax.grad(loss_fn))
        t = timeit(jg, state.params, cb, rng)
        print(f'  fwd + loss + bwd:  {t*1e3:8.1f} ms')


if __name__ == '__main__':
    kw = {}
    if '--b' in sys.argv:
        kw['b'] = int(sys.argv[sys.argv.index('--b') + 1])
    main(**kw)
