#!/usr/bin/env python
"""Attribute the stage-1 backbone+neck backward (119 ms at b4 — ~4x the
theoretical ResNet-50 bwd).  Isolates ResNet fwd / fwd+bwd, per-stage
cost, and the ChannelMapper, at bench shapes (b4, 800x1344, bf16).

Usage: python tools/profile_resnet_bwd.py [--b 4]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(f, *args, iters=3, warmup=1):
    from demf_tpu.utils.profiling import sync
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(b=4, hw=(800, 1344)):
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    from demf_tpu.models.resnet import ResNet
    from demf_tpu.models.image_neck import ChannelMapper
    from demf_tpu.utils.precision import cast_floating, compute_dtype_scope

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (b, hw[0], hw[1], 3), jnp.float32)

    net = ResNet(depth=50, num_stages=4, out_indices=(1, 2, 3),
                 frozen_stages=1, norm_eval=True, style='caffe')
    variables = net.init(rng, img, train=False)
    params = cast_floating(variables['params'], 'bfloat16')
    bstats = variables.get('batch_stats')

    def fwd(p, x):
        var = {'params': p}
        if bstats:
            var['batch_stats'] = bstats
        with compute_dtype_scope('bfloat16'):
            outs = net.apply(var, x.astype(jnp.bfloat16), train=True)
        return outs

    def loss(p, x):
        return sum(jnp.sum(o.astype(jnp.float32)) for o in fwd(p, x))

    t = timeit(jax.jit(lambda p, x: loss(p, x)), params, img)
    print(f'resnet fwd            {t * 1e3:8.1f} ms', flush=True)
    t = timeit(jax.jit(jax.grad(loss)), params, img)
    print(f'resnet fwd+bwd        {t * 1e3:8.1f} ms', flush=True)
    # grads w.r.t. the INPUT too (mirrors nothing in the step; isolates
    # whether d_input chains cost anything extra)
    t = timeit(jax.jit(jax.grad(loss, argnums=(0, 1))), params, img)
    print(f'resnet fwd+bwd+dinput {t * 1e3:8.1f} ms', flush=True)

    # neck on top (the stage-1 graph): mapper of C3-C5 -> 4 levels
    mapper = ChannelMapper(in_channels=[512, 1024, 2048], out_channels=256,
                           num_outs=4)
    feats0 = jax.jit(lambda p, x: fwd(p, x))(params, img)
    mvar = mapper.init(rng, feats0)
    mparams = cast_floating(mvar['params'], 'bfloat16')

    def loss_full(ps, x):
        p, mp = ps
        outs = fwd(p, x)
        with compute_dtype_scope('bfloat16'):
            mouts = mapper.apply({'params': mp}, outs)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in mouts)

    t = timeit(jax.jit(lambda ps, x: loss_full(ps, x)), (params, mparams),
               img)
    print(f'resnet+neck fwd       {t * 1e3:8.1f} ms', flush=True)
    t = timeit(jax.jit(jax.grad(loss_full)), (params, mparams), img)
    print(f'resnet+neck fwd+bwd   {t * 1e3:8.1f} ms', flush=True)

    # frozen-stages stop_gradient variant: grads skipped below layer2
    # (torch requires_grad=False parity; the repo currently only masks lr)
    def loss_sg(p, x):
        frozen = {'conv1', 'bn1'} | {k for k in p
                                     if k.startswith('layer1_')}
        psg = {k: (jax.lax.stop_gradient(v) if k in frozen else v)
               for k, v in p.items()}
        var = {'params': psg}
        if bstats:
            var['batch_stats'] = bstats
        with compute_dtype_scope('bfloat16'):
            x = x.astype(jnp.bfloat16)
            # stop the activation chain at the stage-1 boundary too: grads
            # below layer2's input are never needed when stem+layer1 frozen
            outs = net.apply(var, x, train=True)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    t = timeit(jax.jit(jax.grad(loss_sg)), params, img)
    print(f'resnet fwd+bwd sg(frozen)  {t * 1e3:8.1f} ms', flush=True)

    # per-stage: truncated resnets
    for stop in (1, 2, 3):
        netk = ResNet(depth=50, num_stages=stop + 1,
                      out_indices=(stop,), frozen_stages=1,
                      norm_eval=True, style='caffe')
        vk = netk.init(rng, img, train=False)
        pk = cast_floating(vk['params'], 'bfloat16')
        bk = vk.get('batch_stats')

        def lossk(p, x, _n=netk, _b=bk):
            var = {'params': p}
            if _b:
                var['batch_stats'] = _b
            with compute_dtype_scope('bfloat16'):
                outs = _n.apply(var, x.astype(jnp.bfloat16), train=True)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        t = timeit(jax.jit(lambda p, x, f=lossk: f(p, x)), pk, img)
        tb = timeit(jax.jit(jax.grad(lossk)), pk, img)
        print(f'stages 0..{stop}: fwd {t * 1e3:7.1f} ms   '
              f'fwd+bwd {tb * 1e3:7.1f} ms', flush=True)


if __name__ == '__main__':
    kw = {}
    if '--b' in sys.argv:
        kw['b'] = int(sys.argv[sys.argv.index('--b') + 1])
    main(**kw)
