#!/usr/bin/env python
"""Op-level device-time attribution via the JAX profiler (xplane).

Captures a trace of the stage-1 DETR train step (or the encoder
fwd+bwd in isolation) and prints the top-N ops by self time, parsed
with tensorboard_plugin_profile — exact attribution instead of
subtraction games.

Usage: python tools/trace_ops.py [--b 4] [--what step|encoder]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def dump_top_ops(logdir, top=35):
    """Aggregate device-op times from the Chrome trace.

    Parses ``vm.trace.json.gz`` directly (the tensorboard_plugin_profile
    protobuf path needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python on
    this image; the Chrome trace carries the same device timeline).
    Prints (a) exclusive self-time per op CLASS (nesting-aware — scan
    ``while`` bodies attribute to their inner ops) and (b) the top
    individual ops with HLO shapes + source lines where available.
    """
    import collections
    import re
    paths = glob.glob(os.path.join(
        logdir, 'plugins/profile/*/*.trace.json.gz'))
    if not paths:
        print('no trace captured (device tracing unsupported?)',
              flush=True)
        return False
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data['traceEvents']
    pids, tids = {}, {}
    for e in ev:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pids[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tids[(e['pid'], e['tid'])] = e['args'].get('name', '')
    evs = [e for e in ev if e.get('ph') == 'X' and 'dur' in e
           and pids.get(e['pid'], '').startswith('/device')
           and tids.get((e['pid'], e['tid']), '') == 'XLA Ops']
    evs.sort(key=lambda e: (e['ts'], -e['dur']))
    stack, child = [], collections.Counter()
    for e in evs:
        ts, dur = e['ts'], e['dur']
        while stack and ts >= stack[-1][0] + stack[-1][1] - 1e-9:
            stack.pop()
        if stack:
            child[id(stack[-1][2])] += dur
        stack.append((ts, dur, e))
    selft = collections.Counter()
    cnt = collections.Counter()
    for e in evs:
        base = re.sub(r'[.\d]+$', '', e['name'])
        selft[base] += e['dur'] - child.get(id(e), 0)
        cnt[base] += 1
    total = sum(selft.values())
    print(f'device exclusive total: {total / 1000:.1f} ms', flush=True)
    print('--- by op class (exclusive self time):', flush=True)
    for n, t in selft.most_common(20):
        if t > total * 0.002:
            print(f'{t / 1000:9.2f} ms  x{cnt[n]:<7} {n}', flush=True)
    tot_i = collections.Counter()
    cnt_i = collections.Counter()
    meta = {}
    for e in evs:
        tot_i[e['name']] += e['dur']
        cnt_i[e['name']] += 1
        if e['name'] not in meta:
            a = e.get('args', {})
            meta[e['name']] = (a.get('long_name', '')[:90],
                               a.get('source', ''))
    print('--- top individual ops:', flush=True)
    for n, t in tot_i.most_common(top):
        ln, src = meta[n]
        print(f'{t / 1000:8.2f} ms x{cnt_i[n]:<6} {n}  {ln}'
              + (f'  [{src}]' if src else ''), flush=True)
    return True


def main(b=4, what='step'):
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    from demf_tpu.utils.profiling import sync, trace

    logdir = '/tmp/demf_trace'
    os.system(f'rm -rf {logdir}')

    if what == 'step':
        import bench
        from demf_tpu.engine import make_train_step
        from demf_tpu.parallel import shard_batch
        from demf_tpu.zoo import synth_detr2d_batch
        dbatch = synth_detr2d_batch(b=b, hw=(800, 1344))
        model, variables, state, _d, mesh, tx = \
            bench._make_state_and_step(
                'deformdetr/imvotenet_deform.py', dbatch, 'bfloat16',
                frozen=False, grad_clip=dict(max_norm=0.1, norm_type=2))
        step = make_train_step(model, tx, donate=False,
                               compute_dtype='bfloat16')
        sbatch = shard_batch(dbatch, mesh)
        rng = jax.random.PRNGKey(0)
        out = step(state, sbatch, rng)
        sync(out)
        with trace(logdir):
            out = step(state, sbatch, rng)
            sync(out)
    else:
        import jax.numpy as jnp
        import numpy as np
        from demf_tpu.models.transformer import DeformableDetrEncoder
        from demf_tpu.utils.precision import (cast_floating,
                                              compute_dtype_scope)
        enc = DeformableDetrEncoder(encoder=dict(num_layers=6))
        hw = (800, 1344)
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

        g = jax.jit(jax.grad(enc_loss))
        out = g(eparams, feats)
        sync(out)
        with trace(logdir):
            out = g(eparams, feats)
            sync(out)
    dump_top_ops(logdir)


if __name__ == '__main__':
    kw = {}
    if '--b' in sys.argv:
        kw['b'] = int(sys.argv[sys.argv.index('--b') + 1])
    if '--what' in sys.argv:
        kw['what'] = sys.argv[sys.argv.index('--what') + 1]
    main(**kw)
