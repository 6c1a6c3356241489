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


def dump_top_ops(logdir, top=40):
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    paths = glob.glob(os.path.join(
        logdir, 'plugins/profile/*/*.xplane.pb'))
    if not paths:
        print('no xplane.pb captured (device tracing unsupported?)',
              flush=True)
        return False
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], 'framework_op_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    try:
        rows = json.loads(data)
    except Exception:
        print(data[:2000], flush=True)
        return True
    # gviz table: rows[1+] after header? handle the two common formats
    if isinstance(rows, dict) and 'rows' in rows:
        cols = [c['label'] for c in rows['cols']]
        table = [[c.get('v') for c in r['c']] for r in rows['rows']]
        try:
            ti = cols.index('Total self-time (us)')
        except ValueError:
            ti = None
        print('\t'.join(cols[:6]), flush=True)
        if ti is not None:
            table.sort(key=lambda r: -(r[ti] or 0))
        for r in table[:top]:
            print('\t'.join(str(v) for v in r[:6]), flush=True)
    else:
        print(str(rows)[:3000], flush=True)
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
