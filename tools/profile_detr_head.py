#!/usr/bin/env python
"""Isolate the DETR head's decoder+assign+loss cost (stage-1 residual
after encoder/backbone attribution: ~140 ms unaccounted at b4).

Builds DeformableDETRHead from the reference config block with the
ENCODER REMOVED (num_layers=0) so fwd / fwd+bwd measures: query embed +
6-layer decoder (self-attn + small-q MSDA cross-attn) + cls/reg heads +
Hungarian assignment + focal/L1/GIoU losses.

Usage: python tools/profile_detr_head.py [--b 4]
"""
from __future__ import annotations

import copy
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
    import numpy as np
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    import demf_tpu.models  # noqa: F401  (registry)
    from demf_tpu.utils.config import Config
    from demf_tpu.utils.precision import cast_floating, compute_dtype_scope
    from demf_tpu.utils.registry import HEADS, build_from_cfg

    repo = os.path.join(os.path.dirname(__file__), '..')
    cfg = Config.fromfile(
        os.path.join(repo, 'configs/deformdetr/imvotenet_image.py'))
    head_cfg = copy.deepcopy(cfg.model['img_bbox_head'])
    head_cfg['train_cfg'] = copy.deepcopy(
        (cfg.model.get('train_cfg') or {}).get('img_bbox', {}))

    for enc_layers in (0, 6):
        hc = copy.deepcopy(head_cfg)
        hc['transformer']['encoder']['num_layers'] = enc_layers
        head = build_from_cfg(hc, HEADS)

        h0, w0 = hw[0] // 8, hw[1] // 8
        feats = [jnp.asarray(np.random.RandomState(i).randn(
            b, h0 // (2 ** i), w0 // (2 ** i), 256), jnp.bfloat16)
            for i in range(4)]
        img_shape = jnp.tile(jnp.asarray([[hw[0], hw[1]]], jnp.float32),
                             (b, 1))
        variables = head.init(jax.random.PRNGKey(0), feats, img_shape)
        params = cast_floating(variables['params'], 'bfloat16')

        g = 8
        gt_bboxes = jnp.tile(jnp.asarray(
            [[100.0, 120.0, 300.0, 360.0]], jnp.float32), (b, g, 1)) \
            + 10.0 * jnp.arange(g, dtype=jnp.float32)[None, :, None]
        gt_labels = jnp.tile(jnp.arange(g, dtype=jnp.int32)[None] % 10,
                             (b, 1))
        gt_valid = jnp.ones((b, g), bool)

        def loss_fn(p, f):
            with compute_dtype_scope('bfloat16'):
                preds = head.apply(
                    {'params': p}, f, img_shape, train=True,
                    rngs={'dropout': jax.random.PRNGKey(1)})
            preds = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if hasattr(a, 'dtype') and a.dtype == jnp.bfloat16 else a,
                preds)
            losses = head.loss(preds, gt_bboxes, gt_labels, gt_valid,
                               img_shape)
            return sum(jnp.sum(v) for v in
                       jax.tree_util.tree_leaves(losses))

        label = f'enc={enc_layers}'
        t = timeit(jax.jit(lambda p, f: loss_fn(p, f)), params, feats)
        print(f'head {label} fwd+loss      {t * 1e3:8.1f} ms', flush=True)
        t = timeit(jax.jit(jax.grad(loss_fn)), params, feats)
        print(f'head {label} fwd+loss+bwd  {t * 1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    kw = {}
    if '--b' in sys.argv:
        kw['b'] = int(sys.argv[sys.argv.index('--b') + 1])
    main(**kw)
