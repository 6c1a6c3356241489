"""Dataset evaluation driver: fixed-shape batched inference -> indoor mAP.

Replaces the reference's ``single_gpu_test``/``multi_gpu_test`` + tmpdir
pickle gather (eval.py:103-112): inference runs as a jitted eval step over
order-preserving padded batches; per-device shards are gathered by the
global-view jit output (no rank gather code needed).
"""
from __future__ import annotations

from typing import Callable, List

import jax
import numpy as np

from ..data.loader import collate_fixed
from .trainer import TrainState, make_eval_step


def run_dataset_inference(model, state_or_vars, dataset, batch_size=16,
                          max_gt=64, progress_cb=None,
                          compute_dtype=None) -> List[dict]:
    """Run inference over a whole dataset, returning per-scene numpy results
    (validity-filtered), in dataset order."""
    if isinstance(state_or_vars, TrainState):
        state = state_or_vars
    else:
        import optax
        state = TrainState(step=0, params=state_or_vars['params'],
                           batch_stats=state_or_vars.get('batch_stats', {}),
                           opt_state=optax.EmptyState())
    eval_step = make_eval_step(model, compute_dtype=compute_dtype)
    n = len(dataset)
    results: List[dict] = []
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        pad = batch_size - len(idx)
        samples = [dataset[i] for i in idx] + [dataset[idx[-1]]] * pad
        batch = collate_fixed(samples, max_gt=max_gt)
        det = jax.device_get(eval_step(state, batch))
        for k in range(len(idx)):
            v = det['valid'][k]
            results.append(dict(boxes_3d=np.asarray(det['boxes_3d'][k][v]),
                                scores_3d=np.asarray(det['scores_3d'][k][v]),
                                labels_3d=np.asarray(det['labels_3d'][k][v])))
        if progress_cb:
            progress_cb(len(results), n)
    return results


def make_dataset_eval_fn(model, dataset, batch_size, logger,
                         compute_dtype=None) -> Callable:
    def eval_fn(state, epoch):
        results = run_dataset_inference(model, state, dataset, batch_size,
                                        compute_dtype=compute_dtype)
        metrics = dataset.evaluate(results)
        logger(f'[eval @ epoch {epoch + 1}] ' + ' '.join(
            f'{k}: {v:.4f}' for k, v in metrics.items()))
        return metrics

    return eval_fn
