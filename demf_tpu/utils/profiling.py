"""Profiling / tracing harness (SURVEY.md §5 aux subsystem).

The reference has no profiler beyond mmcv's per-iter timing logs; here we
expose the JAX profiler (XPlane traces viewable in TensorBoard /
xprof) plus a simple hard-sync step timer that is robust to async dispatch
(and to remote-TPU tunnels where ``block_until_ready`` can return early —
the timer syncs by fetching a scalar).
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir='/tmp/demf_tpu_trace'):
    """Capture an XPlane trace: ``with trace('/tmp/tb'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(tree):
    """Hard-sync: fetch one scalar from the first leaf (tunnel-safe)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf.reshape(-1)[0].astype('float32'))


def time_fn(fn, *args, iters=5, warmup=1, name=None):
    """Wall-clock a jitted function with hard syncs. Returns seconds/call."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    if name:
        print(f'{name}: {dt * 1000:.1f} ms')
    return dt
