"""Mixed-precision policy (N11: reference fp16 surface, TPU-native bf16).

The reference exposes optional fp16 via mmcv ``wrap_fp16_model`` +
``@force_fp32`` loss guards (/root/reference/eval.py:84-86,
class_agnostic_vote_head.py:39,622).  The TPU-native equivalent is a
bf16 compute policy with fp32 master weights and fp32 loss islands:

* master params stay fp32 in the optimizer state; the train step casts a
  bf16 COPY for the forward/backward (gradients flow through the cast and
  arrive fp32);
* network inputs (images / cached features) are cast to bf16; raw
  ``points`` stay fp32 — bf16 has 8 mantissa bits, so at SUN RGB-D range
  (~5 m) the quantization step is ~2 cm, which corrupts voxelization at
  voxel_size=0.01 and FPS/ball-query index math.  Instead the point
  branch casts *derived features* to the active compute dtype after the
  coordinate math (PointSAModule grouping output, FCAF3D voxel features)
  via the ``compute_dtype_scope`` below, keeping the MXU matmuls bf16
  while geometry stays fp32 — matching the reference's fp16 surface,
  which also keeps coordinates fp32 (mmcv auto_fp16 casts module inputs,
  not the raw batch);
* ground truth, calibration matrices and all loss/target math stay fp32
  (the ``@force_fp32`` equivalent — ``model.loss`` always receives fp32
  predictions via ``cast_floating(results, float32)``);
* modules are DTYPE-PRESERVING: flax norm layers force fp32 reductions
  and would re-promote activations, so every norm call site casts back to
  its input dtype — with fp32 inputs nothing changes, with bf16 inputs
  the whole matmul/conv chain stays on the fast MXU path;
* geometry ops (FPS / ball query / 3-NN) already compute distances in
  fp32 internally regardless of input dtype (see ops/sampling.py:43).

bf16 needs no loss scaling (same exponent range as fp32), so the
reference's ``fp16 = dict(loss_scale=...)`` config key simply toggles the
policy here.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

# batch keys the network consumes (cast under the policy); everything else
# (points — see module docstring — gt boxes/labels, masks, calibration in
# img_meta) stays fp32 for coordinate / target-assignment / projection math
_CASTABLE_BATCH_KEYS = ('img', 'img_features')

# Active compute dtype during a policy-scoped forward trace.  Set by the
# train/eval steps (engine/trainer.py) around ``model.apply``; read by
# point-branch modules to cast derived features (NOT coordinates) onto the
# bf16 MXU path.  Plain module global is correct here: the scope is active
# exactly while jit traces the step, and compute_dtype is trace-static.
_ACTIVE_COMPUTE_DTYPE = None


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    """Mark ``dtype`` as the active compute dtype for the enclosed trace."""
    global _ACTIVE_COMPUTE_DTYPE
    prev = _ACTIVE_COMPUTE_DTYPE
    _ACTIVE_COMPUTE_DTYPE = dtype
    try:
        yield
    finally:
        _ACTIVE_COMPUTE_DTYPE = prev


def active_compute_dtype():
    """The scope's dtype, or None outside any policy scope."""
    return _ACTIVE_COMPUTE_DTYPE


def cast_compute(x):
    """Cast an array to the active compute dtype (no-op outside a scope).

    Call sites: feature tensors whose *coordinate math is already done* —
    grouped/recentered point features before the SA MLPs, mean-pooled voxel
    features before the sparse backbone.
    """
    if _ACTIVE_COMPUTE_DTYPE is None:
        return x
    return x.astype(_ACTIVE_COMPUTE_DTYPE)


def cast_floating(tree, dtype):
    """Cast every inexact-dtype leaf of a pytree to ``dtype``."""
    def cast(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.inexact):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def cast_batch(batch, dtype):
    """Cast only the network-input keys of a batch dict."""
    out = dict(batch)
    for k in _CASTABLE_BATCH_KEYS:
        if k in out:
            out[k] = cast_floating(out[k], dtype)
    return out


def resolve_compute_dtype(cfg) -> str | None:
    """Map config surface to a policy: ``bf16 = True`` or the reference's
    ``fp16 = dict(...)`` both select bfloat16 compute on TPU."""
    if cfg is None:
        return None
    if cfg.get('bf16') or cfg.get('fp16') is not None:
        return 'bfloat16'
    return None
