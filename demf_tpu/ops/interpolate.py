"""Three-NN inverse-distance-weighted feature propagation.

TPU-native replacement for mmdet3d CUDA ops ``three_nn`` /
``three_interpolate`` (pulled in by the reference through the PointNet2SASSG
FP stages, configs/demf/demf_votenet.py:56).  Source sets are small (<=512
points), so a dense distance matrix + top-k is both exact and fast on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .grouping import _sqdist


def three_nn(unknown, known):
    """3 nearest neighbors of each unknown point among known points.

    Args:
        unknown: (B, N, 3) query points.
        known: (B, M, 3) source points.
    Returns:
        dists: (B, N, 3) euclidean distances (sqrt, like the CUDA op).
        idx: (B, N, 3) int32 neighbor indices.
    """
    d2 = _sqdist(unknown.astype(jnp.float32), known.astype(jnp.float32))
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features, idx, weight):
    """Weighted sum of 3 neighbor features.

    Args:
        features: (B, C, M) source features.
        idx: (B, N, 3) neighbor indices.
        weight: (B, N, 3) interpolation weights.
    Returns:
        (B, C, N).
    """
    b, c, m = features.shape
    n = idx.shape[1]
    flat = idx.reshape(b, 1, n * 3).astype(jnp.int32)
    flat = jnp.broadcast_to(flat, (b, c, n * 3))
    gathered = jnp.take_along_axis(features, flat, axis=2).reshape(b, c, n, 3)
    return jnp.sum(gathered * weight[:, None, :, :], -1)


def three_nn_interpolate(unknown, known, features):
    """Fused three_nn + inverse-distance weights + interpolate.

    Matches mmdet3d PointFPModule's weighting: w = (1/d) / sum(1/d) with
    d clamped at 1e-10 (the CUDA op adds 1e-8 to squared dists).
    """
    d2 = _sqdist(unknown.astype(jnp.float32), known.astype(jnp.float32))
    neg, idx = jax.lax.top_k(-d2, 3)
    dist2 = jnp.maximum(-neg, 0.0)
    dist_recip = 1.0 / (dist2 + 1e-8)
    weight = dist_recip / jnp.sum(dist_recip, -1, keepdims=True)
    return three_interpolate(features, idx.astype(jnp.int32),
                             weight.astype(features.dtype))
