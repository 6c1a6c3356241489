"""Three-NN inverse-distance-weighted feature propagation.

TPU-native replacement for mmdet3d CUDA ops ``three_nn`` /
``three_interpolate`` (pulled in by the reference through the PointNet2SASSG
FP stages, configs/demf/demf_votenet.py:56).  Source sets are small (<=512
points), so a dense distance matrix + top-k is both exact and fast on TPU.

Perf note (xplane-verified on v5e): the interpolation gather must fetch
contiguous channel-LAST rows ((B, M, C), gather axis 1).  A channel-first
(B, C, M) take_along_axis broadcasts indices across C and degenerates into
4-byte scattered reads — it was 67% of the whole PointNet++ forward.
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
    """Weighted sum of 3 neighbor features (channel-last).

    Args:
        features: (B, M, C) source features.
        idx: (B, N, 3) neighbor indices.
        weight: (B, N, 3) interpolation weights.
    Returns:
        (B, N, C).
    """
    b, m, c = features.shape
    n = idx.shape[1]
    flat = idx.reshape(b, n * 3, 1).astype(jnp.int32)
    gathered = jnp.take_along_axis(features, flat, axis=1)  # (B, N*3, C)
    gathered = gathered.reshape(b, n, 3, c)
    return jnp.sum(gathered * weight[..., None].astype(features.dtype), 2)


def three_nn_interpolate(unknown, known, features):
    """Fused three_nn + inverse-distance weights + interpolate.

    Matches mmdet3d PointFPModule's weighting: w = (1/d) / sum(1/d) with
    the CUDA op's 1e-8 epsilon on squared distances.

    Args:
        unknown: (B, N, 3); known: (B, M, 3); features: (B, M, C).
    Returns:
        (B, N, C).
    """
    d2 = _sqdist(unknown.astype(jnp.float32), known.astype(jnp.float32))
    neg, idx = jax.lax.top_k(-d2, 3)
    dist2 = jnp.maximum(-neg, 0.0)
    dist_recip = 1.0 / (dist2 + 1e-8)
    weight = dist_recip / jnp.sum(dist_recip, -1, keepdims=True)
    return three_interpolate(features, idx.astype(jnp.int32), weight)
