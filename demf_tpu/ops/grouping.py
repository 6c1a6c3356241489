"""Neighborhood grouping ops: ball query, gather, query-and-group.

TPU-native replacements for the mmdet3d CUDA ops ``ball_query`` /
``group_points`` / ``gather_points`` (reference invocation: every
PointSAModule built at class_agnostic_vote_head.py:13,383 and in the
PointNet2SASSG backbone config, configs/demf/demf_votenet.py:51-62).

Design notes (TPU): the naive (B, M, N) distance matrix for the first SA
stage is 2.6 GB at batch 16, so ``ball_query`` streams over source-point
chunks with a running "first-K by index" top-k merge — memory is bounded by
the chunk while the distance tiles stay fused in VMEM.  The CUDA semantics
are preserved exactly: the returned slots are the first ``nsample`` in-radius
points in index order, remaining slots padded with the first neighbor, and
all-zero when the neighborhood is empty.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _first_k_by_index(d2, radius2, nsample, base_index, prev_best=None):
    """Per center, smallest-index in-radius points as descending 'keys'.

    Keys are ``BIG - global_index`` for in-radius points and ``-1`` otherwise,
    so top_k(keys) yields the first-K by index.  Returns merged keys (..., K).
    """
    big = jnp.asarray(2 ** 30, jnp.int32)
    n = d2.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    gidx = idx + base_index
    keys = jnp.where(d2 < radius2, big - gidx, -1)
    if prev_best is not None:
        keys = jnp.concatenate([prev_best, keys], -1)
        n = keys.shape[-1]
    k = min(nsample, n)
    best, _ = jax.lax.top_k(keys, k)
    if k < nsample:
        pad = jnp.full(best.shape[:-1] + (nsample - k,), -1, jnp.int32)
        best = jnp.concatenate([best, pad], -1)
    return best


def ball_query(radius, nsample, points_xyz, centers_xyz, chunk=4096):
    """Fixed-radius neighbor search.

    Args:
        radius: float search radius.
        nsample: max neighbors per center (static).
        points_xyz: (B, N, 3) source points.
        centers_xyz: (B, M, 3) query centers.
        chunk: source chunk size bounding the live distance tile.
    Returns:
        (B, M, nsample) int32 indices into N (CUDA-compatible padding).
    """
    b, n, _ = points_xyz.shape
    m = centers_xyz.shape[1]
    r2 = jnp.asarray(radius * radius, jnp.float32)
    centers = centers_xyz.astype(jnp.float32)
    pts = points_xyz.astype(jnp.float32)

    if n <= chunk:
        d2 = _sqdist(centers, pts)  # (B, M, N)
        best = _first_k_by_index(d2, r2, nsample, 0)
    else:
        nchunks = -(-n // chunk)
        pad_n = nchunks * chunk
        if pad_n != n:
            # pad with far-away points that can never be in radius
            pad = jnp.full((b, pad_n - n, 3), 1e6, jnp.float32)
            pts = jnp.concatenate([pts, pad], 1)
        pts_c = pts.reshape(b, nchunks, chunk, 3)

        def scan_body(best, inp):
            pchunk, cidx = inp
            d2 = _sqdist(centers, pchunk)  # (B, M, chunk)
            best = _first_k_by_index(d2, r2, nsample, cidx * chunk, best)
            return best, None

        best0 = jnp.full((b, m, nsample), -1, jnp.int32)
        best, _ = jax.lax.scan(
            scan_body, best0,
            (jnp.swapaxes(pts_c, 0, 1), jnp.arange(nchunks)))

    big = jnp.asarray(2 ** 30, jnp.int32)
    has = best >= 0
    idx = jnp.where(has, big - best, 0)
    # CUDA pad rule: empty slots take the first neighbor (slot 0); all-empty
    # neighborhoods give index 0.
    first = idx[..., :1]
    any_ = has[..., :1]
    idx = jnp.where(has, idx, jnp.where(any_, first, 0))
    return idx.astype(jnp.int32)


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
                    use_xyz=True, normalize_xyz=False, chunk=4096):
    """Fused ball query + neighbor gather + recenter (mmdet3d QueryAndGroup).

    Args:
        points_xyz: (B, N, 3).
        centers_xyz: (B, M, 3).
        features: (B, C, N) or None.
    Returns:
        (B, C', M, nsample) grouped features where C' = 3 + C if use_xyz.
    """
    idx = ball_query(radius, nsample, points_xyz, centers_xyz, chunk=chunk)
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
