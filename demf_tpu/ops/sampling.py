"""Point sampling ops: furthest point sampling (FPS).

TPU-native replacement for the mmdet3d CUDA op ``furthest_point_sample``
(invoked by the reference at class_agnostic_vote_head.py:13,429 and inside
every PointSAModule).  The algorithm is inherently sequential in the number
of samples K; each step is a fused O(N) vector update + argmax which XLA maps
onto the VPU, with the running min-distance vector staying in registers/VMEM
across the fori_loop.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def furthest_point_sample(points_xyz, num_samples):
    """Iterative max-min-distance sampling.

    Matches mmdet3d semantics: the first selected index is 0 and distances
    are squared euclidean.  On TPU this dispatches to the Pallas kernel
    (ops/pallas/fps.py) that keeps the running min-distance vector in VMEM;
    elsewhere (and under DEMF_TPU_DISABLE_PALLAS=1) it runs the XLA
    fori_loop formulation below.

    Args:
        points_xyz: (B, N, 3) float coordinates.
        num_samples: K, static int.
    Returns:
        (B, K) int32 indices into N.
    """
    if (jax.default_backend() == 'tpu'
            and not os.environ.get('DEMF_TPU_DISABLE_PALLAS')):
        from .pallas.fps import furthest_point_sample_pallas
        return furthest_point_sample_pallas(points_xyz, num_samples)
    return _furthest_point_sample_xla(points_xyz, num_samples)


def _furthest_point_sample_xla(points_xyz, num_samples):
    """Reference XLA implementation (also the oracle for the kernel)."""
    b, n, _ = points_xyz.shape
    xyz = points_xyz.astype(jnp.float32)

    def body(k, carry):
        dists, idxs, last_xyz = carry
        # distance from every point to the most recently selected point
        d = jnp.sum((xyz - last_xyz[:, None, :]) ** 2, -1)  # (B, N)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, -1).astype(jnp.int32)       # (B,)
        idxs = idxs.at[:, k].set(nxt)
        last_xyz = jnp.take_along_axis(
            xyz, nxt[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return dists, idxs, last_xyz

    dists0 = jnp.full((b, n), 1e10, jnp.float32)
    idxs0 = jnp.zeros((b, num_samples), jnp.int32)
    last0 = xyz[:, 0]  # first pick is index 0
    _, idxs, _ = jax.lax.fori_loop(
        1, num_samples, body, (dists0, idxs0, last0))
    return idxs


def furthest_point_sample_with_dist(points_dist, num_samples):
    """FPS given a precomputed (B, N, N) pairwise distance matrix."""
    b, n, _ = points_dist.shape

    def body(k, carry):
        dists, idxs, last = carry
        d = jnp.take_along_axis(
            points_dist, last[:, None, None].astype(jnp.int32) *
            jnp.ones((b, 1, n), jnp.int32), axis=1)[:, 0]
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, -1).astype(jnp.int32)
        idxs = idxs.at[:, k].set(nxt)
        return dists, idxs, nxt

    dists0 = jnp.full((b, n), 1e10, points_dist.dtype)
    idxs0 = jnp.zeros((b, num_samples), jnp.int32)
    last0 = jnp.zeros((b,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(
        1, num_samples, body, (dists0, idxs0, last0))
    return idxs
