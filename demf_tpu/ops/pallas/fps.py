"""Pallas TPU kernel: furthest point sampling.

The flagship sequential kernel (SURVEY.md §7 hard-part #1, CUDA op N1).
FPS is K dependent steps; the XLA fori_loop formulation round-trips the
(B, N) running-distance vector through HBM every iteration.  This kernel
keeps the distance vector, the coordinates, and the selection loop entirely
in VMEM: one program per batch element, each iteration doing two fused
VPU passes over N lanes (select coords by masked reduce, then distance
min-update + first-argmax).

VMEM budget per program: 4 x (N_pad,) f32 + (K,) i32 ~ 330 KB at N=20k —
comfortably inside the ~16 MB/core VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _fps_kernel(n_valid, num_samples, xyz_ref, out_ref, dist_ref):
    """One batch element.

    xyz_ref: (3, Nr, 128) VMEM (x/y/z planes, flat index = r * 128 + lane).
    out_ref: (1, K) int32 VMEM.
    dist_ref: (Nr, 128) f32 scratch.
    """
    nr = xyz_ref.shape[2]
    xs = xyz_ref[0, 0]
    ys = xyz_ref[0, 1]
    zs = xyz_ref[0, 2]
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 0) * LANES +
                jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 1))
    valid = flat_idx < n_valid
    dist_ref[:] = jnp.where(valid, 1e10, -1.0)
    out_ref[0, 0, 0] = 0

    def body(k, last_idx):
        sel = flat_idx == last_idx
        sx = jnp.sum(jnp.where(sel, xs, 0.))
        sy = jnp.sum(jnp.where(sel, ys, 0.))
        sz = jnp.sum(jnp.where(sel, zs, 0.))
        d = (xs - sx) ** 2 + (ys - sy) ** 2 + (zs - sz) ** 2
        new_dist = jnp.where(valid, jnp.minimum(dist_ref[:], d), -1.0)
        dist_ref[:] = new_dist
        mx = jnp.max(new_dist)
        nxt = jnp.min(jnp.where(new_dist == mx, flat_idx, n_valid))
        out_ref[0, 0, k] = nxt
        return nxt

    jax.lax.fori_loop(1, num_samples, body, 0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(points_xyz, num_samples, interpret=False):
    """Drop-in Pallas FPS: (B, N, 3) -> (B, K) int32 (mmdet3d semantics)."""
    b, n, _ = points_xyz.shape
    n_pad = -(-n // LANES) * LANES
    nr = n_pad // LANES
    xyz = jnp.swapaxes(points_xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if n_pad != n:
        xyz = jnp.pad(xyz, ((0, 0), (0, 0), (0, n_pad - n)))
    xyz = xyz.reshape(b, 3, nr, LANES)

    kernel = functools.partial(_fps_kernel, n, num_samples)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, nr, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        # scalar stores are only legal to SMEM on Mosaic
        out_specs=pl.BlockSpec((1, 1, num_samples), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nr, LANES), jnp.float32)],
        interpret=interpret,
    )(xyz)
    return out[:, 0, :]
