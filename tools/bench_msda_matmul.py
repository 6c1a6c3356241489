#!/usr/bin/env python
"""Microbench: MSDA sampling as a one-hot MXU matmul (the M-form kernel).

XLA's gather floor is ~86 M rows/s (issue-bound, tools/bench_gather_kernel:
a Pallas VMEM select kernel is WORSE at ~52 M).  TPU-native alternative:
for each (b, h, level), the whole gather+bilinear-weight+reduce is

    out(Q, hd) = M(Q, N) @ plane(N, hd)

where M has 16 weighted one-hots per row (4 points x 4 bilinear corners).
M is never materialized: each (Q_t, N_t) tile is built in VMEM registers
(16 compare+fma passes against a lane iota) and fed straight to the MXU.
Dense FLOPs are ~1000x the useful work but the MXU is ~1000x faster than
the scalar gather issue rate — and the weighting/reduction fuse for free.

Usage: python tools/bench_msda_matmul.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, iters=5, warmup=2):
    def sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(leaf.reshape(-1)[0].astype('float32'))
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def _mform_kernel(n_tiles, n_t, nslots, idx_ref, w_ref, plane_ref,
                  out_ref):
    """idx_ref (1, nslots, Q_t, 1) i32 VMEM; w_ref same bf16;
    plane_ref (1, N, hd) VMEM; out_ref (1, Q_t, hd)."""
    q_t = out_ref.shape[1]
    hd = out_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_t, n_t), 1)

    def body(nt, acc):
        n_base = nt * n_t
        m = jnp.zeros((q_t, n_t), jnp.bfloat16)
        for k in range(nslots):
            idxk = idx_ref[0, k]                      # (Q_t, 1)
            wk = w_ref[0, k]                          # (Q_t, 1)
            hit = (idxk - n_base == lane)
            m = m + wk * hit.astype(jnp.bfloat16)
        tile = plane_ref[0, pl.ds(pl.multiple_of(n_base, n_t), n_t), :]
        return acc + jax.lax.dot_general(
            m, tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_tiles, body,
                            jnp.zeros((q_t, hd), jnp.float32),
                            unroll=False)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def mform_sample(plane, idx16, w16, q_t=256, n_t=512, interpret=False):
    """plane (BH, N, hd), idx16 (BH, S, Q, 1) i32, w16 (BH, S, Q, 1)
    -> out (BH, Q, hd) = sum_k w16[k] * plane[idx16[k]]."""
    bh, n, hd = plane.shape
    nslots = idx16.shape[1]
    q = idx16.shape[2]
    assert q % q_t == 0 and n % n_t == 0
    kernel = functools.partial(_mform_kernel, n // n_t, n_t, nslots)
    return pl.pallas_call(
        kernel,
        grid=(bh, q // q_t),
        in_specs=[
            pl.BlockSpec((1, nslots, q_t, 1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nslots, q_t, 1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_t, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, q, hd), plane.dtype),
        interpret=interpret,
    )(idx16, w16, plane)


@jax.jit
def xla_ref(plane, idx16, w16):
    bh, n, hd = plane.shape
    idx = idx16[..., 0]                               # (BH, S, Q)
    w = w16[..., 0].astype(jnp.float32)
    base = (jnp.arange(bh, dtype=jnp.int32) * n)[:, None, None]
    rows = plane.reshape(bh * n, hd)[(idx + base).reshape(-1)]
    rows = rows.reshape(*idx.shape, hd).astype(jnp.float32)
    return jnp.sum(rows * w[..., None], axis=1).astype(plane.dtype)


def run_level(bh, n, q, hd=32, nslots=16, label=''):
    rng = np.random.RandomState(0)
    plane = jnp.asarray(rng.randn(bh, n, hd), jnp.bfloat16)
    idx16 = jnp.asarray(rng.randint(0, n, (bh, nslots, q, 1)), jnp.int32)
    w16 = jnp.asarray(rng.rand(bh, nslots, q, 1), jnp.bfloat16)

    small = (slice(None, 2), slice(None), slice(None, 512))
    got = np.asarray(mform_sample(plane[:2], idx16[small], w16[small]),
                     np.float32)
    want = np.asarray(xla_ref(plane[:2], idx16[small], w16[small]),
                      np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)

    rows = bh * q * nslots
    t_x = timeit(lambda: xla_ref(plane, idx16, w16))
    print(f'{label} N={n:6d}: xla {t_x * 1e3:7.1f} ms '
          f'({rows / t_x / 1e6:6.0f} M rows/s)', flush=True)
    for q_t, n_t in ((256, 512), (512, 512), (256, 1024)):
        if q % q_t or n % n_t:
            continue
        t = timeit(lambda: mform_sample(plane, idx16, w16, q_t, n_t))
        print(f'{label} N={n:6d}: mform q{q_t} n{n_t} {t * 1e3:7.1f} ms '
              f'({rows / t / 1e6:6.0f} M rows/s)', flush=True)


def main():
    bh = 128
    q = 22528                   # 22323 padded
    # reference encoder levels (100x168, 50x84, 25x42, 13x21) padded
    for n, label in ((16896, 'lvl0'), (4608, 'lvl1'), (1536, 'lvl2'),
                     (512, 'lvl3')):
        run_level(bh, n, q, label=label)


if __name__ == '__main__':
    main()
