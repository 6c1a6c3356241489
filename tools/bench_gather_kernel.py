#!/usr/bin/env python
"""Microbench: Pallas VMEM-resident row gather vs the XLA gather floor.

The MSDA encoder is bound by row gathers (~45.7M quad rows/layer at
b16/22k tokens, NOTES.md).  XLA's gather streams the plane from HBM at
~64-160 M rows/s.  This kernel pins one (b, h) level plane in VMEM
(<= 5.7 MB for the full level-concatenated quad plane) and does
per-sample aligned block reads + in-register sublane select, unrolled to
hide scalar-loop overhead.

Mosaic constraints shaping the kernel (discovered round 3):
  * single-row dynamic VMEM reads need 8-sublane (f32) / 16 (bf16)
    alignment -> read aligned blocks, select in-register;
  * SMEM/VMEM block shapes need (8, 128)-divisible trailing dims -> the
    index array is blocked as (1, 8, 512) over an (BH, NB, 512) reshape.

Usage: python tools/bench_gather_kernel.py [--small]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INNER = 512


def timeit(f, *args, iters=5, warmup=2):
    # tunnel-safe hard sync (block_until_ready can return early over the
    # remote-TPU tunnel; see demf_tpu.utils.profiling)
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


# ---------------------------------------------------------------------------
# Pallas kernel: per-(b,h) plane resident in VMEM, gather s_tile rows
# ---------------------------------------------------------------------------

def _gather_kernel(align, unroll, idx_ref, plane_ref, out_ref):
    """idx_ref: (1, bpt, INNER) SMEM; plane_ref: (1, N, C) VMEM;
    out_ref: (1, s_tile, C) VMEM.

    Output stores are 8-aligned too: each group of 8 samples is built in
    registers ((8, C) select-accumulate) and stored as one block.
    """
    s_tile = out_ref.shape[1]
    c = out_ref.shape[2]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (align, c), 0)
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (8, c), 0)
    zero = jnp.zeros((), plane_ref.dtype)
    # constant sublane-placement masks (dtype multiply avoids the i1
    # relayout Mosaic can't do against a sublane-replicated operand)
    placem = [(out_iota == u).astype(plane_ref.dtype) for u in range(8)]

    def group(g):
        acc = jnp.zeros((8, c), plane_ref.dtype)
        for u in range(8):
            i = g * 8 + u
            r = idx_ref[0, i // INNER, i % INNER]
            base = pl.multiple_of((r // align) * align, align)
            off = r % align
            block = plane_ref[0, pl.ds(base, align), :]
            row = jnp.sum(jnp.where(sub_iota == off, block, zero),
                          axis=0, keepdims=True)
            acc = acc + jnp.broadcast_to(row, (8, c)) * placem[u]
        out_ref[0, pl.ds(pl.multiple_of(g * 8, 8), 8), :] = acc

    def body(j, _):
        for u in range(unroll):
            group(j * unroll + u)
        return 0

    jax.lax.fori_loop(0, s_tile // (8 * unroll), body, 0, unroll=False)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def pallas_gather(plane, idx, s_tile=4096, unroll=8, interpret=False):
    """plane (BH, N, C), idx (BH, S) -> rows (BH, S, C).

    Requires S % s_tile == 0 and s_tile % (8 * INNER) == 0.
    """
    bh, n, c = plane.shape
    s = idx.shape[1]
    assert s % s_tile == 0 and s_tile % INNER == 0
    bpt = s_tile // INNER
    idx3 = idx.reshape(bh, s // INNER, INNER)
    align = 16 if plane.dtype == jnp.bfloat16 else 8
    kernel = functools.partial(_gather_kernel, align, unroll)
    return pl.pallas_call(
        kernel,
        grid=(bh, s // s_tile),
        in_specs=[
            pl.BlockSpec((1, bpt, INNER), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, c), plane.dtype),
        interpret=interpret,
    )(idx3, plane)


@jax.jit
def xla_gather(plane, idx):
    bh, n, c = plane.shape
    base = (jnp.arange(bh, dtype=jnp.int32) * n)[:, None]
    rows = plane.reshape(bh * n, c)[(idx + base).reshape(-1)]
    return rows.reshape(bh, idx.shape[1], c)


def main(small=False):
    from demf_tpu.ops.pallas.gather_rows import gather_rows
    rng = np.random.RandomState(0)
    if small:
        bh, n, s, c = 4, 1024, 8192, 128
    else:
        # encoder lvl-concat realistic plane: B16 x H8, 22336 rows padded.
        # s reduced from the full 357k samples/(b,h) so the (BH, S, C)
        # outputs stay ~3 GB (the rate is s-independent past ~1M rows).
        bh, n, s, c = 128, 22336, 90112, 128
    plane = jnp.asarray(rng.randn(bh, n, c), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, n, (bh, s)), jnp.int32)

    # correctness first (small shapes; full-size outputs can't coexist)
    sidx = idx[:, :8192]
    want = np.asarray(xla_gather(plane, sidx), np.float32)
    got = np.asarray(pallas_gather(plane, sidx, 4096, 8), np.float32)
    np.testing.assert_allclose(got, want)
    got = np.asarray(gather_rows(plane, sidx), np.float32)
    np.testing.assert_allclose(got, want)
    del got, want, sidx
    print('correctness OK')

    rows = bh * s
    t = timeit(lambda: xla_gather(plane, idx))
    print(f'xla gather:    {t * 1e3:8.1f} ms  {rows / t / 1e6:8.1f} M rows/s')
    for unroll in (2, 4, 8):
        for s_tile in (4096, 8192):
            t = timeit(lambda: gather_rows(plane, idx, s_tile, unroll))
            print(f'stage  u{unroll:<2} t{s_tile:<5}: {t * 1e3:8.1f} ms  '
                  f'{rows / t / 1e6:8.1f} M rows/s')
    for unroll in (8,):
        for s_tile in (4096,):
            t = timeit(lambda: pallas_gather(plane, idx, s_tile, unroll))
            print(f'select u{unroll:<2} t{s_tile:<5}: {t * 1e3:8.1f} ms  '
                  f'{rows / t / 1e6:8.1f} M rows/s')


if __name__ == '__main__':
    main(small='--small' in sys.argv)
