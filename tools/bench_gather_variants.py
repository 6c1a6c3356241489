#!/usr/bin/env python
"""Characterize the XLA gather rate: what sets the ~86 M rows/s floor?

Variants: flat big-plane gather (current msda form), scan-over-bh with a
per-slice plane (VMEM-resident candidate), sorted vs random indices,
iota indices (streaming upper bound), and row width 64/128/256 ch.

Usage: python tools/bench_gather_variants.py
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


@jax.jit
def flat_gather(plane, idx):
    bh, n, c = plane.shape
    base = (jnp.arange(bh, dtype=jnp.int32) * n)[:, None]
    rows = plane.reshape(bh * n, c)[(idx + base).reshape(-1)]
    return rows.reshape(bh, idx.shape[1], c)


@jax.jit
def batched_gather(plane, idx):
    return jnp.take_along_axis(plane, idx[..., None], axis=1)


@jax.jit
def scan_gather(plane, idx):
    def body(_, xs):
        p, i = xs
        return None, p[i]
    _, out = jax.lax.scan(body, None, (plane, idx))
    return out


def report(label, fn, plane, idx):
    rows = idx.shape[0] * idx.shape[1]
    t = timeit(fn, plane, idx)
    print(f'{label:<42} {t * 1e3:8.1f} ms  {rows / t / 1e6:7.1f} M rows/s',
          flush=True)


def main():
    rng = np.random.RandomState(0)
    bh, n, s = 128, 22336, 90112
    for c in (128,):
        plane = jnp.asarray(rng.randn(bh, n, c), jnp.bfloat16)
        idx_r = jnp.asarray(rng.randint(0, n, (bh, s)), jnp.int32)
        idx_s = jnp.sort(idx_r, axis=1)
        # near-sorted: sorted plus small jitter (msda query-order locality)
        idx_ns = jnp.clip(idx_s + jnp.asarray(
            rng.randint(-30, 30, (bh, s)), jnp.int32), 0, n - 1)
        idx_i = jnp.broadcast_to(
            (jnp.arange(s, dtype=jnp.int32) * n // s)[None], (bh, s))
        idx_i = jnp.asarray(idx_i)

        print(f'--- C={c} bh={bh} n={n} s={s} (bf16 rows of {c*2} B)')
        report('flat random', flat_gather, plane, idx_r)
        report('flat sorted', flat_gather, plane, idx_s)
        report('flat near-sorted', flat_gather, plane, idx_ns)
        report('flat iota', flat_gather, plane, idx_i)
        report('batched(take_along) random', batched_gather, plane, idx_r)
        report('scan-over-bh random', scan_gather, plane, idx_r)
        report('scan-over-bh sorted', scan_gather, plane, idx_s)

    # small-plane regime (the 160 M rows/s measurement): same total rows
    plane1 = jnp.asarray(rng.randn(1, 16384, 128), jnp.bfloat16)
    idxs1 = jnp.asarray(rng.randint(0, 16384, (1, s * 32)), jnp.int32)
    report('single-slice small plane random', flat_gather, plane1, idxs1)

    # f32 narrow rows for comparison
    plane32 = jnp.asarray(rng.randn(bh, n, 32), jnp.bfloat16)
    idx32 = jnp.asarray(rng.randint(0, n, (bh, s)), jnp.int32)
    report('flat random c=32', flat_gather, plane32, idx32)





@jax.jit
def flat_scatter(buf, idx, upd):
    bh, n, c = buf.shape
    base = (jnp.arange(bh, dtype=jnp.int32) * n)[:, None]
    out = buf.reshape(bh * n, c).at[(idx + base).reshape(-1)].add(
        upd.reshape(-1, c))
    return out.reshape(bh, n, c)


@jax.jit
def scan_scatter(buf, idx, upd):
    def body(_, xs):
        b, i, u = xs
        return None, b.at[i].add(u)
    _, out = jax.lax.scan(body, None, (buf, idx, upd))
    return out


def scatters():
    # device-side generation: host->device of a ~6 GB f32 array over the
    # tunnel takes minutes; keys are cheap
    bh, n, s, c = 128, 22336, 45056, 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    buf = jnp.zeros((bh, n, c), jnp.float32)
    idx = jax.random.randint(k1, (bh, s), 0, n, jnp.int32)
    upd = jax.random.normal(k2, (bh, s, c), jnp.float32)
    idx.block_until_ready()
    rows = bh * s
    for label, fn in (('flat scatter f32', flat_scatter),
                      ('scan-over-bh scatter f32', scan_scatter)):
        t = timeit(fn, buf, idx, upd)
        print(f'{label:<42} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


if __name__ == '__main__':
    if '--scatter' in sys.argv:
        scatters()
    else:
        main()
