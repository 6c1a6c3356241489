#!/usr/bin/env python
"""Microbench sparse-conv building blocks at FCAF3D b8/16k shapes.

Attribution targets (profile_fcaf3d --detail: backbone fwd ~97 ms):
table construction (27 sequential bucket lookups per table) vs conv
apply (scan over 27 taps = ~900 tiny matmuls across the 33 convs).

Usage: python tools/bench_sparse_ops.py [--v2]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from demf_tpu.ops import sparse as S


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


B = 8
# (M, C) per FCAF3D stage at max_voxels=16384 caps
STAGES = ((2048, 64), (1024, 128), (512, 256), (256, 512))


def make_stage(m, c, seed=0):
    rng = np.random.RandomState(seed)
    # realistic occupancy: coords drawn from a 2*(m)**(1/3)-sided cube
    side = max(4, int(round((m * 4) ** (1 / 3))))
    coords = rng.randint(0, side, (B, m, 3)).astype(np.int32)
    valid = np.ones((B, m), bool)
    feats = rng.randn(B, m, c).astype(np.float32)
    return (jnp.asarray(coords), jnp.asarray(valid),
            jnp.asarray(feats, jnp.bfloat16))


def main():
    offs = S.kernel_offsets(3)

    # table build per stage
    for m, c in STAGES:
        coords, valid, feats = make_stage(m, c)
        tab = jax.jit(jax.vmap(lambda co, v: S.neighbor_table(
            co, v, co, v, offs)))
        t = timeit(tab, coords, valid)
        print(f'table M={m:5d}           {t * 1e3:8.2f} ms', flush=True)

    # conv apply per stage (scan-over-taps, current)
    for m, c in STAGES:
        coords, valid, feats = make_stage(m, c)
        nbr = jax.jit(jax.vmap(lambda co, v: S.neighbor_table(
            co, v, co, v, offs)))(coords, valid)
        w = jnp.asarray(np.random.RandomState(1).randn(27, c, c) * 0.1,
                        jnp.bfloat16)
        conv = jax.jit(S.sparse_conv_apply_batched)
        t = timeit(conv, feats, nbr, w)
        print(f'conv  M={m:5d} C={c:3d}     {t * 1e3:8.2f} ms', flush=True)


def main2():
    """Variants: im2col conv apply; tap-vectorized table build."""
    offs = S.kernel_offsets(3)

    def conv_im2col(feats, nbr, weights):
        b, m, c = feats.shape
        k = nbr.shape[2]
        co = weights.shape[2]
        flat = feats.reshape(b * m, c)
        base = (jnp.arange(b, dtype=jnp.int32) * m)[:, None, None]
        idx = (jnp.where(nbr >= 0, nbr, 0) + base).reshape(-1)
        g = flat[idx].reshape(b, nbr.shape[1], k, c)
        g = jnp.where((nbr >= 0)[..., None], g, 0.0)
        return jax.lax.dot_general(
            g.reshape(b, nbr.shape[1], k * c),
            weights.reshape(k * c, co).astype(g.dtype),
            (((2,), (0,)), ((), ())))

    def table_vec(coords, valid, tap_chunk=27):
        def one(co, v):
            skeys, order = S.build_key_table(co, v)
            packed = S._bucketed_table(skeys, order)
            og = offs.reshape(-1, tap_chunk, 3)

            def group(off_g):
                q = (co[None] + off_g[:, None]).reshape(-1, 3)
                vv = jnp.tile(v, (off_g.shape[0],))
                return S._lookup_bucketed(packed, q, vv).reshape(
                    off_g.shape[0], -1)
            res = jax.lax.map(group, og)                # (G, T, M)
            return res.reshape(27, -1).T
        return jax.vmap(one)(coords, valid)

    for m, c in STAGES:
        coords, valid, feats = make_stage(m, c)
        nbr = jax.jit(jax.vmap(lambda co, v: S.neighbor_table(
            co, v, co, v, offs)))(coords, valid)
        w = jnp.asarray(np.random.RandomState(1).randn(27, c, c) * 0.1,
                        jnp.bfloat16)
        t = timeit(jax.jit(conv_im2col), feats, nbr, w)
        print(f'conv-im2col M={m:5d} C={c:3d} {t * 1e3:8.2f} ms',
              flush=True)

    for m, c in STAGES:
        coords, valid, feats = make_stage(m, c)
        for chunk in (27, 9):
            t = timeit(jax.jit(
                lambda co, v, ch=chunk: table_vec(co, v, ch)),
                coords, valid)
            print(f'table-vec M={m:5d} chunk={chunk:2d} '
                  f'{t * 1e3:8.2f} ms', flush=True)


def main3():
    """Chained in-jit repetitions (amortizes the ~5 ms tunnel dispatch
    floor of --v1/--v2): 8x table builds / 8x convs inside one jit."""
    offs = S.kernel_offsets(3)
    REP = 8

    def conv_im2col(feats, nbr, weights):
        b, m, c = feats.shape
        k = nbr.shape[2]
        co = weights.shape[2]
        flat = feats.reshape(b * m, c)
        base = (jnp.arange(b, dtype=jnp.int32) * m)[:, None, None]
        idx = (jnp.where(nbr >= 0, nbr, 0) + base).reshape(-1)
        g = flat[idx].reshape(b, nbr.shape[1], k, c)
        g = jnp.where((nbr >= 0)[..., None], g, 0.0)
        return jax.lax.dot_general(
            g.reshape(b, nbr.shape[1], k * c),
            weights.reshape(k * c, co).astype(g.dtype),
            (((2,), (0,)), ((), ())))

    for m, c in STAGES:
        coords, valid, feats = make_stage(m, c)
        nbr = jax.jit(jax.vmap(lambda co, v: S.neighbor_table(
            co, v, co, v, offs)))(coords, valid)
        w = jnp.asarray(np.random.RandomState(1).randn(27, c, c) * 0.1,
                        jnp.bfloat16)

        def chain(fn, f0):
            f = f0
            for _ in range(REP):
                f = 0.1 * fn(f, nbr, w) + f0
            return f
        for label, fn in (('scan', S.sparse_conv_apply_batched),
                          ('im2col', conv_im2col)):
            t = timeit(jax.jit(lambda f0, fn=fn: chain(fn, f0)), feats,
                       iters=5)
            print(f'conv-{label:<7} M={m:5d} C={c:3d} '
                  f'{t / REP * 1e3:8.2f} ms/conv', flush=True)

    for m, c in STAGES:
        coords, valid, feats = make_stage(m, c)

        def tchain(co0, v):
            acc = jnp.zeros((), jnp.int32)
            for r in range(REP):
                co = co0 + (acc % 2)       # data-dep: defeats CSE
                nbr = jax.vmap(lambda cc, vv: S.neighbor_table(
                    cc, vv, cc, vv, offs))(co, v)
                acc = acc + jnp.sum(jnp.maximum(nbr[..., 0], 0))
            return acc
        t = timeit(jax.jit(tchain), coords, valid, iters=5)
        print(f'table       M={m:5d}       {t / REP * 1e3:8.2f} '
              f'ms/table', flush=True)


def main4():
    """Table-build phase isolation (chained): sort-only vs full table vs
    tap-vectorized lookups."""
    offs = S.kernel_offsets(3)
    REP = 8

    def sort_only(co, v):
        return jax.vmap(S.build_key_table)(co, v)

    def table_current(co, v):
        return jax.vmap(lambda cc, vv: S.neighbor_table(
            cc, vv, cc, vv, offs))(co, v)

    def table_tapvec(co, v):
        def one(cc, vv):
            skeys, order = S.build_key_table(cc, vv)
            packed = S._bucketed_table(skeys, order)
            q = (cc[None] + offs[:, None]).reshape(-1, 3)
            vq = jnp.tile(vv, (27,))
            return S._lookup_bucketed(packed, q, vq).reshape(
                27, -1).T
        return jax.vmap(one)(co, v)

    for m, c in STAGES:
        coords, valid, _ = make_stage(m, c)

        def chain(fn, co0, v):
            acc = jnp.zeros((), jnp.int32)
            for r in range(REP):
                co = co0 + (acc % 2)
                out = fn(co, v)
                acc = acc + jnp.sum(jnp.maximum(
                    jax.tree_util.tree_leaves(out)[0], 0).astype(
                        jnp.int32))
            return acc
        def table_unrolled(co, v):
            def one(cc, vv):
                skeys, order = S.build_key_table(cc, vv)
                packed = S._bucketed_table(skeys, order)
                cols = [S._lookup_bucketed(packed, cc + offs[t][None], vv)
                        for t in range(27)]
                return jnp.stack(cols, -1)
            return jax.vmap(one)(co, v)

        for label, fn in (('sort-only', sort_only),
                          ('current', table_current),
                          ('tap-vec', table_tapvec),
                          ('unrolled', table_unrolled)):
            t = timeit(jax.jit(
                lambda co, v, fn=fn: chain(fn, co, v)), coords, valid,
                iters=5)
            print(f'{label:<10} M={m:5d}       {t / REP * 1e3:8.2f} ms',
                  flush=True)


def main5():
    """Batched-lookup formulations: vmap (current) vs flat-batch gather
    vs scan-over-batch, for the full 27-tap table build."""
    offs = S.kernel_offsets(3)
    REP = 8

    def table_current(co, v):
        return jax.vmap(lambda cc, vv: S.neighbor_table(
            cc, vv, cc, vv, offs))(co, v)

    def _packed_batch(co, v):
        sk, od = jax.vmap(S.build_key_table)(co, v)
        return jax.vmap(S._bucketed_table)(sk, od)

    def table_flat(co, v):
        b, m, _ = co.shape
        packed = _packed_batch(co, v)                  # (B, NB, 2, W)
        nb = packed.shape[1]
        w = packed.shape[3]
        pflat = packed.reshape(b * nb, 2, w)
        cols = []
        from demf_tpu.ops.sparse import _SHIFT, INVALID, linearize
        for t in range(27):
            q = co + offs[t][None, None]
            qk = linearize(jnp.clip(q, -_SHIFT, int(INVALID)))  # (B, M)
            pivots = packed[:, :, 0, 0]                # (B, NB)
            bucket = jnp.sum(qk[:, :, None] >= pivots[:, None, :],
                             -1) - 1
            bucket = jnp.clip(bucket, 0, nb - 1)
            fb = bucket + (jnp.arange(b, dtype=jnp.int32) * nb)[:, None]
            rows = pflat[fb.reshape(-1)]               # (B*M, 2, W)
            eq = rows[:, 0, :] == qk.reshape(-1)[:, None]
            hit = eq.any(1) & v.reshape(-1)
            idx = jnp.argmax(eq, 1)
            res = jnp.take_along_axis(rows[:, 1, :], idx[:, None],
                                      1)[:, 0]
            cols.append(jnp.where(hit, res, -1).reshape(b, m))
        return jnp.stack(cols, -1)

    def table_scanb(co, v):
        packed = _packed_batch(co, v)

        def body(_, xs):
            pk, cc, vv = xs
            cols = [S._lookup_bucketed(pk, cc + offs[t][None], vv)
                    for t in range(27)]
            return None, jnp.stack(cols, -1)
        _, out = jax.lax.scan(body, None, (packed, co, v))
        return out

    for m, c in STAGES:
        coords, valid, _ = make_stage(m, c)

        def chain(fn, co0, v):
            acc = jnp.zeros((), jnp.int32)
            for r in range(REP):
                co = co0 + (acc % 2)
                out = fn(co, v)
                acc = acc + jnp.sum(jnp.maximum(out, 0).astype(jnp.int32))
            return acc
        for label, fn in (('vmap (cur)', table_current),
                          ('flat-batch', table_flat),
                          ('scan-batch', table_scanb)):
            t = timeit(jax.jit(
                lambda co, v, fn=fn: chain(fn, co, v)), coords, valid,
                iters=5)
            print(f'{label:<10} M={m:5d}       {t / REP * 1e3:8.2f} ms',
                  flush=True)


if __name__ == '__main__':
    if '--v5' in sys.argv:
        main5()
    elif '--v4' in sys.argv:
        main4()
    elif '--v3' in sys.argv:
        main3()
    elif '--v2' in sys.argv:
        main2()
    else:
        main()
