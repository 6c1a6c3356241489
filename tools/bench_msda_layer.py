#!/usr/bin/env python
"""Attribute the per-slice cost of the scan-over-slice MSDA forward.

Per-layer at b16 encoder shapes: 128 slices x 357k rows.  Measured
281 ms/layer vs ~127 ms of pure gather at the 360 M rows/s floor -- this
bench times body variants to find the other ~150 ms.

Usage: python tools/bench_msda_layer.py
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


_B = int(os.environ.get('MSDA_BENCH_B', '16'))
BH, N, Q, HD, NLV, NPTS = _B * 8, 22336, 22528, 32, 4, 4
S = Q * NLV * NPTS
C = 4 * HD


def make_inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    plane = jax.random.normal(ks[0], (BH, N, C), jnp.bfloat16)
    idx = jax.random.randint(ks[1], (BH, S), 0, N, jnp.int32)
    w4 = jax.random.uniform(ks[2], (BH, S, 4), jnp.bfloat16)
    jax.block_until_ready((plane, idx, w4))
    return plane, idx, w4


def fold_matrix(n_rep, hd, dtype):
    return jnp.tile(jnp.eye(hd, dtype=dtype), (n_rep, 1))


@jax.jit
def scan_gather_only(plane, idx, w4):
    # gather + trivial reduce (keeps output small without the fold)
    def body(_, xs):
        p, i, _w = xs
        rows = p[i]
        return None, jnp.sum(rows.astype(jnp.float32), axis=0)
    _, out = jax.lax.scan(body, None, (plane, idx, w4))
    return out


@jax.jit
def scan_full_body(plane, idx, w4):
    fold = fold_matrix(NLV * NPTS * 4, HD, jnp.bfloat16)

    def body(_, xs):
        p, i, w = xs
        rows = p[i]
        wfull = jnp.repeat(w, HD, axis=-1)
        weighted = (rows * wfull).reshape(Q, NLV * NPTS * 4 * HD)
        out = jax.lax.dot_general(
            weighted, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return None, out.astype(jnp.bfloat16)
    _, out = jax.lax.scan(body, None, (plane, idx, w4))
    return out


@jax.jit
def scan_no_weight(plane, idx, w4):
    # fold without the weight multiply: isolates the wfull repeat+mult
    fold = fold_matrix(NLV * NPTS * 4, HD, jnp.bfloat16)

    def body(_, xs):
        p, i, _w = xs
        rows = p[i]
        weighted = rows.reshape(Q, NLV * NPTS * 4 * HD)
        out = jax.lax.dot_general(
            weighted, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return None, out.astype(jnp.bfloat16)
    _, out = jax.lax.scan(body, None, (plane, idx, w4))
    return out


@jax.jit
def scan_gather_4way(plane, idx, w4):
    # 4 independent per-level gathers per body (pipelining check)
    fold = fold_matrix(NPTS * 4, HD, jnp.bfloat16)
    sl = S // NLV

    def body(_, xs):
        p, i, w = xs
        acc = None
        for lvl in range(NLV):
            rows = p[i.reshape(Q, NLV, NPTS)[:, lvl].reshape(-1)]
            wl = w.reshape(Q, NLV, NPTS, 4)[:, lvl].reshape(-1, 4)
            wfull = jnp.repeat(wl, HD, axis=-1)
            weighted = (rows * wfull).reshape(Q, NPTS * 4 * HD)
            o = jax.lax.dot_general(
                weighted, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        return None, acc.astype(jnp.bfloat16)
    _, out = jax.lax.scan(body, None, (plane, idx, w4))
    return out


@jax.jit
def scan_pairs(plane, idx, w4):
    # two slices per scan step (halves iteration count)
    fold = fold_matrix(NLV * NPTS * 4, HD, jnp.bfloat16)
    p2 = plane.reshape(BH // 2, 2, N, C)
    i2 = idx.reshape(BH // 2, 2, S)
    w2 = w4.reshape(BH // 2, 2, S, 4)

    def body(_, xs):
        p, i, w = xs
        outs = []
        for k in range(2):
            rows = p[k][i[k]]
            wfull = jnp.repeat(w[k], HD, axis=-1)
            weighted = (rows * wfull).reshape(Q, NLV * NPTS * 4 * HD)
            o = jax.lax.dot_general(
                weighted, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(o.astype(jnp.bfloat16))
        return None, jnp.stack(outs)
    _, out = jax.lax.scan(body, None, (p2, i2, w2))
    return out


def main():
    plane, idx, w4 = make_inputs()
    rows = BH * S
    for label, fn in (('gather-only scan', scan_gather_only),
                      ('full body (msda form)', scan_full_body),
                      ('no-weight fold', scan_no_weight),
                      ('4-way level gathers', scan_gather_4way),
                      ('2 slices/step', scan_pairs)):
        t = timeit(fn, plane, idx, w4)
        print(f'{label:<26} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)




@jax.jit
def scan_barrier_body(plane, idx, w4):
    # optimization_barrier between gather and weighting: keeps the fast
    # gather emitter, pays one HBM round-trip for the rows
    fold = fold_matrix(NLV * NPTS * 4, HD, jnp.bfloat16)

    def body(_, xs):
        p, i, w = xs
        rows = p[i]
        rows = jax.lax.optimization_barrier(rows)
        wfull = jnp.repeat(w, HD, axis=-1)
        weighted = (rows * wfull).reshape(Q, NLV * NPTS * 4 * HD)
        out = jax.lax.dot_general(
            weighted, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return None, out.astype(jnp.bfloat16)
    _, out = jax.lax.scan(body, None, (plane, idx, w4))
    return out


@jax.jit
def scan_barrier_bcast3d(plane, idx, w4):
    # barrier + (S,4,hd)*(S,4,1) broadcast instead of repeat
    fold = fold_matrix(NLV * NPTS * 4, HD, jnp.bfloat16)

    def body(_, xs):
        p, i, w = xs
        rows = jax.lax.optimization_barrier(p[i])
        weighted = (rows.reshape(S, 4, HD) * w[..., None]).reshape(
            Q, NLV * NPTS * 4 * HD)
        out = jax.lax.dot_general(
            weighted, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return None, out.astype(jnp.bfloat16)
    _, out = jax.lax.scan(body, None, (plane, idx, w4))
    return out


@jax.jit
def scan_batched_dot(plane, idx, w4):
    # barrier + per-query batched matvec (w (q,64) x R (q,64,hd))
    def body(_, xs):
        p, i, w = xs
        rows = jax.lax.optimization_barrier(p[i])
        r3 = rows.reshape(Q, NLV * NPTS * 4, HD)
        wq = w.reshape(Q, NLV * NPTS * 4)
        out = jax.lax.dot_general(
            wq, r3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return None, out.astype(jnp.bfloat16)
    _, out = jax.lax.scan(body, None, (plane, idx, w4))
    return out


def main2():
    plane, idx, w4 = make_inputs()
    rows = BH * S
    for label, fn in (('barrier + repeat mult', scan_barrier_body),
                      ('barrier + bcast3d mult', scan_barrier_bcast3d),
                      ('barrier + batched dot', scan_batched_dot)):
        t = timeit(fn, plane, idx, w4)
        print(f'{label:<26} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)




def main3():
    """Time the real op + the real encoder layer at b16 encoder shapes."""
    from demf_tpu.ops.msda import multi_scale_deformable_attention
    shapes = ((100, 168), (50, 84), (25, 42), (13, 21))
    sum_hw = sum(h * w for h, w in shapes)
    b, heads, hd = _B, 8, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    value = jax.random.normal(ks[0], (b, sum_hw, heads, hd), jnp.bfloat16)
    locs = jax.random.uniform(
        ks[1], (b, sum_hw, heads, NLV, NPTS, 2), jnp.float32)
    aw = jax.nn.softmax(jax.random.normal(
        ks[2], (b, sum_hw, heads, NLV, NPTS), jnp.float32).reshape(
            b, sum_hw, heads, -1), axis=-1).reshape(
                b, sum_hw, heads, NLV, NPTS)
    jax.block_until_ready((value, locs, aw))
    fn = jax.jit(functools.partial(
        multi_scale_deformable_attention, spatial_shapes=shapes))
    t = timeit(lambda: fn(value, sampling_locations=locs,
                          attention_weights=aw))
    rows = b * heads * sum_hw * NLV * NPTS
    print(f'real msda op               {t * 1e3:8.1f} ms  '
          f'{rows / t / 1e6:7.1f} M rows/s', flush=True)

    # full encoder layer (self-attn msda + FFN) via the model module
    import demf_tpu.models  # noqa: F401
    from demf_tpu.utils.registry import HEADS, build_from_cfg
    from demf_tpu.zoo import load_model_cfg
    cfg = load_model_cfg('demf/demf_votenet.py')
    enc_cfg = dict(cfg.model['img_encoder'])
    enc_cfg['encoder'] = {**dict(enc_cfg['encoder']), 'num_layers': 1}
    enc = build_from_cfg(enc_cfg, HEADS)
    lvls = [jax.random.normal(k, (b, h, w, 256), jnp.bfloat16)
            for k, (h, w) in zip(jax.random.split(ks[0], 4), shapes)]
    img_shape = jnp.tile(jnp.asarray(
        [[800, 1333]], jnp.float32), (b, 1))
    variables = jax.jit(lambda r: enc.init(
        r, lvls, img_shape, train=False))(jax.random.PRNGKey(1))
    efwd = jax.jit(lambda v, x: enc.apply(v, x, img_shape, train=False))
    t = timeit(efwd, variables, lvls)
    print(f'1-layer encoder            {t * 1e3:8.1f} ms', flush=True)


def main4():
    """Attribute the msda op preamble: quad build, geometry, w4 prep."""
    from demf_tpu.ops import msda as M
    shapes = ((100, 168), (50, 84), (25, 42), (13, 21))
    sum_hw = sum(h * w for h, w in shapes)
    b, heads, hd = _B, 8, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    value = jax.random.normal(ks[0], (b, sum_hw, heads, hd), jnp.bfloat16)
    locs = jax.random.uniform(
        ks[1], (b, sum_hw, heads, NLV, NPTS, 2), jnp.float32)
    aw = jax.nn.softmax(jax.random.normal(
        ks[2], (b, sum_hw, heads, NLV, NPTS), jnp.float32).reshape(
            b, sum_hw, heads, -1), axis=-1).reshape(
                b, sum_hw, heads, NLV, NPTS)
    jax.block_until_ready((value, locs, aw))

    quad = jax.jit(lambda v: M._build_quad_plane(v, shapes, jnp.bfloat16))
    t = timeit(quad, value)
    print(f'quad plane build           {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def geo(l, a):
        g = M._geometry(shapes, l)
        idx = g['idx'].reshape(b * heads, -1)
        w4g = g['wslot'].reshape(b * heads, -1, 4)
        awf = jnp.moveaxis(a, 2, 1).reshape(b * heads, -1)
        return idx, w4g * awf[..., None].astype(w4g.dtype)
    t = timeit(geo, locs, aw)
    print(f'geometry + w4 prep         {t * 1e3:8.1f} ms', flush=True)


def main5():
    """Gather rate with a 45 MB per-step operand (scan over b only)."""
    b_, heads = 16, 8
    n_all = heads * N
    s_b = Q * heads * NLV * NPTS
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    plane = jax.random.normal(ks[0], (b_, n_all, C), jnp.bfloat16)
    idx = jax.random.randint(ks[1], (b_, s_b), 0, n_all, jnp.int32)
    w4f = jax.random.uniform(ks[2], (b_, s_b * 4), jnp.bfloat16)
    jax.block_until_ready((plane, idx, w4f))
    fold = fold_matrix(NLV * NPTS * 4, HD, jnp.bfloat16)

    @jax.jit
    def scan_b(plane, idx, w4f):
        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            wfull = jnp.repeat(w.reshape(s_b, 4), HD, axis=-1)
            weighted = (rows * wfull).reshape(
                Q * heads, NLV * NPTS * 4 * HD)
            out = jax.lax.dot_general(
                weighted, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.reshape(Q, heads * HD).astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4f))
        return out

    rows = b_ * s_b
    t = timeit(scan_b, plane, idx, w4f)
    print(f'scan-over-b (45MB operand) {t * 1e3:8.1f} ms  '
          f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main6():
    """lp-major body variants: w4 passed as (4, S) slot-major (unpadded),
    wfull built by fused broadcast+concat, fold adapted to lp-major
    sample order (q no longer outermost in S)."""
    LP = NLV * NPTS
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    plane = jax.random.normal(ks[0], (BH, N, C), jnp.bfloat16)
    idx = jax.random.randint(ks[1], (BH, S), 0, N, jnp.int32)
    ws = jax.random.uniform(ks[2], (BH, 4, S), jnp.bfloat16)
    jax.block_until_ready((plane, idx, ws))

    def wfull_bcast(w_s):
        # (4, S) -> (S, 4hd) via per-slot broadcasts + concat (fusable)
        return jnp.concatenate(
            [jnp.broadcast_to(w_s[k][:, None], (S, HD)) for k in range(4)],
            axis=1)

    @jax.jit
    def lp_einsum(plane, idx, ws):
        fold = fold_matrix(4, HD, jnp.bfloat16)           # (4hd, hd)

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            weighted = (rows * wfull_bcast(w)).reshape(LP, Q, C)
            out = jnp.einsum('lqc,cj->qj', weighted, fold,
                             preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, ws))
        return out

    @jax.jit
    def lp_unrolled(plane, idx, ws):
        fold = fold_matrix(4, HD, jnp.bfloat16)

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            weighted = (rows * wfull_bcast(w)).reshape(LP, Q, C)
            acc = None
            for lp in range(LP):
                o = jax.lax.dot_general(
                    weighted[lp], fold, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = o if acc is None else acc + o
            return None, acc.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, ws))
        return out

    @jax.jit
    def lp_dot2(plane, idx, ws):
        fold = jnp.tile(fold_matrix(4, HD, jnp.bfloat16)[None],
                        (LP, 1, 1))                        # (LP, 4hd, hd)

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            weighted = (rows * wfull_bcast(w)).reshape(LP, Q, C)
            out = jax.lax.dot_general(
                weighted, fold, (((0, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, ws))
        return out

    w4sm = jax.random.uniform(ks[2], (BH, S, 4), jnp.bfloat16)
    jax.block_until_ready(w4sm)

    @jax.jit
    def lp_repeat_dot2(plane, idx, w4):
        # isolate: (S,4)+repeat wfull (the q-major winner's form) with
        # the lp-major 2-contract fold
        fold = jnp.tile(fold_matrix(4, HD, jnp.bfloat16)[None],
                        (LP, 1, 1))

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            wfull = jnp.repeat(w, HD, axis=-1)
            weighted = (rows * wfull).reshape(LP, Q, C)
            out = jax.lax.dot_general(
                weighted, fold, (((0, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    @jax.jit
    def q_bcast_fold(plane, idx, ws):
        # isolate: bcast-concat wfull with the q-major single big fold
        fold = fold_matrix(NLV * NPTS * 4, HD, jnp.bfloat16)

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            weighted = (rows * wfull_bcast(w)).reshape(
                Q, NLV * NPTS * 4 * HD)
            out = jax.lax.dot_general(
                weighted, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, ws))
        return out

    rows = BH * S
    for label, fn in (('lp repeat + 2-contract', lambda p, i, w: lp_repeat_dot2(p, i, w4sm)),
                      ('q bcast + single fold', q_bcast_fold),
                      ('lp einsum fold', lp_einsum),
                      ('lp unrolled 16-matmul', lp_unrolled),
                      ('lp 2-contract dot', lp_dot2)):
        try:
            t = timeit(fn, plane, idx, ws)
            print(f'{label:<26} {t * 1e3:8.1f} ms  '
                  f'{rows / t / 1e6:7.1f} M rows/s', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{label:<26} FAILED: {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)


def main7():
    """Geometry prep cost in lp-major (Q-minor) layout vs the current
    (B,h,Q,L,P) padded layout (main4's 78 ms)."""
    b, heads = 16, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    shapes = ((100, 168), (50, 84), (25, 42), (13, 21))
    locs = jax.random.uniform(
        ks[1], (b, Q, heads, NLV, NPTS, 2), jnp.float32)
    aw = jax.random.uniform(ks[2], (b, Q, heads, NLV, NPTS), jnp.float32)
    jax.block_until_ready((locs, aw))

    wvec = jnp.asarray([w for (_, w) in shapes], jnp.float32)
    hvec = jnp.asarray([h for (h, _) in shapes], jnp.float32)
    starts = [0]
    for (h, w) in shapes:
        starts.append(starts[-1] + h * w)
    svec = jnp.asarray(starts[:-1], jnp.float32)
    wm2 = jnp.asarray([max(w - 2, 0) for (_, w) in shapes], jnp.float32)
    hm2 = jnp.asarray([max(h - 2, 0) for (h, _) in shapes], jnp.float32)
    SLOTS = ((0, 0), (0, 1), (1, 0), (1, 1))

    @jax.jit
    def geo_lpq(locs, aw):
        # (B,Q,h,L,P,2) -> (B, h*L*P*2, Q) -> (B,h,L,P,2,Q)
        t = jnp.transpose(
            locs.reshape(b, Q, heads * NLV * NPTS * 2), (0, 2, 1))
        t = jax.lax.optimization_barrier(t).reshape(
            b, heads, NLV, NPTS, 2, Q)
        lshape = (1, 1, NLV, 1, 1)
        x = t[:, :, :, :, 0] * wvec.reshape(lshape) - 0.5
        y = t[:, :, :, :, 1] * hvec.reshape(lshape) - 0.5
        bx = jnp.clip(jnp.floor(x), 0.0, wm2.reshape(lshape))
        by = jnp.clip(jnp.floor(y), 0.0, hm2.reshape(lshape))
        idx = (svec.reshape(lshape) + by * wvec.reshape(lshape) + bx)
        awT = jnp.transpose(
            aw.reshape(b, Q, heads * NLV * NPTS), (0, 2, 1))
        awT = jax.lax.optimization_barrier(awT).reshape(
            b, heads, NLV, NPTS, Q)
        ws = []
        for dy, dx in SLOTS:
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (bx + dx)))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (by + dy)))
            ws.append((wx * wy * awT).astype(jnp.bfloat16))
        w4 = jnp.stack(ws, axis=2)                     # (B,h,4,L,P,Q)
        return (idx.astype(jnp.int32).reshape(BH, S),
                w4.reshape(BH, 4, S))
    t = timeit(geo_lpq, locs, aw)
    print(f'lpq geometry + w4 prep     {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def geo_lpq_s4(locs, aw):
        # same geometry but emits w4 as (BH, S, 4) slot-minor (what the
        # winning lp repeat + 2-contract body consumes)
        t = jnp.transpose(
            locs.reshape(b, Q, heads * NLV * NPTS * 2), (0, 2, 1))
        t = jax.lax.optimization_barrier(t).reshape(
            b, heads, NLV, NPTS, 2, Q)
        lshape = (1, 1, NLV, 1, 1)
        x = t[:, :, :, :, 0] * wvec.reshape(lshape) - 0.5
        y = t[:, :, :, :, 1] * hvec.reshape(lshape) - 0.5
        bx = jnp.clip(jnp.floor(x), 0.0, wm2.reshape(lshape))
        by = jnp.clip(jnp.floor(y), 0.0, hm2.reshape(lshape))
        idx = (svec.reshape(lshape) + by * wvec.reshape(lshape) + bx)
        awT = jnp.transpose(
            aw.reshape(b, Q, heads * NLV * NPTS), (0, 2, 1))
        awT = jax.lax.optimization_barrier(awT).reshape(
            b, heads, NLV, NPTS, Q)
        ws = []
        for dy, dx in SLOTS:
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (bx + dx)))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (by + dy)))
            ws.append((wx * wy * awT).astype(jnp.bfloat16))
        w4 = jnp.stack(ws, axis=-1)                    # (B,h,L,P,Q,4)
        return (idx.astype(jnp.int32).reshape(BH, S),
                w4.reshape(BH, S, 4))
    t = timeit(geo_lpq_s4, locs, aw)
    print(f'lpq geometry + (S,4) w4    {t * 1e3:8.1f} ms', flush=True)


def main8():
    """Flat (S*4,) w4 scan input vs (S, 4): the (S,4) array tile-pads
    its minor dim 32x (11.8 GB at BH=128), so both its materialization
    and the scan's re-read may pay; the flat form is unpadded."""
    LP = NLV * NPTS
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    plane = jax.random.normal(ks[0], (BH, N, C), jnp.bfloat16)
    idx = jax.random.randint(ks[1], (BH, S), 0, N, jnp.int32)
    w4flat = jax.random.uniform(ks[2], (BH, S * 4), jnp.bfloat16)
    jax.block_until_ready((plane, idx, w4flat))

    @jax.jit
    def lp_flat(plane, idx, w4f):
        fold = jnp.tile(fold_matrix(4, HD, jnp.bfloat16)[None],
                        (LP, 1, 1))

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            wfull = jnp.repeat(w.reshape(S, 4), HD, axis=-1)
            weighted = (rows * wfull).reshape(LP, Q, C)
            out = jax.lax.dot_general(
                weighted, fold, (((0, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4f))
        return out

    rows = BH * S
    t = timeit(lp_flat, plane, idx, w4flat)
    print(f'lp flat-w4 scan            {t * 1e3:8.1f} ms  '
          f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main9():
    """Forward+backward (VJP) of the real op at encoder shapes.

    Uses a REAL (data-dependent) cotangent: a plain ``sum`` loss hands
    the VJP a constant-ones upstream grad, which XLA folds into the
    backward (the g4 tiles become constants and the D dots collapse to
    row sums) — that under-measured the backward by ~60% vs the
    in-model cost (measured 139 vs 225 ms/layer at b4).
    """
    from demf_tpu.ops.msda import multi_scale_deformable_attention
    shapes = ((100, 168), (50, 84), (25, 42), (13, 21))
    sum_hw = sum(h * w for h, w in shapes)
    b, heads, hd = _B, 8, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    value = jax.random.normal(ks[0], (b, sum_hw, heads, hd), jnp.bfloat16)
    locs = jax.random.uniform(
        ks[1], (b, sum_hw, heads, NLV, NPTS, 2), jnp.float32)
    aw = jax.nn.softmax(jax.random.normal(
        ks[2], (b, sum_hw, heads, NLV, NPTS), jnp.float32).reshape(
            b, sum_hw, heads, -1), axis=-1).reshape(
                b, sum_hw, heads, NLV, NPTS)
    wout = jax.random.normal(ks[3], (heads * hd, heads * hd),
                             jnp.bfloat16) * 0.02
    jax.block_until_ready((value, locs, aw, wout))

    def loss(v, l, a):
        out = multi_scale_deformable_attention(
            v, shapes, sampling_locations=l, attention_weights=a)
        # output proj makes the upstream cotangent data-dependent
        return jnp.sum((out @ wout).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t = timeit(g, value, locs, aw, iters=3)
    rows = b * heads * sum_hw * NLV * NPTS
    print(f'real op fwd+bwd            {t * 1e3:8.1f} ms  '
          f'{rows / t / 1e6:7.1f} M rows/s(fwd-equiv)', flush=True)


def main10():
    """Attribute the backward scan: re-gather + D dots vs scatter-add."""
    LP = NLV * NPTS
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    plane = jax.random.normal(ks[0], (BH, N, C), jnp.bfloat16)
    idx = jax.random.randint(ks[1], (BH, S), 0, N, jnp.int32)
    w4 = jax.random.uniform(ks[2], (BH, S, 4), jnp.bfloat16)
    g = jax.random.normal(ks[3], (BH, Q, HD), jnp.float32)
    jax.block_until_ready((plane, idx, w4, g))

    @jax.jit
    def bwd_dots_only(plane, idx, w4, g):
        slotpick = jnp.repeat(jnp.eye(4, dtype=jnp.bfloat16), HD, axis=0)

        def body(_, xs):
            p, i, w, g_s = xs
            rows = jax.lax.optimization_barrier(p[i])
            g4 = jnp.tile(g_s.astype(jnp.bfloat16), (LP, 4))
            D = jax.lax.dot_general(
                rows * g4, slotpick, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_aw = jnp.sum(w.astype(jnp.float32) * D, axis=-1)
            return None, (d_aw, D)
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    @jax.jit
    def bwd_scatter_only(plane, idx, w4, g):
        def body(_, xs):
            p, i, w, g_s = xs
            wfull = jnp.repeat(w.astype(jnp.float32), HD, axis=-1)
            upd = wfull * jnp.tile(g_s, (LP, 4))
            upd = jax.lax.optimization_barrier(upd)
            dplane = jnp.zeros(p.shape, jnp.float32).at[i].add(upd)
            return None, dplane.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    @jax.jit
    def bwd_scatter_bf16(plane, idx, w4, g):
        # f32 accumulation is required for correctness; this measures the
        # update-stream dtype cost only
        def body(_, xs):
            p, i, w, g_s = xs
            wfull = jnp.repeat(w, HD, axis=-1)
            upd = wfull * jnp.tile(g_s.astype(jnp.bfloat16), (LP, 4))
            upd = jax.lax.optimization_barrier(upd)
            dplane = jnp.zeros(p.shape, jnp.float32).at[i].add(
                upd.astype(jnp.float32))
            return None, dplane.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    rows = BH * S
    for label, fn in (('bwd re-gather + D dots', bwd_dots_only),
                      ('bwd scatter-add (f32 upd)', bwd_scatter_only),
                      ('bwd scatter-add (bf16 upd)', bwd_scatter_bf16)):
        t = timeit(fn, plane, idx, w4, g, iters=3)
        print(f'{label:<27} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main11():
    """Forward core variants: fold-matmul (current) vs slot-split
    broadcast-multiply + LP reduction (no wfull repeat, no MXU)."""
    LP = NLV * NPTS
    plane, idx, w4 = make_inputs()

    @jax.jit
    def fold_current(plane, idx, w4):
        fold = jnp.tile(fold_matrix(4, HD, jnp.bfloat16)[None],
                        (LP, 1, 1))

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            wfull = jnp.repeat(w, HD, axis=-1)
            weighted = (rows * wfull).reshape(LP, Q, C)
            out = jax.lax.dot_general(
                weighted, fold, (((0, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    @jax.jit
    def slot_split(plane, idx, w4):
        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i]).reshape(LP, Q, C)
            wv = w.reshape(LP, Q, 4)
            acc = jnp.zeros((Q, HD), jnp.float32)
            for s in range(4):
                part = rows[:, :, s * HD:(s + 1) * HD].astype(jnp.float32)
                acc = acc + jnp.sum(
                    part * wv[:, :, s, None].astype(jnp.float32), axis=0)
            return None, acc.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    @jax.jit
    def slot_split_bf16(plane, idx, w4):
        # bf16 partial products, f32 accumulation across slots/LP via sum
        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i]).reshape(LP, Q, C)
            wv = w.reshape(LP, Q, 4)
            acc = jnp.zeros((Q, HD), jnp.float32)
            for s in range(4):
                part = rows[:, :, s * HD:(s + 1) * HD] * wv[:, :, s, None]
                acc = acc + jnp.sum(part.astype(jnp.float32), axis=0)
            return None, acc.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    rows = BH * S
    for label, fn in (('fold-matmul (current)', fold_current),
                      ('slot-split f32', slot_split),
                      ('slot-split bf16 prod', slot_split_bf16)):
        t = timeit(fn, plane, idx, w4, iters=3)
        print(f'{label:<27} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main12():
    """Scatter-add accumulator-dtype and row-width variants."""
    LP = NLV * NPTS
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    plane = jax.random.normal(ks[0], (BH, N, C), jnp.bfloat16)
    idx = jax.random.randint(ks[1], (BH, S), 0, N, jnp.int32)
    w4 = jax.random.uniform(ks[2], (BH, S, 4), jnp.bfloat16)
    g = jax.random.normal(ks[3], (BH, Q, HD), jnp.float32)
    jax.block_until_ready((plane, idx, w4, g))

    def make_upd(w, g_s):
        gslot = jnp.tile(g_s.astype(jnp.bfloat16), (1, 4))
        wfull3 = jnp.repeat(w.reshape(LP, Q, 4), HD, axis=-1)
        return (wfull3 * gslot[None]).reshape(S, C)

    @jax.jit
    def scatter_f32acc(plane, idx, w4, g):
        def body(_, xs):
            p, i, w, g_s = xs
            upd = jax.lax.optimization_barrier(make_upd(w, g_s))
            d = jnp.zeros(p.shape, jnp.float32).at[i].add(
                upd.astype(jnp.float32))
            return None, d.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    @jax.jit
    def scatter_bf16acc(plane, idx, w4, g):
        def body(_, xs):
            p, i, w, g_s = xs
            upd = jax.lax.optimization_barrier(make_upd(w, g_s))
            d = jnp.zeros(p.shape, jnp.bfloat16).at[i].add(upd)
            return None, d
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    @jax.jit
    def scatter_sorted_f32acc(plane, idx, w4, g):
        # sort indices per slice, permute updates via a (fast) gather,
        # then scatter with sorted indices
        def body(_, xs):
            p, i, w, g_s = xs
            order = jnp.argsort(i)
            upd = jax.lax.optimization_barrier(make_upd(w, g_s))
            upd_s = jax.lax.optimization_barrier(upd[order])
            d = jnp.zeros(p.shape, jnp.float32).at[i[order]].add(
                upd_s.astype(jnp.float32),
                indices_are_sorted=True)
            return None, d.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    rows = BH * S
    for label, fn in (('scatter f32 acc', scatter_f32acc),
                      ('scatter bf16 acc', scatter_bf16acc),
                      ('scatter sorted f32 acc', scatter_sorted_f32acc)):
        t = timeit(fn, plane, idx, w4, g, iters=3)
        print(f'{label:<27} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main15():
    """Forward core: fused multiply + reduce-over-LP to a (Q, C) partial,
    then a tiny (4hd, hd) slot fold — one pass over the rows buffer
    instead of the 2-contract fold's weighted materialization + re-read
    (rows write 91 MB + weighted write 91 + fold read 91 vs rows write
    91 + fused read 91 + ~6 MB partial)."""
    LP = NLV * NPTS
    plane, idx, w4 = make_inputs()

    @jax.jit
    def fold_current(plane, idx, w4):
        fold = jnp.tile(fold_matrix(4, HD, jnp.bfloat16)[None],
                        (LP, 1, 1))

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            wfull = jnp.repeat(w, HD, axis=-1)
            weighted = (rows * wfull).reshape(LP, Q, C)
            out = jax.lax.dot_general(
                weighted, fold, (((0, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    @jax.jit
    def mul_reduce_lp(plane, idx, w4):
        fold = fold_matrix(4, HD, jnp.bfloat16)            # (4hd, hd)

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i]).reshape(LP, Q, C)
            wfull = jnp.repeat(w.reshape(LP, Q, 4), HD, axis=-1)
            part = jnp.sum((rows * wfull).astype(jnp.float32), axis=0)
            out = jax.lax.dot_general(
                part.astype(jnp.bfloat16), fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    @jax.jit
    def mul_reduce_lp_bf16(plane, idx, w4):
        # bf16 partial accumulation over the 16 LP slabs
        fold = fold_matrix(4, HD, jnp.bfloat16)

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i]).reshape(LP, Q, C)
            wfull = jnp.repeat(w.reshape(LP, Q, 4), HD, axis=-1)
            part = jnp.sum(rows * wfull, axis=0)
            out = jax.lax.dot_general(
                part, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    rows = BH * S
    for label, fn in (('2-contract fold (current)', fold_current),
                      ('mul + reduce-LP f32', mul_reduce_lp),
                      ('mul + reduce-LP bf16', mul_reduce_lp_bf16)):
        t = timeit(fn, plane, idx, w4, iters=3)
        print(f'{label:<27} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main16():
    """Quad-plane build attribution + variants.

    The build is ~26 ms/layer at b16 vs ~2 ms of pure bandwidth — find
    whether the (B,HW,heads,hd)->(B,heads,HW,hd) transpose or the
    4-slot minor-dim concat is the bad emitter, and try reorderings."""
    shapes = ((100, 168), (50, 84), (25, 42), (13, 21))
    sum_hw = sum(h * w for h, w in shapes)
    b, heads, hd = _B, 8, 32
    value = jax.random.normal(jax.random.PRNGKey(0),
                              (b, sum_hw, heads, hd), jnp.bfloat16)
    jax.block_until_ready(value)

    from demf_tpu.ops import msda as M

    quad_cur = jax.jit(
        lambda v: M._build_quad_plane(v, shapes, jnp.bfloat16))
    t = timeit(quad_cur, value)
    print(f'current build              {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def transpose_only(v):
        outs = []
        start = 0
        for (h, w) in shapes:
            vl = v[:, start:start + h * w]
            outs.append(jnp.transpose(vl, (0, 2, 1, 3)))
            start += h * w
        return outs
    t = timeit(transpose_only, value)
    print(f'  per-level transpose      {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def concat_only(v):
        # shifted-4 concat on an already (B, heads, HW, hd) input
        outs = []
        start = 0
        for (h, w) in shapes:
            vl = jnp.transpose(v[:, start:start + h * w], (0, 2, 1, 3))
            vl = jax.lax.optimization_barrier(vl)
            n = h * w
            vp = jnp.pad(vl, ((0, 0), (0, 0), (0, w + 1), (0, 0)))
            outs.append(jnp.concatenate(
                [vp[:, :, 0:n], vp[:, :, 1:n + 1],
                 vp[:, :, w:n + w], vp[:, :, w + 1:n + w + 1]], axis=-1))
            start += h * w
        return jnp.concatenate(outs, axis=2)
    t = timeit(concat_only, value)
    print(f'  transpose+barrier+concat {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def flat256_transpose(v):
        # transpose as (B, HW, 256) -> (B, 256, HW) 2-D form, then view
        # heads-major: (B, heads, hd, HW) needs hd<->HW swap after; try
        # the big 2-D transpose alone to see if XLA's emitter likes it
        v2 = v.reshape(b, sum_hw, heads * hd)
        return jnp.transpose(v2, (0, 2, 1))
    t = timeit(flat256_transpose, value)
    print(f'  one (HW,256) transpose   {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def quad_then_transpose(v):
        # build the 4-slot concat FIRST in value layout (B, HW, heads,
        # 4hd), then one transpose with a 128-wide minor dim
        outs = []
        start = 0
        for (h, w) in shapes:
            vl = v[:, start:start + h * w]                 # (B,HW,hd8,32)
            n = h * w
            vp = jnp.pad(vl, ((0, 0), (0, w + 1), (0, 0), (0, 0)))
            quad = jnp.concatenate(
                [vp[:, 0:n], vp[:, 1:n + 1],
                 vp[:, w:n + w], vp[:, w + 1:n + w + 1]], axis=-1)
            outs.append(jnp.transpose(quad, (0, 2, 1, 3)))
            start += h * w
        return jnp.concatenate(outs, axis=2)
    t = timeit(quad_then_transpose, value)
    print(f'quad-then-transpose        {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def quad_flat_shift(v):
        # 'flat256 + barrier' probe: just the big 2-D flat transpose with
        # a barrier, to isolate the emitter cost of the (B, HW, 256) ->
        # (B, 256, HW) reshuffle (the fused pad+shift variant it once
        # fed was trimmed after losing)
        vt = jnp.transpose(v.reshape(b, sum_hw, heads * hd), (0, 2, 1))
        vt = jax.lax.optimization_barrier(vt)              # (B, 256, HW)
        return vt
    t = timeit(quad_flat_shift, value)
    print(f'  flat256 + barrier        {t * 1e3:8.1f} ms', flush=True)


def main17():
    """Quad build via MXU copy-matmuls: shifted flat (B, HW, 256) views
    contracted with 0/1 selector matrices that place head channels into
    slot blocks — no pre-transpose, no 32-wide minor concat."""
    shapes = ((100, 168), (50, 84), (25, 42), (13, 21))
    sum_hw = sum(h * w for h, w in shapes)
    b, heads, hd = _B, 8, 32
    value = jax.random.normal(jax.random.PRNGKey(0),
                              (b, sum_hw, heads, hd), jnp.bfloat16)
    jax.block_until_ready(value)

    from demf_tpu.ops import msda as M
    quad_cur = jax.jit(
        lambda v: M._build_quad_plane(v, shapes, jnp.bfloat16))
    t = timeit(quad_cur, value)
    print(f'current build              {t * 1e3:8.1f} ms', flush=True)

    def selector_big():
        # E_s (4, 256, 1024): E_s[s, h*hd+j, h*128 + s*hd + j] = 1
        e = np.zeros((4, heads * hd, heads * 4 * hd), np.float32)
        for s in range(4):
            for h_ in range(heads):
                for j in range(hd):
                    e[s, h_ * hd + j, h_ * 4 * hd + s * hd + j] = 1.0
        return jnp.asarray(e, jnp.bfloat16)

    E_big = selector_big()

    @jax.jit
    def mxu_big(v):
        planes = []
        start = 0
        for (h, w) in shapes:
            n = h * w
            vl = v.reshape(b, sum_hw, heads * hd)[:, start:start + n]
            vp = jnp.pad(vl, ((0, 0), (0, w + 1), (0, 0)))
            shifts = jnp.stack(
                [vp[:, 0:n], vp[:, 1:n + 1],
                 vp[:, w:n + w], vp[:, w + 1:n + w + 1]])   # (4,B,N,256)
            quad = jax.lax.dot_general(
                shifts, E_big, (((0, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.bfloat16)        # (B,N,1024)
            quad = jnp.transpose(
                quad.reshape(b, n, heads, 4 * hd), (0, 2, 1, 3))
            planes.append(quad)
            start += n
        return jnp.concatenate(planes, axis=2)
    t = timeit(mxu_big, value)
    print(f'mxu big + transpose        {t * 1e3:8.1f} ms', flush=True)

    @jax.jit
    def mxu_perhead(v):
        planes = []
        start = 0
        for (h, w) in shapes:
            n = h * w
            vl = v.reshape(b, sum_hw, heads * hd)[:, start:start + n]
            vp = jnp.pad(vl, ((0, 0), (0, w + 1), (0, 0)))
            shifts = jnp.stack(
                [vp[:, 0:n], vp[:, 1:n + 1],
                 vp[:, w:n + w], vp[:, w + 1:n + w + 1]])   # (4,B,N,256)
            per_head = []
            for h_ in range(heads):
                eh = E_big[:, :, h_ * 4 * hd:(h_ + 1) * 4 * hd]
                q_h = jax.lax.dot_general(
                    shifts, eh, (((0, 3), (0, 1)), ((), ())),
                    preferred_element_type=jnp.bfloat16)    # (B,N,128)
                per_head.append(q_h)
            planes.append(jnp.stack(per_head, axis=1))      # (B,h,N,128)
            start += n
        return jnp.concatenate(planes, axis=2)
    t = timeit(mxu_perhead, value)
    print(f'mxu per-head stack         {t * 1e3:8.1f} ms', flush=True)

    # exactness check vs current (away from level seams the flat-shift
    # semantics match)
    a = np.asarray(quad_cur(value), np.float32)
    for label, fn in (('big', mxu_big), ('perhead', mxu_perhead)):
        c = np.asarray(fn(value), np.float32)
        # compare on level-0 interior rows (y <= h-2 guaranteed rows)
        n0 = shapes[0][0] * shapes[0][1] - shapes[0][1] - 1
        err = np.abs(a[:, :, :n0] - c[:, :, :n0]).max()
        print(f'  max|diff| vs current ({label}): {err}', flush=True)


LEVELS = ((100, 168), (50, 84), (25, 42), (13, 21))
LSIZES = tuple(h * w for h, w in LEVELS)
LSTARTS = tuple(np.cumsum((0,) + LSIZES)[:4].tolist())
SL = Q * NPTS      # per-level sample count (lp-major chunk length)


def make_structured_inputs(seed=0):
    """Inputs whose indices respect the lp-major level layout: chunk l of
    the sample axis targets rows [start_l, start_l + N_l)."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    plane = jax.random.normal(ks[0], (BH, N, C), jnp.bfloat16)
    parts = [jax.random.randint(ks[1 + l], (BH, SL), LSTARTS[l],
                                LSTARTS[l] + LSIZES[l], jnp.int32)
             for l in range(NLV)]
    idx = jnp.concatenate(parts, axis=1)
    w4 = jax.random.uniform(ks[6], (BH, S, 4), jnp.bfloat16)
    g = jax.random.normal(ks[7], (BH, Q, HD), jnp.float32)
    jax.block_until_ready((plane, idx, w4, g))
    return plane, idx, w4, g


def _make_upd(w, g_s):
    gslot = jnp.tile(g_s.astype(jnp.bfloat16), (1, 4))
    wfull3 = jnp.repeat(w.reshape(NLV * NPTS, Q, 4), HD, axis=-1)
    return (wfull3 * gslot[None]).reshape(S, C)


def main13():
    """d_value scatter with LEVEL-STRUCTURED indices: fused vs per-level
    split planes vs coarse-levels-as-one-hot-matmul hybrid."""
    plane, idx, w4, g = make_structured_inputs()

    @jax.jit
    def fused(plane, idx, w4, g):
        def body(_, xs):
            p, i, w, g_s = xs
            upd = jax.lax.optimization_barrier(_make_upd(w, g_s))
            d = jnp.zeros(p.shape, jnp.float32).at[i].add(upd)
            return None, d.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    @jax.jit
    def split_levels(plane, idx, w4, g):
        def body(_, xs):
            p, i, w, g_s = xs
            upd = jax.lax.optimization_barrier(_make_upd(w, g_s))
            outs = []
            for l in range(NLV):
                il = i[l * SL:(l + 1) * SL] - LSTARTS[l]
                ul = upd[l * SL:(l + 1) * SL]
                outs.append(jnp.zeros((LSIZES[l], C), jnp.float32)
                            .at[il].add(ul))
            d = jnp.concatenate(outs, axis=0)
            return None, d.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
        return out

    def hybrid(n_matmul_levels):
        # coarse levels become one-hot MXU matmuls; fine levels scatter
        @jax.jit
        def fn(plane, idx, w4, g):
            def body(_, xs):
                p, i, w, g_s = xs
                upd = jax.lax.optimization_barrier(_make_upd(w, g_s))
                outs = []
                for l in range(NLV):
                    il = i[l * SL:(l + 1) * SL] - LSTARTS[l]
                    ul = upd[l * SL:(l + 1) * SL]
                    if l >= NLV - n_matmul_levels:
                        oh = (il[:, None] == jnp.arange(LSIZES[l],
                                                        dtype=jnp.int32)
                              ).astype(jnp.bfloat16)       # (SL, N_l)
                        d = jax.lax.dot_general(
                            oh, ul, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        d = jnp.zeros((LSIZES[l], C), jnp.float32) \
                            .at[il].add(ul)
                    outs.append(d)
                d = jnp.concatenate(outs, axis=0)
                return None, d.astype(jnp.bfloat16)
            _, out = jax.lax.scan(body, None, (plane, idx, w4, g))
            return out
        return fn

    rows = BH * S
    for label, fn in (('fused scatter (current)', fused),
                      ('per-level split planes', split_levels),
                      ('split + matmul lvl 3', hybrid(1)),
                      ('split + matmul lvl 2-3', hybrid(2)),
                      ('split + matmul lvl 1-3', hybrid(3)),
                      ('all-matmul lvl 0-3', hybrid(4))):
        t = timeit(fn, plane, idx, w4, g, iters=3)
        print(f'{label:<27} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main14():
    """Forward gather with level-structured indices: fused vs per-level
    split planes vs coarse-levels-as-one-hot-matmul."""
    plane, idx, w4, _ = make_structured_inputs()
    LP = NLV * NPTS

    def weighted_fold(rows, w):
        wfull = jnp.repeat(w, HD, axis=-1)
        weighted = (rows * wfull).reshape(LP, Q, C)
        fold = jnp.tile(fold_matrix(4, HD, jnp.bfloat16)[None],
                        (LP, 1, 1))
        return jax.lax.dot_general(
            weighted, fold, (((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def fused(plane, idx, w4):
        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i])
            return None, weighted_fold(rows, w)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    @jax.jit
    def split_levels(plane, idx, w4):
        def body(_, xs):
            p, i, w = xs
            parts = []
            for l in range(NLV):
                pl_ = p[LSTARTS[l]:LSTARTS[l] + LSIZES[l]]
                il = i[l * SL:(l + 1) * SL] - LSTARTS[l]
                parts.append(jax.lax.optimization_barrier(pl_[il]))
            rows = jnp.concatenate(parts, axis=0)
            return None, weighted_fold(rows, w)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    def hybrid(n_matmul_levels):
        @jax.jit
        def fn(plane, idx, w4):
            def body(_, xs):
                p, i, w = xs
                parts = []
                for l in range(NLV):
                    pl_ = p[LSTARTS[l]:LSTARTS[l] + LSIZES[l]]
                    il = i[l * SL:(l + 1) * SL] - LSTARTS[l]
                    if l >= NLV - n_matmul_levels:
                        oh = (il[:, None] == jnp.arange(
                            LSIZES[l], dtype=jnp.int32)
                        ).astype(jnp.bfloat16)              # (SL, N_l)
                        rows = jax.lax.dot_general(
                            oh, pl_, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.bfloat16)
                    else:
                        rows = jax.lax.optimization_barrier(pl_[il])
                    parts.append(rows)
                rows = jnp.concatenate(parts, axis=0)
                return None, weighted_fold(rows, w)
            _, out = jax.lax.scan(body, None, (plane, idx, w4))
            return out
        return fn

    rows = BH * S
    for label, fn in (('fused gather (current)', fused),
                      ('per-level split planes', split_levels),
                      ('split + matmul lvl 2-3', hybrid(2)),
                      ('split + matmul lvl 1-3', hybrid(3))):
        t = timeit(fn, plane, idx, w4, iters=3)
        print(f'{label:<27} {t * 1e3:8.1f} ms  '
              f'{rows / t / 1e6:7.1f} M rows/s', flush=True)


def main18():
    """Forward core, round 4: kill the weighting stage's traffic above
    the gather floor (scan core ~146 ms vs gather-only ~88 ms at b16).

    Hypothesis: the repeat(w4, HD) + astype(f32) in the mul+reduce form
    materializes extra (S, C)-sized temporaries.  The slot-slice form
    reads rows' lane groups [s*hd:(s+1)*hd] directly, multiplies by a
    Q-minor per-slot weight (no repeat, no fold matmul — the fold IS the
    slot loop), and reduces over LP in one fusion; the Pallas variant
    does the same with an explicit VMEM accumulator."""
    LP = NLV * NPTS
    plane, idx, w4 = make_inputs()
    # Q-minor slot-major weights (what _geometry emits before the final
    # stack-to-(S,4); using this layout in the op would also skip that
    # transpose)
    w4t_f32 = jnp.transpose(w4.reshape(BH, LP, Q, 4),
                            (0, 1, 3, 2)).astype(jnp.float32)
    w4t_bf16 = w4t_f32.astype(jnp.bfloat16)
    jax.block_until_ready((w4t_f32, w4t_bf16))

    @jax.jit
    def gather_only(plane, idx, w4):
        def body(_, xs):
            p, i, _w = xs
            rows = jax.lax.optimization_barrier(p[i])
            return None, jnp.sum(rows.astype(jnp.float32), axis=0)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    @jax.jit
    def mul_reduce_lp(plane, idx, w4):
        fold = fold_matrix(4, HD, jnp.bfloat16)

        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i]).reshape(LP, Q, C)
            wfull = jnp.repeat(w.reshape(LP, Q, 4), HD, axis=-1)
            part = jnp.sum((rows * wfull).astype(jnp.float32), axis=0)
            out = jax.lax.dot_general(
                part.astype(jnp.bfloat16), fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    def make_slot_slice(wdt):
        @jax.jit
        def slot_slice(plane, idx, w4t):
            def body(_, xs):
                p, i, w = xs                     # w (LP, 4, Q)
                rows = jax.lax.optimization_barrier(
                    p[i]).reshape(LP, Q, C)
                acc = None
                for s in range(4):
                    term = (rows[:, :, s * HD:(s + 1) * HD]
                            .astype(jnp.float32) *
                            w[:, s, :, None].astype(jnp.float32))
                    acc = term if acc is None else acc + term
                out = jnp.sum(acc, axis=0)       # (Q, HD) f32
                return None, out.astype(jnp.bfloat16)
            _, out = jax.lax.scan(body, None, (plane, idx, w4t))
            return out
        return slot_slice

    def pallas_fold():
        from jax.experimental import pallas as pl
        QT = 512
        nq = Q // QT

        def kern(rows_ref, w_ref, out_ref):
            lp = pl.program_id(1)
            r = rows_ref[0]                      # (QT, C) bf16
            w = w_ref[0]                         # (4, QT) f32
            acc = None
            for s in range(4):
                term = (r[:, s * HD:(s + 1) * HD].astype(jnp.float32) *
                        w[s, :][:, None])
                acc = term if acc is None else acc + term

            @pl.when(lp == 0)
            def _init():
                out_ref[...] = acc

            @pl.when(lp > 0)
            def _acc():
                out_ref[...] += acc

        fold1 = pl.pallas_call(
            kern,
            grid=(nq, LP),
            in_specs=[
                pl.BlockSpec((1, QT, C), lambda qi, lp: (lp, qi, 0)),
                pl.BlockSpec((1, 4, QT), lambda qi, lp: (lp, 0, qi)),
            ],
            out_specs=pl.BlockSpec((QT, HD), lambda qi, lp: (qi, 0)),
            out_shape=jax.ShapeDtypeStruct((Q, HD), jnp.float32),
        )

        @jax.jit
        def pallas_form(plane, idx, w4t):
            def body(_, xs):
                p, i, w = xs
                rows = jax.lax.optimization_barrier(
                    p[i]).reshape(LP, Q, C)
                return None, fold1(rows, w).astype(jnp.bfloat16)
            _, out = jax.lax.scan(body, None, (plane, idx, w4t))
            return out
        return pallas_form

    rows_n = BH * S
    cases = [('gather-only floor', gather_only, w4),
             ('mul+reduce (current)', mul_reduce_lp, w4),
             ('slot-slice f32 w4t', make_slot_slice('f32'), w4t_f32),
             ('slot-slice bf16 w4t', make_slot_slice('bf16'), w4t_bf16)]
    try:
        cases.append(('pallas fold f32 w4t', pallas_fold(), w4t_f32))
    except Exception as e:
        print(f'pallas variant skipped: {type(e).__name__}: {e}',
              flush=True)
    ref = None
    for label, fn, w_in in cases:
        try:
            t = timeit(fn, plane, idx, w_in, iters=3)
        except Exception as e:
            print(f'{label:<27} FAILED: {type(e).__name__}: '
                  f'{str(e)[:120]}', flush=True)
            continue
        print(f'{label:<27} {t * 1e3:8.1f} ms  '
              f'{rows_n / t / 1e6:7.1f} M rows/s', flush=True)
        if label.startswith('mul+reduce'):
            ref = fn(plane, idx, w_in)
        elif ref is not None and not label.startswith('gather'):
            got = fn(plane, idx, w_in)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f'  max|diff| vs current: {err:.2e}', flush=True)


def main19():
    """Forward core, round 4b: query-chunked nested scan.

    The mul+reduce pass above the gather floor costs ~54 ms (main18):
    the per-slice rows buffer is S*256B = 92 MB, so the weighting
    re-reads it from HBM.  Chunking Q into QC-query blocks makes the
    per-chunk rows buffer LP*QC*256B (4-8 MB) — small enough that the
    gather output stays VMEM-resident into the weighting consumer.
    Outer scan over (b, h) slices keeps the 5.7 MB plane resident;
    inner scan walks the chunks."""
    LP = NLV * NPTS
    plane, idx, w4 = make_inputs()
    rows_n = BH * S
    fold = fold_matrix(4, HD, jnp.bfloat16)

    @jax.jit
    def current(plane, idx, w4):
        def body(_, xs):
            p, i, w = xs
            rows = jax.lax.optimization_barrier(p[i]).reshape(LP, Q, C)
            wfull = jnp.repeat(w.reshape(LP, Q, 4), HD, axis=-1)
            part = jnp.sum((rows * wfull).astype(jnp.float32), axis=0)
            out = jax.lax.dot_general(
                part.astype(jnp.bfloat16), fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, out.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, (plane, idx, w4))
        return out

    def chunk_inputs(qc):
        nq = Q // qc
        # lp-major (BH, LP*Q) -> chunk-major (BH, NQ, LP*QC); in the
        # real op _geometry can emit this layout directly (Q is already
        # the minor axis there)
        ic = jnp.transpose(idx.reshape(BH, LP, nq, qc), (0, 2, 1, 3))
        ic = ic.reshape(BH, nq, LP * qc)
        wc = jnp.transpose(w4.reshape(BH, LP, nq, qc, 4), (0, 2, 1, 3, 4))
        wc = wc.reshape(BH, nq, LP * qc, 4)
        jax.block_until_ready((ic, wc))
        return ic, wc

    def make_chunked(qc, barrier=True):
        nq = Q // qc

        @jax.jit
        def chunked(plane, ic, wc):
            def outer(_, xs):
                p, i_s, w_s = xs                  # (NQ, LP*QC[, 4])

                def inner(_, ys):
                    i_c, w_c = ys
                    rows = p[i_c]                 # (LP*QC, C)
                    if barrier:
                        rows = jax.lax.optimization_barrier(rows)
                    rows3 = rows.reshape(LP, qc, C)
                    wfull = jnp.repeat(w_c.reshape(LP, qc, 4), HD,
                                       axis=-1)
                    part = jnp.sum((rows3 * wfull).astype(jnp.float32),
                                   axis=0)
                    out = jax.lax.dot_general(
                        part.astype(jnp.bfloat16), fold,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return None, out.astype(jnp.bfloat16)

                _, o = jax.lax.scan(inner, None, (i_s, w_s))
                return None, o.reshape(nq * qc, HD)
            _, out = jax.lax.scan(outer, None, (plane, ic, wc))
            return out
        return chunked

    t = timeit(current, plane, idx, w4, iters=3)
    print(f'current (unchunked)        {t * 1e3:8.1f} ms  '
          f'{rows_n / t / 1e6:7.1f} M rows/s', flush=True)
    ref = current(plane, idx, w4)

    for qc in (2048, 2816, 5632):
        ic, wc = chunk_inputs(qc)
        for barrier in (True,):
            fn = make_chunked(qc, barrier)
            label = f'chunk {qc}{"" if barrier else " nobar"}'
            try:
                t = timeit(fn, plane, ic, wc, iters=3)
            except Exception as e:
                print(f'{label:<27}FAILED: {type(e).__name__}: '
                      f'{str(e)[:100]}', flush=True)
                continue
            got = fn(plane, ic, wc)
            nq = Q // qc
            gotr = got.reshape(BH, nq, qc, HD)
            refr = ref.reshape(BH, nq, qc, HD)
            err = float(jnp.max(jnp.abs(
                gotr.astype(jnp.float32) - refr.astype(jnp.float32))))
            print(f'{label:<27}{t * 1e3:8.1f} ms  '
                  f'{rows_n / t / 1e6:7.1f} M rows/s  '
                  f'max|diff| {err:.2e}', flush=True)


def main20():
    """Backward d_value, round 4: WIDENED scatter for the fine level.

    The R=128 quad scatter is issue-rate bound (~55 M rows/s; R=32 ran
    ~10 M, so the per-row issue cost dominates, not traffic).  Packing
    k samples' updates into one (k*128)-wide row — sample with target n
    writes channel block n % k of accumulator row n // k — divides the
    row count by k for k x traffic.  Shapes = DETR-pretrain fine level
    at b4: S_l = 4*22528 samples/slice, 32 slices, N = 16800 rows."""
    b4_bh = 32
    sl = 4 * Q                       # fine-level samples per slice
    n_l = 16800
    c = 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    idx = jax.random.randint(ks[0], (b4_bh, sl), 0, n_l, jnp.int32)
    upd = jax.random.normal(ks[1], (b4_bh, sl, c), jnp.bfloat16)
    jax.block_until_ready((idx, upd))
    rows_n = b4_bh * sl

    def make_scatter(k):
        npad = -(-n_l // k) * k

        @jax.jit
        def scat(idx, upd):
            def body(_, xs):
                i, u = xs
                if k == 1:
                    d = jnp.zeros((npad, c), jnp.float32).at[i].add(
                        u.astype(jnp.float32))
                    return None, d
                blk = i % k                      # (SL,)
                row = i // k
                # place u into channel block blk of a (SL, k*c) row
                sel = (jnp.arange(k, dtype=jnp.int32)[None, :]
                       == blk[:, None])          # (SL, k)
                uw = (sel[:, :, None].astype(upd.dtype)
                      * u[:, None, :]).reshape(sl, k * c)
                uw = jax.lax.optimization_barrier(uw)
                d = jnp.zeros((npad // k, k * c), jnp.float32).at[row].add(
                    uw.astype(jnp.float32))
                return None, d.reshape(npad, c)
            _, out = jax.lax.scan(body, None, (idx, upd))
            return out
        return scat

    ref = None
    for k in (1, 2, 4, 8):
        fn = make_scatter(k)
        t = timeit(fn, idx, upd, iters=3)
        got = fn(idx, upd)
        if ref is None:
            ref = got
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(got[:, :n_l] - ref[:, :n_l])))
        print(f'scatter R={k * c:<5} {t * 1e3:8.1f} ms  '
              f'{rows_n / k / t / 1e6:7.1f} M rows/s  '
              f'max|diff| {err:.2e}', flush=True)


def main21():
    """Backward d_value, round 5: SORTED-BANDED one-hot accumulation.

    Per (slice, chunk): sort the 11264 fine-level sample indices, gather
    the update rows into sorted order (fast VMEM gather), then for each
    group of g consecutive sorted samples run a width-W banded one-hot
    matmul (targets rel to the group's first index) and add the (W, 128)
    partial into the accumulator at a dynamic offset.  Out-of-band
    samples (group span > W — rare for real encoder geometry) fall back
    to an exact masked scatter under lax.cond.  Shapes = DETR-pretrain
    fine level at b4: 32 slices x 8 chunks x 11264 samples, N = 16800.
    Clustered indices model raster-chunk locality (the first 6 chunks of
    a slice are fine-level queries in raster order; the last 2 hold the
    coarse-level queries whose fine samples spread over the whole map).
    """
    n_slices, n_chunks, sl_c = 32, 8, 11264
    n_l = 16800
    c = 128
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    # clustered: chunk j of the first 6 covers rows [j*2816/16800 * n_l]
    centers = (np.arange(n_chunks) * 2816 + 1408).clip(0, n_l)
    base = np.broadcast_to(centers[None, :, None],
                           (n_slices, n_chunks, sl_c)).astype(np.int32)
    jitter = np.asarray(jax.random.randint(
        ks[0], (n_slices, n_chunks, sl_c), -400, 400, jnp.int32))
    idx_cl = np.clip(base + jitter, 0, n_l - 1)
    # coarse-query chunks (last 2): uniform over the whole fine level
    uni = np.asarray(jax.random.randint(
        ks[1], (n_slices, 2, sl_c), 0, n_l, jnp.int32))
    idx_cl[:, 6:] = uni
    idx_cl = jnp.asarray(idx_cl)
    idx_uni = jax.random.randint(
        ks[2], (n_slices, n_chunks, sl_c), 0, n_l, jnp.int32)
    upd = jax.random.normal(ks[3], (n_slices, n_chunks, sl_c, c),
                            jnp.bfloat16)
    jax.block_until_ready((idx_cl, idx_uni, upd))
    rows_n = n_slices * n_chunks * sl_c

    @jax.jit
    def scatter_base(idx, upd):
        def outer(_, xs):
            i_s, u_s = xs

            def inner(acc, ys):
                i, u = ys
                return acc.at[i].add(u.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(
                inner, jnp.zeros((n_l, c), jnp.float32), (i_s, u_s))
            return None, acc
        _, out = jax.lax.scan(outer, None, (idx, upd))
        return out

    def make_banded(g, w):
        ng = sl_c // g
        n_pad = n_l + w      # headroom so every dynamic band fits

        @jax.jit
        def banded(idx, upd):
            def outer(_, xs):
                i_s, u_s = xs

                def inner(acc, ys):
                    i, u = ys                      # (SL,), (SL, c)
                    si, perm = jax.lax.sort_key_val(
                        i, jnp.arange(sl_c, dtype=jnp.int32))
                    us = jax.lax.optimization_barrier(u[perm])
                    los = si[::g]                  # (ng,) group starts
                    rel = si.reshape(ng, g) - los[:, None]
                    inband = rel < w
                    oh = ((rel[:, :, None] ==
                           jnp.arange(w, dtype=jnp.int32)[None, None])
                          .astype(u.dtype))        # (ng, g, w)
                    parts = jax.lax.dot_general(
                        oh, us.reshape(ng, g, c),
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # (ng, w, c)

                    def grp(a, zs):
                        lo, p = zs
                        cur = jax.lax.dynamic_slice(a, (lo, 0), (w, c))
                        return jax.lax.dynamic_update_slice(
                            a, cur + p, (lo, 0)), None

                    acc2, _ = jax.lax.scan(grp, acc, (los, parts))
                    ovf = jnp.any(~inband)

                    def fb(a):
                        um = jnp.where(inband.reshape(sl_c, 1), 0.0,
                                       us.astype(jnp.float32))
                        return a.at[si].add(um)

                    acc2 = jax.lax.cond(ovf, fb, lambda a: a, acc2)
                    return acc2, None

                acc, _ = jax.lax.scan(
                    inner, jnp.zeros((n_pad, c), jnp.float32), (i_s, u_s))
                return None, acc[:n_l]
            _, out = jax.lax.scan(outer, None, (idx, upd))
            return out
        return banded

    ref_cl = scatter_base(idx_cl, upd)
    ref_uni = scatter_base(idx_uni, upd)
    t = timeit(scatter_base, idx_cl, upd, iters=3)
    print(f'scatter baseline            {t * 1e3:8.1f} ms  '
          f'{rows_n / t / 1e6:7.1f} M rows/s', flush=True)
    for g, w in ((512, 512), (1024, 1024), (1024, 512), (2816, 1024)):
        fn = make_banded(g, w)
        for label, idx, ref in (('clustered', idx_cl, ref_cl),
                                ('uniform  ', idx_uni, ref_uni)):
            try:
                t = timeit(fn, idx, upd, iters=3)
            except Exception as e:
                print(f'banded g={g} W={w} {label}  FAILED: '
                      f'{type(e).__name__}: {str(e)[:80]}', flush=True)
                break
            got = fn(idx, upd)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f'banded g={g:<5}W={w:<5}{label} {t * 1e3:8.1f} ms  '
                  f'{rows_n / t / 1e6:7.1f} M rows/s  max|diff| {err:.2e}',
                  flush=True)


if __name__ == '__main__':
    if '--v21' in sys.argv:
        main21()
    elif '--v20' in sys.argv:
        main20()
    elif '--v19' in sys.argv:
        main19()
    elif '--v18' in sys.argv:
        main18()
    elif '--v17' in sys.argv:
        main17()
    elif '--v16' in sys.argv:
        main16()
    elif '--v15' in sys.argv:
        main15()
    elif '--v14' in sys.argv:
        main14()
    elif '--v13' in sys.argv:
        main13()
    elif '--v12' in sys.argv:
        main12()
    elif '--v11' in sys.argv:
        main11()
    elif '--v10' in sys.argv:
        main10()
    elif '--v9' in sys.argv:
        main9()
    elif '--v8' in sys.argv:
        main8()
    elif '--v7' in sys.argv:
        main7()
    elif '--v6' in sys.argv:
        main6()
    elif '--v5' in sys.argv:
        main5()
    elif '--v4' in sys.argv:
        main4()
    elif '--v3' in sys.argv:
        main3()
    elif '--v2' in sys.argv:
        main2()
    else:
        main()
