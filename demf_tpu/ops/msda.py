"""Multi-scale deformable attention sampling core (quad-fused, custom VJP).

TPU-native replacement for the mmcv CUDA kernel
``MultiScaleDeformableAttnFunction`` (N6 in SURVEY.md §2b; reference
invocation demf/modeling/layers/transformer.py:9, used by the 6-layer image
encoder and the DeMF decoder cross-attention).  The math matches
``multi_scale_deformable_attn_pytorch`` / the CUDA kernel exactly:
grid_sample-style bilinear reads (align_corners=False, zero padding) at
learned per-head/level/point offsets, reduced with attention weights.

Design (v5e-measured, rounds 2-3):
  * TPU gathers from a large flat HBM operand are COUNT-bound at ~64-89M
    rows/s for any row size in [64, 256] elements (and 2x slower at 32).
    The round-1 formulation issued 4 corner gathers of hd=32 rows per
    sample; here each level is pre-packed into a QUAD layout where row
    (y, x) holds the whole 2x2 neighbourhood [v(y,x), v(y,x+1),
    v(y+1,x), v(y+1,x+1)] (4*hd = 128 channels), so ONE gather per
    sample fetches all four corners (~4x), and all levels ride a single
    fused gather into the level-concatenated quad plane.
  * The gather runs as a ``lax.scan`` over the fused (batch, head) axis:
    each step gathers one slice's samples from that slice's ~5.7 MB
    plane, which XLA keeps VMEM-resident and serves with its vector
    dynamic-load path at ~360 M rows/s -- 4.1x the flat big-operand form
    (tools/bench_gather_variants.py; random vs sorted indices measured
    identical, so this is an operand-residency effect, not locality).
    Pallas per-row alternatives (aligned-block select, stage-and-select
    via one-hot MXU compaction) both measured ~50 M rows/s -- Mosaic
    exposes no vector dynamic-load, so XLA's emitter wins
    (tools/bench_gather_kernel.py).
  * Zero-padding semantics fall out of the weight algebra: the quad base
    is clamped to the grid, per-slot weights are
    relu(1-|x-px|) * relu(1-|y-py|) which vanish for any slot pixel more
    than 1 away, and out-of-range neighbours are zero rows in the quad
    plane -- no masks needed, exact for every clamp/edge case.
  * (levels*points*slots*hd) -> hd reductions run as tiny MXU matmuls
    with a static fold matrix instead of (..., 4, 32)-shaped reshapes,
    whose (8, 128) tile padding caused a 4x memory blowup (round-1
    backward OOM'd at encoder scale because of exactly this).
  * custom VJP: backward re-gathers the quad rows (cheaper than saving
    ~GBs of forward rows), computes d_attn / d_locations from per-slot
    dot products, and accumulates d_value with ONE quad-layout
    scatter-add per sample (R=128 scatter measured ~55M rows/s vs ~10M
    at R=32) followed by a cheap shift-fold back to the pixel grid.
  * encoder-scale forwards walk queries in ~2816-query chunks inside
    the per-slice scan: the per-chunk rows buffer (~11 MB) stays
    VMEM-resident into the weighting consumer instead of round-tripping
    the full (S, 4hd) 92 MB slice buffer through HBM (scan core
    146 -> 105 ms/layer at b16, bit-exact; bench --v19).

Measured (v5e-1, batch 16, reference encoder shapes, 8 heads x 4 levels
x 4 points): forward 2.9 s -> ~0.9 s; backward OOM -> ~1.7 s.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# slot order (dy, dx): matches quad channel layout slot*hd + j
_SLOTS = ((0, 0), (0, 1), (1, 0), (1, 1))


@functools.lru_cache(maxsize=8)
def _quad_selector_np(heads, hd):
    """(4, heads*hd, heads*4*hd) 0/1 selector: E[s, h*hd+j,
    h*4*hd + s*hd + j] = 1 — contracting shifted flat value views with
    E places head h's channels into slot block s of the quad row.
    Cached as numpy so the constant stays host-resident and
    backend-agnostic; each call site converts it to the requested dtype
    (``_quad_selector``)."""
    import numpy as np
    e = np.zeros((4, heads * hd, heads * 4 * hd), np.float32)
    for s in range(4):
        for h in range(heads):
            for j in range(hd):
                e[s, h * hd + j, h * 4 * hd + s * hd + j] = 1.0
    return e


def _quad_selector(heads, hd, dtype_name):
    return jnp.asarray(_quad_selector_np(heads, hd), jnp.dtype(dtype_name))


def _build_quad_plane(value, spatial_shapes, gather_dtype):
    """Pack all levels into one (B, heads, sum_HW, 4*hd) quad plane.

    quad[b, h, start_l + y*w + x] = concat(v[y, x], v[y, x+1], v[y+1, x],
    v[y+1, x+1]), so a single row gather fetches the full 2x2 bilinear
    neighbourhood.

    Built as FLAT ROW SHIFTS of the raw (B, H*W, heads*hd) level slice
    (x+1 = shift 1, y+1 = shift w) contracted with a 0/1 selector on the
    MXU (``_quad_selector``): the matmul performs the head-transpose AND
    the 4-slot channel placement in one pass, replacing the per-level
    (B,HW,heads,hd)->(B,heads,HW,hd) transpose + 32-wide minor-dim
    concat whose partial-tile writes made the copy form ~26 ms/layer at
    b16 (MXU form: 20 ms; exact — each output channel sums exactly one
    0/1-selected input, tools/bench_msda_layer.py --v16/--v17).
    NOTE: the selector and its contraction scale as heads^2*hd^2
    (4*heads*hd contracting dim per output element) — 2 MB bf16 and a
    net win at the reference's 8x32, but re-benchmark against the
    transpose+concat form before adopting wider head configs.
    Rows whose shift crosses the row boundary (x = w-1) pick up the
    next image row instead of zero — harmless because the sampling
    geometry clamps bx <= w-2 / by <= h-2, so those quad rows are never
    gathered (the tail block y = h-1 reads the zero pad).  Levels
    narrower than 2 pixels fall back to the padded spatial build whose
    out-of-grid slots are exact zeros.
    """
    b, _, heads, hd = value.shape
    sel = _quad_selector(heads, hd, jnp.dtype(gather_dtype).name)
    planes = []
    start = 0
    for (h, w) in spatial_shapes:
        n = h * w
        if h < 2 or w < 2:
            v = value[:, start:start + n].astype(gather_dtype)
            v = jnp.transpose(v, (0, 2, 1, 3))        # (B, heads, HW, hd)
            vs = v.reshape(b, heads, h, w, hd)
            vp = jnp.pad(vs, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            quad = jnp.concatenate(
                [vp[:, :, dy:dy + h, dx:dx + w] for dy, dx in _SLOTS],
                axis=-1).reshape(b, heads, h * w, 4 * hd)
        else:
            vl = value.reshape(value.shape[0], -1, heads * hd)[
                :, start:start + n].astype(gather_dtype)
            vp = jnp.pad(vl, ((0, 0), (0, w + 1), (0, 0)))
            shifts = jnp.stack(
                [vp[:, 0:n], vp[:, 1:n + 1],
                 vp[:, w:n + w], vp[:, w + 1:n + w + 1]])  # (4,B,N,HH)
            quad = jax.lax.dot_general(
                shifts, sel, (((0, 3), (0, 1)), ((), ())),
                preferred_element_type=gather_dtype,
                precision=_precision(gather_dtype))        # (B,N,4HH)
            quad = jnp.transpose(
                quad.reshape(b, n, heads, 4 * hd), (0, 2, 1, 3))
        planes.append(quad)
        start += n
    return jnp.concatenate(planes, axis=2)


def _geometry(spatial_shapes, locs):
    """Vectorized sample geometry in lp-major, Q-minor layout.

    Every intermediate keeps Q (tens of thousands) as the minor dim so
    elementwise geometry runs on unpadded (8, 128)-tileable arrays; the
    query-major layout's minor dims of 4/2 tile-pad 32-64x and cost
    ~78 ms/layer at b16 encoder shapes (tools/bench_msda_layer.py --v4
    vs --v7: 18.7 ms for this form).

    Args:
        locs: (B, Q, heads, L, P, 2) normalized [0, 1] (x, y).
    Returns dict with (B, heads, L, P, Q)-shaped f32 tensors:
        idx (int32 row into the level-concatenated quad plane),
        x, y (pixel coords), bx, by (quad base), and ws (list of 4
        per-slot bilinear weights in _SLOTS order).
    """
    b, q, heads, nlv, npts, _ = locs.shape
    # one fused transpose to Q-minor; barrier forces it to materialize
    # as a copy instead of leaking strided reads into every consumer
    t = jnp.transpose(locs.reshape(b, q, heads * nlv * npts * 2),
                      (0, 2, 1))
    t = jax.lax.optimization_barrier(t).reshape(
        b, heads, nlv, npts, 2, q)
    wvec = jnp.asarray([w for (_, w) in spatial_shapes], jnp.float32)
    hvec = jnp.asarray([h for (h, _) in spatial_shapes], jnp.float32)
    starts = [0]
    for (h, w) in spatial_shapes:
        starts.append(starts[-1] + h * w)
    svec = jnp.asarray(starts[:-1], jnp.float32)
    wm2 = jnp.asarray([max(w - 2, 0) for (_, w) in spatial_shapes],
                      jnp.float32)
    hm2 = jnp.asarray([max(h - 2, 0) for (h, _) in spatial_shapes],
                      jnp.float32)
    lshape = (1, 1, nlv, 1, 1)
    x = t[:, :, :, :, 0] * wvec.reshape(lshape) - 0.5
    y = t[:, :, :, :, 1] * hvec.reshape(lshape) - 0.5
    bx = jnp.clip(jnp.floor(x), 0.0, wm2.reshape(lshape))
    by = jnp.clip(jnp.floor(y), 0.0, hm2.reshape(lshape))
    idx = (svec.reshape(lshape) + by * wvec.reshape(lshape) + bx)
    ws = []
    for dy, dx in _SLOTS:
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (bx + dx)))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (by + dy)))
        ws.append(wx * wy)
    return dict(idx=idx.astype(jnp.int32), x=x, y=y, bx=bx, by=by,
                ws=ws, wvec=wvec, hvec=hvec)


def _aw_lpq(aw):
    """(B, Q, heads, L, P) attention weights -> (B, heads, L, P, Q)."""
    b, q, heads, nlv, npts = aw.shape
    t = jnp.transpose(aw.reshape(b, q, heads * nlv * npts), (0, 2, 1))
    return jax.lax.optimization_barrier(t).reshape(
        b, heads, nlv, npts, q)


def _fold_matrix(n_rep, hd, dtype):
    """(n_rep*hd, hd) block-stacked identity: sums n_rep groups of hd."""
    return jnp.tile(jnp.eye(hd, dtype=dtype), (n_rep, 1))


def _precision(compute_dtype):
    # the fold matrices are 0/1 selectors; on TPU the default matmul
    # precision rounds f32 operands to bf16 on the MXU, which would break
    # oracle-exactness of the f32 path -- force full precision there
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32 else None)


def _slice_forward(plane_s, idx_s, w4_s, q, hd, nlv, npts, compute_dtype):
    """One (b, h) slice: gather all S = L*P*q quad rows + weighted fold.

    plane_s (N, 4hd); idx_s (S,) i32 lp-major ((l, p, q) order); w4_s
    (S, 4) attn*bilinear weights.  Returns (q, hd) f32.  The
    ``plane_s[idx_s]`` gather is the whole point of the
    scan-over-slice formulation (module docstring).
    """
    # optimization_barrier: without it XLA fuses the weighting into the
    # gather consumer and the gather drops off its fast vector-load path
    # (521 -> 126 M rows/s measured, tools/bench_msda_layer.py)
    rows = jax.lax.optimization_barrier(plane_s[idx_s])   # (S, 4hd)
    # fused multiply + reduce over the leading LP axis to a (q, 4hd)
    # partial (ONE pass over the rows buffer; the earlier 2-contract
    # fold materialized a weighted (S, 4hd) copy and re-read it:
    # 151 -> 145 ms/layer at b16, bench --v15), then a tiny slot fold
    rows3 = rows.reshape(nlv * npts, q, 4 * hd).astype(compute_dtype)
    wfull = jnp.repeat(
        w4_s.astype(compute_dtype).reshape(nlv * npts, q, 4), hd,
        axis=-1)
    part = jnp.sum((rows3 * wfull).astype(jnp.float32), axis=0)
    # slot fold on the small (q, 4hd) f32 partial; HIGHEST keeps the 0/1
    # selection exact (the dot is tiny, full precision is free here)
    fold = _fold_matrix(4, hd, jnp.float32)               # (4hd, hd)
    return jax.lax.dot_general(
        part, fold, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (q, hd) f32


def _g4_tile(g_s, q, hd, nlv, npts, dtype):
    """(q, hd) upstream grad -> (S, 4hd) tiled to lp-major samples and
    slots: g4[lp*q + b, slot*hd + j] = g_s[b, j]."""
    return jnp.tile(g_s.astype(dtype), (nlv * npts, 4))


def _acc_rows(n_l):
    """Carry rows for one level's chunked-backward accumulator (padded
    to a _SCATTER_WIDEN_K multiple on widened scatter levels)."""
    if n_l > _ONEHOT_SCATTER_MAX_ROWS and _SCATTER_WIDEN_K > 1:
        return -(-n_l // _SCATTER_WIDEN_K) * _SCATTER_WIDEN_K
    return n_l


# one-hot-matmul threshold for the d_value accumulation: a level with
# N_l rows costs ~2*S_l*N_l*128 MXU FLOPs as a matmul vs ~S_l/1e8 s as a
# scatter; the crossover on v5e sits at N_l ~4k.  At reference encoder
# shapes this routes levels 1-3 (4200/1050/273 rows) onto the MXU and
# keeps only the 16800-row level as a scatter: 117 -> 87 ms/layer at b4
# (tools/bench_msda_layer.py --v13; per-level split WITHOUT the matmul
# is slower than the fused scatter, 132 ms -- the win is the MXU, not
# the split).
_ONEHOT_SCATTER_MAX_ROWS = 4608

# Banded one-hot: in the query-chunked backward a chunk's samples on a
# given level cluster in a contiguous row band (queries walk the
# flattened levels in raster order, and deformable offsets are a few
# pixels), so the one-hot contraction only needs a W-row window at a
# dynamic offset instead of all N_l rows.  Out-of-band chunks (the
# coarse-level queries whose samples spread over the whole map, or
# aggressively trained offsets) detect overflow at runtime and take the
# full-width one-hot under ``lax.cond`` — exact in every case, the band
# is purely a fast path.  W = the smallest multiple of 512 covering
# half the level, capped at 2048 (a wider 2560 band and banding the
# ~1 k-row level both measured slower at stage-1 shapes: the extra
# band-RMW traffic beats the overflow savings).  Levels at or below
# _BANDED_MIN_ROWS keep the plain full one-hot.
_BANDED_MIN_ROWS = 2048


def _band_width(n_l):
    w = -(-(n_l // 2) // 512) * 512
    return min(w, 2048, n_l)

# Widened scatter for the remaining (fine) scatter levels: pack k
# samples' updates into one (k*4hd)-wide accumulator row (target row n
# -> row n//k, channel block n%k), dividing the issue-rate-bound
# scatter row count by k for k x traffic + a one-hot block-select on
# the VPU.  0/1 = off; tuned via tools/bench_msda_layer.py --v20
# (measured: k=2 is 1.5x SLOWER than the plain scatter — the one-hot
# block-select producer outweighs the halved row count; kept as an
# env-gated probe only).
_SCATTER_WIDEN_K = int(os.environ.get('DEMF_TPU_MSDA_WIDEN_K', '0') or 0)

# Residual-saving threshold for the chunked backward: when the total
# sample count B*heads*L*P*Q is at most this, the forward SAVES the
# packed quad plane + the chunk-layout gather inputs (idx / bilinear
# weights / attention weights / pixel coords) instead of recomputing
# them in the backward.  The recompute is ~14 ms/layer of pure layout
# work (plane repack, Q-minor geometry transposes, chunk reshapes) at
# stage-1 DETR-pretrain shapes (b4: 11.5 M samples -> ~550 MB/layer of
# residuals, 3.3 GB for the 6-layer encoder — fine in 16 GB HBM), but
# at the b16 uncached-DeMF shapes (46 M samples) the residuals would be
# ~13 GB, so large calls keep the rematerializing backward.
_SAVE_RESIDUALS_MAX_SAMPLES = int(os.environ.get(
    'DEMF_TPU_MSDA_SAVE_RES_MAX', str(24_000_000)))


def _slice_backward(plane_s, idx_s, w4geo_s, aw_s, g_s, q, hd, nlv, npts,
                    compute_dtype, level_sizes, accs=None):
    """Backward for one (b, h) slice (or one query chunk of one).

    w4geo_s: (S, 4) bilinear slot weights (geometry only, no attn).
    aw_s: (S,) attention weights.  g_s: (q, hd) f32 upstream grad.
    level_sizes: static per-level row counts (sum = N); the sample axis
    is lp-major so level l's samples are the contiguous chunk
    [l*npts*q, (l+1)*npts*q).
    accs: optional tuple of per-level (N_l, 4hd) f32 accumulators (the
    query-chunked scan carry); when given, returns the UPDATED tuple in
    place of the concatenated plane — scatter levels add in place on
    the carry instead of materializing a fresh dense plane per chunk.
    Returns (dplane_s (N, 4hd) f32 | accs tuple, d_aw (S,), D (S, 4)).

    The upstream grad enters BOTH branches (per-slot dots and the
    scatter update) as a small (q, 4*hd) slot-tile broadcast along the
    leading LP axis of (LP, q, 4*hd)-shaped temporaries — NOT as a
    materialized (S, 4*hd) tile.  With a constant cotangent (a plain
    ``sum`` loss) XLA folds these terms away entirely, which is why
    sum-loss microbenches under-measure this backward (bench
    --v9 docstring).
    """
    lp = nlv * npts
    # barrier: same gather fast-path protection as _slice_forward
    rows = jax.lax.optimization_barrier(plane_s[idx_s])   # (S, 4hd)
    rows3 = rows.reshape(lp, q, 4 * hd)
    gslot = jnp.tile(g_s.astype(compute_dtype), (1, 4))   # (q, 4hd)
    slotpick = jnp.repeat(jnp.eye(4, dtype=compute_dtype), hd, axis=0)
    # per-slot dots D[s, slot] = <g, rows_slot>: fold hd groups on the
    # MXU (batched (LP, q, 4hd) x (4hd, 4) matmul) to avoid
    # (..., 4, hd) tile-padded temporaries
    D = jax.lax.dot_general(
        rows3.astype(compute_dtype) * gslot[None], slotpick,
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(compute_dtype))              # (LP, q, 4)
    D = D.reshape(q * lp, 4)                              # (S, 4)
    d_aw = jnp.sum(w4geo_s * D, axis=-1)                  # (S,)
    # d_quad scatter: upd = (attn * wslot) x g, accumulated per slice --
    # the scan-over-slice scatter mirrors the gather's fast path.  The
    # update STREAM is kept in compute_dtype (bf16 in the default
    # policy): the scatter is traffic-bound and a bf16 stream runs 1.5x
    # faster (639 -> 435 ms/layer standalone, bench_msda_layer --v10)
    # while accumulation stays f32; grads through the value plane are
    # already bf16-quantized by the forward's gather_dtype policy, so
    # this adds no new precision class (f32 oracle mode is unchanged).
    wfull3 = jnp.repeat(
        (w4geo_s * aw_s[:, None]).astype(compute_dtype).reshape(lp, q, 4),
        hd, axis=-1)                                      # (LP, q, 4hd)
    upd = (wfull3 * gslot[None]).reshape(q * lp, 4 * hd)
    # barrier: keep the elementwise update producer out of the scatter
    # fusion (mirror of the gather effect)
    upd = jax.lax.optimization_barrier(upd)
    # per-level d_value accumulation: one-hot MXU matmul for coarse
    # levels, scatter-add for fine ones (see _ONEHOT_SCATTER_MAX_ROWS)
    sl = npts * q
    start = 0
    parts = []
    for lvl, n_l in enumerate(level_sizes):
        il = idx_s[lvl * sl:(lvl + 1) * sl] - start
        ul = upd[lvl * sl:(lvl + 1) * sl]
        if n_l <= _ONEHOT_SCATTER_MAX_ROWS:
            base = (jnp.zeros((n_l, 4 * hd), jnp.float32)
                    if accs is None else accs[lvl])
            bw = _band_width(n_l)
            if n_l > _BANDED_MIN_ROWS and bw < n_l:
                # banded fast path: W-row one-hot at a dynamic offset;
                # overflow (samples outside [lo, lo+W)) falls back to
                # the full-width one-hot under cond — exact either way
                lo = jnp.clip(jnp.min(il), 0, n_l - bw)
                rel = il - lo
                ovf = jnp.any(rel >= bw)

                def _full(a, il=il, ul=ul, n_l=n_l):
                    oh = (il[:, None]
                          == jnp.arange(n_l, dtype=jnp.int32)
                          ).astype(compute_dtype)
                    return a + jax.lax.dot_general(
                        oh, ul, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_precision(compute_dtype))

                def _band(a, rel=rel, lo=lo, ul=ul, bw=bw):
                    oh = (rel[:, None]
                          == jnp.arange(bw, dtype=jnp.int32)
                          ).astype(compute_dtype)
                    band = jax.lax.dot_general(
                        oh, ul, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_precision(compute_dtype))
                    cur = jax.lax.dynamic_slice(
                        a, (lo, 0), (bw, a.shape[1]))
                    return jax.lax.dynamic_update_slice(
                        a, cur + band, (lo, 0))

                d = jax.lax.cond(ovf, _full, _band, base)
                parts.append(d)
                start += n_l
                continue
            oh = (il[:, None] == jnp.arange(n_l, dtype=jnp.int32)
                  ).astype(compute_dtype)                 # (SL, N_l)
            d = jax.lax.dot_general(
                oh, ul, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision(compute_dtype))
            if accs is not None:
                d = accs[lvl] + d
        else:
            k = _SCATTER_WIDEN_K
            if k > 1:
                # (npad//k, k*4hd) is the same row-major layout as
                # (npad, 4hd), so the widened view is a free bitcast of
                # the accumulator
                npad = -(-n_l // k) * k
                base = (jnp.zeros((npad, 4 * hd), jnp.float32)
                        if accs is None else accs[lvl])
                sel = (jnp.arange(k, dtype=jnp.int32)[None, :]
                       == (il % k)[:, None]).astype(ul.dtype)
                uw = (sel[:, :, None] * ul[:, None, :]).reshape(
                    ul.shape[0], k * 4 * hd)
                uw = jax.lax.optimization_barrier(uw)
                d = base.reshape(npad // k, k * 4 * hd).at[il // k].add(
                    uw.astype(jnp.float32)).reshape(npad, 4 * hd)
                if accs is None:
                    d = d[:n_l]
            else:
                base = (jnp.zeros((n_l, 4 * hd), jnp.float32)
                        if accs is None else accs[lvl])
                d = base.at[il].add(ul.astype(jnp.float32))
        parts.append(d)
        start += n_l
    if accs is not None:
        return tuple(parts), d_aw, D
    dplane = jnp.concatenate(parts, axis=0)
    return dplane, d_aw, D


def _loc_grads(geo, D, aw_t):
    """Location gradients from per-slot dots (all slices at once).

    D: (B, h, L, P, Q, 4) per-slot dots; aw_t: (B, h, L, P, Q).
    Returns d_locs (B, Q, h, L, P, 2).
    """
    dW = aw_t.astype(jnp.float32)[..., None] * D
    x, y, bx, by = geo['x'], geo['y'], geo['bx'], geo['by']
    dx_acc = jnp.zeros_like(x)
    dy_acc = jnp.zeros_like(y)
    for si, (dy_, dx_) in enumerate(_SLOTS):
        px = bx + dx_
        py = by + dy_
        ax = jnp.abs(x - px)
        ay = jnp.abs(y - py)
        wx = jnp.maximum(0.0, 1.0 - ax)
        wy = jnp.maximum(0.0, 1.0 - ay)
        gx = jnp.where(ax < 1.0, -jnp.sign(x - px), 0.0) * wy
        gy = jnp.where(ay < 1.0, -jnp.sign(y - py), 0.0) * wx
        dx_acc = dx_acc + dW[..., si] * gx
        dy_acc = dy_acc + dW[..., si] * gy
    # chain: x = loc_x * w_level - 0.5
    nlv = x.shape[2]
    lshape = (1, 1, nlv, 1, 1)
    d_locs = jnp.stack([dx_acc * geo['wvec'].reshape(lshape),
                        dy_acc * geo['hvec'].reshape(lshape)], axis=-1)
    # (B,h,L,P,Q,2) -> (B,Q,h,L,P,2)
    return jnp.transpose(d_locs, (0, 4, 1, 2, 3, 5))


def _bilinear_gather_rows(value_rows, loc_xy, h, w, out_dtype):
    """Bilinear sample with zero padding, align_corners=False.

    Args:
        value_rows: (B, heads, H*W, hd) one level's features, hd-minor so
            each gathered row is contiguous.
        loc_xy: (B, heads, Q, 2) normalized [0, 1] sample locations (x, y).
    Returns:
        (B, heads, Q, hd) in ``out_dtype``.
    """
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0).astype(out_dtype)
    wy1 = (y - y0).astype(out_dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    one = jnp.asarray(1.0, out_dtype)
    for dy, wy in ((0, one - wy1), (1, wy1)):
        for dx, wx in ((0, one - wx1), (1, wx1)):
            xi = x0i + dx
            yi = y0i + dy
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            # narrow rows (hd=32, 64 B): decoder-scale gathers are a
            # few ms total; the batched take_along_axis form stays
            g = jnp.take_along_axis(
                value_rows, idx[..., None].astype(jnp.int32),
                axis=2).astype(out_dtype)
            wgt = (wx * wy * ok.astype(out_dtype))[..., None]
            out = g * wgt if out is None else out + g * wgt
    return out


def _small_q_msda(value, spatial_shapes, locs, aw, gather_dtype):
    """Decoder-scale MSDA: plain per-corner gathers, XLA autodiff.

    At Q << sum_HW the quad repack (~4x plane traffic per call, twice
    with the VJP recompute) costs more than the whole sampling; measured
    on the DeMF stage-2 step the round-1-style corner-gather formulation
    with ordinary autodiff is the fastest variant here.
    """
    b, _, heads, hd = value.shape
    q, npts = locs.shape[1], locs.shape[4]
    out = jnp.zeros((b, heads, q, hd), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w].astype(gather_dtype)
        rows = jnp.transpose(v, (0, 2, 1, 3))             # (B,h,HW,hd)
        loc = jnp.moveaxis(locs[:, :, :, lvl], 2, 1)      # (B,h,Q,P,2)
        loc = loc.reshape(b, heads, q * npts, 2)
        sampled = _bilinear_gather_rows(rows, loc, h, w, gather_dtype)
        sampled = sampled.reshape(b, heads, q, npts, hd)
        awl = jnp.moveaxis(aw[:, :, :, lvl], 2, 1)        # (B,h,Q,P)
        out = out + jnp.sum(
            sampled.astype(jnp.float32) *
            awl[..., None].astype(jnp.float32), axis=3)
        start += h * w
    return jnp.moveaxis(out, 1, 2).reshape(
        b, q, heads * hd).astype(value.dtype)


@functools.lru_cache(maxsize=32)
def _make_small_q_msda(spatial_shapes, gather_dtype_name):
    """Small-q MSDA with a custom VJP whose d_value rides the MXU.

    XLA's autodiff adjoint for the per-corner ``take_along_axis``
    gathers is a 32-element-row scatter-add (the slow ~10 M rows/s
    class).  At decoder scale the one-hot matmul form is tiny —
    2*QP*HW*hd FLOPs per (corner, level) — so the whole d_value
    accumulation runs as batched (B, h) matmuls with the one-hot
    generated on the fly, and d_locations / d_attention come from the
    same re-gathered corner rows via per-corner dots (the decoder
    analogue of the encoder path's ``_slice_backward``).  Matches mmcv
    ``ms_deform_attn_backward`` semantics exactly (zero padding,
    align_corners=False).
    """
    gather_dtype = jnp.dtype(gather_dtype_name)

    def _fwd_impl(value, locs, aw):
        return _small_q_msda(value, spatial_shapes, locs, aw,
                             gather_dtype)

    @jax.custom_vjp
    def fn(value, locs, aw):
        return _fwd_impl(value, locs, aw)

    def fwd_rule(value, locs, aw):
        return _fwd_impl(value, locs, aw), (value, locs, aw)

    def _bwd(res, g):
        value, locs, aw = res
        b, _, heads, hd = value.shape
        q, npts = locs.shape[1], locs.shape[4]
        qp = q * npts
        gh = jnp.moveaxis(
            g.reshape(b, q, heads, hd), 2, 1).astype(jnp.float32)
        # per-sample upstream grad, broadcast over points: (B,h,QP,hd)
        ghp = jnp.broadcast_to(gh[:, :, :, None], (b, heads, q, npts, hd)
                               ).reshape(b, heads, qp, hd)
        d_val_levels = []
        d_aw_levels = []
        d_loc_levels = []
        start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            n_l = h * w
            v = value[:, start:start + n_l].astype(gather_dtype)
            rows = jnp.transpose(v, (0, 2, 1, 3))         # (B,h,HW,hd)
            loc = jnp.moveaxis(locs[:, :, :, lvl], 2, 1).reshape(
                b, heads, qp, 2)
            awl = jnp.moveaxis(aw[:, :, :, lvl], 2, 1).reshape(
                b, heads, qp).astype(jnp.float32)
            x = loc[..., 0].astype(jnp.float32) * w - 0.5
            y = loc[..., 1].astype(jnp.float32) * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            dot_sum = jnp.zeros((b, heads, qp), jnp.float32)
            dx_acc = jnp.zeros((b, heads, qp), jnp.float32)
            dy_acc = jnp.zeros((b, heads, qp), jnp.float32)
            d_rows = jnp.zeros((b, heads, n_l, hd), jnp.float32)
            wx1 = x - x0
            wy1 = y - y0
            for dy in (0, 1):
                wy_ = wy1 if dy else 1.0 - wy1
                gy = 1.0 if dy else -1.0
                for dx in (0, 1):
                    wx_ = wx1 if dx else 1.0 - wx1
                    gx = 1.0 if dx else -1.0
                    xi = x0i + dx
                    yi = y0i + dy
                    ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                          ).astype(jnp.float32)
                    idx = (jnp.clip(yi, 0, h - 1) * w
                           + jnp.clip(xi, 0, w - 1))
                    gcorn = jnp.take_along_axis(
                        rows, idx[..., None], axis=2).astype(jnp.float32)
                    # per-sample <g, corner>: d/d(weight) of this corner
                    dot = jnp.sum(gcorn * ghp, axis=-1) * ok
                    wgt = wx_ * wy_ * ok
                    dot_sum = dot_sum + wgt * dot
                    # location grads (d wgt / d x, d y)
                    dx_acc = dx_acc + awl * dot * gx * wy_
                    dy_acc = dy_acc + awl * dot * gy * wx_
                    # d_value: one-hot matmul over QP (MXU; the
                    # comparison is generated in the fused loop)
                    upd = ((awl * wgt)[..., None] * ghp).astype(
                        gather_dtype)                     # (B,h,QP,hd)
                    oh = (idx[..., None]
                          == jnp.arange(n_l, dtype=jnp.int32)
                          ).astype(gather_dtype)          # (B,h,QP,HW)
                    d_rows = d_rows + jax.lax.dot_general(
                        oh, upd, (((2,), (2,)), ((0, 1), (0, 1))),
                        preferred_element_type=jnp.float32,
                        precision=_precision(gather_dtype))
            d_aw_levels.append(dot_sum.reshape(b, heads, q, npts))
            d_loc_levels.append(jnp.stack(
                [dx_acc * w, dy_acc * h], axis=-1).reshape(
                    b, heads, q, npts, 2))
            d_val_levels.append(jnp.moveaxis(d_rows, 1, 2))
            start += n_l
        d_value = jnp.concatenate(d_val_levels, axis=1).astype(value.dtype)
        # (B,h,Q,P[,2]) per level -> (B,Q,h,L,P[,2])
        d_aw = jnp.stack([jnp.moveaxis(a, 1, 2) for a in d_aw_levels],
                         axis=3).astype(aw.dtype)
        d_locs = jnp.stack([jnp.moveaxis(a, 1, 2) for a in d_loc_levels],
                           axis=3).astype(locs.dtype)
        return d_value, d_locs, d_aw

    fn.defvjp(fwd_rule, _bwd)
    return fn


def _fold_quad_grad(dquad, h, w, hd):
    """(B, heads, HW, 4*hd) quad-layout grad -> (B, heads, HW, hd)."""
    b, heads = dquad.shape[:2]
    dq = dquad.reshape(b, heads, h, w, 4, hd)
    out = dq[:, :, :, :, 0]
    # slot 1 = (0, 1): contribution to pixel (y, x) from row (y, x-1)
    out = out + jnp.pad(dq[:, :, :, :-1, 1], (
        (0, 0), (0, 0), (0, 0), (1, 0), (0, 0)))
    # slot 2 = (1, 0): from row (y-1, x)
    out = out + jnp.pad(dq[:, :, :-1, :, 2], (
        (0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
    # slot 3 = (1, 1): from row (y-1, x-1)
    out = out + jnp.pad(dq[:, :, :-1, :-1, 3], (
        (0, 0), (0, 0), (1, 0), (1, 0), (0, 0)))
    return out.reshape(b, heads, h * w, hd)


@functools.lru_cache(maxsize=32)
def _make_msda(spatial_shapes, gather_dtype_name, query_chunk):
    gather_dtype = jnp.dtype(gather_dtype_name)
    compute_dtype = gather_dtype
    nlv = len(spatial_shapes)

    def _geo_flat(locs):
        """Geometry, reshaped to fused-slice lp-major layout (BH, S, ...)."""
        b, q, heads = locs.shape[:3]
        npts = locs.shape[4]
        s = q * nlv * npts
        geo = _geometry(spatial_shapes, locs)
        idx = geo['idx'].reshape(b * heads, s)
        w4geo = jnp.stack(geo['ws'], axis=-1).reshape(b * heads, s, 4)
        return geo, idx, w4geo

    @jax.custom_vjp
    def msda(value, locs, aw):
        return _fwd(value, locs, aw)[0]

    def _fwd(value, locs, aw):
        b, _, heads, hd = value.shape
        q = locs.shape[1]
        npts = locs.shape[4]
        lp = nlv * npts
        plane = _build_quad_plane(value, spatial_shapes, gather_dtype)
        plane = plane.reshape(b * heads, plane.shape[2], 4 * hd)
        geo = _geometry(spatial_shapes, locs)
        aw_t = _aw_lpq(aw)                                # (B,h,L,P,Q)
        # per-slot weight * attention in the unpadded Q-minor layout,
        # stacked slot-minor only at the very end
        w4 = jnp.stack(
            [(w * aw_t).astype(compute_dtype) for w in geo['ws']],
            axis=-1)                                      # (B,h,L,P,Q,4)

        if q > 2 * query_chunk:
            # Query-chunked nested scan: the per-chunk rows buffer
            # (LP*QC*4hd, ~11 MB at QC=2816) stays VMEM-resident into
            # the weighting consumer instead of round-tripping the full
            # (S, 4hd) 92 MB slice buffer through HBM — scan core
            # 146 -> 105 ms/layer at b16 encoder shapes, bit-exact
            # (tools/bench_msda_layer.py --v19).  Padded queries gather
            # row 0 with weight 0 and are sliced off.
            qc = query_chunk
            nq = -(-q // qc)
            qp = nq * qc

            def chunk_s(a, tail=()):
                a = a.reshape((b, heads, lp, q) + tail)
                a = jnp.pad(a, ((0, 0),) * 3 + ((0, qp - q),)
                            + ((0, 0),) * len(tail))
                a = jnp.transpose(
                    a.reshape((b, heads, lp, nq, qc) + tail),
                    (0, 1, 3, 2, 4) + tuple(
                        5 + i for i in range(len(tail))))
                return a.reshape((b * heads, nq, lp * qc) + tail)

            idxc = chunk_s(geo['idx'])
            w4c = chunk_s(w4, (4,))

            def body(_, xs):
                p_s, idx_s, w4_s = xs

                def inner(_, ys):
                    i_c, w_c = ys
                    o = _slice_forward(p_s, i_c, w_c, qc, hd, nlv,
                                       npts, compute_dtype)
                    return None, o.astype(value.dtype)

                _, o = jax.lax.scan(inner, None, (idx_s, w4_s))
                return None, o.reshape(nq * qc, hd)

            _, outs = jax.lax.scan(body, None, (plane, idxc, w4c))
            out = outs.reshape(b, heads, qp, hd)[:, :, :q]
            if b * heads * lp * q <= _SAVE_RESIDUALS_MAX_SAMPLES:
                # Save the packed plane + the chunk-layout gather inputs
                # so the backward skips the plane repack, the Q-minor
                # geometry transposes and the chunk reshapes (~14
                # ms/layer of pure layout work at stage-1 shapes).  The
                # (0,)-sized leaves carry the public dtypes for the
                # cotangent casts.
                w4geoc = chunk_s(
                    jnp.stack([w.astype(compute_dtype)
                               for w in geo['ws']], axis=-1), (4,))
                awc = chunk_s(aw_t.astype(jnp.float32))
                saved = (plane, idxc, w4geoc, awc,
                         geo['x'], geo['y'],
                         jnp.zeros((0,), value.dtype),
                         jnp.zeros((0,), locs.dtype),
                         jnp.zeros((0,), aw.dtype))
                out = jnp.moveaxis(out, 1, 2).reshape(b, q, heads * hd)
                return out.astype(value.dtype), saved
        else:
            idx = geo['idx'].reshape(b * heads, q * lp)
            w4f = w4.reshape(b * heads, q * lp, 4)

            def body(_, xs):
                p_s, idx_s, w4_s = xs
                o = _slice_forward(p_s, idx_s, w4_s, q, hd, nlv, npts,
                                   compute_dtype)
                return None, o.astype(value.dtype)

            _, outs = jax.lax.scan(body, None, (plane, idx, w4f))
            out = outs.reshape(b, heads, q, hd)
        out = jnp.moveaxis(out, 1, 2).reshape(b, q, heads * hd)
        return out.astype(value.dtype), (value, locs, aw)

    def _grid_consts(jdtype=jnp.float32):
        wvec = jnp.asarray([w for (_, w) in spatial_shapes], jdtype)
        hvec = jnp.asarray([h for (h, _) in spatial_shapes], jdtype)
        wm2 = jnp.asarray([max(w - 2, 0) for (_, w) in spatial_shapes],
                          jdtype)
        hm2 = jnp.asarray([max(h - 2, 0) for (h, _) in spatial_shapes],
                          jdtype)
        return wvec, hvec, wm2, hm2

    def _bwd_saved(res, g):
        """Backward from saved chunk-layout residuals (no recompute)."""
        plane, idxc, w4geoc, awc, x, y, vdt, ldt, adt = res
        b, heads, _, npts, q = x.shape
        hd = plane.shape[2] // 4
        lp = nlv * npts
        qc = query_chunk
        nq = idxc.shape[1]
        qp = nq * qc
        gh = jnp.moveaxis(
            g.reshape(b, q, heads, hd).astype(jnp.float32), 2, 1)
        gh = gh.reshape(b * heads, q, hd)
        ghc = jnp.pad(gh, ((0, 0), (0, qp - q), (0, 0))).reshape(
            b * heads, nq, qc, hd)
        level_sizes = tuple(h * w for (h, w) in spatial_shapes)

        def body(_, xs):
            p_s, idx_s, w4_s, aw_s, g_s = xs
            acc0 = tuple(jnp.zeros((_acc_rows(n_l), 4 * hd), jnp.float32)
                         for n_l in level_sizes)

            def inner(accs, ys):
                i_c, w_c, a_c, g_c = ys
                accs, d_aw_c, D_c = _slice_backward(
                    p_s, i_c, w_c, a_c, g_c, qc, hd, nlv, npts,
                    compute_dtype, level_sizes, accs=accs)
                return accs, (d_aw_c, D_c)

            accs, (d_aw_s, D_s) = jax.lax.scan(
                inner, acc0, (idx_s, w4_s, aw_s, g_s))
            dplane = jnp.concatenate(
                [a[:n_l] for a, n_l in zip(accs, level_sizes)], axis=0)
            return None, (dplane, d_aw_s, D_s)

        _, (dquad, d_aw_f, D_f) = jax.lax.scan(
            body, None, (plane, idxc, w4geoc, awc, ghc))

        def unchunk(a, tail=()):
            a = a.reshape((b, heads, nq, lp, qc) + tail)
            a = jnp.transpose(a, (0, 1, 3, 2, 4) + tuple(
                5 + i for i in range(len(tail))))
            return a.reshape((b, heads, nlv, npts, qp) + tail)[
                :, :, :, :, :q]

        d_aw = jnp.transpose(unchunk(d_aw_f), (0, 4, 1, 2, 3))
        D = unchunk(D_f, (4,))
        aw_t = unchunk(awc)
        wvec, hvec, wm2, hm2 = _grid_consts()
        lshape = (1, 1, nlv, 1, 1)
        geo = dict(x=x, y=y,
                   bx=jnp.clip(jnp.floor(x), 0.0, wm2.reshape(lshape)),
                   by=jnp.clip(jnp.floor(y), 0.0, hm2.reshape(lshape)),
                   wvec=wvec, hvec=hvec)
        d_locs = _loc_grads(geo, D, aw_t)

        dquad = dquad.reshape(b, heads, -1, 4 * hd)
        starts = [0]
        for (h, w) in spatial_shapes:
            starts.append(starts[-1] + h * w)
        dval_levels = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            dv = _fold_quad_grad(
                dquad[:, :, starts[lvl]:starts[lvl + 1]], h, w, hd)
            dval_levels.append(jnp.moveaxis(dv, 1, 2))
        d_value = jnp.concatenate(dval_levels, axis=1).astype(vdt.dtype)
        return (d_value, d_locs.astype(ldt.dtype), d_aw.astype(adt.dtype))

    def _bwd(res, g):
        if len(res) == 9:
            return _bwd_saved(res, g)
        value, locs, aw = res
        b, nv, heads, hd = value.shape
        q = locs.shape[1]
        npts = locs.shape[4]
        lp = nlv * npts
        s = q * lp
        plane = _build_quad_plane(value, spatial_shapes, gather_dtype)
        plane = plane.reshape(b * heads, plane.shape[2], 4 * hd)
        geo, idx, w4geo = _geo_flat(locs)
        aw_t = _aw_lpq(aw)                                # (B,h,L,P,Q)
        awf = aw_t.reshape(b * heads, s)
        gh = jnp.moveaxis(
            g.reshape(b, q, heads, hd).astype(jnp.float32), 2, 1)
        gh = gh.reshape(b * heads, q, hd)

        level_sizes = tuple(h * w for (h, w) in spatial_shapes)

        if q > 2 * query_chunk:
            # Query-chunked backward (mirror of the forward): the
            # per-chunk rows buffer stays VMEM-resident into the
            # per-slot-dot and update producers instead of
            # round-tripping the full (S, 4hd) slice buffer through
            # HBM.  Sample arrays go chunk-major ((lp, Q) ->
            # (nq, lp, qc)); the per-level d_plane accumulates in an
            # f32 scan carry.  Padded queries carry zero weight and
            # zero upstream grad, so their updates vanish and their
            # d_aw / D outputs are sliced off.
            qc = query_chunk
            nq = -(-q // qc)
            qp = nq * qc

            def chunk_s(a, tail=()):
                a = a.reshape((b, heads, lp, q) + tail)
                a = jnp.pad(a, ((0, 0),) * 3 + ((0, qp - q),)
                            + ((0, 0),) * len(tail))
                a = jnp.transpose(
                    a.reshape((b, heads, lp, nq, qc) + tail),
                    (0, 1, 3, 2, 4) + tuple(
                        5 + i for i in range(len(tail))))
                return a.reshape((b * heads, nq, lp * qc) + tail)

            idxc = chunk_s(idx)
            w4c = chunk_s(w4geo, (4,))
            awc = chunk_s(awf)
            ghc = jnp.pad(gh, ((0, 0), (0, qp - q), (0, 0))).reshape(
                b * heads, nq, qc, hd)

            def body(_, xs):
                p_s, idx_s, w4_s, aw_s, g_s = xs
                acc0 = tuple(jnp.zeros((_acc_rows(n_l), 4 * hd),
                                       jnp.float32)
                             for n_l in level_sizes)

                def inner(accs, ys):
                    i_c, w_c, a_c, g_c = ys
                    accs, d_aw_c, D_c = _slice_backward(
                        p_s, i_c, w_c, a_c, g_c, qc, hd, nlv, npts,
                        compute_dtype, level_sizes, accs=accs)
                    return accs, (d_aw_c, D_c)

                accs, (d_aw_s, D_s) = jax.lax.scan(
                    inner, acc0, (idx_s, w4_s, aw_s, g_s))
                dplane = jnp.concatenate(
                    [a[:n_l] for a, n_l in zip(accs, level_sizes)],
                    axis=0)
                return None, (dplane, d_aw_s, D_s)

            _, (dquad, d_aw_f, D_f) = jax.lax.scan(
                body, None, (plane, idxc, w4c, awc, ghc))

            def unchunk(a, tail=()):
                # (BH, nq, lp*qc[,tail]) -> (B, h, lp, Q[,tail])
                a = a.reshape((b, heads, nq, lp, qc) + tail)
                a = jnp.transpose(a, (0, 1, 3, 2, 4) + tuple(
                    5 + i for i in range(len(tail))))
                return a.reshape((b, heads, nlv, npts, qp) + tail)[
                    :, :, :, :, :q]

            d_aw = jnp.transpose(unchunk(d_aw_f), (0, 4, 1, 2, 3))
            D = unchunk(D_f, (4,))
        else:
            def body(_, xs):
                p_s, idx_s, w4_s, aw_s, g_s = xs
                dplane, d_aw, D = _slice_backward(
                    p_s, idx_s, w4_s, aw_s, g_s, q, hd, nlv, npts,
                    compute_dtype, level_sizes)
                return None, (dplane, d_aw, D)

            _, (dquad, d_aw_f, D_f) = jax.lax.scan(
                body, None, (plane, idx, w4geo, awf, gh))

            # lp-major (BH, S) -> (B, Q, h, L, P)
            d_aw = jnp.transpose(
                d_aw_f.reshape(b, heads, nlv, npts, q), (0, 4, 1, 2, 3))
            D = D_f.reshape(b, heads, nlv, npts, q, 4)
        d_locs = _loc_grads(geo, D, aw_t)

        dquad = dquad.reshape(b, heads, -1, 4 * hd)
        starts = [0]
        for (h, w) in spatial_shapes:
            starts.append(starts[-1] + h * w)
        dval_levels = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            dv = _fold_quad_grad(
                dquad[:, :, starts[lvl]:starts[lvl + 1]], h, w, hd)
            dval_levels.append(jnp.moveaxis(dv, 1, 2))    # (B,HW,heads,hd)
        d_value = jnp.concatenate(dval_levels, axis=1).astype(value.dtype)
        return (d_value, d_locs.astype(locs.dtype), d_aw.astype(aw.dtype))

    def fwd_rule(value, locs, aw):
        return _fwd(value, locs, aw)

    msda.defvjp(fwd_rule, _bwd)
    return msda


def multi_scale_deformable_attention(value, spatial_shapes,
                                     sampling_locations, attention_weights,
                                     query_chunk=None, gather_dtype=None):
    """Core MSDA sampling + weighted reduction (quad-fused, custom VJP).

    Args:
        value: (B, sum_HW, num_heads, head_dim) flattened multi-level values.
        spatial_shapes: static tuple of (h, w) per level.
        sampling_locations: (B, Q, heads, levels, points, 2) in [0, 1].
        attention_weights: (B, Q, heads, levels, points), normalized.
        query_chunk: forward scan inner-chunk size; queries are walked
            in QC-sized blocks so the gathered rows buffer stays
            VMEM-resident into the weighting (active when
            Q > 2*query_chunk; the default 2816 — overridable via env
            ``DEMF_TPU_MSDA_QC`` — puts the per-chunk buffer at ~11 MB,
            the measured v5e sweet spot and an exact 8-chunk fit for
            the reference's 22323-query encoder).
        gather_dtype: dtype of the packed quad planes (defaults to bf16
            for f32 inputs -- halves gather traffic; pass jnp.float32 for
            bit-exact oracle comparisons).
    Returns:
        (B, Q, heads * head_dim) in value.dtype.
    """
    if query_chunk is None:
        query_chunk = int(os.environ.get('DEMF_TPU_MSDA_QC', '2816'))
    if gather_dtype is None:
        # parity escape hatch: DEMF_TPU_MSDA_F32=1 keeps the sampling
        # planes fp32 (bit-exact vs the torch reference; used by the
        # whole-model forward-parity test) at 2x gather traffic
        if os.environ.get('DEMF_TPU_MSDA_F32'):
            gather_dtype = value.dtype
        else:
            gather_dtype = (jnp.bfloat16 if value.dtype == jnp.float32
                            else value.dtype)
    shapes_t = tuple(tuple(s) for s in spatial_shapes)
    q = sampling_locations.shape[1]
    nlv, npts = sampling_locations.shape[3], sampling_locations.shape[4]
    sum_hw = value.shape[1]
    # Decoder-scale calls (few queries vs plane size): the quad repack
    # (~4x plane traffic) costs more than it saves -- gather the 4 corners
    # straight out of the raw value instead.  Encoder-scale calls amortize
    # the repack over ~20x more samples.
    if q * nlv * npts * 8 < sum_hw:
        fn = _make_small_q_msda(shapes_t, jnp.dtype(gather_dtype).name)
        return fn(value, sampling_locations, attention_weights)
    fn = _make_msda(shapes_t, jnp.dtype(gather_dtype).name,
                    int(query_chunk))
    return fn(value, sampling_locations, attention_weights)
