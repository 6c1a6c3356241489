"""TPU-native sparse 3D convolution (voxel-hash gather/matmul form).

Replaces MinkowskiEngine's sparse conv stack used by the reference's
DeMF-FCAF3D branch (SURVEY.md §2b N12, reference README.md:55-58 — the
``DeMF_fcaf`` branch's HDResNet34 backbone).  MinkowskiEngine builds CPU
hash-map "kernel maps"; here everything is dense XLA primitives with
static shapes, so the whole backbone jits into one program:

  * coordinates live in a fixed-capacity table ``(M, 3) int32`` with a
    validity mask (padding rows hold a sentinel);
  * neighbor lookup = binary search (``searchsorted``) of linearized
    coordinates in a sorted key table — O(M K log M) vectorized compares,
    no host hashing;
  * convolution = per-offset row gather + one einsum over the kernel
    taps — the FLOPs land on the MXU as (M, K*C) x (K*C, Co) matmuls;
  * stride-2 downsampling produces unique coarse coordinates via
    sort + adjacent-compare (fixed output capacity), matching
    MinkowskiConvolution(kernel=2, stride=2) semantics;
  * transposed stride-2 conv targets a KNOWN fine coordinate set (the
    encoder skip's table), as FCAF3D's decoder does.

Convention: coordinates are non-negative voxel indices (shift by the
point-cloud range before voxelizing).  ``INVALID`` marks padding rows.
Keys are packed into int32 (x64 stays disabled): per-axis span 1290
(1290^3 < 2^31), supporting grids up to ~1250 voxels per axis with
conv-tap excursions of +/-16 — FCAF3D's finest SUN RGB-D grid is 640.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SPAN = 1290                       # per-axis key span; _SPAN**3 < 2**31
_SHIFT = 16                        # headroom for negative tap queries
INVALID = jnp.int32(_SPAN - _SHIFT - 1)   # sentinel coordinate (=1273)
MAX_COORD = int(_SPAN - _SHIFT - 2)       # largest real coordinate


def linearize(coords):
    """(..., 3) int coords in [-16, 1273] -> unique int32 keys."""
    c = coords.astype(jnp.int32) + _SHIFT
    return (c[..., 0] * _SPAN + c[..., 1]) * _SPAN + c[..., 2]


def voxelize(points, features, voxel_size, pc_start, max_voxels):
    """Points -> mean-pooled voxel table (fixed capacity).

    Args:
        points: (N, 3) float xyz.
        features: (N, C) per-point features to mean-pool per voxel.
        voxel_size: float or (3,) — voxel edge length.
        pc_start: (3,) lower corner of the point-cloud range.
        max_voxels: static output capacity M.
    Returns:
        coords (M, 3) int32 (INVALID padded), feats (M, C), valid (M,).
    """
    n = points.shape[0]
    vs = jnp.asarray(voxel_size, jnp.float32)
    raw = jnp.floor(
        (points.astype(jnp.float32) - jnp.asarray(pc_start)) / vs)
    # points outside the grid are DROPPED (MinkowskiEngine keeps arbitrary
    # coordinates; our packed-key table cannot, and clamping them into edge
    # voxels would pollute edge-voxel mean features) — they sort to the end
    # via a max-key sentinel and their segment id overflows to m (scatter
    # drops out-of-bounds ids under jit)
    in_range = jnp.all((raw >= 0) & (raw <= MAX_COORD), axis=-1)   # (N,)
    coords = jnp.clip(raw, 0, MAX_COORD).astype(jnp.int32)
    keys = jnp.where(in_range, linearize(coords), jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(keys)
    skeys = keys[order]
    sfeat = features[order]
    scoord = coords[order]
    sin_range = in_range[order]
    heads = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    # segment ids: one per unique voxel, in sorted order
    seg = jnp.cumsum(heads) - 1                            # (N,)
    m = max_voxels
    seg = jnp.where(sin_range, seg, m)                     # drop out-of-range
    feat_sum = jax.ops.segment_sum(sfeat, seg, num_segments=m)
    cnt = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), seg,
                              num_segments=m)
    first = jnp.full((m,), n, jnp.int32).at[seg].min(
        jnp.arange(n, dtype=jnp.int32))
    valid = cnt > 0
    coords_out = jnp.where(
        valid[:, None], scoord[jnp.clip(first, 0, n - 1)], INVALID)
    feats_out = feat_sum / jnp.maximum(cnt[:, None], 1.0)
    return coords_out, feats_out, valid


def build_key_table(coords, valid):
    """Sorted key table for neighbor lookups: (skeys, row_of_rank)."""
    keys = jnp.where(valid, linearize(coords), jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(keys)
    return keys[order], order.astype(jnp.int32)


def key_table_presorted(coords, valid):
    """``build_key_table`` for coordinate sets already in key order.

    Every coordinate table the FCAF3D/DeMF-FCAF3D models produce is
    emitted in sorted-key, valid-prefix order (``voxelize`` and
    ``downsample_coords`` both write rows in sorted segment order), so
    the per-level argsort is redundant — at b8/16k voxels the per-step
    table argsorts were ~25 ms of the 208 ms step (VERDICT r3 item 4).
    Callers assert the invariant via ``sorted_input=True``; padding rows
    map to the INT32_MAX sentinel exactly like the sorted output of
    ``build_key_table``.
    """
    keys = jnp.where(valid, linearize(coords), jnp.iinfo(jnp.int32).max)
    return keys, jnp.arange(coords.shape[0], dtype=jnp.int32)


def lookup(skeys, order, query_coords, query_valid):
    """Find rows of ``query_coords`` in the table; -1 when absent.

    Queries outside the packable range are clamped; clamped queries
    cannot alias a real key (real per-axis fields never reach the clamp
    bound).  Uses the bucketed-compare path (see ``_lookup_bucketed``).
    """
    return _lookup_bucketed(_bucketed_table(skeys, order), query_coords,
                            query_valid)


def kernel_offsets(kernel_size):
    """(K, 3) int32 offsets for a cubic kernel, centered (odd k) or
    forward (even k, Minkowski convention: taps at 0..k-1)."""
    k = kernel_size
    r = jnp.arange(k) - (k - 1) // 2 if k % 2 == 1 else jnp.arange(k)
    zz, yy, xx = jnp.meshgrid(r, r, r, indexing='ij')
    return jnp.stack([zz.reshape(-1), yy.reshape(-1), xx.reshape(-1)],
                     -1).astype(jnp.int32)


_BUCKET_W = 128     # keys per bucket: one 512 B row gather per query


def _bucketed_table(skeys, order):
    """Pack the sorted (key, row) table into (B, 2, W) bucket rows."""
    m = skeys.shape[0]
    b = -(-m // _BUCKET_W)
    pad = b * _BUCKET_W - m
    if pad:
        skeys = jnp.concatenate(
            [skeys, jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)])
        order = jnp.concatenate([order, jnp.zeros((pad,), jnp.int32)])
    return jnp.stack([skeys.reshape(b, _BUCKET_W),
                      order.reshape(b, _BUCKET_W)], 1)


def _lookup_bucketed(packed, query_coords, query_valid):
    """Hash-free exact lookup: pick the query's bucket by comparing
    against the B bucket pivots (all-vectorized), gather that bucket's
    512 B (key, row) line, and match within it.

    Replaces searchsorted + two single-int32-element gathers — those
    were the FCAF3D backbone's hottest ops after the conv gathers
    (xplane: ~110 ms/step at b8/16k voxels for the stem level alone;
    single-element gathers run ~10 M rows/s while 128-int row gathers
    move the same information at full gather throughput).
    """
    qkeys = linearize(jnp.clip(query_coords, -_SHIFT, int(INVALID)))
    pivots = packed[:, 0, 0]                              # (B,)
    bucket = jnp.sum(qkeys[:, None] >= pivots[None, :], 1) - 1
    bucket = jnp.clip(bucket, 0, packed.shape[0] - 1)
    rows = packed[bucket]                                 # (Q, 2, W)
    eq = rows[:, 0, :] == qkeys[:, None]
    hit = eq.any(1) & query_valid
    res = jnp.sum(jnp.where(eq, rows[:, 1, :], 0), axis=1)
    return jnp.where(hit, res, -1)


def neighbor_table(in_coords, in_valid, out_coords, out_valid, offsets,
                   in_stride=1):
    """(M_out, K) row indices into the input table (-1 = no neighbor).

    ``out_coords`` are in input-resolution units; each output voxel's
    tap t looks up ``out_coords + offsets[t] * in_stride``.

    Taps run under ``lax.map`` (sequential) so the bucketed lookup's
    per-tap (Q, W) buffers never coexist across all K taps.
    """
    skeys, order = build_key_table(in_coords, in_valid)
    packed = _bucketed_table(skeys, order)

    def per_offset(off):
        q = out_coords + off[None, :] * in_stride
        return _lookup_bucketed(packed, q, out_valid)

    return jax.lax.map(per_offset, offsets).T       # (M_out, K)


def _bucketed_table_ov(skeys, order):
    """Overlap-packed table for the z-run lookup: (NB, 2, W+2) lines
    plus (NB,) pivots.

    Line i holds sorted positions [i*W - 1, i*W + W] inclusive (one
    position of overlap on each side, sentinel-padded at the global
    ends), so the three ADJACENT sorted positions occupied by a key and
    its +-tensor_stride z-neighbours always fit in the line chosen by a
    pivot compare on the center key (proof in ``_lookup_zrun_batched``).
    """
    m = skeys.shape[0]
    nb = -(-m // _BUCKET_W)
    maxk = jnp.iinfo(jnp.int32).max
    pad = nb * _BUCKET_W - m
    sk = jnp.concatenate([jnp.full((1,), maxk, jnp.int32), skeys,
                          jnp.full((pad + 1,), maxk, jnp.int32)])
    od = jnp.concatenate([jnp.zeros((1,), jnp.int32), order,
                          jnp.zeros((pad + 1,), jnp.int32)])
    pos = (jnp.arange(nb, dtype=jnp.int32)[:, None] * _BUCKET_W +
           jnp.arange(_BUCKET_W + 2, dtype=jnp.int32)[None])
    return jnp.stack([sk[pos], od[pos]], 1), skeys[::_BUCKET_W]


def _lookup_zrun_batched(lines, pivots, center_coords, query_valid,
                         dzs, ts):
    """Resolve the taps ``center + (0, 0, dz*ts)`` for every dz in
    ``dzs`` (subset of {-1, 0, 1}) with ONE overlap-line gather per
    center query — a 3x cut in bucket-line gathers for k=3 kernels
    (2x for k=2), which are the count-bound cost of table builds.

    Why one line suffices: ``linearize`` keeps coordinate axis 2 (z) as
    the fastest key axis, every valid key in a pyramid level has z = 0
    (mod ts) (coords are multiples of the tensor stride, see
    ``downsample_coords``), and the dz = +-1 taps are masked off when
    z +- ts leaves [0, MAX_COORD] — so no table key lies strictly
    between the center key k and k +- ts, and the (at most three)
    candidate keys occupy adjacent sorted positions p-1, p, p+1 around
    k's insertion point p.  The pivot compare puts p inside bucket b's
    position range [b*W, (b+1)*W], and line b covers exactly
    [b*W - 1, (b+1)*W] (``_bucketed_table_ov``).
    """
    b, q = query_valid.shape
    nb = pivots.shape[1]
    qk = linearize(jnp.clip(center_coords, -_SHIFT, int(INVALID)))
    bucket = jnp.sum(qk[:, :, None] >= pivots[:, None, :], -1) - 1
    bucket = jnp.clip(bucket, 0, nb - 1)
    fb = bucket + (jnp.arange(b, dtype=jnp.int32) * nb)[:, None]
    rows = lines.reshape(b * nb, 2, lines.shape[-1])[fb.reshape(-1)]
    keys, vals = rows[:, 0, :], rows[:, 1, :]
    zc = center_coords[..., 2].reshape(-1)
    vq = query_valid.reshape(-1)
    qkf = qk.reshape(-1)
    out = []
    for dz in dzs:
        if dz == 0:
            ok = vq
        elif dz < 0:
            # z - ts < 0 cannot be a real coord; also guard clamped z
            ok = vq & (zc - ts >= 0) & (zc <= MAX_COORD)
        else:
            ok = vq & (zc + ts <= MAX_COORD)
        eq = keys == (qkf + dz * ts)[:, None]
        hit = eq.any(1) & ok
        # At most one line key can match (real keys are unique and the
        # INT32_MAX pad sentinel exceeds every clamped query key, whose
        # max is _SPAN**3 - 1 < 2**31 - 1), so a masked sum IS the
        # matched row index — replacing argmax + within-row gather with
        # one reduce pass over the gathered lines (xplane: the
        # eq/argmax/take fusions were ~18 of the stem table's 35 ms at
        # b8/16k; the line gathers themselves only ~6 ms).
        res = jnp.sum(jnp.where(eq, vals, 0), axis=1)
        out.append(jnp.where(hit, res, -1).reshape(b, q))
    return out


def _z_runs(offsets):
    """Group taps into consecutive z-runs for the fused lookup.

    Returns a list of (tap_indices, o0, o1, dz_list) where each run
    shares (offset[0], offset[1]) and has distinct offset[2] values in
    {-1, 0, 1} — the layout ``kernel_offsets`` emits for k in {2, 3}
    (axis 2 fastest), in either sign (reverse tables negate offsets).
    None when the offsets don't factor this way or nothing is saved.
    """
    try:
        offs = np.asarray(jax.device_get(offsets)).astype(np.int64)
    except Exception:
        return None
    k = offs.shape[0]
    runs = []
    i = 0
    while i < k:
        j = i
        while (j + 1 < k and offs[j + 1, 0] == offs[i, 0]
               and offs[j + 1, 1] == offs[i, 1]):
            j += 1
        o2s = offs[i:j + 1, 2].tolist()
        if any(abs(z) > 1 for z in o2s) or len(set(o2s)) != len(o2s):
            return None
        runs.append((list(range(i, j + 1)), int(offs[i, 0]),
                     int(offs[i, 1]), o2s))
        i = j + 1
    return runs if len(runs) < k else None


def _lookup_bucketed_batched(packed, query_coords, query_valid):
    """Batched ``_lookup_bucketed`` with the batch axis FLATTENED into
    the bucket-line gather's row axis: a (B*Q,)-row gather from the
    (B*NB, 2, W) table runs ~1.2x faster than B vmapped per-sample
    gathers on v5e (tools/bench_sparse_ops.py --v5)."""
    b, nb, _, w = packed.shape
    qk = linearize(jnp.clip(query_coords, -_SHIFT, int(INVALID)))
    pivots = packed[:, :, 0, 0]                           # (B, NB)
    bucket = jnp.sum(qk[:, :, None] >= pivots[:, None, :], -1) - 1
    bucket = jnp.clip(bucket, 0, nb - 1)
    fb = bucket + (jnp.arange(b, dtype=jnp.int32) * nb)[:, None]
    rows = packed.reshape(b * nb, 2, w)[fb.reshape(-1)]   # (B*Q, 2, W)
    eq = rows[:, 0, :] == qk.reshape(-1)[:, None]
    hit = eq.any(1) & query_valid.reshape(-1)
    # masked sum = the unique matched row (see _lookup_zrun_batched)
    res = jnp.sum(jnp.where(eq, rows[:, 1, :], 0), axis=1)
    return jnp.where(hit, res, -1).reshape(qk.shape)


def neighbor_table_batched(in_coords, in_valid, out_coords, out_valid,
                           offsets, in_stride=1, sorted_input=False):
    """Batched ``neighbor_table``: (B, M_out, K) from (B, M_in, 3).

    One sorted table per sample (vmapped build), then one flat-batch
    bucketed lookup per tap (unrolled python loop: XLA overlaps the
    per-tap fusions; lookup throughput is bound by the bucket-line
    gather count, see tools/bench_sparse_ops.py --v4/--v5).

    k=2/k=3 cubic kernels take the fused z-run path: one overlap-line
    gather per (o0, o1) tap group resolves all its z taps
    (``_lookup_zrun_batched``), a 3x (k=3) / 2x (k=2) cut in the
    count-bound bucket-line gathers.

    ``sorted_input=True`` asserts ``in_coords`` is already in
    sorted-key, valid-prefix order (``key_table_presorted``) and skips
    the per-sample argsort."""
    table_fn = key_table_presorted if sorted_input else build_key_table
    sk, od = jax.vmap(table_fn)(in_coords, in_valid)
    runs = _z_runs(offsets)
    if runs is not None:
        lines, pivots = jax.vmap(_bucketed_table_ov)(sk, od)
        cols = [None] * offsets.shape[0]
        for taps, o0, o1, dzs in runs:
            center = out_coords + jnp.asarray(
                [o0 * in_stride, o1 * in_stride, 0],
                jnp.int32)[None, None]
            res = _lookup_zrun_batched(lines, pivots, center, out_valid,
                                       dzs, in_stride)
            for t, r in zip(taps, res):
                cols[t] = r
        return jnp.stack(cols, -1)                        # (B, M_out, K)
    packed = jax.vmap(_bucketed_table)(sk, od)
    cols = [
        _lookup_bucketed_batched(
            packed, out_coords + (offsets[t] * in_stride)[None, None],
            out_valid)
        for t in range(offsets.shape[0])]
    return jnp.stack(cols, -1)                            # (B, M_out, K)


def sparse_conv_apply(feats, nbr, weights, bias=None):
    """Gather-matmul sparse convolution.

    Memory-bounded formulation: a ``lax.scan`` over the K kernel taps,
    each iteration one (M, C) row gather + one MXU matmul with that
    tap's (C, Co) kernel — peak extra memory is one (M, C) buffer
    instead of the (M, K, C) tensor a single einsum would materialize
    (227 MB/sample at FCAF3D scale: M=32k, K=27, C=64, fp32).

    Args:
        feats: (M_in, C) input features (padding rows must be zero).
        nbr: (M_out, K) neighbor rows, -1 = absent (zero contribution).
        weights: (K, C, Co) per-tap kernels.
    Returns:
        (M_out, Co).
    """
    m_in = feats.shape[0]

    def tap(acc, inp):
        nbr_k, w_k = inp
        g = feats[jnp.clip(nbr_k, 0, m_in - 1)]
        g = jnp.where((nbr_k >= 0)[:, None], g, 0.0)
        return acc + g @ w_k.astype(g.dtype), None

    out0 = jnp.zeros((nbr.shape[0], weights.shape[2]), feats.dtype)
    out, _ = jax.lax.scan(tap, out0, (nbr.T, weights))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv_scan_math(feats, nbr, weights):
    """Scan-over-taps gather-matmul core: (B, M, C) x (B, Mo, K) ->
    (B, Mo, Co).  Batch axis FLATTENED into the gather row axis (batched
    take-along-axis gathers run ~65 M rows/s on v5e vs ~89 M for the
    flat form; same rationale as ops/msda)."""
    b, m, c = feats.shape
    flat = feats.reshape(b * m, c)
    base = (jnp.arange(b, dtype=jnp.int32) * m)[:, None]

    def tap(acc, inp):
        nbr_k, w_k = inp                       # (B, Mo), (C, Co)
        idx = (jnp.where(nbr_k >= 0, nbr_k, 0) + base).reshape(-1)
        g = flat[idx].reshape(b, nbr_k.shape[1], c)
        g = jnp.where((nbr_k >= 0)[..., None], g, 0.0)
        return acc + g @ w_k.astype(g.dtype), None

    out0 = jnp.zeros((b, nbr.shape[1], weights.shape[2]), feats.dtype)
    out, _ = jax.lax.scan(tap, out0, (jnp.moveaxis(nbr, 2, 0), weights))
    return out


def _conv_dweights(feats, nbr, g):
    """d_weights[t] = gather_t(feats)^T @ g, re-gathering per tap."""
    b, m, c = feats.shape
    flat = feats.reshape(b * m, c)
    base = (jnp.arange(b, dtype=jnp.int32) * m)[:, None]

    def tap(_, nbr_k):
        idx = (jnp.where(nbr_k >= 0, nbr_k, 0) + base).reshape(-1)
        rows = flat[idx].reshape(b, nbr_k.shape[1], c)
        rows = jnp.where((nbr_k >= 0)[..., None], rows, 0.0)
        dw = jnp.einsum('bmc,bmo->co', rows.astype(jnp.float32),
                        g.astype(jnp.float32))
        return None, dw

    _, dws = jax.lax.scan(tap, None, jnp.moveaxis(nbr, 2, 0))
    return dws                                     # (K, C, Co) f32


@jax.custom_vjp
def _conv_sym(feats, nbr, weights):
    """Submanifold conv (in set == out set, symmetric centered taps)
    with a scatter-free VJP: offsets[K-1-t] == -offsets[t], so the
    transpose table is the tap-FLIPPED forward table and d_feats is a
    gather-conv with per-tap-transposed kernels.  XLA's autodiff of the
    gather would emit per-tap scatter-adds, which run ~5x slower than
    gathers on v5e (same asymmetry as ops/msda's backward)."""
    return _conv_scan_math(feats, nbr, weights)


def _conv_sym_fwd(feats, nbr, weights):
    return _conv_scan_math(feats, nbr, weights), (feats, nbr, weights)


def _conv_sym_bwd(res, g):
    feats, nbr, weights = res
    g = g.astype(feats.dtype)
    d_feats = _conv_scan_math(
        g, jnp.flip(nbr, -1), jnp.transpose(weights, (0, 2, 1)))
    d_w = _conv_dweights(feats, nbr, g).astype(weights.dtype)
    return d_feats.astype(feats.dtype), None, d_w


_conv_sym.defvjp(_conv_sym_fwd, _conv_sym_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _conv_revgeo(kernel_size, in_stride, rev_sign, sorted_out, feats,
                 nbr, weights, out_coords, out_valid, in_coords,
                 in_valid):
    """Gather-matmul conv whose VJP builds a REVERSE table (rev slot t
    of input voxel i is the output row reading i at tap t, query =
    i + rev_sign * offsets[t] * in_stride) in the backward pass and
    computes d_feats as a gather-conv — the forward pays nothing extra,
    and training avoids XLA's per-tap scatter-add transpose.
    rev_sign = -1 for forward (strided) convs whose taps read
    out + off, +1 for transposed convs whose fine rows read
    coarse = fine - off."""
    return _conv_scan_math(feats, nbr, weights)


def _conv_revgeo_fwd(kernel_size, in_stride, rev_sign, sorted_out,
                     feats, nbr, weights, out_coords, out_valid,
                     in_coords, in_valid):
    out = _conv_scan_math(feats, nbr, weights)
    return out, (feats, nbr, weights, out_coords, out_valid, in_coords,
                 in_valid)


def _conv_revgeo_bwd(kernel_size, in_stride, rev_sign, sorted_out, res,
                     g):
    feats, nbr, weights, out_coords, out_valid, in_coords, in_valid = res
    g = g.astype(feats.dtype)
    offs = rev_sign * kernel_offsets(kernel_size)
    # the reverse table's INPUT set is the forward's output set
    rev_nbr = neighbor_table_batched(out_coords, out_valid, in_coords,
                                     in_valid, offs,
                                     in_stride=in_stride,
                                     sorted_input=sorted_out)
    d_feats = _conv_scan_math(
        g, rev_nbr, jnp.transpose(weights, (0, 2, 1)))
    d_w = _conv_dweights(feats, nbr, g).astype(weights.dtype)
    return (d_feats.astype(feats.dtype), None, d_w, None, None, None,
            None)


_conv_revgeo.defvjp(_conv_revgeo_fwd, _conv_revgeo_bwd)


def sparse_conv_apply_batched(feats, nbr, weights, bias=None, rev=None):
    """Batched gather-matmul sparse conv: (B, M, C) x (B, Mo, K).

    rev: backward-transpose strategy —
      * None: XLA autodiff (per-tap scatter-adds into d_feats);
      * 'flip': submanifold case (out set == in set, odd centered
        kernel) — the reverse table is the tap-flipped ``nbr``;
      * dict(kernel_size=, in_stride=, out_coords=, out_valid=,
        in_coords=, in_valid=[, rev_sign=-1][, sorted_out=False]): the
        backward builds a reverse table (zero forward cost);
        rev_sign=+1 for transposed convs; sorted_out=True asserts
        out_coords is key-sorted (skips the reverse table's argsort).
    """
    if rev is None:
        out = _conv_scan_math(feats, nbr, weights)
    elif isinstance(rev, str) and rev == 'flip':
        out = _conv_sym(feats, nbr, weights)
    else:
        out = _conv_revgeo(int(rev['kernel_size']),
                           int(rev['in_stride']),
                           int(rev.get('rev_sign', -1)),
                           bool(rev.get('sorted_out', False)), feats,
                           nbr, weights, rev['out_coords'],
                           rev['out_valid'], rev['in_coords'],
                           rev['in_valid'])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def submanifold_conv_batched(coords, valid, feats, weights, bias=None,
                             kernel_size=3, tensor_stride=1, nbr=None,
                             sorted_input=False):
    """Batched ``submanifold_conv``: tables per sample (vmapped index
    math), features through the flattened batched gather path."""
    if nbr is None:
        offs = kernel_offsets(kernel_size)
        nbr = neighbor_table_batched(coords, valid, coords, valid, offs,
                                     in_stride=tensor_stride,
                                     sorted_input=sorted_input)
    rev = 'flip' if kernel_size % 2 == 1 else None
    out = sparse_conv_apply_batched(feats, nbr, weights, bias, rev=rev)
    return jnp.where(valid[..., None], out, 0.0)


def submanifold_conv(coords, valid, feats, weights, bias=None,
                     kernel_size=3, tensor_stride=1, nbr=None):
    """MinkowskiConvolution(stride=1) on the same coordinate set.

    ``tensor_stride``: the level's coordinate granularity (coords are
    multiples of it after s stride-2 downsamplings); kernel taps step by
    it, exactly like Minkowski tensor-stride bookkeeping.

    ``nbr``: optionally a precomputed (M, K) neighbor table for this
    (coords, kernel_size, tensor_stride) — the table depends only on the
    coordinate set, so callers stacking several convs on one level
    should build it once (see MinkResNet) instead of paying the
    argsort + K binary searches per conv.
    """
    if nbr is None:
        offs = kernel_offsets(kernel_size)
        nbr = neighbor_table(coords, valid, coords, valid, offs,
                             in_stride=tensor_stride)
    out = sparse_conv_apply(feats, nbr, weights, bias)
    return jnp.where(valid[:, None], out, 0.0)


def downsample_coords(coords, valid, stride, max_out):
    """Unique ``coords // stride * stride`` (coarse set at fine units).

    Matches Minkowski stride-s conv output coordinates (tensor stride
    bookkeeping: coarse coords stay expressed in fine-grid units).
    """
    coarse = jnp.where(valid[:, None], coords // stride * stride, INVALID)
    keys = linearize(coarse)
    order = jnp.argsort(keys)
    skeys = keys[order]
    sc = coarse[order]
    heads = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(heads) - 1
    n = coords.shape[0]
    first = jnp.full((max_out,), n, jnp.int32).at[seg].min(
        jnp.arange(n, dtype=jnp.int32))
    out_valid = first < n
    svalid = valid[order]
    out_valid = out_valid & svalid[jnp.clip(first, 0, n - 1)]
    out_coords = jnp.where(out_valid[:, None],
                           sc[jnp.clip(first, 0, n - 1)], INVALID)
    return out_coords, out_valid


def strided_conv(coords, valid, feats, weights, bias=None, stride=2,
                 kernel_size=2, max_out=None, tensor_stride=1):
    """MinkowskiConvolution(kernel=2, stride=2) downsampling conv.

    ``tensor_stride`` is the INPUT level's granularity; the output level
    has granularity ``tensor_stride * stride`` (coords stay in finest
    units).  Returns (out_coords, out_valid, out_feats).
    """
    max_out = max_out or coords.shape[0]
    out_coords, out_valid = downsample_coords(
        coords, valid, stride * tensor_stride, max_out)
    offs = kernel_offsets(kernel_size)     # forward taps 0..k-1
    nbr = neighbor_table(coords, valid, out_coords, out_valid, offs,
                         in_stride=tensor_stride)
    out = sparse_conv_apply(feats, nbr, weights, bias)
    return out_coords, out_valid, jnp.where(out_valid[:, None], out, 0.0)


def strided_conv_batched(coords, valid, feats, weights, bias=None,
                         stride=2, kernel_size=2, max_out=None,
                         tensor_stride=1, sorted_input=False):
    """Batched ``strided_conv`` (flattened feature gathers).

    The output coordinate set is always key-sorted
    (``downsample_coords`` emits sorted segments), so the backward
    reverse table never argsorts; ``sorted_input`` additionally skips
    the forward table's argsort when the INPUT set is sorted."""
    max_out = max_out or coords.shape[1]
    offs = kernel_offsets(kernel_size)

    oc, ov = jax.vmap(lambda c, v: downsample_coords(
        c, v, stride * tensor_stride, max_out))(coords, valid)
    nbr = neighbor_table_batched(coords, valid, oc, ov, offs,
                                 in_stride=tensor_stride,
                                 sorted_input=sorted_input)
    rev = dict(kernel_size=kernel_size, in_stride=tensor_stride,
               out_coords=oc, out_valid=ov, in_coords=coords,
               in_valid=valid, sorted_out=True)
    out = sparse_conv_apply_batched(feats, nbr, weights, bias, rev=rev)
    return oc, ov, jnp.where(ov[..., None], out, 0.0)


def sparse_max_pool_batched(coords, valid, feats, stride=2, kernel_size=2,
                            max_out=None, tensor_stride=1,
                            sorted_input=False):
    """Batched ``sparse_max_pool`` (flattened feature gathers)."""
    max_out = max_out or coords.shape[1]
    offs = kernel_offsets(kernel_size)

    oc, ov = jax.vmap(lambda c, v: downsample_coords(
        c, v, stride * tensor_stride, max_out))(coords, valid)
    nbr = neighbor_table_batched(coords, valid, oc, ov, offs,
                                 in_stride=tensor_stride,
                                 sorted_input=sorted_input)
    b, m, c = feats.shape
    flat = feats.reshape(b * m, c)
    base = (jnp.arange(b, dtype=jnp.int32) * m)[:, None]

    def tap(acc, nbr_k):
        idx = (jnp.where(nbr_k >= 0, nbr_k, 0) + base).reshape(-1)
        g = flat[idx].reshape(b, nbr_k.shape[1], c)
        g = jnp.where((nbr_k >= 0)[..., None], g, -jnp.inf)
        return jnp.maximum(acc, g), None

    out0 = jnp.full((b, nbr.shape[1], c), -jnp.inf, feats.dtype)
    out, _ = jax.lax.scan(tap, out0, jnp.moveaxis(nbr, 2, 0))
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    return oc, ov, jnp.where(ov[..., None], out, 0.0)


def transposed_conv_to(coords_fine, valid_fine, coords_coarse,
                       valid_coarse, feats_coarse, weights, bias=None,
                       stride=2, kernel_size=2, tensor_stride=1):
    """MinkowskiConvolutionTranspose(kernel=2, stride=2) onto a KNOWN
    fine coordinate set (the encoder skip's table), as FCAF3D's decoder
    upsampling does.

    ``tensor_stride`` is the FINE level's granularity (the coarse level
    has ``tensor_stride * stride``).  weights: (K, C, Co) with taps
    indexed like the forward conv; for k=2/s=2 each fine voxel has
    exactly one coarse parent and one matching tap.
    """
    # parent coarse coordinate of each fine voxel
    cs = stride * tensor_stride
    parent = coords_fine // cs * cs
    skeys, order = build_key_table(coords_coarse, valid_coarse)
    prow = lookup(skeys, order, parent, valid_fine)          # (M_f,)
    # which tap: fine = parent + off*ts  ->  off in {0..k-1}^3
    off = (coords_fine - parent) // tensor_stride             # (M_f, 3)
    k = kernel_size
    tap = (off[:, 0] * k + off[:, 1]) * k + off[:, 2]         # (M_f,)
    safe = jnp.clip(prow, 0, feats_coarse.shape[0] - 1)
    gathered = feats_coarse[safe]                             # (M_f, C)
    gathered = jnp.where((prow >= 0)[:, None], gathered, 0.0)
    w = weights[jnp.clip(tap, 0, k ** 3 - 1)]                 # (M_f, C, Co)
    out = jnp.einsum('mc,mco->mo', gathered, w.astype(gathered.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return jnp.where(valid_fine[:, None], out, 0.0)


def transposed_conv_to_batched(coords_fine, valid_fine, coords_coarse,
                               valid_coarse, feats_coarse, weights,
                               bias=None, stride=2, kernel_size=2,
                               tensor_stride=1, sorted_input=False,
                               sorted_fine=False):
    """Batched ``transposed_conv_to`` with a scatter-free VJP.

    Key identity: the transposed conv's per-fine-row read IS a
    gather-conv whose tap-t neighbor is the coarse voxel at
    ``fine - off_t * ts`` — for k=2/s=2 exactly one tap matches (the
    fine voxel's parent), so ONE parent lookup + tap decomposition
    builds the whole (B, Mf, K) table; d_feats_coarse then routes
    through the +offsets (children) reverse table instead of XLA's
    scatter-add.
    """
    cs = stride * tensor_stride
    parent = coords_fine // cs * cs
    table_fn = key_table_presorted if sorted_input else build_key_table
    sk, od = jax.vmap(table_fn)(coords_coarse, valid_coarse)
    packed = jax.vmap(_bucketed_table)(sk, od)
    prow = _lookup_bucketed_batched(packed, parent, valid_fine)
    off = (coords_fine - parent) // tensor_stride         # (B, Mf, 3)
    k = kernel_size
    tap = (off[..., 0] * k + off[..., 1]) * k + off[..., 2]
    tnbr = jnp.where(
        (tap[..., None] == jnp.arange(k ** 3, dtype=jnp.int32)[None,
                                                               None]) &
        (prow[..., None] >= 0),
        prow[..., None], -1)                              # (B, Mf, K)
    rev = dict(kernel_size=kernel_size, in_stride=tensor_stride,
               rev_sign=+1, out_coords=coords_fine, out_valid=valid_fine,
               in_coords=coords_coarse, in_valid=valid_coarse,
               sorted_out=sorted_fine)
    out = sparse_conv_apply_batched(feats_coarse, tnbr, weights, bias,
                                    rev=rev)
    return jnp.where(valid_fine[..., None], out, 0.0)


def global_max_pool(feats, valid):
    return jnp.max(jnp.where(valid[:, None], feats, -jnp.inf), 0)


def sparse_max_pool(coords, valid, feats, stride=2, kernel_size=2,
                    max_out=None, tensor_stride=1):
    """MinkowskiMaxPooling(kernel=2, stride=2)."""
    max_out = max_out or coords.shape[0]
    out_coords, out_valid = downsample_coords(
        coords, valid, stride * tensor_stride, max_out)
    offs = kernel_offsets(kernel_size)
    nbr = neighbor_table(coords, valid, out_coords, out_valid, offs,
                         in_stride=tensor_stride)
    m_in = feats.shape[0]

    def tap(acc, nbr_k):
        g = feats[jnp.clip(nbr_k, 0, m_in - 1)]
        g = jnp.where((nbr_k >= 0)[:, None], g, -jnp.inf)
        return jnp.maximum(acc, g), None

    out0 = jnp.full((nbr.shape[0], feats.shape[1]), -jnp.inf,
                    feats.dtype)
    out, _ = jax.lax.scan(tap, out0, nbr.T)
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out_coords, out_valid, jnp.where(out_valid[:, None], out, 0.0)
