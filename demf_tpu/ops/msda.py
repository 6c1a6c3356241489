"""Multi-scale deformable attention sampling core.

TPU-native replacement for the mmcv CUDA kernel
``MultiScaleDeformableAttnFunction`` (N6 in SURVEY.md §2b; reference
invocation demf/modeling/layers/transformer.py:9, used by the 6-layer image
encoder and the DeMF decoder cross-attention).  The math matches
``multi_scale_deformable_attn_pytorch`` / the CUDA kernel exactly:
grid_sample-style bilinear reads (align_corners=False, zero padding) at
learned per-head/level/point offsets, reduced with attention weights.

TPU performance notes (measured on v5e):
  * gathers fetch CONTIGUOUS per-head rows (layout (B, heads, HW, hd),
    gather on axis 2) — a lane-minor sample layout turns every read into a
    4-byte scattered access and is ~10x slower;
  * the gather operand is cast to bf16 (halves the dominant HBM traffic;
    the weighted reduction accumulates in fp32);
  * queries run in static chunks via ``lax.map`` so live gather temporaries
    stay bounded at the reference's ~22k-token encoder;
  * spatial shapes are static so every slice is compile-time fixed.
The gather traffic (4 corners x points x levels x heads) is inherent to an
XLA formulation; a Pallas kernel holding the bf16 level plane in VMEM is the
~100x-traffic upgrade path once Mosaic exposes vector gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather_rows(value_rows, loc_xy, h, w, out_dtype):
    """Bilinear sample with zero padding, align_corners=False.

    Args:
        value_rows: (B, heads, H*W, hd) one level's features (bf16),
            hd-minor so each gathered row is contiguous.
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
            g = jnp.take_along_axis(
                value_rows, idx[..., None].astype(jnp.int32),
                axis=2).astype(out_dtype)
            wgt = (wx * wy * ok.astype(out_dtype))[..., None]
            out = g * wgt if out is None else out + g * wgt
    return out


def multi_scale_deformable_attention(value, spatial_shapes,
                                     sampling_locations, attention_weights,
                                     query_chunk=2048, gather_dtype=None):
    """Core MSDA sampling + weighted reduction.

    Args:
        value: (B, sum_HW, num_heads, head_dim) flattened multi-level values.
        spatial_shapes: static tuple of (h, w) per level.
        sampling_locations: (B, Q, heads, levels, points, 2) in [0, 1].
        attention_weights: (B, Q, heads, levels, points), normalized.
        query_chunk: static query-chunk size bounding gather temporaries.
    Returns:
        (B, Q, heads * head_dim) in value.dtype.
    """
    b, _, heads, hd = value.shape
    q = sampling_locations.shape[1]
    npoints = sampling_locations.shape[4]
    if gather_dtype is None:
        gather_dtype = (jnp.bfloat16 if value.dtype == jnp.float32
                        else value.dtype)

    # per-level value planes: (B, heads, HW, hd), rows contiguous per head
    planes = []
    start = 0
    for (h, w) in spatial_shapes:
        v = value[:, start:start + h * w].astype(gather_dtype)
        planes.append(jnp.transpose(v, (0, 2, 1, 3)))
        start += h * w

    def run_chunk(args):
        locs_c, aw_c = args
        qc = locs_c.shape[1]
        out = jnp.zeros((b, heads, qc, hd), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            loc = jnp.moveaxis(locs_c[:, :, :, lvl], 2, 1)   # (B,h,qc,P,2)
            loc = loc.reshape(b, heads, qc * npoints, 2)
            sampled = _bilinear_gather_rows(planes[lvl], loc, h, w,
                                            gather_dtype)
            sampled = sampled.reshape(b, heads, qc, npoints, hd)
            aw = jnp.moveaxis(aw_c[:, :, :, lvl], 2, 1)      # (B,h,qc,P)
            out = out + jnp.sum(
                sampled.astype(jnp.float32) *
                aw[..., None].astype(jnp.float32), axis=3)
        return out                                            # (B,h,qc,hd)

    if q <= query_chunk:
        out = run_chunk((sampling_locations, attention_weights))
        return jnp.moveaxis(out, 1, 2).reshape(
            b, q, heads * hd).astype(value.dtype)

    nchunks = -(-q // query_chunk)
    q_pad = nchunks * query_chunk
    locs = jnp.pad(sampling_locations,
                   ((0, 0), (0, q_pad - q), (0, 0), (0, 0), (0, 0), (0, 0)))
    aw = jnp.pad(attention_weights,
                 ((0, 0), (0, q_pad - q), (0, 0), (0, 0), (0, 0)))
    locs = jnp.moveaxis(locs.reshape(b, nchunks, query_chunk, heads,
                                     len(spatial_shapes), npoints, 2), 1, 0)
    aw = jnp.moveaxis(aw.reshape(b, nchunks, query_chunk, heads,
                                 len(spatial_shapes), npoints), 1, 0)
    outs = jax.lax.map(run_chunk, (locs, aw))                # (nc,B,h,qc,hd)
    out = jnp.moveaxis(outs, 0, 2)                           # (B,h,nc,qc,hd)
    out = out.reshape(b, heads, q_pad, hd)[:, :, :q]
    return jnp.moveaxis(out, 1, 2).reshape(
        b, q, heads * hd).astype(value.dtype)
