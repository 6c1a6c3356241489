"""Multi-scale deformable attention sampling core.

TPU-native replacement for the mmcv CUDA kernel
``MultiScaleDeformableAttnFunction`` (N6 in SURVEY.md §2b; reference
invocation demf/modeling/layers/transformer.py:9, used by the 6-layer image
encoder and the DeMF decoder cross-attention).  The math matches
``multi_scale_deformable_attn_pytorch`` / the CUDA kernel exactly:
grid_sample-style bilinear reads (align_corners=False, zero padding) at
learned per-head/level/point offsets, reduced with attention weights.

TPU design notes:
  * the 4-corner gathers run in a (B, heads, head_dim, Q*P) layout — the
    long sample axis sits in the 128-lane dimension and head_dim (32) in
    sublanes, avoiding the 4x lane-padding blowup of a head_dim-minor
    layout;
  * queries are processed in static chunks via ``lax.map`` so the live
    gather temporaries are bounded (~hundreds of MB at the reference's
    ~22k-token encoder instead of multi-GB);
  * spatial shapes are static so every slice is compile-time fixed.
A Pallas kernel specializing the gather tiles is the planned next step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather_hd_lanes(value_t, loc_xy, h, w):
    """Bilinear sample with zero padding, align_corners=False.

    Args:
        value_t: (B, heads, head_dim, H*W) one level's features
            (sample axis last).
        loc_xy: (B, heads, Q, 2) normalized [0, 1] sample locations (x, y).
    Returns:
        (B, heads, head_dim, Q).
    """
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            xi = x0i + dx
            yi = y0i + dy
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            g = jnp.take_along_axis(
                value_t, idx[:, :, None, :].astype(jnp.int32), axis=3)
            wgt = (wx * wy * ok).astype(value_t.dtype)[:, :, None, :]
            out = g * wgt if out is None else out + g * wgt
    return out


def multi_scale_deformable_attention(value, spatial_shapes,
                                     sampling_locations, attention_weights,
                                     query_chunk=4096):
    """Core MSDA sampling + weighted reduction.

    Args:
        value: (B, sum_HW, num_heads, head_dim) flattened multi-level values.
        spatial_shapes: static tuple of (h, w) per level.
        sampling_locations: (B, Q, heads, levels, points, 2) in [0, 1].
        attention_weights: (B, Q, heads, levels, points), normalized.
        query_chunk: static query-chunk size bounding gather temporaries.
    Returns:
        (B, Q, heads * head_dim).
    """
    b, _, heads, hd = value.shape
    q = sampling_locations.shape[1]
    npoints = sampling_locations.shape[4]

    # per-level value planes, sample axis last: (B, heads, hd, H*W)
    planes = []
    start = 0
    for (h, w) in spatial_shapes:
        v = value[:, start:start + h * w]
        planes.append(jnp.transpose(v, (0, 2, 3, 1)))
        start += h * w

    def run_chunk(args):
        locs_c, aw_c = args
        # locs_c: (B, qc, heads, L, P, 2); aw_c: (B, qc, heads, L, P)
        qc = locs_c.shape[1]
        out = jnp.zeros((b, heads, hd, qc), value.dtype)
        for lvl, (h, w) in enumerate(spatial_shapes):
            loc = jnp.moveaxis(locs_c[:, :, :, lvl], 2, 1)  # (B,h,qc,P,2)
            loc = loc.reshape(b, heads, qc * npoints, 2)
            sampled = _bilinear_gather_hd_lanes(planes[lvl], loc, h, w)
            sampled = sampled.reshape(b, heads, hd, qc, npoints)
            aw = jnp.moveaxis(aw_c[:, :, :, lvl], 2, 1)     # (B,h,qc,P)
            aw = aw[:, :, None].astype(value.dtype)
            out = out + jnp.sum(sampled * aw, axis=4)
        return out                                           # (B,h,hd,qc)

    if q <= query_chunk:
        out = run_chunk((sampling_locations, attention_weights))
        return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, q, heads * hd)

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
    outs = jax.lax.map(run_chunk, (locs, aw))                # (nc,B,h,hd,qc)
    out = jnp.moveaxis(outs, 0, 3)                           # (B,h,hd,nc,qc)
    out = out.reshape(b, heads, hd, q_pad)[..., :q]
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, q, heads * hd)
