"""Multi-scale deformable attention sampling core.

TPU-native replacement for the mmcv CUDA kernel
``MultiScaleDeformableAttnFunction`` (N6 in SURVEY.md §2b; reference
invocation demf/modeling/layers/transformer.py:9, used by the 6-layer image
encoder and the DeMF decoder cross-attention).  The math matches
``multi_scale_deformable_attn_pytorch`` / the CUDA kernel exactly:
grid_sample-style bilinear reads (align_corners=False, zero padding) at
learned per-head/level/point offsets, reduced with attention weights.

Implementation: per level, the 4-corner gathers are expressed as
``take_along_axis`` over a head-major value layout so XLA lowers them to
efficient dynamic-gathers; the lerp and the weighted reduction fuse into the
surrounding elementwise graph.  Spatial shapes are *static* so every slice is
compile-time fixed.  A Pallas kernel specializing the gather tiles is the
planned upgrade path; this XLA formulation is already fusion-friendly and
keeps everything in bf16-capable form.
"""
from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather(value_hw, loc_xy, h, w):
    """Bilinear sample with zero padding, align_corners=False.

    Args:
        value_hw: (B, heads, H*W, head_dim) one level's features.
        loc_xy: (B, heads, Q, 2) normalized [0, 1] sample locations (x, y).
        h, w: static level dims.
    Returns:
        (B, heads, Q, head_dim).
    """
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy, wy in ((0, wy0), (1, wy1)):
        for dx, wx in ((0, wx0), (1, wx1)):
            xi = x0i + dx
            yi = y0i + dy
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            g = jnp.take_along_axis(
                value_hw, idx[..., None].astype(jnp.int32), axis=2)
            wgt = (wx * wy * ok).astype(value_hw.dtype)[..., None]
            out = g * wgt if out is None else out + g * wgt
    return out


def multi_scale_deformable_attention(value, spatial_shapes,
                                     sampling_locations, attention_weights):
    """Core MSDA sampling + weighted reduction.

    Args:
        value: (B, sum_HW, num_heads, head_dim) flattened multi-level values.
        spatial_shapes: static tuple of (h, w) per level.
        sampling_locations: (B, Q, heads, levels, points, 2) in [0, 1].
        attention_weights: (B, Q, heads, levels, points), normalized.
    Returns:
        (B, Q, heads * head_dim).
    """
    b, _, heads, hd = value.shape
    q = sampling_locations.shape[1]
    npoints = sampling_locations.shape[4]
    out = jnp.zeros((b, heads, q, hd), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w]                    # (B, HW, hd*, d)
        v = jnp.swapaxes(v, 1, 2)                            # (B, heads, HW, d)
        loc = sampling_locations[:, :, :, lvl]               # (B, Q, heads, P, 2)
        loc = jnp.moveaxis(loc, 2, 1).reshape(b, heads, q * npoints, 2)
        sampled = _bilinear_gather(v, loc, h, w)             # (B, heads, Q*P, d)
        sampled = sampled.reshape(b, heads, q, npoints, hd)
        aw = attention_weights[:, :, :, lvl]                 # (B, Q, heads, P)
        aw = jnp.moveaxis(aw, 2, 1)[..., None]               # (B, heads, Q, P, 1)
        out = out + jnp.sum(sampled * aw.astype(value.dtype), axis=3)
        start += h * w
    return jnp.moveaxis(out, 1, 2).reshape(b, q, heads * hd)
