"""RoIAlign as XLA bilinear crop-and-resize (mmcv CUDA op N10 equivalent).

Reference invocation site: configs/_base_/models/imvotenet_image.py:37
(output_size=7, used by the ImVoteNet baseline's Faster R-CNN branch).
Fixed-shape: every RoI in the padded (R, 4) set is sampled with a static
(out*2) x (out*2) grid (2x2 samples per bin, averaged) in ``aligned=True``
convention; invalid RoIs are masked by the caller.
"""
from __future__ import annotations

import jax.numpy as jnp


def roi_align(features, rois, output_size=7, spatial_scale=1.0,
              samples_per_bin=2):
    """
    Args:
        features: (H, W, C) one image's feature map (NHWC single image).
        rois: (R, 4) xyxy boxes in input-image coords.
        spatial_scale: feature stride reciprocal.
    Returns:
        (R, out, out, C).
    """
    h, w, c = features.shape
    out = output_size
    s = samples_per_bin
    boxes = rois * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # aligned=True: offset -0.5
    roi_w = jnp.clip(x2 - x1, 1e-3, None)
    roi_h = jnp.clip(y2 - y1, 1e-3, None)
    bin_w = roi_w / out
    bin_h = roi_h / out

    # sample grid: (out*s) points per axis at bin-subsample centers
    gi = (jnp.arange(out * s) + 0.5) / s                    # in bin units
    sx = x1[:, None] + gi[None, :] * bin_w[:, None] - 0.5   # (R, out*s)
    sy = y1[:, None] + gi[None, :] * bin_h[:, None] - 0.5

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx1 = sx - x0
    wy1 = sy - y0

    def gather(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        flat = features.reshape(h * w, c)
        idx = yi[:, :, None] * w + xi[:, None, :]           # (R, oy, ox)
        return flat[idx.reshape(-1)].reshape(idx.shape + (c,))

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy1[:, :, None, None]
    wx = wx1[:, None, :, None]
    val = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
           v10 * wy * (1 - wx) + v11 * wy * wx)             # (R, oy, ox, C)
    r = rois.shape[0]
    val = val.reshape(r, out, s, out, s, c)
    return val.mean(axis=(2, 4))
