"""Batched coordinate transforms: inverse 3D augmentation + 2D projection.

TPU-native equivalents of mmdet3d's ``apply_3d_transformation`` /
``coord_2d_transform`` / ``points_cam2img`` used by the DeMF reference-point
bridge (class_agnostic_vote_head.py:524-547).  The reference loops per
sample on host; here meta is batched arrays and everything is vmapped inside
the jitted step.
"""
from __future__ import annotations

import jax.numpy as jnp

from .boxes import points_cam2img


def reverse_3d_transform(points, meta):
    """Undo the recorded 3D augmentation flow (HF -> R -> S -> T applied
    forward; reversed here as T^-1, S^-1, R^-1, HF).

    Args:
        points: (B, N, 3) augmented-frame points.
        meta: dict with 'pcd_trans' (B, 3), 'pcd_scale_factor' (B,),
            'pcd_rotation' (B, 3, 3) (forward p' = p @ M),
            'pcd_horizontal_flip' (B,) bool.
    Returns:
        (B, N, 3) points in the original depth frame.
    """
    p = points
    if 'pcd_trans' in meta:
        p = p - meta['pcd_trans'][:, None, :]
    if 'pcd_scale_factor' in meta:
        p = p / meta['pcd_scale_factor'][:, None, None]
    if 'pcd_rotation' in meta:
        # rotation matrices are orthogonal: inverse = transpose
        p = jnp.einsum('bnj,bkj->bnk', p, meta['pcd_rotation'])
    if 'pcd_horizontal_flip' in meta:
        flip = meta['pcd_horizontal_flip'][:, None]
        p = p.at[..., 0].set(jnp.where(flip, -p[..., 0], p[..., 0]))
    return p


def forward_2d_transform(uv, meta):
    """Original-image pixel coords -> transformed-image coords
    (mmdet3d ``coord_2d_transform(ori2new=True)``): scale then h-flip."""
    if 'scale_factor' in meta:
        uv = uv * meta['scale_factor'][:, None, :2]
    if 'flip' in meta and 'img_shape' in meta:
        w = meta['img_shape'][:, 1].astype(uv.dtype)[:, None]
        flip = meta['flip'][:, None]
        u = jnp.where(flip, w - uv[..., 0], uv[..., 0])
        uv = jnp.stack([u, uv[..., 1]], -1)
    return uv


def project_points_to_image(points, meta, clamp=True):
    """Full DeMF bridge: undo 3D aug -> depth2img projection -> 2D transform
    -> normalize to [0, 1] by (img_shape - 1) (ref :524-547).

    Args:
        points: (B, N, 3).
        meta: batched meta dict with depth2img (B, 4, 4) + aug fields.
    Returns:
        (B, N, 2) normalized (u, v) in [0, 1].
    """
    xyz_depth = reverse_3d_transform(points, meta)
    proj = meta['depth2img']  # (B, 4, 4)
    ones = jnp.ones_like(xyz_depth[..., :1])
    hom = jnp.concatenate([xyz_depth, ones], -1)
    p2d = jnp.einsum('bnj,bkj->bnk', hom, proj)
    uv = p2d[..., :2] / jnp.clip(p2d[..., 2:3], 1e-6, None)
    uv = forward_2d_transform(uv, meta)
    shape = meta['img_shape'].astype(uv.dtype)
    u = uv[..., 0] / (shape[:, 1:2] - 1)
    v = uv[..., 1] / (shape[:, 0:1] - 1)
    uv = jnp.stack([u, v], -1)
    if clamp:
        uv = jnp.clip(uv, 0.0, 1.0)
    return uv
