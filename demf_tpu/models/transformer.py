"""Transformer building blocks: sine pos-encoding, multi-scale deformable
attention, DETR encoder/decoder layers, and the DeMF image encoder.

TPU-native re-design of the mmcv transformer bricks the reference assembles
(configs/demf/demf_votenet.py:28-47,68-96; demf/modeling/layers/
deform_detr_encoder.py; demf/modeling/layers/transformer.py).  Everything is
batch-first (B, N, C) with static per-level spatial shapes, so the whole
encoder is one fused XLA program; the MSDA sampling core lives in
demf_tpu.ops.msda.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.msda import multi_scale_deformable_attention
from ..utils.registry import (HEADS, POSITIONAL_ENCODINGS,
                              TRANSFORMER_LAYERS)


@POSITIONAL_ENCODINGS.register_module()
class SinePositionalEncoding:
    """Stateless sine positional encoding (mmcv-compatible numerics)."""

    def __init__(self, num_feats=128, temperature=10000, normalize=False,
                 scale=2 * math.pi, offset=0., eps=1e-6):
        self.num_feats = num_feats
        self.temperature = temperature
        self.normalize = normalize
        self.scale = scale
        self.offset = offset
        self.eps = eps

    def __call__(self, mask):
        """mask: (B, H, W) bool where True = padding.
        Returns (B, H, W, 2 * num_feats)."""
        not_mask = (~mask).astype(jnp.float32)
        y_embed = jnp.cumsum(not_mask, axis=1)
        x_embed = jnp.cumsum(not_mask, axis=2)
        if self.normalize:
            y_embed = (y_embed + self.offset) / \
                (y_embed[:, -1:, :] + self.eps) * self.scale
            x_embed = (x_embed + self.offset) / \
                (x_embed[:, :, -1:] + self.eps) * self.scale
        dim_t = jnp.arange(self.num_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_feats)
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t
        pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                           jnp.cos(pos_x[..., 1::2])], -1).reshape(
            *x_embed.shape, -1)
        pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                           jnp.cos(pos_y[..., 1::2])], -1).reshape(
            *y_embed.shape, -1)
        return jnp.concatenate([pos_y, pos_x], -1)


def _msda_offset_bias_init(num_heads, num_levels, num_points):
    """DETR-style grid init of the sampling-offset bias."""
    thetas = np.arange(num_heads) * (2.0 * np.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (h, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for p in range(num_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)


class MultiScaleDeformableAttention(nn.Module):
    """MSDA layer with projections + residual (mmcv semantics, batch-first).

    The sampling core is the XLA gather kernel in ops/msda.py (CUDA N6 in
    SURVEY.md §2b).
    """
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    im2col_step: int = 64  # accepted for config parity; unused on TPU
    batch_first: bool = True
    norm_cfg: Any = None
    init_cfg: Any = None

    @nn.compact
    def __call__(self, query, value, *, query_pos=None, key_padding_mask=None,
                 reference_points=None, spatial_shapes=None,
                 train: bool = False, identity=None):
        """
        Args:
            query: (B, Nq, C).
            value: (B, Nv, C) flattened multi-level features.
            query_pos: (B, Nq, C) or None.
            key_padding_mask: (B, Nv) bool, True = padding.
            reference_points: (B, Nq, L, 2) normalized.
            spatial_shapes: static tuple of (h, w).
        """
        h, l, p = self.num_heads, self.num_levels, self.num_points
        c = self.embed_dims
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos

        v = nn.Dense(c, name='value_proj')(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0., v)
        b, nv, _ = v.shape
        v = v.reshape(b, nv, h, c // h)

        offsets = nn.Dense(
            h * l * p * 2, name='sampling_offsets',
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32:
                jnp.asarray(_msda_offset_bias_init(h, l, p), dtype))(query)
        nq = query.shape[1]
        offsets = offsets.reshape(b, nq, h, l, p, 2)

        attn = nn.Dense(h * l * p, name='attention_weights',
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(query)
        attn = jax.nn.softmax(attn.reshape(b, nq, h, l * p), -1)
        attn = attn.reshape(b, nq, h, l, p)

        normalizer = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], jnp.float32)
        if reference_points.shape[-1] == 2:
            locs = reference_points[:, :, None, :, None, :] + \
                offsets / normalizer[None, None, None, :, None, :]
        else:  # 4D refs (cx, cy, w, h): offsets scaled by box size
            locs = reference_points[:, :, None, :, None, :2] + \
                offsets / p * reference_points[:, :, None, :, None, 2:] * 0.5
        out = multi_scale_deformable_attention(v, spatial_shapes, locs, attn)
        out = nn.Dense(c, name='output_proj')(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out + identity


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 1024
    ffn_drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.feedforward_channels, name='fc1')(x)
        y = nn.relu(y)
        y = nn.Dropout(self.ffn_drop, deterministic=not train)(y)
        y = nn.Dense(self.embed_dims, name='fc2')(y)
        y = nn.Dropout(self.ffn_drop, deterministic=not train)(y)
        return x + y


class MultiheadAttention(nn.Module):
    """Standard MHA with mmcv's query_pos/key_pos + residual semantics."""
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key=None, value=None, *, query_pos=None,
                 key_pos=None, key_padding_mask=None, train: bool = False):
        if key is None:
            key = query
        if value is None:
            value = key
        if key_pos is None and query_pos is not None and \
                key.shape == query.shape:
            key_pos = query_pos
        identity = query
        q = query + query_pos if query_pos is not None else query
        k = key + key_pos if key_pos is not None else key
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            out_features=self.embed_dims, dropout_rate=self.dropout,
            deterministic=not train, name='attn')
        mask = None
        if key_padding_mask is not None:
            mask = ~key_padding_mask[:, None, None, :]
        out = attn(q, k, value, mask=mask)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return identity + out


class DetrTransformerEncoderLayer(nn.Module):
    """self_attn(MSDA) -> LN -> FFN -> LN."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024
    ffn_dropout: float = 0.1
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, pos, key_padding_mask, reference_points,
                 spatial_shapes, train: bool = False):
        x = MultiScaleDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            dropout=self.attn_dropout, name='self_attn')(
                x, x, query_pos=pos, key_padding_mask=key_padding_mask,
                reference_points=reference_points,
                spatial_shapes=spatial_shapes, train=train)
        dt = x.dtype   # dtype-preserving: LN promotes to f32 internally
        x = nn.LayerNorm(name='norm1')(x).astype(dt)
        x = FFN(self.embed_dims, self.feedforward_channels,
                self.ffn_dropout, name='ffn')(x, train)
        x = nn.LayerNorm(name='norm2')(x).astype(dt)
        return x


class DetrTransformerDecoderLayer(nn.Module):
    """self_attn(MHA) -> LN -> cross_attn(MSDA) -> LN -> FFN -> LN."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024
    ffn_dropout: float = 0.1
    self_attn_dropout: float = 0.1
    cross_attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, query, value, *, query_pos, key_padding_mask,
                 reference_points, spatial_shapes, train: bool = False):
        q = MultiheadAttention(self.embed_dims, self.num_heads,
                               self.self_attn_dropout, name='self_attn')(
            query, query_pos=query_pos, train=train)
        dt = query.dtype
        q = nn.LayerNorm(name='norm1')(q).astype(dt)
        q = MultiScaleDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            dropout=self.cross_attn_dropout, name='cross_attn')(
                q, value, query_pos=query_pos,
                key_padding_mask=key_padding_mask,
                reference_points=reference_points,
                spatial_shapes=spatial_shapes, train=train)
        q = nn.LayerNorm(name='norm2')(q).astype(dt)
        q = FFN(self.embed_dims, self.feedforward_channels,
                self.ffn_dropout, name='ffn')(q, train)
        q = nn.LayerNorm(name='norm3')(q).astype(dt)
        return q


def make_level_masks(img_shape, batch_hw, spatial_shapes):
    """Per-level padding masks from per-image valid shapes.

    Replicates mask building + F.interpolate(nearest) downsampling of the
    reference (deform_detr_encoder.py:69-84) without materializing the
    full-res mask: level pixel (i, j) is padding iff its nearest full-res
    pixel falls outside (img_h, img_w).

    Args:
        img_shape: (B, 2) int [h, w] valid sizes.
        batch_hw: static (H, W) of the padded batch.
        spatial_shapes: static tuple of level (h, w).
    Returns:
        list of (B, h, w) bool masks (True = padding).
    """
    big_h, big_w = batch_hw
    masks = []
    for (h, w) in spatial_shapes:
        # F.interpolate(nearest): src_idx = floor(dst_idx * src/dst)
        rows = (jnp.arange(h) * big_h // h).astype(jnp.int32)
        cols = (jnp.arange(w) * big_w // w).astype(jnp.int32)
        row_pad = rows[None, :] >= img_shape[:, :1]   # (B, h)
        col_pad = cols[None, :] >= img_shape[:, 1:2]  # (B, w)
        masks.append(row_pad[:, :, None] | col_pad[:, None, :])
    return masks


def get_valid_ratios(masks):
    """(B, L, 2) [w_ratio, h_ratio] of valid area per level (ref :38-46)."""
    ratios = []
    for m in masks:
        valid_h = jnp.sum(~m[:, :, 0], 1).astype(jnp.float32) / m.shape[1]
        valid_w = jnp.sum(~m[:, 0, :], 1).astype(jnp.float32) / m.shape[2]
        ratios.append(jnp.stack([valid_w, valid_h], -1))
    return jnp.stack(ratios, 1)


def encoder_reference_points(spatial_shapes, valid_ratios):
    """Per-token reference grid at pixel centers scaled by valid ratios
    (ref deform_detr_encoder.py:48-66). Returns (B, sum_HW, L, 2)."""
    b = valid_ratios.shape[0]
    ref_list = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = jnp.arange(h, dtype=jnp.float32) + 0.5
        rx = jnp.arange(w, dtype=jnp.float32) + 0.5
        ry_n = ry[None, :] / (valid_ratios[:, lvl, 1:2] * h)   # (B, h)
        rx_n = rx[None, :] / (valid_ratios[:, lvl, 0:1] * w)   # (B, w)
        gx, gy = jnp.broadcast_arrays(rx_n[:, None, :], ry_n[:, :, None])
        ref = jnp.stack([gx, gy], -1)                          # (B, h, w, 2)
        ref_list.append(ref.reshape(b, h * w, 2))
    refs = jnp.concatenate(ref_list, 1)            # (B, sum_HW, 2)
    return refs[:, :, None, :] * valid_ratios[:, None, :, :]


@HEADS.register_module()
class DeformableDetrEncoder(nn.Module):
    """Standalone Deformable-DETR encoder used as the DeMF image encoder.

    Re-design of the reference's ``DeformableDetrEncoder``
    (demf/modeling/layers/deform_detr_encoder.py): padding masks + sine pos
    encodings + learned level embeds, flatten 4 levels, run N MSDA self-attn
    layers, un-flatten back to feature maps.  NHWC in/out.
    """
    encoder: Any = None
    positional_encoding: Any = None
    num_feature_levels: int = 4
    embed_dims: int = 256
    init_cfg: Any = None

    @nn.compact
    def __call__(self, mlvl_feats, img_shape, train: bool = False):
        """
        Args:
            mlvl_feats: tuple of (B, H_l, W_l, C) NHWC maps.
            img_shape: (B, 2) valid [h, w] of each image at input resolution.
        Returns:
            tuple of encoded (B, H_l, W_l, C) maps.
        """
        enc_cfg = dict(self.encoder or {})
        num_layers = enc_cfg.get('num_layers', 6)
        tl = dict(enc_cfg.get('transformerlayers', {}))
        attn_cfg = dict(tl.get('attn_cfgs', {}))
        pe_cfg = dict(self.positional_encoding or {})
        pe_cfg.pop('type', None)
        pos_enc = SinePositionalEncoding(**pe_cfg)

        spatial_shapes = tuple(
            (f.shape[1], f.shape[2]) for f in mlvl_feats)
        # input resolution = level-0 stride 8 (C3): reconstruct padded hw
        batch_hw = (mlvl_feats[0].shape[1] * 8, mlvl_feats[0].shape[2] * 8)
        # img_shape is at input resolution; masks need level-relative compare
        masks = make_level_masks(img_shape, batch_hw, spatial_shapes)
        valid_ratios = get_valid_ratios(masks)

        level_embeds = self.param(
            'level_embeds', nn.initializers.normal(1.0),
            (self.num_feature_levels, self.embed_dims))

        feat_flat, mask_flat, pos_flat = [], [], []
        for lvl, (feat, mask) in enumerate(zip(mlvl_feats, masks)):
            b, h, w, c = feat.shape
            pos = pos_enc(mask) + level_embeds[lvl]
            feat_flat.append(feat.reshape(b, h * w, c))
            pos_flat.append(pos.reshape(b, h * w, c))
            mask_flat.append(mask.reshape(b, h * w))
        x = jnp.concatenate(feat_flat, 1)
        pos = jnp.concatenate(pos_flat, 1)
        key_padding_mask = jnp.concatenate(mask_flat, 1)
        reference_points = encoder_reference_points(spatial_shapes,
                                                    valid_ratios)

        for i in range(num_layers):
            x = DetrTransformerEncoderLayer(
                embed_dims=self.embed_dims,
                num_heads=attn_cfg.get('num_heads', 8),
                num_levels=self.num_feature_levels,
                num_points=attn_cfg.get('num_points', 4),
                feedforward_channels=tl.get('feedforward_channels', 1024),
                ffn_dropout=tl.get('ffn_dropout', 0.1),
                attn_dropout=attn_cfg.get('dropout', 0.1),
                name=f'layers_{i}')(
                    x, pos=pos, key_padding_mask=key_padding_mask,
                    reference_points=reference_points,
                    spatial_shapes=spatial_shapes, train=train)

        outs = []
        start = 0
        for (h, w) in spatial_shapes:
            outs.append(x[:, start:start + h * w].reshape(
                x.shape[0], h, w, x.shape[-1]))
            start += h * w
        return tuple(outs)


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute query-pos embedding: MLP over (center, size)
    (reference transformer.py:18-36: Conv1d(6->C)+BN+ReLU+Conv1d)."""
    input_channel: int = 6
    num_pos_feats: int = 256

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        x = nn.Dense(self.num_pos_feats, name='fc1')(xyz)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn')(x).astype(xyz.dtype)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, name='fc2')(x)


@TRANSFORMER_LAYERS.register_module()
class DeMFTransformerDecoderLayer(nn.Module):
    """DETR decoder layer with learned (center,size) query positions
    (reference transformer.py:39-80)."""
    transformerlayers: Any = None
    posembed: Any = None
    num_layers: int = 1  # accepted for config parity (used by the head)

    @nn.compact
    def __call__(self, query, value, *, query_pos_input, key_padding_mask,
                 reference_points, spatial_shapes, valid_ratios,
                 train: bool = False):
        """
        Args:
            query: (B, Nq, C) proposal features.
            value: (B, Nv, C) flattened image tokens.
            query_pos_input: (B, Nq, 6) detached (center, size).
            reference_points: (B, Nq, 2) normalized image points.
            valid_ratios: (B, L, 2).
        """
        tl = dict(self.transformerlayers or {})
        attn_cfgs = tl.get('attn_cfgs', [{}, {}])
        self_cfg = dict(attn_cfgs[0])
        cross_cfg = dict(attn_cfgs[1])
        pe_cfg = dict(self.posembed or {})

        # per-level reference points scaled by valid ratios (ref :62-68)
        ref_inp = reference_points[:, :, None, :] * valid_ratios[:, None]

        query_pos = PositionEmbeddingLearned(
            input_channel=pe_cfg.get('input_channel', 6),
            num_pos_feats=pe_cfg.get('num_pos_feats', 256),
            name='posembed')(query_pos_input, train)

        return DetrTransformerDecoderLayer(
            embed_dims=cross_cfg.get('embed_dims', 256),
            num_heads=cross_cfg.get('num_heads', 8),
            num_levels=cross_cfg.get('num_levels', 4),
            num_points=cross_cfg.get('num_points', 4),
            feedforward_channels=tl.get('feedforward_channels', 1024),
            ffn_dropout=tl.get('ffn_dropout', 0.1),
            self_attn_dropout=self_cfg.get('dropout', 0.1),
            cross_attn_dropout=cross_cfg.get('dropout', 0.1),
            name='layer')(
                query, value, query_pos=query_pos,
                key_padding_mask=key_padding_mask,
                reference_points=ref_inp, spatial_shapes=spatial_shapes,
                train=train)
