"""Vote offset regression module (mmdet3d ``VoteModule`` equivalent).

Reference config: configs/demf/demf_votenet.py:142-154; built by the vote
heads at class_agnostic_vote_head.py:382.  Channel-last Dense stacks; the
vote loss (seed-weighted min-over-GT-votes chamfer) lives here as
``vote_loss`` to mirror the reference's ``VoteModule.get_loss``.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2 import SharedMLP


class VoteModule(nn.Module):
    in_channels: int = 256
    vote_per_seed: int = 1
    gt_per_seed: int = 3
    conv_channels: Sequence[int] = (256, 256)
    norm_feats: bool = True
    with_res_feat: bool = True
    vote_loss: Any = None
    conv_cfg: Any = None
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, seed_points, seed_feats, train: bool = False):
        """
        Args:
            seed_points: (B, N, 3).
            seed_feats: (B, N, C).
        Returns:
            (vote_points (B, N*vps, 3), vote_feats (B, N*vps, C),
             vote_offset (B, N*vps, 3)).
        """
        b, n, c = seed_feats.shape
        vps = self.vote_per_seed
        x = SharedMLP(list(self.conv_channels), name='vote_conv')(
            seed_feats, train)
        out_dim = (3 + c) if self.with_res_feat else 3
        out = nn.Dense(out_dim * vps, name='conv_out')(x)
        out = out.reshape(b, n, vps, out_dim)

        offset = out[..., 0:3]
        vote_points = (seed_points[:, :, None, :] + offset).reshape(
            b, n * vps, 3)
        if self.with_res_feat:
            res_feats = out[..., 3:]
            vote_feats = (seed_feats[:, :, None, :] + res_feats).reshape(
                b, n * vps, c)
        else:
            vote_feats = jnp.repeat(seed_feats, vps, axis=1)
        if self.norm_feats:
            norm = jnp.linalg.norm(vote_feats, axis=-1, keepdims=True)
            vote_feats = vote_feats / jnp.maximum(norm, 1e-12)
        return vote_points, vote_feats, offset.reshape(b, n * vps, 3)

    def get_loss(self, seed_points, vote_points, seed_indices,
                 vote_target_masks, vote_targets):
        """Seed-weighted min-over-GT chamfer vote loss.

        Mirrors mmdet3d VoteModule.get_loss (invoked by the reference at
        class_agnostic_vote_head.py:58-61): for each seed, the l1 distance
        from its vote to the nearest of its ``gt_per_seed`` GT votes, summed
        with weights normalized over the whole batch.

        Args:
            seed_points: (B, N, 3).
            vote_points: (B, N*vps, 3).
            seed_indices: (B, N) int indices into the raw cloud.
            vote_target_masks: (B, P) per-raw-point vote mask.
            vote_targets: (B, P, 3*gt_per_seed) per-raw-point GT offsets.
        """
        b, n = seed_points.shape[:2]
        gps = self.gt_per_seed
        idx = seed_indices.astype(jnp.int32)
        seed_gt_votes_mask = jnp.take_along_axis(
            vote_target_masks.astype(jnp.float32), idx, axis=1)  # (B, N)
        seed_gt_votes = jnp.take_along_axis(
            vote_targets, idx[..., None], axis=1)                # (B, N, 3g)
        seed_gt_votes = seed_gt_votes + jnp.tile(seed_points, (1, 1, gps))
        weight = seed_gt_votes_mask / (jnp.sum(seed_gt_votes_mask) + 1e-6)

        votes = vote_points.reshape(b, n, self.vote_per_seed, 3)
        gts = seed_gt_votes.reshape(b, n, gps, 3)
        # l1 distance of every (vote, gt-vote) pair, then min over votes
        # (chamfer dst side), min over gt votes, weighted sum.
        d = jnp.sum(jnp.abs(votes[:, :, :, None, :] - gts[:, :, None, :, :]),
                    -1)                                         # (B,N,vps,g)
        dst = jnp.min(d, axis=2)                                # (B, N, g)
        dst_weight = self._dst_weight * weight                  # (B, N)
        return jnp.sum(jnp.min(dst, axis=-1) * dst_weight)

    @property
    def _dst_weight(self):
        if self.vote_loss is None:
            return 1.0
        return self.vote_loss.get('loss_dst_weight', 1.0)
