"""VoteFusion: lift 2D detections to per-seed image-vote features.

TPU-native re-design of mmdet3d ``VoteFusion`` (reference invocation
imvotenet_deform.py:117-119,314; cfg configs/baseline/imvotenet.py:160-163,
``max_imvote_per_pixel=3``, 18-dim imvotes feeding ``img_mlp in_channel=18``).

Fixed-shape formulation: 2D boxes are a padded (B, K, 6) tensor
[x1, y1, x2, y2, score, class] sorted by score with a validity mask.  For
each seed and slot k < max_imvote_per_pixel, the k-th highest-scoring valid
box containing the seed's projected pixel produces one imvote with the
ImVoteNet cue layout (18 dims):

    * 2 geometric 2D dims: (du, dv) from the projected seed to the box
      center, normalized by the image size;
    * 3 geometric 3D dims: the pseudo 3D vote — the displacement from the
      seed to the point on the box-center camera ray at the seed's depth,
      expressed in the (augmented) depth frame;
    * 10 semantic dims: one-hot detected class;
    * 3 texture dims: the (normalized) RGB at the seed's pixel (given to
      every slot, matched or not, like the upstream texture cue).

Output layout is slot-major — flat index = slot * num_seeds + seed — so
``index % num_seeds`` recovers the seed id (the contract
``sample_valid_seeds`` relies on, ref imvotenet_deform.py:325).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.transforms import forward_2d_transform, reverse_3d_transform
from ..utils.registry import FUSION_LAYERS


def project_seeds_to_pixels(seeds, meta):
    """Seeds (aug frame) -> pixel uv in the transformed image + cam depth +
    original-depth-frame coords."""
    xyz_depth = reverse_3d_transform(seeds, meta)
    proj = meta['depth2img']
    hom = jnp.concatenate([xyz_depth, jnp.ones_like(xyz_depth[..., :1])], -1)
    p2d = jnp.einsum('bnj,bkj->bnk', hom, proj)
    depth = jnp.clip(p2d[..., 2], 1e-6, None)
    uv0 = p2d[..., :2] / depth[..., None]          # original-image pixels
    uv = forward_2d_transform(uv0, meta)           # transformed-image pixels
    return uv, depth, xyz_depth


def reverse_pixel_to_depth_frame(uv_t, depth, meta):
    """Pixel in transformed image + cam depth -> original depth-frame xyz."""
    # undo 2D transform: unflip then unscale
    u = uv_t[..., 0]
    if 'flip' in meta and 'img_shape' in meta:
        w = meta['img_shape'][:, 1].astype(u.dtype)[:, None]
        u = jnp.where(meta['flip'][:, None], w - u, u)
    uv = jnp.stack([u, uv_t[..., 1]], -1)
    if 'scale_factor' in meta:
        uv = uv / meta['scale_factor'][:, None, :2]
    # invert the 3x3 projection: xyz = inv(P) @ (u z, v z, z)
    p3 = meta['depth2img'][:, :3, :3]
    rhs = jnp.concatenate([uv * depth[..., None], depth[..., None]], -1)
    inv = jnp.linalg.inv(p3)
    return jnp.einsum('bnj,bkj->bnk', rhs, inv)


def apply_3d_aug_to_vector(vec, meta):
    """Forward-apply the recorded aug (HF -> R -> S) to a *vector* (no T)."""
    v = vec
    if 'pcd_horizontal_flip' in meta:
        flip = meta['pcd_horizontal_flip'][:, None]
        v = v.at[..., 0].set(jnp.where(flip, -v[..., 0], v[..., 0]))
    if 'pcd_rotation' in meta:
        v = jnp.einsum('bnj,bjk->bnk', v, meta['pcd_rotation'])
    if 'pcd_scale_factor' in meta:
        v = v * meta['pcd_scale_factor'][:, None, None]
    return v


@FUSION_LAYERS.register_module()
class VoteFusion:
    """Stateless fusion op (no learned params)."""

    def __init__(self, num_classes=10, max_imvote_per_pixel=3):
        self.num_classes = num_classes
        self.max_imvote_per_pixel = max_imvote_per_pixel

    def __call__(self, img, bboxes_2d, box_valid, seeds, meta):
        """
        Args:
            img: (B, H, W, 3) normalized images (NHWC).
            bboxes_2d: (B, K, 6) score-sorted [x1 y1 x2 y2 score cls].
            box_valid: (B, K) bool.
            seeds: (B, N, 3) seed xyz (augmented frame).
        Returns:
            feats: (B, N * max_imvote, 18) slot-major imvote features.
            mask: (B, N * max_imvote) bool.
        """
        b, n, _ = seeds.shape
        kmax = self.max_imvote_per_pixel
        uv, depth, xyz_depth = project_seeds_to_pixels(seeds, meta)
        u, v = uv[..., 0], uv[..., 1]                          # (B, N)

        boxes = bboxes_2d[..., :4]                             # (B, K, 4)
        inside = ((u[:, :, None] >= boxes[:, None, :, 0]) &
                  (u[:, :, None] <= boxes[:, None, :, 2]) &
                  (v[:, :, None] >= boxes[:, None, :, 1]) &
                  (v[:, :, None] <= boxes[:, None, :, 3]) &
                  box_valid[:, None, :])                       # (B, N, K)
        cnt_excl = jnp.cumsum(inside, -1) - inside

        h_img = meta['img_shape'][:, 0].astype(jnp.float32)
        w_img = meta['img_shape'][:, 1].astype(jnp.float32)

        # texture cue at the seed pixel (shared by all slots)
        hi, wi = img.shape[1], img.shape[2]
        ui = jnp.clip(u.astype(jnp.int32), 0, wi - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, hi - 1)
        tex = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, vi, ui)  # (B,N,3)

        slot_feats = []
        slot_masks = []
        for k in range(kmax):
            mk = inside & (cnt_excl == k)
            hask = jnp.any(mk, -1)                              # (B, N)
            idxk = jnp.argmax(mk, -1)                           # (B, N)
            box_k = jnp.take_along_axis(bboxes_2d, idxk[..., None], 1)
            cx = (box_k[..., 0] + box_k[..., 2]) / 2
            cy = (box_k[..., 1] + box_k[..., 3]) / 2
            du = (cx - u) / w_img[:, None]
            dv = (cy - v) / h_img[:, None]
            # pseudo 3D vote at the seed's depth, mapped to augmented frame
            target_depth_xyz = reverse_pixel_to_depth_frame(
                jnp.stack([cx, cy], -1), depth, meta)
            vote3d = apply_3d_aug_to_vector(
                target_depth_xyz - xyz_depth, meta)
            sem = jax.nn.one_hot(box_k[..., 5].astype(jnp.int32),
                                 self.num_classes)
            f = jnp.concatenate(
                [du[..., None], dv[..., None], vote3d, sem], -1)
            f = jnp.where(hask[..., None], f, 0.)
            f = jnp.concatenate([f, tex], -1)                   # (B, N, 18)
            slot_feats.append(f)
            slot_masks.append(hask)

        feats = jnp.concatenate(slot_feats, 1)      # slot-major (B, N*k, 18)
        mask = jnp.concatenate(slot_masks, 1)
        return feats, mask


def sample_valid_seeds(mask, num_sampled_seed, rng):
    """Fixed-shape seed sampling (reference imvotenet_deform.py:14-53).

    Picks ``num_sampled_seed`` imvote indices per sample: a random subset of
    valid (box-matched) imvotes, topped up — when there are fewer valid ones
    — with random indices from [0, num_sampled_seed) (the reference's
    ``% num_sampled_seed`` fill rule).  One top-k, no host sync.
    """
    b, total = mask.shape
    u = jax.random.uniform(rng, (b, total))
    idx = jnp.arange(total)
    key = mask.astype(jnp.float32) * 2.0 + \
        (idx < num_sampled_seed).astype(jnp.float32) + u
    _, inds = jax.lax.top_k(key, num_sampled_seed)
    return inds.astype(jnp.int32)
