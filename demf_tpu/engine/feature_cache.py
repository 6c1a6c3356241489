"""Frozen image-branch feature cache.

DeMF freezes its whole image branch (reference demfnet.py:103-132) and its
image pipeline is deterministic per scene (Resize keep_ratio, flip_ratio=0 —
configs/demf/demf_votenet.py:194-197), so the encoder output for a scene
never changes across the 36 x 5 training visits.  The reference recomputes
the ResNet-50 + 6-layer deformable encoder forward every step; this module
computes each scene's multi-level features ONCE and serves them from cache,
making stage-2 training cost ~the point branch + fusion head.

Cache format: one .npz per scene with float16 feature levels
(lvl0..lvl3, NHWC without batch dim) — ~11 MB/scene at the (1333, 800)
budget, ~60 GB for SUN RGB-D train, streamed from disk by the loader.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np


def compute_image_features(model, variables, batch):
    """Run the frozen image branch on a batch -> tuple of NHWC arrays."""
    return jax.jit(
        lambda v, b: model.apply(v, b, train=False, img_feat_only=True))(
        variables, batch)


class FeatureCache:
    def __init__(self, cache_dir, ram_budget_bytes=2 << 30):
        """Disk cache of per-scene feature levels with a bounded RAM layer.

        The RAM layer avoids re-reading the npz every epoch — on small
        overfit/benchmark datasets the whole cache fits, and the per-step
        loader cost drops from npz-decode to a dict lookup.
        """
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._ram = {}
        self._ram_bytes = 0
        self._ram_budget = ram_budget_bytes

    def path(self, scene_id):
        return os.path.join(self.cache_dir, f'{scene_id}.npz')

    def has(self, scene_id):
        return scene_id in self._ram or os.path.exists(self.path(scene_id))

    def save(self, scene_id, feats: Sequence[np.ndarray]):
        np.savez(self.path(scene_id),
                 **{f'lvl{i}': np.asarray(f, np.float16)
                    for i, f in enumerate(feats)})

    def load(self, scene_id):
        if scene_id in self._ram:
            return self._ram[scene_id]
        with np.load(self.path(scene_id)) as z:
            out = tuple(z[f'lvl{i}'].astype(np.float32)
                        for i in range(len(z.files)))
        size = sum(f.nbytes for f in out)
        if self._ram_bytes + size <= self._ram_budget:
            self._ram[scene_id] = out
            self._ram_bytes += size
        return out


def precompute_dataset_features(model, variables, dataset, cache,
                                batch_size=8, max_gt=64, progress_cb=None):
    """Fill the cache for every scene of a dataset (one pass, batched)."""
    from ..data.loader import collate_fixed
    n = len(dataset)
    for start in range(0, n, batch_size):
        ids = list(range(start, min(start + batch_size, n)))
        if all(cache.has(i) for i in ids):
            continue
        pad = batch_size - len(ids)
        samples = [dataset[i] for i in ids] + [dataset[ids[-1]]] * pad
        batch = collate_fixed(samples, max_gt=max_gt)
        feats = jax.device_get(compute_image_features(model, variables,
                                                      batch))
        for k, sid in enumerate(ids):
            cache.save(sid, [f[k] for f in feats])
        if progress_cb:
            progress_cb(min(start + batch_size, n), n)


class CachedFeatureLoader:
    """Wraps a DataLoader: swaps each batch's images for cached features."""

    def __init__(self, loader, cache):
        self.loader = loader
        self.cache = cache
        self.batch_size = loader.batch_size
        self.dataset = loader.dataset

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            yield attach_cached_features(batch, self.cache,
                                         batch['sample_idx'])


def attach_cached_features(batch, cache, scene_ids):
    """Add 'img_features' (stacked levels) to a collated batch."""
    import jax.numpy as jnp
    per_scene = [cache.load(int(s)) for s in scene_ids]
    levels = len(per_scene[0])
    feats = tuple(
        jnp.asarray(np.stack([ps[l] for ps in per_scene]))
        for l in range(levels))
    out = dict(batch)
    out['img_features'] = feats
    out.pop('img', None)
    return out
