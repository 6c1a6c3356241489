"""Test-time augmentation: flip-ensemble inference + box merging.

TPU-native equivalent of the reference's aug-test path
(imvotenet_deform.py:575-691 / mmdet3d ``aug_test`` +
``merge_aug_bboxes_3d``): run the detector on augmented copies of the point
cloud (BEV-horizontal flip), map detections back to the original frame,
concatenate and re-run 3D NMS.  Everything stays fixed-shape: each aug
variant contributes a padded detection set; the merge is one aligned-3D-NMS
over the union.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops
from ..ops.nms import aligned_3d_nms


def _flip_batch(batch):
    """BEV-horizontal flip of a collated batch (points x -> -x)."""
    out = dict(batch)
    pts = batch['points']
    out['points'] = pts.at[..., 0].set(-pts[..., 0])
    meta = dict(batch.get('img_meta', {}))
    if 'pcd_horizontal_flip' in meta:
        meta['pcd_horizontal_flip'] = ~meta['pcd_horizontal_flip']
    out['img_meta'] = meta
    return out


def _unflip_boxes(boxes):
    """Map detections from the flipped frame back to the original."""
    import numpy as np
    b = boxes.at[..., 0].set(-boxes[..., 0])
    return b.at[..., 6].set(np.pi - b[..., 6])


def aug_test_3d(model, variables, batch, nms_thr=0.25, use_flip=True):
    """Flip-ensemble inference.

    Args:
        model/variables: detector + trained variables.
        batch: collated test batch (points [+ img/meta]).
    Returns:
        padded dict(boxes_3d, scores_3d, labels_3d, valid) merged over augs.
    """
    @jax.jit
    def infer(v, b):
        results = model.apply(v, b, train=False,
                              rngs={'sample': jax.random.PRNGKey(0)})
        return model.get_bboxes(results, b)

    dets = [infer(variables, batch)]
    if use_flip:
        flipped = infer(variables, _flip_batch(batch))
        flipped = dict(flipped)
        flipped['boxes_3d'] = _unflip_boxes(flipped['boxes_3d'])
        dets.append(flipped)

    boxes = jnp.concatenate([d['boxes_3d'] for d in dets], 1)
    scores = jnp.concatenate([d['scores_3d'] for d in dets], 1)
    labels = jnp.concatenate([d['labels_3d'] for d in dets], 1)
    valid = jnp.concatenate([d['valid'] for d in dets], 1)

    @jax.jit
    def merge(boxes, scores, labels, valid):
        def single(bx, sc, lb, va):
            bottom = bx.at[..., 2].add(-bx[..., 5] / 2.)
            minmax = box_ops.corners_minmax(bottom)
            keep = aligned_3d_nms(minmax, sc, lb, nms_thr, valid=va)
            return keep & va

        keep = jax.vmap(single)(boxes, scores, labels, valid)
        return dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels,
                    valid=keep)

    return merge(boxes, scores, labels, valid)
