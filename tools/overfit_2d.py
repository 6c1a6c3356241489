#!/usr/bin/env python
"""2D-trainer convergence proofs: overfit the DETR pretrain path and the
Faster R-CNN image-only path on synthetic scenes (VERDICT round-1 #4).

The scenes are images with class-colored rectangles, so both detectors can
genuinely learn localization + classification (not just memorize).  Reports
2D AP@0.5 before/after training; PASS requires a large gain over random.

Both models are the shipped full-size configs (reference parity:
configs/deformdetr/imvotenet_deform.py stage 1 and the ImVoteNet
Faster-R-CNN image branch, reference imvotenet.py) run at a reduced image
budget for tool speed.

Usage: python tools/overfit_2d.py [--model detr|frcnn|both] [--steps 300]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

HW = (224, 288)
N_SCENES = 16
MAX_G = 6
# 10 visually distinct class colors (RGB)
COLORS = np.array([
    [220, 40, 40], [40, 220, 40], [40, 40, 220], [220, 220, 40],
    [220, 40, 220], [40, 220, 220], [240, 140, 20], [140, 20, 240],
    [20, 240, 140], [128, 128, 128]], np.float32)


def make_scenes(n=N_SCENES, hw=HW, seed=0):
    """Images with filled class-colored rectangles + 2D GT."""
    rng = np.random.RandomState(seed)
    h, w = hw
    imgs = np.empty((n, h, w, 3), np.float32)
    boxes = np.zeros((n, MAX_G, 4), np.float32)
    labels = np.zeros((n, MAX_G), np.int64)
    valid = np.zeros((n, MAX_G), bool)
    for i in range(n):
        img = rng.normal(0.5, 0.05, (h, w, 3)).astype(np.float32)
        g = rng.randint(2, MAX_G + 1)
        for j in range(g):
            bw = rng.randint(30, w // 2)
            bh = rng.randint(30, h // 2)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            lab = rng.randint(0, 10)
            img[y1:y1 + bh, x1:x1 + bw] = COLORS[lab] / 255.0
            boxes[i, j] = (x1, y1, x1 + bw, y1 + bh)
            labels[i, j] = lab
            valid[i, j] = True
        imgs[i] = img
    return imgs, boxes, labels, valid


def ap50(dets, det_labels, gts, gt_labels, gt_valid, score_thr=0.05):
    """Simple 2D AP@0.5 (VOC area) over the set, averaged over classes."""
    aps = []
    for c in range(10):
        records = []   # (score, is_tp)
        n_gt = 0
        for i in range(len(gts)):
            g = gts[i][gt_valid[i] & (gt_labels[i] == c)]
            n_gt += len(g)
            d = dets[i][(det_labels[i] == c) & (dets[i][:, 4] > score_thr)]
            d = d[np.argsort(-d[:, 4])]
            taken = np.zeros(len(g), bool)
            for box in d:
                if len(g) == 0:
                    records.append((box[4], False))
                    continue
                ix1 = np.maximum(g[:, 0], box[0])
                iy1 = np.maximum(g[:, 1], box[1])
                ix2 = np.minimum(g[:, 2], box[2])
                iy2 = np.minimum(g[:, 3], box[3])
                inter = (ix2 - ix1).clip(0) * (iy2 - iy1).clip(0)
                union = ((g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1]) +
                         (box[2] - box[0]) * (box[3] - box[1]) - inter)
                iou = inter / np.maximum(union, 1e-6)
                j = int(iou.argmax())
                if iou[j] > 0.5 and not taken[j]:
                    taken[j] = True
                    records.append((box[4], True))
                else:
                    records.append((box[4], False))
        if n_gt == 0:
            continue
        if not records:
            aps.append(0.0)
            continue
        records.sort(key=lambda r: -r[0])
        tp = np.cumsum([r[1] for r in records])
        fp = np.cumsum([not r[1] for r in records])
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, 1)
        # VOC continuous area AP
        mrec = np.concatenate([[0], recall, [1]])
        mpre = np.concatenate([[0], precision, [0]])
        for k in range(len(mpre) - 2, -1, -1):
            mpre[k] = max(mpre[k], mpre[k + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        aps.append(float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1])
                         .sum()))
    return float(np.mean(aps)) if aps else 0.0


def build(model_kind):
    import jax
    import demf_tpu.models  # noqa: F401
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from demf_tpu.zoo import load_model_cfg

    if model_kind == 'detr':
        cfg = load_model_cfg('deformdetr/imvotenet_deform.py')
        grad_clip = dict(max_norm=0.1, norm_type=2)
        lr = 2e-4
    else:
        cfg = load_model_cfg('baseline/imvotenet.py')
        grad_clip = dict(max_norm=10, norm_type=2)
        lr = 1e-3
    model = build_from_cfg(cfg.model, DETECTORS)
    return model, grad_clip, lr


def run(model_kind, steps, batch_size=8, compute_dtype='bfloat16'):
    import jax
    import jax.numpy as jnp
    from demf_tpu.engine import (build_optimizer, create_train_state,
                                 make_train_step)
    from demf_tpu.parallel import make_mesh, replicate, shard_batch

    print(f'=== {model_kind} ===', flush=True)
    imgs, boxes, labels, valid = make_scenes()
    model, grad_clip, lr = build(model_kind)

    def scene_batch(idx):
        return dict(
            img=jnp.asarray(imgs[idx]),
            img_meta=dict(img_shape=jnp.asarray(
                np.tile(np.array([list(HW)], np.int32), (len(idx), 1)))),
            gt_bboxes=jnp.asarray(boxes[idx]),
            gt_labels=jnp.asarray(labels[idx]),
            gt_bboxes_valid=jnp.asarray(valid[idx]))

    batch0 = scene_batch(np.arange(batch_size))
    rng0 = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, b: model.init(
        {'params': r, 'sample': jax.random.fold_in(r, 2)}, b,
        train=True))(rng0, batch0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables['params']))
    print(f'params: {n_params/1e6:.1f}M', flush=True)
    tx = build_optimizer(dict(type='AdamW', lr=lr, weight_decay=1e-4),
                         variables['params'], grad_clip=grad_clip)
    mesh = make_mesh()
    state = replicate(create_train_state(model, tx, variables), mesh)
    train_step = make_train_step(model, tx, compute_dtype=compute_dtype)

    @jax.jit
    def infer(variables, batch):
        results = model.apply(variables, batch, train=False,
                              rngs={'sample': jax.random.PRNGKey(0)})
        return model.get_bboxes(results, batch)

    def eval_ap(state):
        dets, det_labels = [], []
        vars_now = {'params': state.params,
                    'batch_stats': state.batch_stats} \
            if getattr(state, 'batch_stats', None) else \
            {'params': state.params}
        for s in range(0, N_SCENES, batch_size):
            idx = np.arange(s, min(s + batch_size, N_SCENES))
            det = infer(vars_now, scene_batch(idx))
            dets.append(np.asarray(det['bboxes']))
            det_labels.append(np.asarray(det['labels']))
        dets = np.concatenate(dets)
        det_labels = np.concatenate(det_labels)
        return ap50(dets, det_labels, boxes, labels, valid)

    ap_before = eval_ap(state)
    print(f'AP@0.5 before: {ap_before:.4f}', flush=True)

    rng = jax.random.PRNGKey(1)
    order = np.random.RandomState(3)
    t0 = time.perf_counter()
    for it in range(steps):
        idx = order.choice(N_SCENES, batch_size, replace=False)
        sbatch = shard_batch(scene_batch(idx), mesh)
        state, metrics = train_step(state, sbatch,
                                    jax.random.fold_in(rng, it))
        if (it + 1) % 25 == 0:
            print(f'step {it + 1}: loss={float(metrics["loss"]):.3f} '
                  f'({(time.perf_counter() - t0) / (it + 1) * 1000:.0f} '
                  f'ms/step avg)', flush=True)

    ap_after = eval_ap(state)
    print(f'AP@0.5 after {steps} steps: {ap_after:.4f}', flush=True)
    assert ap_after > max(0.2, ap_before + 0.15), \
        f'{model_kind} failed to learn: {ap_before:.4f} -> {ap_after:.4f}'
    print(f'OVERFIT 2D ({model_kind}) PASSED', flush=True)
    return ap_before, ap_after


if __name__ == '__main__':
    kind = 'both'
    steps = 300
    if '--model' in sys.argv:
        kind = sys.argv[sys.argv.index('--model') + 1]
    if '--steps' in sys.argv:
        steps = int(sys.argv[sys.argv.index('--steps') + 1])
    kinds = ['detr', 'frcnn'] if kind == 'both' else [kind]
    for k in kinds:
        run(k, steps)
