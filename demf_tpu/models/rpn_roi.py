"""Faster R-CNN image-branch components: anchors, delta coder, RPN, RoI head.

TPU-native re-design of the mmdet components the ImVoteNet baseline pulls in
(configs/_base_/models/imvotenet_image.py:17-96: RPNHead + AnchorGenerator +
DeltaXYWHBBoxCoder + SingleRoIExtractor(RoIAlign) + Shared2FCBBoxHead).  In
the published ImVoteNet workflow this branch is FROZEN and used for
inference only (2D box extraction from a ported checkpoint,
configs/baseline/imvotenet.py load_from); the inference path here is
complete and fixed-shape (padded proposals + validity masks), and RPN/RCNN
*training* is available too (``rpn_loss`` / ``sample_rcnn_rois`` /
``rcnn_loss`` below, with the MaxIoUAssigner/RandomSampler equivalents in
``assign_sample.py``).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import batched_nms_2d, nms_2d
from ..ops.roi_align import roi_align
from ..utils.registry import HEADS


def grid_anchors(feat_hw, stride, scales, ratios):
    """(H*W*A, 4) xyxy anchors for one level (mmdet AnchorGenerator)."""
    h, w = feat_hw
    base = stride * np.asarray(scales, np.float32)
    ratios = np.asarray(ratios, np.float32)
    h_r = np.sqrt(ratios)
    w_r = 1.0 / h_r
    ws = (base[None, :] * w_r[:, None]).reshape(-1)   # (A,)
    hs = (base[None, :] * h_r[:, None]).reshape(-1)
    cx = stride / 2.0
    base_anchors = np.stack(
        [cx - ws / 2, cx - hs / 2, cx + ws / 2, cx + hs / 2], -1)
    sx = np.arange(w, dtype=np.float32) * stride
    sy = np.arange(h, dtype=np.float32) * stride
    shift = np.stack(np.meshgrid(sx, sy), -1).reshape(-1, 2)
    shifts = np.concatenate([shift, shift], -1)       # (H*W, 4)
    anchors = (shifts[:, None, :] + base_anchors[None]).reshape(-1, 4)
    return jnp.asarray(anchors)


def delta2bbox(anchors, deltas, means=(0., 0., 0., 0.),
               stds=(1., 1., 1., 1.), max_shape=None, wh_ratio_clip=0.016):
    """mmdet DeltaXYWHBBoxCoder.decode."""
    means = jnp.asarray(means)
    stds = jnp.asarray(stds)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    if max_shape is not None:
        hm, wm = max_shape
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, wm), jnp.clip(boxes[..., 1], 0, hm),
            jnp.clip(boxes[..., 2], 0, wm), jnp.clip(boxes[..., 3], 0, hm)],
            -1)
    return boxes


def bbox2delta(anchors, boxes, means=(0., 0., 0., 0.),
               stds=(1., 1., 1., 1.)):
    """mmdet DeltaXYWHBBoxCoder.encode."""
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = jnp.clip(anchors[..., 2] - anchors[..., 0], 1e-6, None)
    ah = jnp.clip(anchors[..., 3] - anchors[..., 1], 1e-6, None)
    bx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    by = (boxes[..., 1] + boxes[..., 3]) * 0.5
    bw = jnp.clip(boxes[..., 2] - boxes[..., 0], 1e-6, None)
    bh = jnp.clip(boxes[..., 3] - boxes[..., 1], 1e-6, None)
    d = jnp.stack([(bx - ax) / aw, (by - ay) / ah,
                   jnp.log(bw / aw), jnp.log(bh / ah)], -1)
    return (d - jnp.asarray(means)) / jnp.asarray(stds)


@HEADS.register_module()
class RPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    anchor_generator: Any = None
    bbox_coder: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: tuple of NHWC maps. Returns per-level (cls, reg)."""
        ag = dict(self.anchor_generator or {})
        num_anchors = len(ag.get('scales', [8])) * \
            len(ag.get('ratios', [0.5, 1.0, 2.0]))
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1, name='rpn_conv')
        cls_conv = nn.Conv(num_anchors, (1, 1), name='rpn_cls')
        reg_conv = nn.Conv(num_anchors * 4, (1, 1), name='rpn_reg')
        outs = []
        for f in feats:
            x = nn.relu(conv(f))
            outs.append((cls_conv(x), reg_conv(x)))
        return outs

    def get_proposals(self, outs, img_shape, cfg):
        """Fixed-shape proposal generation: per-level top nms_pre, decode,
        joint NMS, pad to max_per_img."""
        ag = dict(self.anchor_generator or {})
        strides = list(ag.get('strides', [4, 8, 16, 32, 64]))
        scales = list(ag.get('scales', [8]))
        ratios = list(ag.get('ratios', [0.5, 1.0, 2.0]))
        coder = dict(self.bbox_coder or {})
        nms_pre = cfg.get('nms_pre', 1000)
        max_per_img = cfg.get('max_per_img', 1000)
        iou_thr = dict(cfg.get('nms', {})).get('iou_threshold', 0.7)

        all_scores, all_boxes, all_lvl = [], [], []
        for lvl, ((cls, reg), stride) in enumerate(zip(outs, strides)):
            b, h, w, a = cls.shape
            anchors = grid_anchors((h, w), stride, scales, ratios)
            scores = jax.nn.sigmoid(cls.reshape(b, -1))
            deltas = reg.reshape(b, -1, 4)
            k = min(nms_pre, scores.shape[1])
            topv, topi = jax.lax.top_k(scores, k)
            boxes = delta2bbox(
                jnp.take(anchors, topi, axis=0),
                jnp.take_along_axis(deltas, topi[..., None], 1),
                coder.get('target_means', (0., 0., 0., 0.)),
                coder.get('target_stds', (1., 1., 1., 1.)))
            all_scores.append(topv)
            all_boxes.append(boxes)
            all_lvl.append(jnp.full(topv.shape, lvl))
        scores = jnp.concatenate(all_scores, 1)
        boxes = jnp.concatenate(all_boxes, 1)
        lvls = jnp.concatenate(all_lvl, 1)

        # clip to image, per-sample NMS (levels NOT separated:
        # nms_across_levels=False in mmdet actually separates by level)
        def single(s, bx, lv, shape):
            hm = shape[0].astype(bx.dtype)
            wm = shape[1].astype(bx.dtype)
            bx = jnp.stack([jnp.clip(bx[:, 0], 0, wm),
                            jnp.clip(bx[:, 1], 0, hm),
                            jnp.clip(bx[:, 2], 0, wm),
                            jnp.clip(bx[:, 3], 0, hm)], -1)
            keep = batched_nms_2d(bx, s, lv, iou_thr)
            key = jnp.where(keep, s, -1.0)
            topv, topi = jax.lax.top_k(key, max_per_img)
            return (jnp.take(bx, topi, axis=0), topv, topv > 0)

        return jax.vmap(single)(scores, boxes, lvls, img_shape)


def pyramid_roi_align(feats, rois, lvl, strides, out_size,
                      samples_per_bin=2):
    """RoIAlign over an FPN pyramid with per-RoI level assignment.

    Single-image: feats is a tuple of (H_l, W_l, C) maps; rois (R, 4) xyxy in
    input coords; lvl (R,) int32 assigned level.  One XLA gather against the
    concatenated pyramid serves all RoIs regardless of level.
    """
    c = feats[0].shape[-1]
    hs = np.asarray([f.shape[0] for f in feats])
    ws = np.asarray([f.shape[1] for f in feats])
    starts = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], 0)

    stride_r = jnp.asarray([1.0 / s for s in strides])[lvl]   # (R,)
    h_l = jnp.asarray(hs)[lvl]
    w_l = jnp.asarray(ws)[lvl]
    start_l = jnp.asarray(starts)[lvl]

    out, s = out_size, samples_per_bin
    boxes = rois * stride_r[:, None]
    x1, y1 = boxes[:, 0], boxes[:, 1]
    bin_w = jnp.clip(boxes[:, 2] - x1, 1e-3, None) / out
    bin_h = jnp.clip(boxes[:, 3] - y1, 1e-3, None) / out
    gi = (jnp.arange(out * s) + 0.5) / s
    sx = x1[:, None] + gi[None] * bin_w[:, None] - 0.5        # (R, out*s)
    sy = y1[:, None] + gi[None] * bin_h[:, None] - 0.5
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx1 = sx - x0
    wy1 = sy - y0

    def gather(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, (h_l - 1)[:, None])
        xi = jnp.clip(xi.astype(jnp.int32), 0, (w_l - 1)[:, None])
        idx = (start_l[:, None, None] + yi[:, :, None] * w_l[:, None, None]
               + xi[:, None, :])                              # (R, oy, ox)
        return flat[idx.reshape(-1)].reshape(idx.shape + (c,))

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy1[:, :, None, None]
    wx = wx1[:, None, :, None]
    val = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
           v10 * wy * (1 - wx) + v11 * wy * wx)
    r = rois.shape[0]
    return val.reshape(r, out, s, out, s, c).mean(axis=(2, 4))


@HEADS.register_module()
class StandardRoIHead(nn.Module):
    bbox_roi_extractor: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    @nn.compact
    def __call__(self, feats, proposals, proposal_valid, train: bool = False):
        """
        Args:
            feats: tuple of NHWC maps (FPN levels for strides 4-32).
            proposals: (B, R, 4) xyxy.
        Returns:
            cls_logits (B, R, C+1), bbox_deltas (B, R, C*4).
        """
        ext = dict(self.bbox_roi_extractor or {})
        strides = list(ext.get('featmap_strides', [4, 8, 16, 32]))
        out_size = dict(ext.get('roi_layer', {})).get('output_size', 7)
        head_cfg = dict(self.bbox_head or {})
        fc_out = head_cfg.get('fc_out_channels', 1024)
        num_classes = head_cfg.get('num_classes', 10)

        # mmdet level mapping: lvl = floor(log2(sqrt(area)/56 + eps)) clamped
        w = proposals[..., 2] - proposals[..., 0]
        h = proposals[..., 3] - proposals[..., 1]
        scale = jnp.sqrt(jnp.clip(w * h, 1e-6, None))
        lvl = jnp.floor(jnp.log2(scale / 56.0 + 1e-6))
        lvl = jnp.clip(lvl, 0, len(strides) - 1).astype(jnp.int32)

        # ONE gather over the concatenated pyramid: sample coordinates are
        # computed in the assigned level's grid and offset into the flat
        # (sum_HW, C) buffer — avoids pooling every level for every RoI.
        pooled = jax.vmap(
            lambda fs, rois_i, lvl_i: pyramid_roi_align(
                fs, rois_i, lvl_i, strides, out_size))(
            tuple(feats[:len(strides)]), proposals, lvl)

        b, r = proposals.shape[:2]
        x = pooled.reshape(b, r, -1)
        x = nn.relu(nn.Dense(fc_out, name='shared_fc1')(x))
        x = nn.relu(nn.Dense(fc_out, name='shared_fc2')(x))
        cls_logits = nn.Dense(num_classes + 1, name='fc_cls')(x)
        bbox_deltas = nn.Dense(num_classes * 4, name='fc_reg')(x)
        return cls_logits, bbox_deltas

    def get_bboxes(self, cls_logits, bbox_deltas, proposals, proposal_valid,
                   img_shape):
        """Per-class decode + NMS -> (B, max_per_img, 5) + labels."""
        head_cfg = dict(self.bbox_head or {})
        coder = dict(head_cfg.get('bbox_coder', {}))
        num_classes = head_cfg.get('num_classes', 10)
        tcfg = dict(self.test_cfg or {})
        score_thr = tcfg.get('score_thr', 0.05)
        iou_thr = dict(tcfg.get('nms', {})).get('iou_threshold', 0.5)
        max_per_img = tcfg.get('max_per_img', 100)

        probs = jax.nn.softmax(cls_logits, -1)[..., :num_classes]

        def single(prob, deltas, rois, valid, shape):
            r = rois.shape[0]
            d = deltas.reshape(r, num_classes, 4)
            boxes = delta2bbox(
                rois[:, None, :], d,
                coder.get('target_means', (0., 0., 0., 0.)),
                coder.get('target_stds', (0.1, 0.1, 0.2, 0.2)),
                max_shape=(shape[0], shape[1]))          # (R, C, 4)
            flat_boxes = boxes.reshape(r * num_classes, 4)
            flat_scores = prob.reshape(r * num_classes)
            flat_labels = jnp.tile(jnp.arange(num_classes), r)
            flat_valid = jnp.repeat(valid, num_classes) & \
                (flat_scores > score_thr)
            keep = batched_nms_2d(flat_boxes, flat_scores, flat_labels,
                                  iou_thr, valid=flat_valid)
            key = jnp.where(keep, flat_scores, -1.0)
            topv, topi = jax.lax.top_k(key, max_per_img)
            return (jnp.take(flat_boxes, topi, axis=0), topv,
                    jnp.take(flat_labels, topi), topv > 0)

        boxes, scores, labels, valid = jax.vmap(single)(
            probs, bbox_deltas, proposals, proposal_valid, img_shape)
        return dict(bboxes=jnp.concatenate([boxes, scores[..., None]], -1),
                    labels=labels, valid=valid)


def rpn_loss(outs, anchor_cfg, coder_cfg, gt_bboxes, gt_valid, train_cfg,
             loss_cls_cfg, loss_bbox_cfg, rng):
    """RPN training losses (mmdet RPNHead.loss, fixed-shape).

    Args:
        outs: per-level (cls (B,H,W,A), reg (B,H,W,A*4)) from RPNHead.
        gt_bboxes: (B, G, 4) xyxy; gt_valid: (B, G) bool.
    Returns:
        dict(loss_rpn_cls, loss_rpn_bbox).
    """
    from ..utils.registry import build_loss
    from .assign_sample import iou_2d, max_iou_assign, random_sample
    strides = list(anchor_cfg.get('strides', [4, 8, 16, 32, 64]))
    scales = list(anchor_cfg.get('scales', [8]))
    ratios = list(anchor_cfg.get('ratios', [0.5, 1.0, 2.0]))
    means = coder_cfg.get('target_means', (0., 0., 0., 0.))
    stds = coder_cfg.get('target_stds', (1., 1., 1., 1.))
    asn = dict(train_cfg.get('assigner', {}))
    smp = dict(train_cfg.get('sampler', {}))

    anchors = jnp.concatenate([
        grid_anchors((c.shape[1], c.shape[2]), s, scales, ratios)
        for (c, _), s in zip(outs, strides)], 0)             # (A, 4)
    cls_flat = jnp.concatenate(
        [c.reshape(c.shape[0], -1) for c, _ in outs], 1)     # (B, A)
    reg_flat = jnp.concatenate(
        [r.reshape(r.shape[0], -1, 4) for _, r in outs], 1)  # (B, A, 4)

    def single(cls_b, reg_b, gt_b, val_b, key):
        ious = iou_2d(anchors, gt_b)
        assigned = max_iou_assign(
            ious, val_b, asn.get('pos_iou_thr', 0.7),
            asn.get('neg_iou_thr', 0.3), asn.get('min_pos_iou', 0.3),
            asn.get('match_low_quality', True))
        pos, neg = random_sample(assigned, smp.get('num', 256),
                                 smp.get('pos_fraction', 0.5), key)
        labels = pos.astype(jnp.float32)
        weights = (pos | neg).astype(jnp.float32)
        gt_for_anchor = jnp.take(gt_b, jnp.maximum(assigned, 0), axis=0)
        deltas = bbox2delta(anchors, gt_for_anchor, means, stds)
        return cls_b, reg_b, labels, weights, pos, deltas

    keys = jax.random.split(rng, cls_flat.shape[0])
    cls_b, reg_b, labels, weights, pos, deltas = jax.vmap(single)(
        cls_flat, reg_flat, gt_bboxes, gt_valid, keys)
    avg = jnp.maximum(jnp.sum(weights), 1.0)
    lc = build_loss(loss_cls_cfg)
    # sigmoid BCE on objectness
    p = cls_b
    bce = jnp.maximum(p, 0) - p * labels + jnp.log1p(jnp.exp(-jnp.abs(p)))
    loss_rpn_cls = jnp.sum(bce * weights) / avg * \
        dict(loss_cls_cfg).get('loss_weight', 1.0)
    lb = build_loss(loss_bbox_cfg)
    loss_rpn_bbox = lb(reg_b, deltas,
                       weight=pos.astype(jnp.float32)[..., None],
                       avg_factor=avg)
    return dict(loss_rpn_cls=loss_rpn_cls, loss_rpn_bbox=loss_rpn_bbox)


def sample_rcnn_rois(proposals, proposal_valid, gt_bboxes, gt_labels,
                     gt_valid, train_cfg, num_classes, rng):
    """RCNN assignment + sampling (add_gt_as_proposals=True), fixed-shape.

    Returns dict with sampled rois (B, S, 4), cls labels (B, S) (bg =
    num_classes), reg targets (B, S, 4, per assigned gt), weights.
    """
    from .assign_sample import iou_2d, max_iou_assign, random_sample
    asn = dict(train_cfg.get('assigner', {}))
    smp = dict(train_cfg.get('sampler', {}))
    num = smp.get('num', 512)

    rois_all = jnp.concatenate([proposals, gt_bboxes], 1)     # (B, R+G, 4)
    valid_all = jnp.concatenate([proposal_valid, gt_valid], 1)

    def single(rois, rvalid, gt_b, lab_b, val_b, key):
        ious = iou_2d(rois, gt_b)
        ious = jnp.where(rvalid[:, None], ious, -1.0)
        assigned = max_iou_assign(
            ious, val_b, asn.get('pos_iou_thr', 0.5),
            asn.get('neg_iou_thr', 0.5), asn.get('min_pos_iou', 0.5),
            asn.get('match_low_quality', False))
        assigned = jnp.where(rvalid, assigned, -2)
        pos, neg = random_sample(assigned, num,
                                 smp.get('pos_fraction', 0.25), key)
        chosen = pos | neg
        key2 = jax.random.fold_in(key, 1)
        sel_key = jnp.where(chosen, 1.0 + jax.random.uniform(
            key2, chosen.shape), 0.0)
        _, sel = jax.lax.top_k(sel_key, num)                  # (S,)
        rois_s = jnp.take(rois, sel, axis=0)
        pos_s = jnp.take(pos, sel, axis=0)
        chosen_s = jnp.take(chosen, sel, axis=0)
        asg_s = jnp.maximum(jnp.take(assigned, sel, axis=0), 0)
        labels_s = jnp.where(pos_s, jnp.take(lab_b, asg_s, axis=0),
                             num_classes)
        gt_s = jnp.take(gt_b, asg_s, axis=0)
        return rois_s, labels_s, gt_s, pos_s, chosen_s

    keys = jax.random.split(rng, rois_all.shape[0])
    rois, labels, gts, pos, chosen = jax.vmap(single)(
        rois_all, valid_all, gt_bboxes, gt_labels, gt_valid, keys)
    return dict(rois=rois, labels=labels, gt_boxes=gts, pos=pos,
                chosen=chosen)


def rcnn_loss(cls_logits, bbox_deltas, sampled, coder_cfg, num_classes,
              loss_cls_cfg, loss_bbox_cfg):
    """RCNN classification + class-specific box regression losses."""
    from ..utils.registry import build_loss
    means = coder_cfg.get('target_means', (0., 0., 0., 0.))
    stds = coder_cfg.get('target_stds', (0.1, 0.1, 0.2, 0.2))
    labels = sampled['labels']
    chosen = sampled['chosen'].astype(jnp.float32)
    pos = sampled['pos']
    avg = jnp.maximum(jnp.sum(chosen), 1.0)
    lc = build_loss(loss_cls_cfg)
    loss_cls = lc(cls_logits, labels, weight=chosen, avg_factor=avg)
    targets = bbox2delta(sampled['rois'], sampled['gt_boxes'], means, stds)
    b, s = labels.shape
    d = bbox_deltas.reshape(b, s, num_classes, 4)
    cls_idx = jnp.clip(labels, 0, num_classes - 1)
    d_pos = jnp.take_along_axis(
        d, cls_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    lb = build_loss(loss_bbox_cfg)
    loss_bbox = lb(d_pos, targets,
                   weight=pos.astype(jnp.float32)[..., None],
                   avg_factor=avg)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
