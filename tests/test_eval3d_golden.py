"""Golden cross-check of core/eval3d.py against mmdet3d's indoor_eval.

Two independent validations (VERDICT.md round-1 item #8):

1. AP mechanics: ``_mm_eval_det_cls`` below is a line-faithful numpy
   transcription of mmdet3d-0.18 ``indoor_eval.py`` (greedy score-order
   matching with strict ``iou_max > thresh``, one-match-per-gt, cumulative
   tp/fp, VOC 'area' interpolation).  Our ``eval_det_cls`` must produce
   identical AP on a randomized multi-scene fixture when fed the same IoU
   function.

2. IoU numerics: ``rotated_iou_3d`` (exact polygon clipping) is checked
   against a dense-grid rasterized IoU on random yaw-rotated boxes.
"""
import numpy as np

from demf_tpu.core import eval3d


# ---------------------------------------------------------------------
# mmdet3d-0.18 indoor_eval transcription (per class, multiple thresholds)
# ---------------------------------------------------------------------

def _mm_average_precision(recalls, precisions):
    """mmdet3d average_precision, mode='area' (2D row convention)."""
    recalls = recalls[np.newaxis, :]
    precisions = precisions[np.newaxis, :]
    num_scales = recalls.shape[0]
    ap = np.zeros(num_scales, dtype=np.float32)
    zeros = np.zeros((num_scales, 1), dtype=recalls.dtype)
    ones = np.ones((num_scales, 1), dtype=recalls.dtype)
    mrec = np.hstack((zeros, recalls, ones))
    mpre = np.hstack((zeros, precisions, zeros))
    for i in range(mpre.shape[1] - 1, 0, -1):
        mpre[:, i - 1] = np.maximum(mpre[:, i - 1], mpre[:, i])
    for i in range(num_scales):
        ind = np.where(mrec[i, 1:] != mrec[i, :-1])[0]
        ap[i] = np.sum(
            (mrec[i, ind + 1] - mrec[i, ind]) * mpre[i, ind + 1])
    return float(ap[0])


def _mm_eval_det_cls(pred, gt, iou_thr, iou_fn):
    """Transcription of mmdet3d eval_det_cls.

    Args:
        pred: {img_id: list of (box (7,), score)}.
        gt: {img_id: list of box (7,)}.
        iou_thr: list of thresholds.
        iou_fn: (N,7) x (M,7) -> (N,M) IoU function.
    Returns:
        {thr: (rec array, prec array, ap)}.
    """
    class_recs = {}
    npos = 0
    for img_id in gt.keys():
        cur_gt = np.array(gt[img_id]).reshape(-1, 7)
        det = [[False] * len(cur_gt) for _ in iou_thr]
        npos += len(cur_gt)
        class_recs[img_id] = {'bbox': cur_gt, 'det': det}

    image_ids = []
    confidence = []
    ious = []
    for img_id in pred.keys():
        cur_num = len(pred[img_id])
        if cur_num == 0:
            continue
        pred_cur = np.stack([b for b, _ in pred[img_id]])
        gt_cur = class_recs[img_id]['bbox']
        if len(gt_cur) > 0:
            iou_cur = iou_fn(pred_cur, gt_cur)
            for i in range(cur_num):
                ious.append(iou_cur[i])
        else:
            for i in range(cur_num):
                ious.append(np.zeros(0))
        for box, score in pred[img_id]:
            image_ids.append(img_id)
            confidence.append(score)

    confidence = np.array(confidence)
    sorted_ind = np.argsort(-confidence)
    image_ids = [image_ids[x] for x in sorted_ind]
    ious = [ious[x] for x in sorted_ind]

    nd = len(image_ids)
    tp_thr = [np.zeros(nd) for _ in iou_thr]
    fp_thr = [np.zeros(nd) for _ in iou_thr]
    for d in range(nd):
        R = class_recs[image_ids[d]]
        iou_max = -np.inf
        cur_iou = ious[d]
        jmax = -1
        if len(cur_iou) > 0:
            for j in range(len(R['bbox'])):
                iou = cur_iou[j]
                if iou > iou_max:
                    iou_max = iou
                    jmax = j
        for iou_idx, thresh in enumerate(iou_thr):
            if iou_max > thresh:
                if not R['det'][iou_idx][jmax]:
                    tp_thr[iou_idx][d] = 1.
                    R['det'][iou_idx][jmax] = 1
                else:
                    fp_thr[iou_idx][d] = 1.
            else:
                fp_thr[iou_idx][d] = 1.

    out = {}
    for iou_idx, thresh in enumerate(iou_thr):
        fp = np.cumsum(fp_thr[iou_idx])
        tp = np.cumsum(tp_thr[iou_idx])
        recall = tp / float(npos)
        precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        ap = _mm_average_precision(recall, precision)
        out[thresh] = (recall, precision, ap)
    return out


def _random_scene(rng, n_gt, n_det):
    gts = []
    for _ in range(n_gt):
        c = rng.uniform(-3, 3, 3)
        d = rng.uniform(0.4, 1.5, 3)
        yaw = rng.uniform(-np.pi, np.pi)
        gts.append(np.concatenate([c, d, [yaw]]))
    dets = []
    for _ in range(n_det):
        if gts and rng.rand() < 0.6:
            base = gts[rng.randint(len(gts))].copy()
            base[:3] += rng.uniform(-0.3, 0.3, 3)
            base[3:6] *= rng.uniform(0.8, 1.2, 3)
            base[6] += rng.uniform(-0.2, 0.2)
        else:
            c = rng.uniform(-3, 3, 3)
            d = rng.uniform(0.4, 1.5, 3)
            base = np.concatenate([c, d, [rng.uniform(-np.pi, np.pi)]])
        dets.append((base, float(rng.rand())))
    return gts, dets


def test_eval_det_cls_matches_mmdet3d_transcription():
    rng = np.random.RandomState(7)
    thresholds = [0.25, 0.5]
    pred_mm, gt_mm = {}, {}
    pred_ours, gt_ours = {}, {}
    for sid in range(6):
        gts, dets = _random_scene(rng, rng.randint(0, 4),
                                  rng.randint(0, 7))
        gt_mm[sid] = gts
        pred_mm[sid] = dets
        gt_ours[sid] = (np.stack(gts) if gts else np.zeros((0, 7)))
        pred_ours[sid] = (
            np.stack([b for b, _ in dets]) if dets else np.zeros((0, 7)),
            np.array([s for _, s in dets]))

    ref = _mm_eval_det_cls(pred_mm, gt_mm, thresholds,
                           eval3d.rotated_iou_3d)
    got = eval3d.eval_det_cls(pred_ours, gt_ours, thresholds)
    for thr in thresholds:
        np.testing.assert_allclose(got[thr][2], ref[thr][2], atol=1e-9), thr


def test_indoor_eval_multiclass_matches_transcription():
    rng = np.random.RandomState(3)
    n_scenes, n_classes = 5, 3
    gt_annos, det_results = [], []
    for _ in range(n_scenes):
        boxes, labels = [], []
        for cls in range(n_classes):
            gts, _ = _random_scene(rng, rng.randint(0, 3), 0)
            boxes += gts
            labels += [cls] * len(gts)
        gt_annos.append(dict(
            gt_boxes=(np.stack(boxes) if boxes else np.zeros((0, 7))),
            gt_labels=np.array(labels, np.int64)))
        dbox, dsc, dlb = [], [], []
        for cls in range(n_classes):
            _, dets = _random_scene(rng, 0, rng.randint(0, 5))
            dbox += [b for b, _ in dets]
            dsc += [s for _, s in dets]
            dlb += [cls] * len(dets)
        det_results.append(dict(
            boxes_3d=(np.stack(dbox) if dbox else np.zeros((0, 7))),
            scores_3d=np.array(dsc), labels_3d=np.array(dlb, np.int64)))

    got = eval3d.indoor_eval(gt_annos, det_results, (0.25, 0.5),
                             class_names=('a', 'b', 'c'))
    # per-class reference via the transcription
    for thr in (0.25, 0.5):
        aps = []
        for cls, name in enumerate(('a', 'b', 'c')):
            gt_mm, pred_mm = {}, {}
            total = 0
            for sid in range(n_scenes):
                gm = gt_annos[sid]['gt_labels'] == cls
                gt_mm[sid] = list(gt_annos[sid]['gt_boxes'][gm])
                total += int(gm.sum())
                dm = det_results[sid]['labels_3d'] == cls
                pred_mm[sid] = list(zip(
                    det_results[sid]['boxes_3d'][dm],
                    det_results[sid]['scores_3d'][dm]))
            if total == 0:
                assert f'{name}_AP_{thr:.2f}' not in got
                continue
            ref = _mm_eval_det_cls(pred_mm, gt_mm, [thr],
                                   eval3d.rotated_iou_3d)
            np.testing.assert_allclose(
                got[f'{name}_AP_{thr:.2f}'], ref[thr][2], atol=1e-9)
            aps.append(ref[thr][2])
        np.testing.assert_allclose(got[f'mAP_{thr:.2f}'], np.mean(aps),
                                   atol=1e-9)


def _grid_iou_3d(b1, b2, res=120):
    """Rasterized IoU oracle: dense BEV grid x exact z overlap."""
    def corners(b):
        return eval3d._bev_corners(b[None])[0]

    out = np.zeros((len(b1), len(b2)))
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            hz = min(a[2] + a[5], b[2] + b[5]) - max(a[2], b[2])
            if hz <= 0:
                continue
            ca, cb = corners(a), corners(b)
            lo = np.minimum(ca.min(0), cb.min(0)) - 1e-3
            hi = np.maximum(ca.max(0), cb.max(0)) + 1e-3
            xs = np.linspace(lo[0], hi[0], res)
            ys = np.linspace(lo[1], hi[1], res)
            gx, gy = np.meshgrid(xs, ys)
            pts = np.stack([gx.ravel(), gy.ravel()], -1)

            def inside(c):
                # orientation-agnostic point-in-convex-quad test
                sgn = np.sign(np.cross(c[1] - c[0], c[2] - c[1]))
                ok = np.ones(len(pts), bool)
                for k in range(4):
                    p, q = c[k], c[(k + 1) % 4]
                    cross = ((q[0] - p[0]) * (pts[:, 1] - p[1]) -
                             (q[1] - p[1]) * (pts[:, 0] - p[0]))
                    ok &= sgn * cross >= 0
                return ok

            cell = ((hi[0] - lo[0]) / (res - 1)) * ((hi[1] - lo[1]) /
                                                    (res - 1))
            inter2d = np.sum(inside(ca) & inside(cb)) * cell
            inter = inter2d * hz
            union = a[3:6].prod() + b[3:6].prod() - inter
            out[i, j] = inter / union
    return out


def test_rotated_iou_matches_rasterized_oracle():
    rng = np.random.RandomState(0)
    b1 = np.stack([np.concatenate([rng.uniform(-1, 1, 3),
                                   rng.uniform(0.5, 2.0, 3),
                                   [rng.uniform(-np.pi, np.pi)]])
                   for _ in range(4)])
    b2 = b1.copy()
    b2[:, :3] += rng.uniform(-0.5, 0.5, (4, 3))
    b2[:, 6] += rng.uniform(-0.8, 0.8, 4)
    got = eval3d.rotated_iou_3d(b1, b2)
    ref = _grid_iou_3d(b1, b2)
    np.testing.assert_allclose(got, ref, atol=2e-2)
