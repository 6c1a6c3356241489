import numpy as np

from demf_tpu.core.eval3d import rotated_iou_3d, indoor_eval, average_precision


def test_rotated_iou_identity_and_disjoint():
    b = np.array([[0, 0, 0, 2, 1, 1, 0.3]])
    iou = rotated_iou_3d(b, b)
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-6)
    b2 = np.array([[10, 10, 10, 2, 1, 1, 0.0]])
    np.testing.assert_allclose(rotated_iou_3d(b, b2), [[0.0]])


def test_rotated_iou_axis_aligned_overlap():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.0]])
    b = np.array([[1, 0, 0, 2, 2, 2, 0.0]])
    # intersection 1x2x2=4, union 8+8-4=12
    np.testing.assert_allclose(rotated_iou_3d(a, b), [[4 / 12]], atol=1e-6)


def test_rotated_iou_90deg_symmetric():
    a = np.array([[0, 0, 0, 4, 2, 1, 0.0]])
    b = np.array([[0, 0, 0, 4, 2, 1, np.pi / 2]])
    # two crossed 4x2 rects: intersection 2x2=4, union 8+8-4=12
    np.testing.assert_allclose(rotated_iou_3d(a, b), [[4 / 12]], atol=1e-5)


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(average_precision(rec, prec) - 1.0) < 1e-6


def test_indoor_eval_perfect_detection():
    classes = ('a', 'b')
    gt = [dict(gt_boxes=np.array([[0, 0, 0, 1, 1, 1, 0.]]),
               gt_labels=np.array([0])),
          dict(gt_boxes=np.array([[2, 2, 2, 1, 1, 1, 0.3],
                                  [5, 5, 5, 1, 1, 1, 0.]]),
               gt_labels=np.array([1, 0]))]
    det = [dict(boxes_3d=np.array([[0, 0, 0, 1, 1, 1, 0.]]),
                scores_3d=np.array([0.9]), labels_3d=np.array([0])),
           dict(boxes_3d=np.array([[2, 2, 2, 1, 1, 1, 0.3],
                                   [5, 5, 5, 1, 1, 1, 0.]]),
                scores_3d=np.array([0.8, 0.7]), labels_3d=np.array([1, 0]))]
    res = indoor_eval(gt, det, (0.25, 0.5), classes)
    assert abs(res['mAP_0.25'] - 1.0) < 1e-6
    assert abs(res['mAP_0.50'] - 1.0) < 1e-6


def test_indoor_eval_false_positive_hurts():
    classes = ('a',)
    gt = [dict(gt_boxes=np.array([[0, 0, 0, 1, 1, 1, 0.]]),
               gt_labels=np.array([0]))]
    det = [dict(boxes_3d=np.array([[0, 0, 0, 1, 1, 1, 0.],
                                   [9, 9, 9, 1, 1, 1, 0.]]),
                scores_3d=np.array([0.5, 0.9]),  # FP ranked first
                labels_3d=np.array([0, 0]))]
    res = indoor_eval(gt, det, (0.25,), classes)
    assert res['mAP_0.25'] < 1.0
