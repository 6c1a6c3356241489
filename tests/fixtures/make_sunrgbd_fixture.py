"""Generate the checked-in miniature SUN RGB-D fixture (mmdet3d format).

Produces ``tests/fixtures/sunrgbd_mini/``:

    sunrgbd_infos_mini.pkl          3 scenes, mmdet3d info schema
    points/00000{0,1,2}.bin         float32 (N, 6) xyz+rgb point clouds
    image/00000{0,1,2}.jpg          160x208 images

Schema mirrors mmdet3d's ``sunrgbd_data_utils.py`` converter output
(the format the reference's configs consume,
/root/reference/configs/_base_/datasets/sunrgbd-3d-10class.py:1-9):
``point_cloud{num_features,lidar_idx}``, ``pts_path``,
``image{image_idx,image_shape,image_path}``, ``calib{K,Rt}``,
``annos{gt_num,name,bbox,location,dimensions,rotation_y,index,class,
gt_boxes_upright_depth}``.  Scene 2 is intentionally EMPTY (gt_num=0) to
exercise ``filter_empty_gt``.

Deterministic (seed 7); rerun this script to regenerate byte-identical
.pkl/.bin (jpg bytes depend on the jpeg encoder; content is seeded).
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

CLASSES = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk',
           'dresser', 'night_stand', 'bookshelf', 'bathtub')
H, W = 160, 208
N_POINTS = 4096
_DEPTH2CAM = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)


def make_scene(rng, n_boxes):
    """Random upright-depth boxes + points sampled on them + floor."""
    boxes = np.zeros((n_boxes, 7), np.float32)
    if n_boxes:
        boxes[:, 0] = rng.uniform(-1.5, 1.5, n_boxes)     # x right
        boxes[:, 1] = rng.uniform(2.0, 4.5, n_boxes)      # y forward
        boxes[:, 2] = rng.uniform(-1.1, -0.4, n_boxes)    # z up (bottom)
        boxes[:, 3:6] = rng.uniform(0.5, 1.5, (n_boxes, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    labels = rng.randint(0, len(CLASSES), n_boxes).astype(np.int64)

    pts = []
    per = (N_POINTS // 2) // max(n_boxes, 1)
    for i in range(n_boxes):
        local = (rng.rand(per, 3) - 0.5) * boxes[i, 3:6]
        c, s = np.cos(boxes[i, 6]), np.sin(boxes[i, 6])
        world = np.stack([local[:, 0] * c + local[:, 1] * s,
                          -local[:, 0] * s + local[:, 1] * c,
                          local[:, 2] + boxes[i, 5] / 2], 1)
        pts.append(world + boxes[i, :3])
    n_bg = N_POINTS - per * n_boxes
    bg = np.stack([rng.uniform(-2.5, 2.5, n_bg), rng.uniform(0.5, 5, n_bg),
                   np.full(n_bg, -1.3)], 1)
    points = np.concatenate(pts + [bg], 0).astype(np.float32)
    rgb = rng.rand(len(points), 3).astype(np.float32)
    return np.concatenate([points, rgb], 1), boxes, labels


def project_boxes(boxes, K, Rt):
    """Upright-depth boxes -> image-plane 2D xyxy via the calib chain
    the dataset reader reproduces (K @ (DEPTH2CAM @ Rt.T))."""
    from demf_tpu.core.boxes import box_corners
    import jax.numpy as jnp
    depth2img = K @ (_DEPTH2CAM @ Rt.T)
    corners = np.asarray(box_corners(jnp.asarray(boxes)))      # (G, 8, 3)
    p = corners @ depth2img.T
    uv = p[..., :2] / np.clip(p[..., 2:3], 1e-3, None)
    x1 = uv[..., 0].min(-1).clip(0, W - 1)
    y1 = uv[..., 1].min(-1).clip(0, H - 1)
    x2 = uv[..., 0].max(-1).clip(0, W - 1)
    y2 = uv[..., 1].max(-1).clip(0, H - 1)
    return np.stack([x1, y1, x2, y2], -1).astype(np.float32)


def main(out_dir=None):
    import cv2
    out_dir = out_dir or os.path.join(os.path.dirname(__file__),
                                      'sunrgbd_mini')
    os.makedirs(os.path.join(out_dir, 'points'), exist_ok=True)
    os.makedirs(os.path.join(out_dir, 'image'), exist_ok=True)
    rng = np.random.RandomState(7)
    K = np.array([[260., 0., W / 2], [0., 260., H / 2], [0., 0., 1.]],
                 np.float32)
    infos = []
    for idx, n_boxes in enumerate([3, 2, 0]):   # scene 2 empty
        # small calib rotation about z so Rt is not trivially identity
        ang = rng.uniform(-0.05, 0.05)
        c, s = np.cos(ang), np.sin(ang)
        Rt = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        raw, boxes, labels = make_scene(rng, n_boxes)
        pts_path = f'points/{idx:06d}.bin'
        raw.tofile(os.path.join(out_dir, pts_path))
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        img_path = f'image/{idx:06d}.jpg'
        cv2.imwrite(os.path.join(out_dir, img_path), img)
        bbox2d = project_boxes(boxes, K, Rt) if n_boxes else \
            np.zeros((0, 4), np.float32)
        annos = dict(
            gt_num=n_boxes,
            name=np.array([CLASSES[l] for l in labels]),
            bbox=bbox2d,
            location=boxes[:, :3].copy(),
            dimensions=boxes[:, 3:6].copy(),
            rotation_y=boxes[:, 6].copy(),
            index=np.arange(n_boxes, dtype=np.int32),
            **{'class': labels.copy()},
            gt_boxes_upright_depth=boxes.copy())
        infos.append(dict(
            point_cloud=dict(num_features=6, lidar_idx=idx),
            pts_path=pts_path,
            image=dict(image_idx=idx, image_shape=np.array([H, W]),
                       image_path=img_path),
            calib=dict(K=K.copy(), Rt=Rt),
            annos=annos))
    with open(os.path.join(out_dir, 'sunrgbd_infos_mini.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    print(f'wrote 3-scene fixture to {out_dir}')


if __name__ == '__main__':
    main()
