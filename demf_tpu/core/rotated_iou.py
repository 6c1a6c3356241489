"""Differentiable rotated 3D IoU on device (fixed-shape polygon clipping).

TPU-native replacement for two reference CUDA surfaces:

  * ``RotatedIoU3DLoss`` — FCAF3D's bbox loss (mmdet3d
    ``diff_iou_rotated_3d``, a CUDA sort-vertices kernel) used by the
    DeMF-FCAF3D branch (SURVEY.md §2b N12);
  * rotated-BEV 3D NMS (mmcv ``nms_rotated`` / pcdet ``nms_gpu``).

Formulation: Sutherland–Hodgman clipping of one BEV rectangle by the
other, with a STATIC vertex buffer (two convex quads intersect in at most
8 vertices; we keep capacity 8 with a validity count), so the whole
computation jits, vmaps, and differentiates (a.e.) — no dynamic shapes,
no host round-trips.  Height overlap x BEV intersection / volume union.

Box convention: (x, y, z_bottom, dx, dy, dz, yaw) depth boxes with the
``core.boxes.box_corners`` rotation sense (x' = x cos + y sin).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_CAP = 8    # max vertices of quad∩quad


def bev_corners(box):
    """(7,) -> (4, 2) CCW BEV corners (box_corners convention)."""
    x, y, dx, dy, yaw = box[0], box[1], box[3], box[4], box[6]
    lx = jnp.array([-0.5, 0.5, 0.5, -0.5]) * dx
    ly = jnp.array([-0.5, -0.5, 0.5, 0.5]) * dy
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    wx = lx * c + ly * s + x
    wy = -lx * s + ly * c + y
    return jnp.stack([wx, wy], -1)


def _clip_by_edge(verts, count, a, b):
    """Clip a polygon (capacity-_CAP ``verts`` with ``count`` valid CCW
    vertices) by the half-plane left of edge a->b."""
    idx = jnp.arange(_CAP)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = verts
    nxtv = verts[nxt]
    e = b - a
    # signed area test: >=0 means inside (left of edge, CCW clip poly)
    def side(p):
        return e[0] * (p[..., 1] - a[1]) - e[1] * (p[..., 0] - a[0])

    cur_in = side(cur) >= 0
    nxt_in = side(nxtv) >= 0
    # intersection of segment cur->nxt with the edge line
    d1 = side(cur)
    d2 = side(nxtv)
    t = d1 / jnp.where(jnp.abs(d1 - d2) < 1e-12, 1e-12, d1 - d2)
    inter = cur + jnp.clip(t, 0.0, 1.0)[:, None] * (nxtv - cur)

    active = idx < count
    # each input vertex emits up to 2 outputs: [cur if cur_in,
    # inter if cur_in != nxt_in]
    emit1 = cur_in & active
    emit2 = (cur_in ^ nxt_in) & active
    out1 = cur
    out2 = inter
    # compact: positions via cumulative counts
    n1 = emit1.astype(jnp.int32)
    n2 = emit2.astype(jnp.int32)
    total_before = jnp.cumsum(n1 + n2) - (n1 + n2)
    pos1 = total_before
    pos2 = total_before + n1
    new_count = jnp.sum(n1 + n2)
    out = jnp.zeros((_CAP, 2), verts.dtype)

    def scatter(out, emit, pos, val):
        safe_pos = jnp.where(emit, pos, _CAP)   # out-of-range -> dropped
        return out.at[safe_pos].add(
            jnp.where(emit[:, None], val, 0.0), mode='drop')

    out = scatter(out, emit1, pos1, out1)
    out = scatter(out, emit2, pos2, out2)
    return out, jnp.minimum(new_count, _CAP)


def _poly_area(verts, count):
    idx = jnp.arange(_CAP)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    active = (idx < count).astype(verts.dtype)
    x1, y1 = verts[:, 0], verts[:, 1]
    x2, y2 = verts[nxt, 0], verts[nxt, 1]
    return 0.5 * jnp.abs(jnp.sum((x1 * y2 - x2 * y1) * active))


def bev_intersection_clip(box1, box2):
    """BEV intersection via Sutherland–Hodgman clipping (reference
    formulation; scatter-heavy — kept for cross-checking)."""
    p1 = bev_corners(box1)
    p2 = bev_corners(box2)
    verts = jnp.zeros((_CAP, 2), p1.dtype).at[:4].set(p1)
    count = jnp.asarray(4, jnp.int32)
    for k in range(4):
        verts, count = _clip_by_edge(verts, count, p2[k],
                                     p2[(k + 1) % 4])
    return _poly_area(verts, count)


def bev_intersection(box1, box2):
    """BEV intersection area, sort-vertices formulation (differentiable,
    scatter-free — the XLA-friendly analogue of the CUDA
    ``diff_iou_rotated`` sort-vertices kernel).

    Candidate vertices of the convex intersection polygon: corners of A
    inside B (4), corners of B inside A (4), and the 16 edge-pair
    intersection points — 24 masked candidates.  They are ordered by
    angle around the valid-centroid; invalid slots repeat the first
    valid vertex (duplicates contribute zero to the shoelace sum).
    """
    pa = bev_corners(box1)                       # (4, 2)
    pb = bev_corners(box2)

    def inside(pts, poly):
        # convex CCW polygon: point is inside iff left of every edge
        a = poly
        b = jnp.roll(poly, -1, axis=0)
        e = b - a                                # (4, 2)
        d = pts[:, None, :] - a[None, :, :]      # (P, 4, 2)
        cr = e[None, :, 0] * d[..., 1] - e[None, :, 1] * d[..., 0]
        return (cr >= -1e-9).all(-1)             # (P,)

    in_ab = inside(pa, pb)                       # (4,)
    in_ba = inside(pb, pa)

    # all 16 edge-pair intersections
    a1 = pa                                      # (4, 2) edge starts
    a2 = jnp.roll(pa, -1, axis=0)
    b1 = pb
    b2 = jnp.roll(pb, -1, axis=0)
    da = (a2 - a1)[:, None, :]                   # (4, 1, 2)
    db = (b2 - b1)[None, :, :]                   # (1, 4, 2)
    r = a1[:, None, :] - b1[None, :, :]          # (4, 4, 2)
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = (db[..., 0] * r[..., 1] - db[..., 1] * r[..., 0]) / safe
    u = (da[..., 0] * r[..., 1] - da[..., 1] * r[..., 0]) / safe
    hit = (jnp.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & \
        (u >= 0) & (u <= 1)
    ipts = a1[:, None, :] + t[..., None] * da    # (4, 4, 2)

    cand = jnp.concatenate([pa, pb, ipts.reshape(16, 2)])   # (24, 2)
    valid = jnp.concatenate([in_ab, in_ba, hit.reshape(16)])

    n = valid.sum()
    w = valid.astype(cand.dtype)[:, None]
    centroid = (cand * w).sum(0) / jnp.maximum(n, 1)
    ang = jnp.arctan2(cand[:, 1] - centroid[1],
                      cand[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(ang)
    pts = cand[order]                            # valid first, by angle
    first = pts[0]
    idx = jnp.arange(24)
    pts = jnp.where((idx < n)[:, None], pts, first[None])
    nxt = jnp.roll(pts, -1, axis=0)
    area = 0.5 * jnp.abs(jnp.sum(
        pts[:, 0] * nxt[:, 1] - nxt[:, 0] * pts[:, 1]))
    return jnp.where(n >= 3, area, 0.0)


def iou3d_pair(box1, box2, eps=1e-7):
    """Single-pair rotated 3D IoU, differentiable. (7,), (7,) -> ()."""
    inter2d = bev_intersection(box1, box2)
    zmin = jnp.maximum(box1[2], box2[2])
    zmax = jnp.minimum(box1[2] + box1[5], box2[2] + box2[5])
    hz = jnp.clip(zmax - zmin, 0.0, None)
    inter = inter2d * hz
    vol1 = box1[3] * box1[4] * box1[5]
    vol2 = box2[3] * box2[4] * box2[5]
    return inter / jnp.clip(vol1 + vol2 - inter, eps, None)


def iou3d_aligned(boxes1, boxes2):
    """Element-wise rotated IoU of two (N, 7) box sets -> (N,)."""
    return jax.vmap(iou3d_pair)(boxes1, boxes2)


def iou3d_matrix(boxes1, boxes2):
    """(N, 7) x (M, 7) -> (N, M) rotated IoU matrix (device)."""
    return jax.vmap(lambda a: jax.vmap(lambda b: iou3d_pair(a, b))(
        boxes2))(boxes1)


def rotated_nms_3d(boxes, scores, classes, thresh, valid=None):
    """Greedy class-aware rotated-BEV 3D NMS, fixed shapes.

    Same contract as ops/nms.aligned_3d_nms but with exact rotated IoU
    (the FCAF3D test-time path, mmdet3d ``nms_3d``).
    Returns a (N,) keep mask.
    """
    from ..ops.nms import _greedy_suppress
    iou = iou3d_matrix(boxes, boxes)
    same = classes[:, None] == classes[None, :]
    iou = jnp.where(same, iou, 0.0)
    if valid is None:
        valid = jnp.ones(boxes.shape[0], bool)
    return _greedy_suppress(iou, scores, thresh, valid)
