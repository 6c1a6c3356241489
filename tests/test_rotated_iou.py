"""Device rotated-IoU (fixed-shape polygon clipping) vs the host oracle.

The differentiable device path (core/rotated_iou.py) must match the
numpy eval-path IoU (core/eval3d.rotated_iou_3d) that is itself
golden-tested against a rasterized oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np

from demf_tpu.core.eval3d import rotated_iou_3d
from demf_tpu.core.rotated_iou import (iou3d_aligned, iou3d_matrix,
                                       rotated_nms_3d)


def _random_boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-2, 2, (n, 2))
    b[:, 2] = rng.uniform(-1, 0, n)
    b[:, 3:6] = rng.uniform(0.3, 2.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_matrix_matches_host_oracle():
    rng = np.random.RandomState(0)
    b1 = _random_boxes(rng, 12)
    b2 = _random_boxes(rng, 9)
    dev = np.asarray(jax.jit(iou3d_matrix)(jnp.asarray(b1),
                                           jnp.asarray(b2)))
    host = rotated_iou_3d(b1, b2)
    np.testing.assert_allclose(dev, host, atol=2e-4)


def test_identical_and_disjoint():
    rng = np.random.RandomState(1)
    b = _random_boxes(rng, 6)
    self_iou = np.asarray(iou3d_aligned(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(self_iou, 1.0, atol=1e-4)
    far = b.copy()
    far[:, 0] += 100.0
    np.testing.assert_allclose(
        np.asarray(iou3d_aligned(jnp.asarray(b), jnp.asarray(far))),
        0.0, atol=1e-6)


def test_gradients():
    """d(IoU)/d(box) must be finite and nonzero for overlapping boxes —
    the RotatedIoU3DLoss contract (FCAF3D bbox loss)."""
    b1 = jnp.asarray([0.1, 0.0, 0.0, 1.0, 1.2, 1.0, 0.3])
    b2 = jnp.asarray([0.0, 0.2, 0.1, 1.1, 0.9, 0.8, -0.2])

    from demf_tpu.core.rotated_iou import iou3d_pair
    g = jax.grad(iou3d_pair)(b1, b2)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_rotated_nms():
    rng = np.random.RandomState(2)
    base = _random_boxes(rng, 1)[0]
    near = base.copy()
    near[0] += 0.05            # heavy overlap, lower score -> suppressed
    far = base.copy()
    far[:2] += 10.0            # disjoint -> kept
    boxes = jnp.asarray(np.stack([base, near, far]))
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([0, 0, 0])
    keep = np.asarray(rotated_nms_3d(boxes, scores, classes, 0.25))
    assert keep.tolist() == [True, False, True]
    # different class -> not suppressed
    keep2 = np.asarray(rotated_nms_3d(boxes, scores,
                                      jnp.asarray([0, 1, 0]), 0.25))
    assert keep2.tolist() == [True, True, True]


def test_sort_vertices_matches_clip_form():
    """The scatter-free sort-vertices intersection must match the
    Sutherland-Hodgman clip form across random and degenerate pairs."""
    from demf_tpu.core.rotated_iou import (bev_intersection,
                                           bev_intersection_clip)
    rng = np.random.RandomState(7)
    b1 = _random_boxes(rng, 64)
    b2 = _random_boxes(rng, 64)
    # include identical, contained, and far-apart pairs
    b2[:8] = b1[:8]
    b2[8:16] = b1[8:16]
    b2[8:16, 3:6] *= 0.3          # contained
    b2[16:24, 0] += 50            # disjoint
    f_new = jax.jit(jax.vmap(bev_intersection))
    f_old = jax.jit(jax.vmap(bev_intersection_clip))
    a_new = np.asarray(f_new(jnp.asarray(b1), jnp.asarray(b2)))
    a_old = np.asarray(f_old(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(a_new, a_old, atol=2e-4)
