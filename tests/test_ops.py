"""Unit tests for geometry ops against pure-numpy oracles (SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from demf_tpu import ops
from demf_tpu.core import boxes as box_ops


def _np_fps(xyz, k):
    n = xyz.shape[0]
    idxs = np.zeros(k, np.int32)
    dists = np.full(n, 1e10)
    last = 0
    for i in range(1, k):
        d = np.sum((xyz - xyz[last]) ** 2, -1)
        dists = np.minimum(dists, d)
        last = int(np.argmax(dists))
        idxs[i] = last
    return idxs


def test_fps_matches_oracle():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 100, 3).astype(np.float32)
    out = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(out[b], _np_fps(xyz[b], 16))


def _np_nearest_in_radius(radius, nsample, points, centers):
    """Oracle: nsample nearest in-radius points, CUDA-style padding."""
    m = centers.shape[0]
    out = np.zeros((m, nsample), np.int32)
    for i in range(m):
        d2 = np.sum((points - centers[i]) ** 2, -1)
        hits = np.where(d2 < radius * radius)[0]
        hits = hits[np.argsort(d2[hits], kind='stable')]
        if len(hits) == 0:
            continue
        cnt = min(len(hits), nsample)
        out[i, :] = hits[0]
        out[i, :cnt] = hits[:cnt]
    return out


@pytest.mark.parametrize('exact', [True, False])
def test_ball_query_nearest_semantics(exact):
    rng = np.random.RandomState(1)
    points = rng.rand(2, 200, 3).astype(np.float32)
    centers = points[:, :32]
    out = np.asarray(ops.ball_query(0.2, 8, jnp.asarray(points),
                                    jnp.asarray(centers), exact=exact))
    for b in range(2):
        ref = _np_nearest_in_radius(0.2, 8, points[b], centers[b])
        d2 = np.sum((points[b][None] - centers[b][:, None]) ** 2, -1)
        # skip boundary-ambiguous centers (fp noise of the matmul distance)
        unambiguous = np.all(np.abs(d2 - 0.04) > 1e-5, axis=1)
        for i in np.where(unambiguous)[0]:
            got, want = set(out[b, i]), set(ref[i])
            if exact:
                assert got == want
            else:  # approx_max_k: high recall required
                assert len(got & want) >= max(1, int(0.75 * len(want)))
        # every returned neighbor must be in radius (or the pad value)
        for i in range(32):
            hits = set(np.where(d2[i] < 0.04 + 1e-6)[0]) | {out[b, i, 0]}
            assert set(out[b, i]) <= hits


def test_ball_query_empty_neighborhood():
    points = jnp.asarray(np.full((1, 16, 3), 10.0, np.float32))
    centers = jnp.zeros((1, 4, 3), jnp.float32)
    out = np.asarray(ops.ball_query(0.5, 8, points, centers))
    np.testing.assert_array_equal(out, 0)


def test_gather_and_group_points():
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 5, 10).astype(np.float32)
    idx = rng.randint(0, 10, (2, 4)).astype(np.int32)
    out = np.asarray(ops.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(out[b], feats[b][:, idx[b]])

    gidx = rng.randint(0, 10, (2, 4, 3)).astype(np.int32)
    gout = np.asarray(ops.group_points(jnp.asarray(feats), jnp.asarray(gidx)))
    for b in range(2):
        for m_ in range(4):
            np.testing.assert_allclose(gout[b, :, m_], feats[b][:, gidx[b, m_]])


def test_three_nn_interpolate():
    rng = np.random.RandomState(3)
    unknown = rng.randn(1, 20, 3).astype(np.float32)
    known = rng.randn(1, 7, 3).astype(np.float32)
    feats = rng.randn(1, 7, 4).astype(np.float32)  # channel-last
    out = np.asarray(ops.three_nn_interpolate(
        jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats)))
    # numpy oracle
    d2 = np.sum((unknown[0][:, None] - known[0][None]) ** 2, -1)
    nn = np.argsort(d2, -1)[:, :3]
    dd = np.take_along_axis(d2, nn, -1)
    w = 1.0 / (dd + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum('nk,nkc->nc', w, feats[0][nn])
    np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=1e-5)


def test_aligned_3d_nms():
    # three boxes: 0 and 1 overlap heavily (same class), 2 is separate
    boxes = jnp.asarray([
        [0, 0, 0, 1, 1, 1],
        [0.05, 0.05, 0.0, 1.05, 1.05, 1.0],
        [5, 5, 5, 6, 6, 6],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([0, 0, 0])
    keep = np.asarray(ops.aligned_3d_nms(boxes, scores, classes, 0.25))
    np.testing.assert_array_equal(keep, [True, False, True])
    # different class -> no suppression
    keep2 = np.asarray(ops.aligned_3d_nms(
        boxes, scores, jnp.asarray([0, 1, 0]), 0.25))
    np.testing.assert_array_equal(keep2, [True, True, True])


def test_points_in_boxes_rotation():
    # 2x1x1 box rotated 45deg about z, bottom z=0.  With the corners-
    # consistent convention the long axis points along
    # R(-yaw) @ x_hat = (cos yaw, -sin yaw) = (0.707, -0.707).
    box = jnp.asarray([[0., 0., 0., 2., 1., 1., np.pi / 4]])
    pts = jnp.asarray([
        [0., 0., 0.5],        # center -> inside
        [0.65, -0.65, 0.5],   # along the long axis (|lx| = 0.92 < 1)
        [0.65, 0.65, 0.5],    # perpendicular (|ly| = 0.92 > 0.5) -> outside
        [0., 0., 1.5],        # above -> outside
    ])
    res = np.asarray(box_ops.points_in_boxes(pts, box))[:, 0]
    np.testing.assert_array_equal(res, [True, True, False, False])

    # consistency with box_corners: every corner (pulled inward) is inside
    corners = box_ops.box_corners(box)[0]
    inner = corners * 0.99 + box_ops.gravity_center(box)[0] * 0.01
    res2 = np.asarray(box_ops.points_in_boxes(inner, box))[:, 0]
    assert res2.all()


def _np_msda(value, shapes, locs, weights):
    """numpy oracle replicating multi_scale_deformable_attn_pytorch."""
    b, _, heads, hd = value.shape
    q, p = locs.shape[1], locs.shape[4]
    out = np.zeros((b, q, heads, hd))
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start:start + h * w].reshape(b, h, w, heads, hd)
        for bi in range(b):
            for qi in range(q):
                for hi in range(heads):
                    for pi in range(p):
                        x = locs[bi, qi, hi, lvl, pi, 0] * w - 0.5
                        y = locs[bi, qi, hi, lvl, pi, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        acc = np.zeros(hd)
                        for dy in (0, 1):
                            for dx in (0, 1):
                                xi, yi = x0 + dx, y0 + dy
                                wgt = ((1 - abs(x - xi)) * (1 - abs(y - yi)))
                                if 0 <= xi < w and 0 <= yi < h:
                                    acc += wgt * v[bi, yi, xi, hi]
                        out[bi, qi, hi] += acc * weights[bi, qi, hi, lvl, pi]
        start += h * w
    return out.reshape(b, q, heads * hd)


def test_msda_matches_oracle():
    rng = np.random.RandomState(4)
    shapes = ((4, 6), (2, 3))
    total = sum(h * w for h, w in shapes)
    b, q, heads, hd, p = 2, 5, 2, 4, 3
    value = rng.randn(b, total, heads, hd).astype(np.float32)
    locs = rng.rand(b, q, heads, len(shapes), p, 2).astype(np.float32)
    # push some locations out of bounds to test zero padding
    locs[0, 0] = 1.2
    w_ = rng.rand(b, q, heads, len(shapes), p).astype(np.float32)
    w_ /= w_.sum((-1, -2), keepdims=True)
    out = np.asarray(ops.multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w_),
        gather_dtype=jnp.float32))
    ref = _np_msda(value, shapes, locs, w_)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # the default bf16 gather path stays within bf16 tolerance
    out16 = np.asarray(ops.multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w_)))
    np.testing.assert_allclose(out16, ref, rtol=2e-2, atol=2e-2)
    # exercise the query-chunked path
    outc = np.asarray(ops.multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w_),
        query_chunk=2, gather_dtype=jnp.float32))
    np.testing.assert_allclose(outc, ref, rtol=1e-4, atol=1e-5)


def test_roi_align_constant_and_gradient_free_zones():
    from demf_tpu.ops.roi_align import roi_align
    feat = jnp.full((16, 16, 2), 3.0)
    rois = jnp.asarray([[0., 0., 8., 8.], [4., 4., 12., 12.]])
    out = np.asarray(roi_align(feat, rois, output_size=4, spatial_scale=1.0))
    assert out.shape == (2, 4, 4, 2)
    np.testing.assert_allclose(out, 3.0, atol=1e-5)


def _jnp_msda_autodiff(value, shapes, locs, aw):
    """Plain-jnp MSDA (no custom VJP) used as an autodiff oracle."""
    import jax

    b, _, heads, hd = value.shape
    q, p = locs.shape[1], locs.shape[4]
    out = jnp.zeros((b, q, heads, hd))
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start:start + h * w].reshape(b, h, w, heads, hd)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        x = locs[:, :, :, lvl, :, 0] * w - 0.5
        y = locs[:, :, :, lvl, :, 1] * h - 0.5
        x0, y0 = jnp.floor(x), jnp.floor(y)
        acc = 0.
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi = x0 + dx, y0 + dy
                wgt = (1 - jnp.abs(x - xi)) * (1 - jnp.abs(y - yi))
                ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                xi_c = jnp.clip(xi, -1, w).astype(jnp.int32) + 1
                yi_c = jnp.clip(yi, -1, h).astype(jnp.int32) + 1
                bi = jnp.arange(b)[:, None, None, None]
                hi = jnp.arange(heads)[None, None, :, None]
                g = vp[bi, yi_c, xi_c, hi]
                acc = acc + jnp.where(ok[..., None], wgt[..., None], 0.) * g
        out = out + jnp.sum(acc * aw[:, :, :, lvl, :, None], axis=3)
        start += h * w
    return out.reshape(b, q, heads * hd)


def test_msda_custom_vjp_matches_autodiff():
    """The quad-fused MSDA custom VJP must equal plain autodiff grads."""
    import jax

    rng = np.random.RandomState(11)
    shapes = ((4, 6), (2, 3))
    total = sum(h * w for h, w in shapes)
    b, q, heads, hd, p = 2, 7, 2, 4, 3
    value = jnp.asarray(rng.randn(b, total, heads, hd).astype(np.float32))
    # keep away from bilinear kinks so both sides are differentiable
    locs = jnp.asarray(
        (rng.rand(b, q, heads, len(shapes), p, 2) * 0.8 + 0.1)
        .astype(np.float32))
    aw = rng.rand(b, q, heads, len(shapes), p).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum((-1, -2), keepdims=True))

    def l_ref(v, l, w):
        return jnp.sum(jnp.sin(_jnp_msda_autodiff(v, shapes, l, w)))

    g_ref = jax.grad(l_ref, argnums=(0, 1, 2))(value, locs, aw)
    for qc in (2048, 2):   # single-chunk and scan paths
        def l_new(v, l, w):
            return jnp.sum(jnp.sin(ops.multi_scale_deformable_attention(
                v, shapes, l, w, query_chunk=qc,
                gather_dtype=jnp.float32)))

        g_new = jax.grad(l_new, argnums=(0, 1, 2))(value, locs, aw)
        for a, b_ in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


def test_msda_saved_residual_backward_matches_recompute():
    """The chunked backward from saved residuals must equal the
    rematerializing chunked backward (DEMF_TPU_MSDA_SAVE_RES_MAX
    routes between them; distinct query_chunk values dodge the
    _make_msda lru_cache)."""
    import jax

    from demf_tpu.ops import msda as msda_mod

    rng = np.random.RandomState(13)
    shapes = ((4, 6), (2, 3))
    total = sum(h * w for h, w in shapes)
    b, q, heads, hd, p = 2, 9, 2, 4, 3
    value = jnp.asarray(rng.randn(b, total, heads, hd).astype(np.float32))
    locs = jnp.asarray(
        (rng.rand(b, q, heads, len(shapes), p, 2) * 0.8 + 0.1)
        .astype(np.float32))
    aw = rng.rand(b, q, heads, len(shapes), p).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum((-1, -2), keepdims=True))

    def loss(qc):
        def f(v, l, w):
            return jnp.sum(jnp.sin(ops.multi_scale_deformable_attention(
                v, shapes, l, w, query_chunk=qc,
                gather_dtype=jnp.float32)))
        return f

    old = msda_mod._SAVE_RESIDUALS_MAX_SAMPLES
    try:
        msda_mod._SAVE_RESIDUALS_MAX_SAMPLES = 10 ** 9
        g_saved = jax.grad(loss(3), argnums=(0, 1, 2))(value, locs, aw)
        msda_mod._SAVE_RESIDUALS_MAX_SAMPLES = 0
        g_rec = jax.grad(loss(4), argnums=(0, 1, 2))(value, locs, aw)
    finally:
        msda_mod._SAVE_RESIDUALS_MAX_SAMPLES = old
    for a, b_ in zip(g_saved, g_rec):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_msda_banded_onehot_backward_matches_autodiff():
    """A >2048-row level routes d_value through the banded one-hot; both
    the in-band fast path (clustered locations) and the overflow
    fallback (spread locations) must match plain autodiff."""
    import jax

    rng = np.random.RandomState(21)
    shapes = ((48, 52), (2, 3))          # 2496 rows: banded; 6: one-hot
    total = sum(h * w for h, w in shapes)
    b, q, heads, hd, p = 1, 80, 2, 4, 2   # q*L*P*8 > sum_HW: quad path
    value = jnp.asarray(rng.randn(b, total, heads, hd).astype(np.float32))
    aw = rng.rand(b, q, heads, len(shapes), p).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum((-1, -2), keepdims=True))

    spread = (rng.rand(b, q, heads, len(shapes), p, 2) * 0.8 + 0.1)
    clustered = spread * 0.1 + 0.45      # tight cluster near the centre
    for locs_np in (clustered, spread):
        locs = jnp.asarray(locs_np.astype(np.float32))

        def l_ref(v, l, w):
            return jnp.sum(jnp.sin(_jnp_msda_autodiff(v, shapes, l, w)))

        def l_new(v, l, w):
            return jnp.sum(jnp.sin(ops.multi_scale_deformable_attention(
                v, shapes, l, w, query_chunk=30,
                gather_dtype=jnp.float32)))

        g_ref = jax.grad(l_ref, argnums=(0, 1, 2))(value, locs, aw)
        g_new = jax.grad(l_new, argnums=(0, 1, 2))(value, locs, aw)
        for a, b_ in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


def test_msda_small_q_path_matches_autodiff():
    """Decoder-scale routing (Q small vs plane) must stay exact too."""
    import jax

    rng = np.random.RandomState(12)
    shapes = ((16, 16), (8, 8))          # sum_HW=320 >> Q*L*P*8
    total = sum(h * w for h, w in shapes)
    b, q, heads, hd, p = 2, 3, 2, 4, 2
    value = jnp.asarray(rng.randn(b, total, heads, hd).astype(np.float32))
    locs = jnp.asarray(
        (rng.rand(b, q, heads, len(shapes), p, 2) * 0.8 + 0.1)
        .astype(np.float32))
    aw = rng.rand(b, q, heads, len(shapes), p).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum((-1, -2), keepdims=True))

    out = np.asarray(ops.multi_scale_deformable_attention(
        value, shapes, locs, aw, gather_dtype=jnp.float32))
    ref = _np_msda(np.asarray(value), shapes, np.asarray(locs),
                   np.asarray(aw))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def l_ref(v, l, w):
        return jnp.sum(jnp.sin(_jnp_msda_autodiff(v, shapes, l, w)))

    def l_new(v, l, w):
        return jnp.sum(jnp.sin(ops.multi_scale_deformable_attention(
            v, shapes, l, w, gather_dtype=jnp.float32)))

    g_ref = jax.grad(l_ref, argnums=(0, 1, 2))(value, locs, aw)
    g_new = jax.grad(l_new, argnums=(0, 1, 2))(value, locs, aw)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_rowwise_nms_matches_matrix():
    """The O(N)-memory row-wise greedy NMS (RPN-proposal scale) must
    produce exactly the matrix-form keep set."""
    import numpy as np
    from demf_tpu.ops import nms as N
    rng = np.random.RandomState(0)
    n = 300
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, :2] = rng.rand(n, 2) * 100
    boxes[:, 2:] = boxes[:, :2] + rng.rand(n, 2) * 40 + 2
    scores = rng.rand(n).astype(np.float32)
    idxs = rng.randint(0, 3, n)
    valid = rng.rand(n) < 0.9
    ref = np.asarray(N.batched_nms_2d(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5,
        jnp.asarray(valid)))
    got = np.asarray(N._greedy_suppress_rowwise_2d(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5,
        jnp.asarray(valid)))
    assert (ref == got).all()
    ref2 = np.asarray(N.nms_2d(jnp.asarray(boxes), jnp.asarray(scores),
                               0.5, jnp.asarray(valid)))
    got2 = np.asarray(N._greedy_suppress_rowwise_2d(
        jnp.asarray(boxes), jnp.asarray(scores), None, 0.5,
        jnp.asarray(valid)))
    assert (ref2 == got2).all()


def test_pallas_gather_rows_interpret():
    """Stage-and-select row gather == fancy-index oracle (interpret mode)."""
    from demf_tpu.ops.pallas.gather_rows import gather_rows
    rng = np.random.RandomState(3)
    for dtype in (jnp.bfloat16, jnp.float32):
        bh, n, s, c = 3, 999, 5000, 128
        plane = jnp.asarray(rng.randn(bh, n, c), dtype)
        idx = jnp.asarray(rng.randint(0, n, (bh, s)), jnp.int32)
        got = np.asarray(gather_rows(plane, idx, 4096, 4, True), np.float32)
        want = np.asarray(plane, np.float32)[
            np.arange(bh)[:, None], np.asarray(idx)]
        np.testing.assert_allclose(got, want)
