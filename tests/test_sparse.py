"""Oracle tests: sparse conv ops vs dense numpy 3D convolution.

The sparse path (ops/sparse.py) must agree with an explicit dense-grid
convolution wherever voxels exist — the same contract MinkowskiEngine
documents for its kernel maps (reference DeMF_fcaf branch backbone,
SURVEY.md §2b N12).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demf_tpu.ops import sparse as S


def _random_voxels(rng, n_occ, grid=8, c=4, cap=64):
    """Random occupied voxel set on a small dense grid."""
    lin = rng.choice(grid ** 3, n_occ, replace=False)
    coords = np.stack([lin // (grid * grid), (lin // grid) % grid,
                       lin % grid], -1).astype(np.int32)
    feats = rng.randn(n_occ, c).astype(np.float32)
    # pad to capacity
    coords_p = np.full((cap, 3), int(S.INVALID), np.int32)
    feats_p = np.zeros((cap, c), np.float32)
    valid = np.zeros((cap,), bool)
    coords_p[:n_occ] = coords
    feats_p[:n_occ] = feats
    valid[:n_occ] = True
    dense = np.zeros((grid, grid, grid, c), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    occ = np.zeros((grid, grid, grid), bool)
    occ[coords[:, 0], coords[:, 1], coords[:, 2]] = True
    return coords_p, feats_p, valid, dense, occ


def _dense_conv(dense, occ, w, kernel_size, out_mask):
    """Dense 3D conv restricted to occupied inputs, evaluated on
    ``out_mask`` sites.  w: (K, C, Co) in S.kernel_offsets order."""
    grid = dense.shape[0]
    c, co = w.shape[1], w.shape[2]
    offs = np.asarray(S.kernel_offsets(kernel_size))
    out = np.zeros((grid, grid, grid, co), np.float32)
    for z in range(grid):
        for y in range(grid):
            for x in range(grid):
                if not out_mask[z, y, x]:
                    continue
                acc = np.zeros(co, np.float32)
                for t, (dz, dy, dx) in enumerate(offs):
                    zz, yy, xx = z + dz, y + dy, x + dx
                    if 0 <= zz < grid and 0 <= yy < grid and \
                            0 <= xx < grid and occ[zz, yy, xx]:
                        acc += dense[zz, yy, xx] @ w[t]
                out[z, y, x] = acc
    return out


def test_submanifold_conv_oracle():
    rng = np.random.RandomState(0)
    coords, feats, valid, dense, occ = _random_voxels(rng, 40)
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.3
    out = np.asarray(jax.jit(S.submanifold_conv)(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        jnp.asarray(w)))
    ref = _dense_conv(dense, occ, w, 3, occ)
    for i in range(40):
        z, y, x = coords[i]
        np.testing.assert_allclose(out[i], ref[z, y, x], atol=1e-4)
    assert (out[40:] == 0).all()


def test_strided_conv_oracle():
    rng = np.random.RandomState(1)
    coords, feats, valid, dense, occ = _random_voxels(rng, 50)
    w = rng.randn(8, 4, 5).astype(np.float32) * 0.3
    oc, ov, out = jax.jit(S.strided_conv, static_argnames=('max_out',))(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        jnp.asarray(w), max_out=64)
    oc, ov, out = np.asarray(oc), np.asarray(ov), np.asarray(out)
    # output coordinate set = unique even-floored coords
    want = {tuple(c // 2 * 2) for c in coords[:50]}
    got = {tuple(c) for c in oc[ov]}
    assert got == want
    # dense oracle evaluated at the coarse sites
    out_mask = np.zeros_like(occ)
    for (z, y, x) in want:
        out_mask[z, y, x] = True
    ref = _dense_conv(dense, occ, w, 2, out_mask)
    for i in np.where(ov)[0]:
        z, y, x = oc[i]
        np.testing.assert_allclose(out[i], ref[z, y, x], atol=1e-4)


def test_max_pool_oracle():
    rng = np.random.RandomState(2)
    coords, feats, valid, dense, occ = _random_voxels(rng, 30)
    oc, ov, out = jax.jit(S.sparse_max_pool, static_argnames=('max_out',))(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        max_out=64)
    oc, ov, out = np.asarray(oc), np.asarray(ov), np.asarray(out)
    for i in np.where(ov)[0]:
        z, y, x = oc[i]
        window = []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    zz, yy, xx = z + dz, y + dy, x + dx
                    if zz < 8 and yy < 8 and xx < 8 and occ[zz, yy, xx]:
                        window.append(dense[zz, yy, xx])
        ref = np.max(window, 0)
        np.testing.assert_allclose(out[i], ref, atol=1e-5)


def test_transposed_conv_oracle():
    rng = np.random.RandomState(3)
    coords, feats, valid, dense, occ = _random_voxels(rng, 40)
    # coarse level from a strided conv
    wdown = rng.randn(8, 4, 5).astype(np.float32) * 0.3
    cc, cv, cf = jax.jit(S.strided_conv, static_argnames=('max_out',))(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        jnp.asarray(wdown), max_out=64)
    wup = rng.randn(8, 5, 3).astype(np.float32) * 0.3
    up = np.asarray(jax.jit(S.transposed_conv_to)(
        jnp.asarray(coords), jnp.asarray(valid), cc, cv, cf,
        jnp.asarray(wup)))
    cc, cv, cf = np.asarray(cc), np.asarray(cv), np.asarray(cf)
    coarse_map = {tuple(cc[i]): cf[i] for i in np.where(cv)[0]}
    offs = np.asarray(S.kernel_offsets(2))
    for i in range(40):
        z, y, x = coords[i]
        parent = (z // 2 * 2, y // 2 * 2, x // 2 * 2)
        off = (z - parent[0], y - parent[1], x - parent[2])
        tap = (off[0] * 2 + off[1]) * 2 + off[2]
        ref = coarse_map[parent] @ wup[tap] \
            if parent in coarse_map else np.zeros(3)
        np.testing.assert_allclose(up[i], ref, atol=1e-4)


def test_voxelize_mean_pool():
    rng = np.random.RandomState(4)
    pts = rng.rand(500, 3).astype(np.float32) * 2 - 1     # [-1, 1)
    feats = rng.randn(500, 6).astype(np.float32)
    coords, vfeats, valid = jax.jit(
        S.voxelize, static_argnames=('max_voxels',))(
        jnp.asarray(pts), jnp.asarray(feats), 0.25,
        jnp.asarray([-1., -1., -1.]), max_voxels=512)
    coords, vfeats, valid = (np.asarray(coords), np.asarray(vfeats),
                             np.asarray(valid))
    ref_coords = np.floor((pts + 1) / 0.25).astype(np.int32)
    # every input voxel appears exactly once with the mean feature
    want = {}
    for i in range(500):
        want.setdefault(tuple(ref_coords[i]), []).append(feats[i])
    got = {tuple(coords[i]): vfeats[i] for i in np.where(valid)[0]}
    assert set(got) == set(want)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], np.mean(v, 0), atol=1e-5)


def test_gradients_flow():
    """Sparse conv must be differentiable wrt features and weights."""
    rng = np.random.RandomState(5)
    coords, feats, valid, _, _ = _random_voxels(rng, 20)
    w = rng.randn(27, 4, 4).astype(np.float32) * 0.3

    def loss(feats, w):
        out = S.submanifold_conv(jnp.asarray(coords), jnp.asarray(valid),
                                 feats, w)
        return jnp.sum(out ** 2)

    gf, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats),
                                            jnp.asarray(w))
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).sum()) > 0 and float(jnp.abs(gw).sum()) > 0


def test_voxelize_drops_out_of_range_points():
    """Advisor round 2: out-of-range points must be EXCLUDED from the
    voxel table (MinkowskiEngine keeps arbitrary coords; our packed table
    cannot, and clamping them into boundary voxels polluted edge-voxel
    mean features)."""
    rng = np.random.RandomState(5)
    pts_in = rng.rand(64, 3).astype(np.float32) * 2 - 1      # [-1, 1)
    # below pc_start (negative voxel coords: previously clamped into the
    # 0-boundary voxel) and beyond the packable bound (previously clamped
    # into the MAX_COORD edge voxel)
    pts_out = np.array([[-9.0, 0.5, 0.5], [0.5, -2.0, 0.5],
                        [0.5, 0.5, 1e6]], np.float32)
    pts = np.concatenate([pts_in, pts_out], 0)
    feats = np.concatenate(
        [np.ones((64, 2), np.float32),
         np.full((3, 2), 1000.0, np.float32)], 0)            # poison marker
    coords, vfeats, valid = jax.jit(
        S.voxelize, static_argnames=('max_voxels',))(
        jnp.asarray(pts), jnp.asarray(feats), 0.25,
        jnp.asarray([-1., -1., -1.]), max_voxels=128)
    coords, vfeats, valid = (np.asarray(coords), np.asarray(vfeats),
                             np.asarray(valid))
    # all valid voxels hold the clean mean (1.0): no poison leaked in
    np.testing.assert_allclose(vfeats[valid], 1.0, atol=1e-6)
    # the in-range voxel set is exactly reproduced
    ref = {tuple(c) for c in np.floor((pts_in + 1) / 0.25).astype(np.int32)}
    got = {tuple(c) for c in coords[valid]}
    assert got == ref


def test_conv_custom_vjp_matches_autodiff():
    """Scatter-free conv VJPs ('flip' for submanifold, revgeo for
    strided) must agree with XLA's autodiff transpose to fp32 tolerance."""
    rng = np.random.RandomState(7)

    def batchify(*samples):
        return tuple(jnp.asarray(np.stack(a)) for a in zip(*samples))

    coords, feats, valid = batchify(*[
        _random_voxels(rng, 40 + 3 * i, cap=64)[:3] for i in range(2)])
    w3 = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32) * 0.2)
    offs = S.kernel_offsets(3)
    nbr = S.neighbor_table_batched(coords, valid, coords, valid, offs)
    cot = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))

    def loss(fn):
        def inner(f, w):
            out = fn(f, w)
            return jnp.sum(out * cot)
        return jax.jit(jax.grad(inner, argnums=(0, 1)))

    g_ref = loss(lambda f, w: S.sparse_conv_apply_batched(
        f, nbr, w, rev=None))(feats, w3)
    g_flip = loss(lambda f, w: S.sparse_conv_apply_batched(
        f, nbr, w, rev='flip'))(feats, w3)
    for a, b in zip(g_ref, g_flip):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # strided (k=2, s=2) revgeo path
    offs2 = S.kernel_offsets(2)
    oc, ov = jax.vmap(lambda c, v: S.downsample_coords(c, v, 2, 32))(
        coords, valid)
    nbr2 = S.neighbor_table_batched(coords, valid, oc, ov, offs2)
    w2 = jnp.asarray(rng.randn(8, 4, 6).astype(np.float32) * 0.2)
    cot2 = jnp.asarray(rng.randn(2, 32, 6).astype(np.float32))
    rev = dict(kernel_size=2, in_stride=1, out_coords=oc, out_valid=ov,
               in_coords=coords, in_valid=valid)

    def loss2(use_rev):
        def inner(f, w):
            out = S.sparse_conv_apply_batched(
                f, nbr2, w, rev=rev if use_rev else None)
            return jnp.sum(out * cot2)
        return jax.jit(jax.grad(inner, argnums=(0, 1)))

    g_ref2 = loss2(False)(feats, w2)
    g_rev2 = loss2(True)(feats, w2)
    for a, b in zip(g_ref2, g_rev2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # k=1 downsample branch (MinkResNet 'down')
    offs1 = S.kernel_offsets(1)
    nbr1 = S.neighbor_table_batched(coords, valid, oc, ov, offs1)
    w1 = jnp.asarray(rng.randn(1, 4, 6).astype(np.float32) * 0.2)
    rev1 = dict(kernel_size=1, in_stride=1, out_coords=oc, out_valid=ov,
                in_coords=coords, in_valid=valid)

    def loss1(use_rev):
        def inner(f, w):
            out = S.sparse_conv_apply_batched(
                f, nbr1, w, rev=rev1 if use_rev else None)
            return jnp.sum(out * cot2)
        return jax.jit(jax.grad(inner, argnums=(0, 1)))

    for a, b in zip(loss1(False)(feats, w1), loss1(True)(feats, w1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_transposed_conv_batched_matches_per_sample():
    """transposed_conv_to_batched == vmapped transposed_conv_to (fwd)
    and its scatter-free VJP == autodiff of the per-sample form."""
    rng = np.random.RandomState(9)

    def batchify(*samples):
        return tuple(jnp.asarray(np.stack(a)) for a in zip(*samples))

    coords, feats, valid = batchify(*[
        _random_voxels(rng, 40 + 5 * i, cap=64)[:3] for i in range(2)])
    oc, ov = jax.vmap(lambda c, v: S.downsample_coords(c, v, 2, 32))(
        coords, valid)
    cfeat = jnp.asarray(rng.randn(2, 32, 4).astype(np.float32))
    cfeat = jnp.where(ov[..., None], cfeat, 0.0)
    w = jnp.asarray(rng.randn(8, 4, 6).astype(np.float32) * 0.3)
    cot = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))

    ref = jax.vmap(lambda fc, fv, c, v, f: S.transposed_conv_to(
        fc, fv, c, v, f, w))(coords, valid, oc, ov, cfeat)
    ref = jnp.where(valid[..., None], ref, 0.0)
    got = S.transposed_conv_to_batched(coords, valid, oc, ov, cfeat, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def gref(f, ww):
        out = jax.vmap(lambda fc, fv, c, v, fcf: S.transposed_conv_to(
            fc, fv, c, v, fcf, ww))(coords, valid, oc, ov, f)
        out = jnp.where(valid[..., None], out, 0.0)
        return jnp.sum(out * cot)

    def gnew(f, ww):
        out = S.transposed_conv_to_batched(coords, valid, oc, ov, f, ww)
        return jnp.sum(out * cot)

    for a, b in zip(jax.grad(gref, argnums=(0, 1))(cfeat, w),
                    jax.grad(gnew, argnums=(0, 1))(cfeat, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_zrun_lookup_matches_per_tap():
    """The fused z-run table (one overlap-line gather per (o0, o1) tap
    group, _lookup_zrun_batched) must agree with the per-tap bucketed
    lookup for every kernel/stride/sign combination it routes."""
    rng = np.random.default_rng(0)
    for kernel, ts, neg in [(3, 1, False), (3, 2, False), (2, 1, False),
                            (2, 4, False), (3, 2, True), (2, 2, True)]:
        b, m = 2, 200
        c = rng.integers(0, 24, size=(b, m, 3)) * ts
        valid = rng.random((b, m)) < 0.8
        c = np.where(valid[..., None], c, int(S.INVALID))
        coords = jnp.asarray(c, jnp.int32)
        v = jnp.asarray(valid)
        offs = S.kernel_offsets(kernel)
        if neg:
            offs = -offs
        assert S._z_runs(offs) is not None
        oc, ov = jax.vmap(lambda cc, vv: S.downsample_coords(
            cc, vv, 2 * ts, m))(coords, v)
        for (o_c, o_v) in [(coords, v), (oc, ov)]:
            fast = S.neighbor_table_batched(coords, v, o_c, o_v, offs,
                                            in_stride=ts)
            sk, od = jax.vmap(S.build_key_table)(coords, v)
            packed = jax.vmap(S._bucketed_table)(sk, od)
            ref = jnp.stack([
                S._lookup_bucketed_batched(
                    packed, o_c + (offs[t] * ts)[None, None], o_v)
                for t in range(offs.shape[0])], -1)
            assert bool(jnp.all(fast == ref))
    # grid-boundary coords (z +- ts leaves [0, MAX_COORD])
    c = jnp.asarray([[[S.MAX_COORD] * 3, [0, 0, 0], [0, 0, 1],
                      [5, 5, 5]]], jnp.int32)
    v = jnp.ones((1, 4), bool)
    offs = S.kernel_offsets(3)
    fast = S.neighbor_table_batched(c, v, c, v, offs, in_stride=1)
    sk, od = jax.vmap(S.build_key_table)(c, v)
    packed = jax.vmap(S._bucketed_table)(sk, od)
    ref = jnp.stack([S._lookup_bucketed_batched(
        packed, c + offs[t][None, None], v) for t in range(27)], -1)
    assert bool(jnp.all(fast == ref))


def test_sorted_input_table_invariant_and_parity():
    """The model path asserts ``sorted_input=True`` everywhere: voxelize
    and downsample_coords must emit key-sorted valid-prefix tables, the
    presorted key table must equal build_key_table's, and the whole
    MinkResNet-style chain (strided conv -> pool -> submanifold table ->
    transposed conv, incl. gradients through the sorted reverse tables)
    must match the argsort path bit-for-bit."""
    rng = np.random.RandomState(11)
    b, n, cap = 2, 600, 256
    pts = rng.rand(b, n, 3).astype(np.float32) * 2 - 1
    feats = rng.randn(b, n, 4).astype(np.float32)
    vox = jax.vmap(lambda p, f: S.voxelize(
        p, f, 0.2, jnp.asarray([-1., -1., -1.]), cap))
    coords, vfeats, valid = vox(jnp.asarray(pts), jnp.asarray(feats))

    # invariant: sorted keys, valid prefix — for voxelize output and for
    # every downsample level derived from it
    def check_sorted(c, v):
        c, v = np.asarray(c), np.asarray(v)
        for i in range(c.shape[0]):
            nv = int(v[i].sum())
            assert v[i, :nv].all() and not v[i, nv:].any()
            keys = np.asarray(S.linearize(jnp.asarray(c[i, :nv])))
            assert (np.diff(keys) > 0).all()

    check_sorted(coords, valid)
    oc, ov = jax.vmap(lambda c, v: S.downsample_coords(c, v, 2, cap))(
        coords, valid)
    check_sorted(oc, ov)

    sk_ref, od_ref = jax.vmap(S.build_key_table)(coords, valid)
    sk_fast, od_fast = jax.vmap(S.key_table_presorted)(coords, valid)
    assert bool(jnp.all(sk_ref == sk_fast))
    assert bool(jnp.all(od_ref == od_fast))

    offs = S.kernel_offsets(3)
    t_ref = S.neighbor_table_batched(coords, valid, oc, ov, offs,
                                     in_stride=1)
    t_fast = S.neighbor_table_batched(coords, valid, oc, ov, offs,
                                      in_stride=1, sorted_input=True)
    assert bool(jnp.all(t_ref == t_fast))

    # full chain incl. gradients through sorted reverse tables
    w1 = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.2)
    wt = jnp.asarray(rng.randn(8, 8, 8).astype(np.float32) * 0.2)

    def chain(f, sorted_input):
        c1, v1, y = S.strided_conv_batched(
            coords, valid, f, w1, stride=2, kernel_size=3,
            max_out=cap // 2, sorted_input=sorted_input)
        y = S.submanifold_conv_batched(c1, v1, y, w2, tensor_stride=2,
                                       sorted_input=sorted_input)
        c2, v2, y2 = S.sparse_max_pool_batched(
            c1, v1, y, max_out=cap // 4, tensor_stride=2,
            sorted_input=sorted_input)
        up = S.transposed_conv_to_batched(
            c1, v1, c2, v2, y2, wt, tensor_stride=2,
            sorted_input=sorted_input, sorted_fine=sorted_input)
        return jnp.sum((y + up) ** 2)

    l_ref, g_ref = jax.value_and_grad(lambda f: chain(f, False))(vfeats)
    l_fast, g_fast = jax.value_and_grad(lambda f: chain(f, True))(vfeats)
    assert float(l_ref) == float(l_fast)
    assert bool(jnp.all(g_ref == g_fast))
