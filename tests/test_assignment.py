"""Device-side auction assignment vs scipy's exact Hungarian solution.

VERDICT round-1 #10: the DETR matcher must run on device (no per-step
host sync).  These tests pin the auction solver's optimality gap and its
drop-in contract with models/detr_head.hungarian_match.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from demf_tpu.ops.assignment import auction_assign, auction_match


def _opt_cost(cost):
    row, col = linear_sum_assignment(cost)
    return cost[row, col].sum()


@pytest.mark.parametrize('g,q,seed', [(8, 32, 0), (20, 300, 1),
                                      (64, 300, 2), (5, 5, 3)])
def test_auction_near_optimal(g, q, seed):
    rng = np.random.RandomState(seed)
    cost = rng.rand(g, q).astype(np.float32) * 10
    col = np.asarray(auction_assign(jnp.asarray(cost)))
    # a valid assignment: distinct columns
    assert len(set(col.tolist())) == g
    got = cost[np.arange(g), col].sum()
    opt = _opt_cost(cost)
    assert got <= opt * 1.001 + 1e-4, (got, opt)


def test_auction_with_padding_rows():
    """Invalid gt rows carry a large constant cost (detr_head convention):
    they must not disturb the real rows' optimal assignment."""
    rng = np.random.RandomState(4)
    g, q, real = 16, 64, 6
    cost = np.full((g, q), 1e6, np.float32)
    cost[:real] = rng.rand(real, q) * 5
    col = np.asarray(auction_assign(jnp.asarray(cost)))
    assert len(set(col.tolist())) == g
    got = cost[np.arange(real), col[:real]].sum()
    opt = _opt_cost(cost[:real])
    assert got <= opt * 1.001 + 1e-4


def test_auction_match_contract_and_jit():
    """Batched (B, Q, G) -> (B, G) drop-in, under jit, matches scipy's
    total cost on every element."""
    rng = np.random.RandomState(5)
    b, q, g = 4, 128, 24
    cost = rng.rand(b, q, g).astype(np.float32)

    out = jax.jit(auction_match)(jnp.asarray(cost))
    assert out.shape == (b, g) and out.dtype == jnp.int32
    out = np.asarray(out)
    for i in range(b):
        assert len(set(out[i].tolist())) == g
        got = cost[i][out[i], np.arange(g)].sum()
        opt = _opt_cost(cost[i].T)
        assert got <= opt * 1.001 + 1e-4


def test_detr_loss_device_solver_close_to_scipy():
    """The head's loss under the on-device solver stays close to the
    host-scipy loss (matchings can differ only at near-ties)."""
    import demf_tpu.models  # noqa: F401  (registry population)
    from demf_tpu.utils.registry import HEADS, build_from_cfg
    rng = np.random.RandomState(6)
    b, q, g, c, layers = 2, 50, 7, 10, 2
    preds = dict(
        cls_scores=jnp.asarray(rng.randn(layers, b, q, c), jnp.float32),
        bbox_preds=jnp.asarray(
            jax.nn.sigmoid(rng.randn(layers, b, q, 4)), jnp.float32))
    gt_bboxes = np.zeros((b, g, 4), np.float32)
    gt_bboxes[..., :2] = rng.rand(b, g, 2) * 100
    gt_bboxes[..., 2:] = gt_bboxes[..., :2] + rng.rand(b, g, 2) * 100 + 10
    gt_labels = rng.randint(0, c, (b, g))
    gt_valid = rng.rand(b, g) < 0.7
    img_shape = np.tile(np.array([[240, 320]], np.int32), (b, 1))

    def head(solver):
        return build_from_cfg(dict(
            type='DeformableDETRHead', num_query=q, num_classes=c,
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=2.0),
            loss_bbox=dict(type='L1Loss', loss_weight=5.0),
            loss_iou=dict(type='GIoULoss', loss_weight=2.0),
            train_cfg=dict(assigner=dict(
                type='HungarianAssigner', solver=solver,
                cls_cost=dict(type='FocalLossCost', weight=2.0),
                reg_cost=dict(type='BBoxL1Cost', weight=5.0),
                iou_cost=dict(type='IoUCost', weight=2.0)))), HEADS)

    args = (preds, jnp.asarray(gt_bboxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_valid), jnp.asarray(img_shape))
    l_dev = head('auction').loss(*args)
    l_host = head('scipy').loss(*args)
    t_dev = float(sum(jnp.asarray(v) for v in l_dev.values()))
    t_host = float(sum(jnp.asarray(v) for v in l_host.values()))
    assert t_dev == pytest.approx(t_host, rel=0.02), (t_dev, t_host)


@pytest.mark.parametrize('seed', list(range(10)))
def test_auction_padding_rows_epsilon_scale(seed):
    """Regression (advisor round 2): eps derived from the full cost range
    includes the 1e6 padding sentinel, making eps ~ 1e4/G and degenerating
    the solve to greedy matching — measured up to 9% over scipy.  With eps
    from REAL entries only the gap must stay within the documented 0.1%
    bound for every seed (advisor's exact scenario: G=32, 16 real, Q=64)."""
    rng = np.random.RandomState(seed)
    g, q, real = 32, 64, 16
    cost = np.full((g, q), 1e6, np.float32)
    cost[:real] = rng.rand(real, q).astype(np.float32)
    col = np.asarray(auction_assign(jnp.asarray(cost)))
    assert len(set(col.tolist())) == g
    got = cost[np.arange(real), col[:real]].sum()
    opt = _opt_cost(cost[:real])
    assert got <= opt * 1.001 + 1e-4, (seed, got, opt)
