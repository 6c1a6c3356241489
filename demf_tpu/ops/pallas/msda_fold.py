"""Pallas TPU kernel: MSDA weighted slot-fold.

The scan-over-slice MSDA forward (ops/msda.py) gathers quad rows
(S, 4*hd) and reduces them to (Q, hd) with per-slot weights:

    out[q, j] = sum_lp sum_slot rows[lp*Q + q, slot*hd + j] * w4[lp*Q + q, slot]

XLA's fused form of the weighting (repeat w4 along hd + elementwise
multiply + fold matmul) costs ~46 ms/layer at b16 encoder shapes — 3x
the HBM bandwidth floor of the tensors it touches.  This kernel streams
the rows once; the (blk, 4*hd) weight tile is built ON THE MXU from the
(blk, 4) slot weights and a static (4, 4*hd) slot-selector matrix (no
materialized repeat in HBM), then folded with the block-identity matrix
and accumulated over the LP grid dimension in a VMEM scratch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_kernel(lp_total, out_dtype, rows_ref, w4_ref, expand_ref,
                 fold_ref, out_ref, acc_ref):
    lp = pl.program_id(1)

    @pl.when(lp == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rows = rows_ref[0]                                 # (blk, 4*hd)
    w4 = w4_ref[0]                                     # (blk, 4)
    # slot weights -> full (blk, 4*hd) tile via MXU with the selector
    # (MXU accumulators must be 32-bit; cast after)
    wt = jnp.dot(w4, expand_ref[:],
                 preferred_element_type=jnp.float32).astype(rows.dtype)
    weighted = rows * wt
    acc_ref[:] += jnp.dot(weighted, fold_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(lp == lp_total - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _fold_kernel_b(lp_total, out_dtype, rows_ref, w4_ref, expand_ref,
                   fold_ref, out_ref, acc_ref):
    lp = pl.program_id(2)

    @pl.when(lp == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rows = rows_ref[0, 0]                              # (blk, 4*hd)
    w4 = w4_ref[0, 0]                                  # (blk, 4)
    wt = jnp.dot(w4, expand_ref[:],
                 preferred_element_type=jnp.float32).astype(rows.dtype)
    acc_ref[:] += jnp.dot(rows * wt, fold_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(lp == lp_total - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=('hd', 'block', 'interpret'))
def weighted_slot_fold_batched(rows, w4, *, hd, block=2048,
                               interpret=False):
    """rows (BH, LP, Q, 4*hd), w4 (BH, LP, Q, 4) -> (BH, Q, hd) f32.

    One pallas_call over every slice: streaming the whole rows buffer
    through a (bh, q_block, lp) grid avoids the ~0.7 ms/step floor a
    lax.scan-of-small-calls pays 128 times."""
    bh, lp, q, c4 = rows.shape
    assert c4 == 4 * hd
    qp = -(-q // block) * block
    if qp != q:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, qp - q), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, qp - q), (0, 0)))
    w4 = w4.astype(rows.dtype)
    expand = jnp.asarray(
        np.repeat(np.eye(4), hd, axis=1), rows.dtype)  # (4, 4*hd)
    fold = jnp.asarray(
        np.tile(np.eye(hd), (4, 1)), rows.dtype)       # (4*hd, hd)
    kernel = functools.partial(_fold_kernel_b, lp, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(bh, qp // block, lp),
        in_specs=[
            pl.BlockSpec((1, 1, block, c4),
                         lambda b, qb, l: (b, l, qb, 0)),
            pl.BlockSpec((1, 1, block, 4),
                         lambda b, qb, l: (b, l, qb, 0)),
            pl.BlockSpec((4, c4), lambda b, qb, l: (0, 0)),
            pl.BlockSpec((c4, hd), lambda b, qb, l: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, hd),
                               lambda b, qb, l: (b, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, qp, hd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, hd), jnp.float32)],
        interpret=interpret,
    )(rows, w4, expand, fold)
    return out[:, :q]


@functools.partial(jax.jit,
                   static_argnames=('hd', 'block', 'interpret'))
def weighted_slot_fold(rows, w4, *, hd, block=2048, interpret=False):
    """rows (LP, Q, 4*hd), w4 (LP, Q, 4) -> (Q, hd) f32-accumulated.

    Exact same math as (rows * repeat(w4, hd)) folded with the
    block-identity matrix (ops/msda._slice_forward).
    """
    lp, q, c4 = rows.shape
    assert c4 == 4 * hd
    qp = -(-q // block) * block
    if qp != q:
        rows = jnp.pad(rows, ((0, 0), (0, qp - q), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, qp - q), (0, 0)))
    w4 = w4.astype(rows.dtype)
    expand = jnp.asarray(
        np.repeat(np.eye(4), hd, axis=1), rows.dtype)  # (4, 4*hd)
    fold = jnp.asarray(
        np.tile(np.eye(hd), (4, 1)), rows.dtype)       # (4*hd, hd)
    kernel = functools.partial(_fold_kernel, lp, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(qp // block, lp),
        in_specs=[
            pl.BlockSpec((1, block, c4), lambda qb, l: (l, qb, 0)),
            pl.BlockSpec((1, block, 4), lambda qb, l: (l, qb, 0)),
            pl.BlockSpec((4, c4), lambda qb, l: (0, 0)),
            pl.BlockSpec((c4, hd), lambda qb, l: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, hd), lambda qb, l: (qb, 0)),
        out_shape=jax.ShapeDtypeStruct((qp, hd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, hd), jnp.float32)],
        interpret=interpret,
    )(rows, w4, expand, fold)
    return out[:q]
