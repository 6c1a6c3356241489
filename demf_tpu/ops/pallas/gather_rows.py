"""Pallas TPU row-gather kernel (stage-and-select).

TPU-native replacement for the XLA gather primitive on the MSDA hot path
(reference CUDA kernel: demf/modeling/layers/transformer.py:9 issues one
texture fetch per bilinear corner; here one row per *sample* fetches the
whole packed 2x2 quad, see demf_tpu/ops/msda.py).  XLA's row gather on
v5e is issue-bound at ~60-90 M rows/s regardless of row width; this
kernel gathers 128-channel rows at a measured multiple of that by
exploiting two facts about the hardware:

  * a (16, 128) bf16 VMEM tile is ONE packed vector register, so a
    16-row-aligned dynamic block copy into a staging tile costs ~1 load
    + 1 store per *sample* (amplification is free: VMEM bandwidth is not
    the constraint, per-op issue rate is);
  * sublane selection is a matmul: 8 staged samples form a (8*align, C)
    tile and one (8, 8*align) one-hot matmul on the otherwise-idle MXU
    compacts them to their 8 true rows in ~1 cycle amortized.

The per-sample cost is therefore ~2-3 VPU issue slots instead of the
~16 of a compare/select/reduce extraction (tools/bench_gather_kernel.py
measured that variant at 52 M rows/s -- slower than XLA).

Layout contract: plane (BH, N, C) with C == 128 (the MSDA quad width) or
any multiple of 128; idx (BH, S) int32 rows into the bh-slice.  The
plane block for one bh stays resident in VMEM across all S tiles (the
index_map pins it), so planes up to a few MB ride VMEM, not HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INNER = 512  # SMEM index rows: (bpt, INNER) blocking of the sample axis


def _kernel(align, unroll, groups, idx_ref, offs_ref, plane_ref, out_ref,
            stage_ref):
    """One (bh, s_tile) cell: gather s_tile rows from the resident plane.

    idx_ref:   (1, bpt, INNER) SMEM i32 -- full row indices (scalar reads
               feed the dynamic block copies).
    offs_ref:  (1, G_t, 8, 128) VMEM i32 -- idx % align, lane-replicated
               so the one-hot compare needs no scalar broadcast.
    plane_ref: (1, Npad, C) VMEM -- resident bh plane slice.
    out_ref:   (1, s_tile, C).
    stage_ref: (8 * align, C) VMEM scratch.
    """
    c = out_ref.shape[2]
    # sel[i, s] == 1  iff  s - align*i == off_i : precompute s - align*i
    rel = (jax.lax.broadcasted_iota(jnp.int32, (8, 8 * align), 1)
           - align * jax.lax.broadcasted_iota(jnp.int32, (8, 8 * align), 0))

    def group(g):
        for u in range(8):
            i = g * 8 + u
            r = idx_ref[0, i // INNER, i % INNER]
            base = pl.multiple_of((r // align) * align, align)
            stage_ref[u * align:(u + 1) * align, :] = (
                plane_ref[0, pl.ds(base, align), :])
        offs = offs_ref[0, g, :, :8 * align]              # (8, 8*align)
        sel = (rel == offs).astype(plane_ref.dtype)
        out_ref[0, pl.ds(pl.multiple_of(g * 8, 8), 8), :] = (
            jax.lax.dot_general(
                sel, stage_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype))

    def body(j, _):
        for u in range(unroll):
            group(j * unroll + u)
        return 0

    jax.lax.fori_loop(0, groups // unroll, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def gather_rows(plane, idx, s_tile=4096, unroll=4, interpret=False):
    """plane (BH, N, C) bf16/f32, idx (BH, S) i32 -> (BH, S, C).

    rows[bh, s] = plane[bh, idx[bh, s]].  S is padded internally to a
    multiple of s_tile; C must be a multiple of 128.
    """
    bh, n, c = plane.shape
    s = idx.shape[1]
    assert c % 128 == 0, c
    align = 16 if plane.dtype == jnp.bfloat16 else 8
    npad = -n % align
    if npad:
        plane = jnp.pad(plane, ((0, 0), (0, npad), (0, 0)))
    spad = -s % s_tile
    idx_p = jnp.pad(idx, ((0, 0), (0, spad))) if spad else idx
    sp = s + spad
    assert s_tile % (8 * unroll) == 0 and s_tile % INNER == 0
    offs = jnp.broadcast_to(
        (idx_p % align).reshape(bh, sp // 8, 8, 1), (bh, sp // 8, 8, 128))
    idx3 = idx_p.reshape(bh, sp // INNER, INNER)
    bpt = s_tile // INNER
    g_t = s_tile // 8
    kernel = functools.partial(_kernel, align, unroll, g_t)
    out = pl.pallas_call(
        kernel,
        grid=(bh, sp // s_tile),
        in_specs=[
            pl.BlockSpec((1, bpt, INNER), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g_t, 8, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plane.shape[1], c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sp, c), plane.dtype),
        scratch_shapes=[pltpu.VMEM((8 * align, c), plane.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx3, offs, plane)
    return out[:, :s] if spad else out
