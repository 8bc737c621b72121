"""Pallas TPU kernel: batched row gather driven by scalar-prefetched indices.

Written as a candidate replacement for `jnp.take_along_axis` in the
SearchTransfer gather_fold (model/SearchTransfer.py:36-46 `bis`): the
index vector is a scalar-prefetch operand, each of K copies of the
source array gets its own BlockSpec whose index_map reads one index per
grid step, and Mosaic double-buffers the K row DMAs across steps.

**Measured result (scripts/ab_gather.py, v5e, 720p seg9 geometries): this
kernel LOSES to XLA's gather by ~1.5-2x at every scale** — e.g. lv1
(L=57600, R=4608): take_along_axis 20.0 ms (106 GB/s) vs row_gather
29.4 ms at the best K=16. On the seg9 single-row-per-patch layout
(patch_ops.gather_fold_nhwc_seg9) XLA's dynamic-gather already runs at
67-106 GB/s; the per-grid-step DMA issue overhead here (57600/K steps of
K small row copies) cannot beat it. Kept unwired as the measured-negative
evidence for that design decision; the shipped path is seg9 + XLA gather.

Rows must be lane-aligned (R % 128 == 0) — true for all three
texture-transfer scales (9*s*s*C = 1152 / 2304 / 4608).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, *refs, k: int):
    # refs = k input row blocks [1, 1, r8, 128] + one output [1, k, r8, 128]
    ins, o_ref = refs[:k], refs[k]
    for j in range(k):
        o_ref[0, j] = ins[j][0, 0]


def row_gather(rows: jnp.ndarray, idx: jnp.ndarray, k: int = 8) -> jnp.ndarray:
    """rows: [B, T, R] (R % 128 == 0); idx: [B, L] int32 in [0, T).
    Returns rows[b, idx[b, l]] -> [B, L, R], equal to
    jnp.take_along_axis(rows, idx[:, :, None], axis=1).
    `k` = gathered rows per grid step (DMAs in flight).

    Rows are viewed as [r8, 128] tiles (r8 = R // 128) so every block's
    trailing two dims equal the full array dims — the shape class Mosaic
    accepts for dynamically-indexed blocks."""
    b, t, r = rows.shape
    l = idx.shape[1]
    assert r % 128 == 0, r
    r8 = r // 128
    while l % k:
        k -= 1
    grid = (b, l // k)
    rows4 = rows.reshape(b, t, r8, 128)

    def imap(j):
        # one gathered row per input copy: step (bi, i) reads row
        # idx[bi, i*k + j]
        def f(bi, i, idx_ref):
            return (bi, idx_ref[bi, i * k + j], 0, 0)
        return f

    out = pl.pallas_call(
        functools.partial(_gather_kernel, k=k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((1, 1, r8, 128), imap(j),
                                   memory_space=pltpu.VMEM)
                      for j in range(k)],
            out_specs=pl.BlockSpec((1, k, r8, 128),
                                   lambda bi, i, idx_ref: (bi, i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, r8, 128), rows.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * b * l * r * rows.dtype.itemsize,
            transcendentals=0,
        ),
    )(idx, *([rows4] * k))
    return out.reshape(b, l, r)
