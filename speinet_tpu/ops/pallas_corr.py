"""Pallas TPU kernel: fused patch-correlation online max/argmax.

The hot search step of SearchTransfer (SearchTransfer.py:26-34) is
    R = ref_n @ lr_n          # [Lr, L] cosine correlations
    S, idx = max/argmax over the Lr axis
with Lr = L = (H/4)(W/4) (57,600 at 720p) and D = C*9 = 1152. The full R
never fits on chip (13 GB at 720p); this kernel streams reference chunks
through VMEM while keeping a running max/argmax per lr position —
flash-attention-style, one pass, zero HBM traffic for R.

Grid: (B, L/TL, Lr/TK). TPU grids execute the trailing axis sequentially
per core, so VMEM scratch carries the running best across the Lr chunks;
Pallas double-buffers the ref-chunk DMAs automatically. The MXU does the
[TK, D] x [D, TL] product per step.

Tie-breaking matches torch.max: first index wins (within-chunk argmax
returns the first maximum; across chunks the update is strictly >).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(lr_ref, ref_ref, s_ref, idx_ref, best, best_idx, *,
                 tk: int, l_ref_true: int):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        best[:] = jnp.full_like(best, -jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    r = jnp.dot(ref_ref[0], lr_ref[0], preferred_element_type=jnp.float32)
    # mask padded reference rows
    row_ids = k * tk + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
    r = jnp.where(row_ids < l_ref_true, r, -jnp.inf)

    cmax = jnp.max(r, axis=0)                          # [TL]
    carg = jnp.argmax(r, axis=0).astype(jnp.int32) + k * tk
    upd = cmax > best[0]
    best[0] = jnp.where(upd, cmax, best[0])
    best_idx[0] = jnp.where(upd, carg, best_idx[0])

    @pl.when(k == n_k - 1)
    def _():
        s_ref[0, 0] = best[0]
        idx_ref[0, 0] = best_idx[0]


def _corr_impl(lr_n: jnp.ndarray, ref_n: jnp.ndarray,
               tl: int | None = None, tk: int | None = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lr_n: [B, D, L] column-normalized; ref_n: [B, Lr, D] row-normalized.

    Returns (S [B, L] float32, idx [B, L] int32) — drop-in equivalent of
    models.search_transfer.correlation_argmax.
    """
    import os

    # tile sizes tunable on hardware without code edits (A/B knobs)
    if tl is None:
        tl = int(os.environ.get("SPEINET_CORR_TL", "512"))
    if tk is None:
        tk = int(os.environ.get("SPEINET_CORR_TK", "512"))
    b, d, l = lr_n.shape
    l_ref = ref_n.shape[1]
    lp = -(-l // tl) * tl
    kp = -(-l_ref // tk) * tk
    lr_p = jnp.pad(lr_n, ((0, 0), (0, 0), (0, lp - l)))
    ref_p = jnp.pad(ref_n, ((0, 0), (0, kp - l_ref), (0, 0)))

    kernel = functools.partial(_corr_kernel, tk=tk, l_ref_true=l_ref)
    grid = (b, lp // tl, kp // tk)
    s, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda bi, li, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # [B, 1, L] layout: with a 2-D output the batch block (1) would
            # violate the (8, 128)-tiling rule whenever B > 1
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, lp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, lp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tl), jnp.float32),
            pltpu.VMEM((1, tl), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lp * kp * d,
            bytes_accessed=(b * d * lp + b * kp * d) * lr_n.dtype.itemsize,
            transcendentals=0,
        ),
    )(lr_p, ref_p)
    return s[:, 0, :l], idx[:, 0, :l]


def _corr_kernel_ld(lr_ref, ref_ref, s_ref, idx_ref, best, best_idx, *,
                    tk: int, l_ref_true: int):
    """Variant of _corr_kernel with the reference in [D, Lr] layout (no host
    transpose of the 265 MB unfold): contraction on axis 0 of both operands;
    the MXU consumes the transposed-LHS form natively."""
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        best[:] = jnp.full_like(best, -jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    r = jax.lax.dot_general(ref_ref[0], lr_ref[0], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [TK, TL]
    row_ids = k * tk + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
    r = jnp.where(row_ids < l_ref_true, r, -jnp.inf)

    cmax = jnp.max(r, axis=0)
    carg = jnp.argmax(r, axis=0).astype(jnp.int32) + k * tk
    upd = cmax > best[0]
    best[0] = jnp.where(upd, cmax, best[0])
    best_idx[0] = jnp.where(upd, carg, best_idx[0])

    @pl.when(k == n_k - 1)
    def _():
        s_ref[0, 0] = best[0]
        idx_ref[0, 0] = best_idx[0]


def _corr_kernel_lds(lr_ref, ref_ref, inv_ref, s_ref, idx_ref, best,
                     best_idx, *, tk: int, l_ref_true: int):
    """_corr_kernel_ld with the per-reference-row scale applied IN-KERNEL:
    the block's ref columns are multiplied by inv (cast to the operand
    dtype — bit-identical to the old host-side `ref * inv` bf16 multiply)
    before the dot. Saves the [B, D, Lr] scaled-copy materialization of
    the raw-unfold path (measured ~11 ms/frame of pure HBM churn at 720p,
    scripts/ab_glue.py 'ref prep')."""
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        best[:] = jnp.full_like(best, -jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    scaled = ref_ref[0] * inv_ref[0].astype(ref_ref.dtype)     # [D, TK]*[1, TK]
    r = jax.lax.dot_general(scaled, lr_ref[0], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [TK, TL]
    row_ids = k * tk + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
    r = jnp.where(row_ids < l_ref_true, r, -jnp.inf)

    cmax = jnp.max(r, axis=0)
    carg = jnp.argmax(r, axis=0).astype(jnp.int32) + k * tk
    upd = cmax > best[0]
    best[0] = jnp.where(upd, cmax, best[0])
    best_idx[0] = jnp.where(upd, carg, best_idx[0])

    @pl.when(k == n_k - 1)
    def _():
        s_ref[0, 0] = best[0]
        idx_ref[0, 0] = best_idx[0]


def _corr_impl_ld(lr: jnp.ndarray, ref_ld: jnp.ndarray,
                  tl: int | None = None, tk: int | None = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lr: [B, D, L]; ref_ld: [B, D, Lr] (SAME layout — no transpose).
    Returns (S [B, L] f32, idx [B, L] int32) of max_k <ref_k, lr_i>.
    Operands need not be normalized; callers fold norm scalings around the
    kernel (argmax over rows is invariant to a per-COLUMN scale, so only the
    reference rows must be pre-scaled)."""
    import os

    if tl is None:
        tl = int(os.environ.get("SPEINET_CORR_TL", "512"))
    if tk is None:
        tk = int(os.environ.get("SPEINET_CORR_TK", "512"))
    b, d, l = lr.shape
    l_ref = ref_ld.shape[2]
    lp = -(-l // tl) * tl
    kp = -(-l_ref // tk) * tk
    lr_p = jnp.pad(lr, ((0, 0), (0, 0), (0, lp - l)))
    ref_p = jnp.pad(ref_ld, ((0, 0), (0, 0), (0, kp - l_ref)))

    kernel = functools.partial(_corr_kernel_ld, tk=tk, l_ref_true=l_ref)
    grid = (b, lp // tl, kp // tk)
    s, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tk), lambda bi, li, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, lp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, lp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tl), jnp.float32),
            pltpu.VMEM((1, tl), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lp * kp * d,
            bytes_accessed=(b * d * lp + b * d * kp) * lr.dtype.itemsize,
            transcendentals=0,
        ),
    )(lr_p, ref_p)
    return s[:, 0, :l], idx[:, 0, :l]


def _corr_impl_lds(lr: jnp.ndarray, ref_ld: jnp.ndarray, inv_ref: jnp.ndarray,
                   tl: int | None = None, tk: int | None = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lr: [B, D, L]; ref_ld: [B, D, Lr] RAW; inv_ref: [B, Lr] f32 per-row
    scale. Returns (S, idx) of max_k inv_k * <ref_k, lr_i> — equal to
    _corr_impl_ld(lr, ref_ld * inv_ref[:, None, :]) without materializing
    the scaled copy."""
    import os

    if tl is None:
        tl = int(os.environ.get("SPEINET_CORR_TL", "512"))
    if tk is None:
        tk = int(os.environ.get("SPEINET_CORR_TK", "512"))
    b, d, l = lr.shape
    l_ref = ref_ld.shape[2]
    lp = -(-l // tl) * tl
    kp = -(-l_ref // tk) * tk
    lr_p = jnp.pad(lr, ((0, 0), (0, 0), (0, lp - l)))
    ref_p = jnp.pad(ref_ld, ((0, 0), (0, 0), (0, kp - l_ref)))
    inv_p = jnp.pad(inv_ref.astype(jnp.float32), ((0, 0), (0, kp - l_ref)))
    inv_p = inv_p.reshape(b, 1, kp)

    kernel = functools.partial(_corr_kernel_lds, tk=tk, l_ref_true=l_ref)
    grid = (b, lp // tl, kp // tk)
    s, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tk), lambda bi, li, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda bi, li, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, lp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, lp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tl), jnp.float32),
            pltpu.VMEM((1, tl), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lp * kp * d,
            bytes_accessed=(b * d * lp + b * d * kp) * lr.dtype.itemsize,
            transcendentals=0,
        ),
    )(lr_p, ref_p, inv_p)
    return s[:, 0, :l], idx[:, 0, :l]


@jax.custom_vjp
def correlation_argmax_pallas_lds(lr: jnp.ndarray, ref_ld: jnp.ndarray,
                                  inv_ref: jnp.ndarray
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled-row twin of correlation_argmax_pallas_ld: the per-row scale
    inv_ref (the reference-side cosine norm) is applied inside the kernel.
    torch.max subgradient through the winning row, with the scale treated
    as part of the row (product rule gives the inv_ref cotangent)."""
    return _corr_impl_lds(lr, ref_ld, inv_ref)


def _corr_lds_fwd(lr, ref_ld, inv_ref):
    s, idx = _corr_impl_lds(lr, ref_ld, inv_ref)
    return (s, idx), (lr, ref_ld, inv_ref, s, idx)


def _corr_lds_bwd(res, g):
    lr, ref_ld, inv_ref, s, idx = res
    gs = g[0].astype(jnp.float32)                           # [B, L]
    sel = jnp.take_along_axis(ref_ld, idx[:, None, :], axis=2)  # [B, D, L]
    inv_sel = jnp.take_along_axis(inv_ref.astype(jnp.float32), idx, axis=1)
    # S_i = inv_{k*} <ref_{k*}, lr_i>
    d_lr = sel.astype(jnp.float32) * (inv_sel * gs)[:, None, :]
    contrib = (lr.astype(jnp.float32)
               * (inv_sel * gs)[:, None, :]).transpose(0, 2, 1)  # [B, L, D]
    b = lr.shape[0]
    bidx = jnp.arange(b)[:, None]
    d_ref = jnp.zeros((b, ref_ld.shape[2], ref_ld.shape[1]), jnp.float32)
    d_ref = d_ref.at[bidx, idx].add(contrib).transpose(0, 2, 1)
    # d_inv_{k*} += <ref_{k*}, lr_i> g = (S_i / inv_{k*}) g  (inv > 0 always:
    # it is 1/max(norm, eps))
    d_inv = jnp.zeros_like(inv_ref, dtype=jnp.float32)
    d_inv = d_inv.at[bidx, idx].add(s / jnp.maximum(inv_sel, 1e-30) * gs)
    return (d_lr.astype(lr.dtype), d_ref.astype(ref_ld.dtype),
            d_inv.astype(inv_ref.dtype))


correlation_argmax_pallas_lds.defvjp(_corr_lds_fwd, _corr_lds_bwd)


@jax.custom_vjp
def correlation_argmax_pallas_ld(lr: jnp.ndarray, ref_ld: jnp.ndarray
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, D, Lr]-layout twin of correlation_argmax_pallas. The custom VJP
    is the same torch.max subgradient; because the norm scalings live
    OUTSIDE this kernel (plain XLA ops), autodiff through the caller's
    inv-norm multiplies recovers the full cosine gradient."""
    return _corr_impl_ld(lr, ref_ld)


def _corr_ld_fwd(lr, ref_ld):
    s, idx = _corr_impl_ld(lr, ref_ld)
    return (s, idx), (lr, ref_ld, idx)


def _corr_ld_bwd(res, g):
    lr, ref_ld, idx = res
    gs = g[0].astype(jnp.float32)                           # [B, L]
    sel = jnp.take_along_axis(ref_ld, idx[:, None, :], axis=2)  # [B, D, L]
    d_lr = sel * gs[:, None, :]
    contrib = (lr * gs[:, None, :]).transpose(0, 2, 1)      # [B, L, D]
    b = lr.shape[0]
    bidx = jnp.arange(b)[:, None]
    d_ref = jnp.zeros_like(ref_ld, shape=(b, ref_ld.shape[2], ref_ld.shape[1]))
    d_ref = d_ref.at[bidx, idx].add(contrib).transpose(0, 2, 1)
    return d_lr.astype(lr.dtype), d_ref.astype(ref_ld.dtype)


correlation_argmax_pallas_ld.defvjp(_corr_ld_fwd, _corr_ld_bwd)


@jax.custom_vjp
def correlation_argmax_pallas(lr_n: jnp.ndarray, ref_n: jnp.ndarray
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable wrapper: S = max_k <ref_k, lr_i> has the closed-form
    (sub)gradient dS_i/dlr_i = ref_{argmax_i} and
    dS_i/dref_{argmax_i} = lr_i — exactly the gradient torch.max propagates
    in the reference (SearchTransfer.py:34)."""
    return _corr_impl(lr_n, ref_n)


def _corr_fwd(lr_n, ref_n):
    s, idx = _corr_impl(lr_n, ref_n)
    return (s, idx), (lr_n, ref_n, idx)


def _corr_bwd(res, g):
    lr_n, ref_n, idx = res
    gs = g[0].astype(jnp.float32)                         # [B, L]
    sel = jnp.take_along_axis(ref_n, idx[..., None], axis=1)  # [B, L, D]
    d_lr = (sel * gs[..., None]).transpose(0, 2, 1)
    contrib = lr_n.transpose(0, 2, 1) * gs[..., None]     # [B, L, D]
    b = lr_n.shape[0]
    bidx = jnp.arange(b)[:, None]
    d_ref = jnp.zeros_like(ref_n).at[bidx, idx].add(contrib)
    return d_lr.astype(lr_n.dtype), d_ref.astype(ref_n.dtype)


correlation_argmax_pallas.defvjp(_corr_fwd, _corr_bwd)
