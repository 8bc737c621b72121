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


# --------------------------------------------------------------------------
# Banded correlation: the 3x3-patch correlation decomposed into 3 shifted
# C-deep matmuls + diagonal adds.
#
# The patch correlation R[p, q] = <unfold(F)[:, p], unfold(G)[:, q]> with
# D = 9*C contracts each of the 9 patch offsets independently:
#     R[p, q] = sum_{o in 3x3} <F[p + o], G[q + o]>     (zero-padded)
# On a feature map padded with ONE zero column (width W -> W+1) and one
# zero row top/bottom, a flattened-index shift by o = dy*(W+1) + dx lands
# exactly where the spatial shift does (the pad column absorbs the row
# wrap), so with C0[u, v] = <F_flat[u], G_flat[v]>:
#     R[p, q] = sum_{dy} sum_{dx} C0[p + dy*(W+1) + dx, q + dy*(W+1) + dx]
# Per tile this is 3 matmuls of depth C=128 over slabs offset by
# (dy-1)*(W+1) — the dx sum collapses to 3 DIAGONAL adds of the
# dy-summed [TK+2, TL+2] tile (the shift is independent of dy). vs the
# flat [TK, 1152] x [1152, TL] step this cuts matmul FLOPs and ref/lr DMA
# ~3x, and the [B, 9C, L] unfold materializations (~1 GB/side at 720p
# batch 8) disappear entirely — the kernel consumes window slabs built
# straight from the [B, H, W, C] maps.
#
# Parity: identical math to correlation_argmax on the same maps (summation
# order differs => f32-accumulation rounding differs; argmax ties can in
# principle resolve differently, never observed in tests). Reference
# semantics: SearchTransfer.py:26-34 (unfold 3x3, pad 1, cosine scores).
# --------------------------------------------------------------------------


def _corr_kernel_banded(lr_ref, ref_ref, inv_ref, msk_ref, s_ref, idx_ref,
                        best, best_idx, *, tk: int, tl: int):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        best[:] = jnp.full_like(best, -jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    csum = None
    for dy in range(3):
        c0 = jax.lax.dot_general(ref_ref[0, 0, dy], lr_ref[0, 0, dy],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        csum = c0 if csum is None else csum + c0            # [TK+2, TL+2]
    # dx in {-1, 0, 1}: diagonal slices of the dy-summed tile
    r = (csum[0:tk, 0:tl] + csum[1:tk + 1, 1:tl + 1]
         + csum[2:tk + 2, 2:tl + 2])
    # per-ref-row cosine scale + validity mask (pad columns / tail): both
    # arrive as [TK, 1] sublane vectors so the broadcast needs no relayout
    r = r * inv_ref[0] + msk_ref[0]

    cmax = jnp.max(r, axis=0)
    carg = jnp.argmax(r, axis=0).astype(jnp.int32) + k * tk
    upd = cmax > best[0]
    best[0] = jnp.where(upd, cmax, best[0])
    best_idx[0] = jnp.where(upd, carg, best_idx[0])

    @pl.when(k == n_k - 1)
    def _():
        s_ref[0, 0] = best[0]
        idx_ref[0, 0] = best_idx[0]


def _banded_windows(x_nhwc: jnp.ndarray, t: int, dtype) -> jnp.ndarray:
    """[B, H, W, C] map -> [B, n, 3, C, t+2] window slabs over the padded
    flat index space (width W+1, one zero row top/bottom): slab (k, dy)
    covers flat positions k*t + (dy-1)*(W+1) - 1 ... + t+2 relative to the
    first interior pixel."""
    b, h, w, c = x_nhwc.shape
    wp = w + 1
    lq = h * wp
    n = -(-lq // t)
    xp = jnp.pad(x_nhwc.astype(dtype), ((0, 0), (1, 1), (0, 1), (0, 0)))
    flat = xp.transpose(0, 3, 1, 2).reshape(b, c, (h + 2) * wp)
    # front pad 1 (dy=0, k=0 slab starts at flat index -1); tail pad so the
    # largest slab (dy=2) fits
    need = 1 + 2 * wp + n * t + 2
    flatp = jnp.pad(flat, ((0, 0), (0, 0),
                           (1, max(0, need - 1 - (h + 2) * wp))))
    slabs = []
    for dy in range(3):
        seg = jax.lax.slice_in_dim(flatp, dy * wp, dy * wp + n * t + 2,
                                   axis=2)
        main = seg[:, :, : n * t].reshape(b, c, n, t)
        ext = jnp.pad(seg[:, :, t:], ((0, 0), (0, 0), (0, t - 2)))
        ext = ext[:, :, : n * t].reshape(b, c, n, t)[:, :, :, :2]
        slabs.append(jnp.concatenate([main, ext], axis=3))  # [b, c, n, t+2]
    return jnp.stack(slabs, axis=2).transpose(0, 3, 2, 1, 4)


def _banded_aux(h: int, w: int, kp: int) -> np.ndarray:
    """Additive validity mask [1, kp, 1] f32 over the padded ref index
    space: 0 on real positions, -1e30 on pad columns / tail."""
    wp = w + 1
    ids = np.arange(kp)
    valid = (ids < h * wp) & (ids % wp < w)
    return np.where(valid, 0.0, -1e30).astype(np.float32)[None, :, None]


def _corr_impl_banded(lr_map: jnp.ndarray, ref_map: jnp.ndarray,
                      inv_ref: jnp.ndarray, tl: int | None = None,
                      tk: int | None = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lr_map: [B, H, W, C] query features; ref_map: [B, Hr, Wr, C]
    reference features; inv_ref: [B, Hr*Wr] f32 per-position patch inverse
    norms. Returns (S [B, H*W] f32 of max_q inv_q * R[p, q], idx [B, H*W]
    int32 into the ORIGINAL row-major Hr*Wr reference space)."""
    import os

    if tl is None:
        tl = int(os.environ.get("SPEINET_CORR_BTL",
                                os.environ.get("SPEINET_CORR_TL", "512")))
    if tk is None:
        tk = int(os.environ.get("SPEINET_CORR_BTK",
                                os.environ.get("SPEINET_CORR_TK", "512")))
    b, h, w, c = lr_map.shape
    hr, wr = ref_map.shape[1:3]
    dtype = lr_map.dtype
    lq = h * (w + 1)
    lk = hr * (wr + 1)
    n_l = -(-lq // tl)
    n_k = -(-lk // tk)
    lr_w = _banded_windows(lr_map, tl, dtype)          # [b, n_l, 3, c, tl+2]
    ref_w = _banded_windows(ref_map, tk, dtype)        # [b, n_k, 3, c, tk+2]
    # inv norms scattered into the padded layout (pad cols get 0, masked)
    inv_p = jnp.pad(inv_ref.astype(jnp.float32).reshape(b, hr, wr),
                    ((0, 0), (0, 0), (0, 1))).reshape(b, lk)
    inv_p = jnp.pad(inv_p, ((0, 0), (0, n_k * tk - lk)))[..., None]
    amask = jnp.asarray(_banded_aux(hr, wr, n_k * tk))

    kernel = functools.partial(_corr_kernel_banded, tk=tk, tl=tl)
    grid = (b, n_l, n_k)
    s, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 3, c, tl + 2), lambda bi, li, ki: (bi, li, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, c, tk + 2), lambda bi, li, ki: (bi, ki, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 1), lambda bi, li, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 1), lambda bi, li, ki: (0, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tl), lambda bi, li, ki: (bi, 0, li),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n_l * tl), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_l * tl), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tl), jnp.float32),
            pltpu.VMEM((1, tl), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # FLOPs over the true (unpadded) tile extents; bytes include the
            # f32 inv/mask side inputs and the f32+i32 outputs (ADVICE r4)
            flops=2 * 3 * b * (n_l * tl) * (n_k * tk) * c,
            bytes_accessed=(b * 3 * c * (n_l * (tl + 2) + n_k * (tk + 2))
                            * lr_map.dtype.itemsize
                            + b * n_k * tk * 4          # inv_p (f32)
                            + b * n_l * tl * 4          # amask (f32)
                            + b * n_l * tl * 8),        # s + idx outputs
            transcendentals=0,
        ),
    )(lr_w, ref_w, inv_p, amask)
    # crop the pad-column query positions; remap idx to row-major Hr*Wr
    s_q = s[:, 0, :lq].reshape(b, h, w + 1)[:, :, :w].reshape(b, h * w)
    iq = idx[:, 0, :lq].reshape(b, h, w + 1)[:, :, :w].reshape(b, h * w)
    idx_orig = (iq // (wr + 1)) * wr + iq % (wr + 1)
    return s_q, idx_orig


@jax.custom_vjp
def banded_corr_argmax(lr_map: jnp.ndarray, ref_map: jnp.ndarray,
                       inv_ref: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Banded twin of correlation_argmax_pallas_lds operating on feature
    MAPS (no unfolds). Gradient: torch.max subgradient through the winning
    reference row — each of the 9 patch offsets contributes a shifted
    gather/scatter in map space (equal to the unfold-form gradient)."""
    return _corr_impl_banded(lr_map, ref_map, inv_ref)


def _banded_fwd(lr_map, ref_map, inv_ref):
    s, idx = _corr_impl_banded(lr_map, ref_map, inv_ref)
    return (s, idx), (lr_map, ref_map, inv_ref, s, idx)


def _banded_bwd(res, g):
    lr_map, ref_map, inv_ref, s, idx = res
    gs = g[0].astype(jnp.float32)                          # [B, L]
    b, h, w, c = lr_map.shape
    hr, wr = ref_map.shape[1:3]
    l = h * w
    bidx = jnp.arange(b)[:, None]
    inv_sel = jnp.take_along_axis(inv_ref.astype(jnp.float32), idx, axis=1)
    gw = (gs * inv_sel)                                    # [B, L]
    qr, qc = idx // wr, idx % wr
    ref_flat = ref_map.astype(jnp.float32).reshape(b, hr * wr, c)
    lr_pad = jnp.pad(lr_map.astype(jnp.float32),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
    d_lr_pad = jnp.zeros_like(lr_pad)
    d_ref_flat = jnp.zeros_like(ref_flat)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # G[q* + o] gathered at every query position (0 when OOB)
            vr, vc = qr + dy, qc + dx
            ok = ((vr >= 0) & (vr < hr) & (vc >= 0) & (vc < wr))
            qo = jnp.clip(vr, 0, hr - 1) * wr + jnp.clip(vc, 0, wr - 1)
            g_sel = jnp.take_along_axis(ref_flat, qo[..., None], axis=1)
            g_sel = g_sel * ok[..., None]
            # F[p + o] read from the padded map (0 when OOB)
            f_o = jax.lax.dynamic_slice(
                lr_pad, (0, 1 + dy, 1 + dx, 0), (b, h, w, c)
            ).reshape(b, l, c)
            # dF[p + o] += g_p inv_{q*} G[q* + o]
            d_lr_pad = jax.lax.dynamic_update_slice(
                d_lr_pad,
                jax.lax.dynamic_slice(d_lr_pad, (0, 1 + dy, 1 + dx, 0),
                                      (b, h, w, c))
                + (gw[..., None] * g_sel).reshape(b, h, w, c),
                (0, 1 + dy, 1 + dx, 0))
            # dG[q* + o] += g_p inv_{q*} F[p + o]
            d_ref_flat = d_ref_flat.at[bidx, qo].add(
                (gw * ok)[..., None] * f_o)
    d_lr = d_lr_pad[:, 1:-1, 1:-1]
    d_inv = jnp.zeros_like(inv_ref, dtype=jnp.float32)
    d_inv = d_inv.at[bidx, idx].add(s / jnp.maximum(inv_sel, 1e-30) * gs)
    return (d_lr.astype(lr_map.dtype),
            d_ref_flat.reshape(b, hr, wr, c).astype(ref_map.dtype),
            d_inv.astype(inv_ref.dtype))


banded_corr_argmax.defvjp(_banded_fwd, _banded_bwd)
