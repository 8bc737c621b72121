"""Pallas TPU kernel: stride-1 SAME conv as shifted MXU matmuls.

XLA's TPU conv emitter runs the encoder's convs at <10% of matmul peak
(measured: 16 TFLOPS for 5x5/C32 vs 260 TFLOPS matmul peak on this chip).
This kernel computes an NHWC stride-1 odd-k conv as k*k VMEM-resident
shifted matmuls with f32 accumulation: the input row-band is DMA'd once,
every tap reads it from VMEM, and bias + ReLU fuse into the epilogue.
HBM traffic = input once (x2 for the band overlap) + output once.

Used with ops/s2d.py: a logical 5x5 conv at 32/64 channels becomes a 3x3
conv at 128/256 channels here — full MXU lane utilization.

Grid: (B, H/tr). Each step owns `tr` output rows and reads input blocks
i and i+1 (tr >= k-1 guarantees the halo is covered). Inference path only;
training uses the XLA lowering (same parameters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x0_ref, x1_ref, w_ref, b_ref, o_ref, *, k: int, tr: int,
                 w_out: int, relu: bool, kcat: bool):
    full = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0)   # [2tr, Wp, C]
    c = full.shape[-1]
    if kcat:
        # gather the k*k shifted taps along the channel axis and contract
        # them in ONE deep-K MXU matmul ([tr*W, k*k*C] x [k*k*C, Co]) —
        # k*k small serialized matmuls leave the MXU latency-bound
        # reshape each slab to 2D before the channel concat: the dy/dx
        # shifts leave each slice with a different sublane/lane offset and
        # Mosaic cannot concatenate mismatched-offset layouts directly
        # ("result/input offset mismatch on non-concat dimension")
        slabs = [full[dy : dy + tr, dx : dx + w_out, :].reshape(tr * w_out, c)
                 for dy in range(k) for dx in range(k)]
        m = jnp.concatenate(slabs, axis=-1)
        acc = jnp.dot(m, w_ref[:].reshape(k * k * c, -1),
                      preferred_element_type=jnp.float32)
    else:
        acc = None
        for dy in range(k):
            for dx in range(k):
                sl = full[dy : dy + tr, dx : dx + w_out, :]
                m = sl.reshape(tr * w_out, c)
                r = jnp.dot(m, w_ref[dy, dx],
                            preferred_element_type=jnp.float32)
                acc = r if acc is None else acc + r
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(tr, w_out, acc.shape[-1]).astype(o_ref.dtype)


def conv2d_mxu(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None,
               relu: bool = False, tr: int | None = None,
               kcat: bool | None = None) -> jnp.ndarray:
    """NHWC stride-1 SAME conv (odd k), bias + optional ReLU fused.

    x: [B, H, W, C]; w: [k, k, C, Co]; bias: [Co] or None.
    kcat=True contracts all k*k taps in one deep-K matmul (best for the
    small-C decode-path convs); None reads the SPEINET_CONV_KCAT env knob.
    Returns [B, H, W, Co] in x.dtype (f32 accumulation).
    """
    import os

    if tr is None:
        tr = int(os.environ.get("SPEINET_CONV_TR", "8"))
    if kcat is None:
        kcat = os.environ.get("SPEINET_CONV_KCAT", "0") == "1"
    b, h, w_in, c = x.shape
    k = w.shape[0]
    co = w.shape[3]
    assert k % 2 == 1 and w.shape[1] == k and w.shape[2] == c
    tr = max(tr, k - 1)
    n_h = -(-h // tr)
    pad_top = k // 2
    # rows: pad so blocks i and i+1 both exist for every grid step
    total_rows = (n_h + 1) * tr
    xp = jnp.pad(x, ((0, 0), (pad_top, total_rows - h - pad_top),
                     (k // 2, k // 2), (0, 0)))
    wp = w_in + k - 1
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)

    kernel = functools.partial(_conv_kernel, k=k, tr=tr, w_out=w_in, relu=relu,
                               kcat=kcat)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec((1, tr, wp, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, wp, c), lambda bi, i: (bi, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, w_in, co), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_h * tr, w_in, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_h * tr * w_in * k * k * c * co,
            bytes_accessed=(2 * b * (n_h + 1) * tr * wp * c
                            + b * n_h * tr * w_in * co) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, xp, w.astype(x.dtype), bias)
    return out[:, :h]
