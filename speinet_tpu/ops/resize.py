"""Bicubic upsampling with PyTorch semantics, TPU-native.

The reference relies on `F.interpolate(mode='bicubic', align_corners=False)`
at integer scale factors 2 and 4 (speinet.py:96,99,108,111-113;
SearchTransfer.py:73-75). PyTorch's bicubic uses the Keys kernel with
A = -0.75 and half-pixel-centered source coordinates; `jax.image.resize`
uses A = -0.5, so it is numerically different. Here the integer-scale case
is lowered to a bank of fixed 4-tap separable phase filters — a handful of
shifted weighted adds that XLA fuses, far cheaper than a general gather
resize.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_A = -0.75  # PyTorch / OpenCV bicubic coefficient


def _cubic_kernel(d: np.ndarray) -> np.ndarray:
    d = np.abs(d)
    out = np.where(
        d <= 1.0,
        (_A + 2.0) * d**3 - (_A + 3.0) * d**2 + 1.0,
        np.where(d < 2.0, _A * d**3 - 5.0 * _A * d**2 + 8.0 * _A * d - 4.0 * _A, 0.0),
    )
    return out


@functools.lru_cache(maxsize=None)
def _phase_taps(scale: int):
    """For each output phase r in [0, scale): (base_offset, 4 weights).

    Output pixel at index scale*k + r samples source coordinate
    x = k + (2r + 1 - scale) / (2*scale)  (half-pixel convention,
    align_corners=False). Taps cover floor(x)-1 .. floor(x)+2.
    """
    taps = []
    for r in range(scale):
        off = (2 * r + 1 - scale) / (2.0 * scale)
        base = int(np.floor(off))  # -1 or 0
        t = off - base             # fractional part in [0, 1)
        d = np.array([1.0 + t, t, 1.0 - t, 2.0 - t])
        w = _cubic_kernel(d)
        taps.append((base, w.astype(np.float64)))
    return taps


def _upsample_axis(x: jnp.ndarray, scale: int, axis: int) -> jnp.ndarray:
    """1-D bicubic upsample along `axis` by integer `scale`.

    Works in place on `axis` (no transposes): the 4 taps are shifted
    slices along the axis, phases interleave via a stack+reshape at
    `axis`+1. On TPU this keeps the trailing (lane) axis untouched, so
    NHWC feature maps upsample without any relayout.
    """
    import jax.lax as lax

    if scale == 1:
        return x
    axis = axis % x.ndim
    n = x.shape[axis]
    # Border handling: PyTorch clamps source indices to [0, n-1] (replicate).
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    xp = jnp.concatenate([first, first, x, last, last], axis=axis)
    # xp index i corresponds to source index i - 2
    acc_dtype = jnp.float32   # 4-tap accumulation in f32 regardless of input
    phases = []
    for base, w in _phase_taps(scale):
        # taps at source indices k + base - 1 .. k + base + 2 -> xp[k + base + 1 ...]
        s0 = base + 1
        acc = None
        for j in range(4):
            sl = lax.slice_in_dim(xp, s0 + j, s0 + j + n, axis=axis)
            term = jnp.asarray(w[j], acc_dtype) * sl.astype(acc_dtype)
            acc = term if acc is None else acc + term
        phases.append(acc)
    out = jnp.stack(phases, axis=axis + 1)     # [..., n, scale, ...]
    return out.reshape(*x.shape[:axis], n * scale, *x.shape[axis + 1:]).astype(x.dtype)


def bicubic_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bicubic upsample [B, C, H, W] by an integer factor, torch-parity.

    Matches `F.interpolate(x, scale_factor=scale, mode='bicubic',
    align_corners=False)` to float32 tolerance.
    """
    x = _upsample_axis(x, scale, -2)
    x = _upsample_axis(x, scale, -1)
    return x


def bicubic_upsample_nhwc(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Same semantics on [B, H, W, C] — upsamples axes 1 and 2 in place.

    TPU-friendly: the channel (lane) axis never moves, so no relayouts;
    the taps are shifted slices along H (sublanes) and W.
    """
    x = _upsample_axis(x, scale, 1)
    x = _upsample_axis(x, scale, 2)
    return x
