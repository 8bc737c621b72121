"""Single-level 2-D discrete wavelet transform (db6), TPU-native.

The reference's WAV1 focus measure calls `ptwt.wavedec2(frames, 'db6',
mode='zero', level=1)` and sums |LH| + |HL| + |HH|
(LD_detector/LD_detector_gopros_train.py:152-159, inference_SPEINet.py:152-159).
Neither ptwt nor pywt exist on TPU images, and a DWT is just a pair of
strided convolutions, so it is implemented directly: zero-padded full
convolution with the db6 decomposition filters, downsampled by 2 (pywt
'zero'-mode semantics: keep odd indices of the full convolution).

Filter constants are the standard published Daubechies-6 coefficients;
orthonormality identities are asserted in the test suite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# pywt db6 dec_lo (low-pass decomposition filter), length 12.
DB6_DEC_LO = np.array([
    -0.00107730108499558, 0.004777257511010651, 0.0005538422009938016,
    -0.031582039318031156, 0.02752286553001629, 0.09750160558707936,
    -0.12976686756709563, -0.22626469396516913, 0.3152503517092432,
    0.7511339080215775, 0.4946238903983854, 0.11154074335008017,
], dtype=np.float64)

# Quadrature-mirror high-pass: dec_hi[k] = (-1)^k * dec_lo[L-1-k]
DB6_DEC_HI = np.array(
    [(-1.0) ** k * DB6_DEC_LO[len(DB6_DEC_LO) - 1 - k] for k in range(len(DB6_DEC_LO))],
    dtype=np.float64,
)


def _dwt_axis(x: jnp.ndarray, filt: np.ndarray, axis: int) -> jnp.ndarray:
    """Full convolution with zero extension along `axis`, downsample by 2.

    pywt 'zero' mode: out[k] = full_conv(x, filt)[2k + 1],
    output length floor((n + L - 1) / 2).
    """
    L = len(filt)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    lead = x.shape[:-1]
    xf = x.reshape(-1, 1, n)
    # full convolution == pad L-1 both sides + VALID correlation w/ flipped filter
    k = jnp.asarray(filt[::-1].copy(), dtype=x.dtype).reshape(1, 1, L)
    y = jax.lax.conv_general_dilated(
        xf, k, window_strides=(2,), padding=[(L - 2, L - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    # padding (L-2, L-1) + stride 2 == full-conv indices 1, 3, 5, ...
    out_len = (n + L - 1) // 2
    y = y[..., :out_len]
    return jnp.moveaxis(y.reshape(*lead, -1), -1, axis)


def dwt2_db6_detail(x: jnp.ndarray) -> tuple:
    """Level-1 db6 detail bands of [..., H, W] with zero extension.

    Returns (LH, HL, HH) — the three high-pass bands (order matches
    lo-rows/hi-cols, hi-rows/lo-cols, hi-rows/hi-cols; the reference only
    consumes |LH|+|HL|+|HH|, which is permutation-invariant).
    """
    lo_r = _dwt_axis(x, DB6_DEC_LO, -1)
    hi_r = _dwt_axis(x, DB6_DEC_HI, -1)
    lh = _dwt_axis(lo_r, DB6_DEC_HI, -2)
    hl = _dwt_axis(hi_r, DB6_DEC_LO, -2)
    hh = _dwt_axis(hi_r, DB6_DEC_HI, -2)
    return lh, hl, hh
