"""Sharpness-prior focus measures, fused and batched on device.

Parity: the 6 per-frame focus measures used by the LD_detector and by
on-the-fly label inference (LD_detector/LD_detector_gopros_train.py:118-194,
duplicated at inference_SPEINet.py:54-189):

  LAP1: 8-neighbor Laplacian, squared L2 pool
  MIS3: 9-kernel center-minus-neighbor |sum|, L1 pool
  WAV1: db6 level-1 detail-coefficient |sum|
  GRA7: Sobel magnitude minus its local mean, squared L2 pool
  STA3: frame minus k x k mean, squared L2 pool
  DCT3: 4x4 +- block kernel, squared L1 pool

The reference runs them frame-by-frame through torch on GPU; here one
jitted pass computes all 6 for a whole batch of frames.

Pooling note: torch `lp_pool2d(x, norm_type=p, kernel_size=k)` computes
sign-less sum(|.|^p? ) — precisely: (sum over window of x^p) ^ (1/p) with
stride = k (non-overlapping), NO absolute value (negative sums possible for
odd p). The reference always squares the L2 pool (removing the root) and
uses L1 pools on non-negative inputs, so sum-pooling reproduces it exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from speinet_tpu.ops.wavelet import dwt2_db6_detail

FOCUS_FEATURE_NAMES = ("lap1", "mis3", "wav1", "gra7", "sta3", "dct3")

_GRAY = np.array([0.2989, 0.587, 0.114], np.float32)  # torchvision Grayscale


def _conv1(x: jnp.ndarray, k: np.ndarray, padding) -> jnp.ndarray:
    """Single-channel conv, x: [B, 1, H, W], k: [kh, kw] or [O, kh, kw]."""
    kk = np.asarray(k, np.float32)
    if kk.ndim == 2:
        kk = kk[None]
    kern = jnp.asarray(kk[:, None], dtype=x.dtype)  # [O, 1, kh, kw]
    pad = padding if isinstance(padding, str) else [(padding, padding)] * 2
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), pad, dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _avg_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch avg_pool2d(kernel=k, padding=k//2, stride=1): zero-padded,
    divisor k*k everywhere."""
    ones = np.ones((k, k), np.float32) / (k * k)
    return _conv1(x, ones, k // 2)


def _sum_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping k x k sum pool (lp_pool building block)."""
    b, c, h, w = x.shape
    hh, ww = h // k, w // k
    x = x[:, :, : hh * k, : ww * k]
    x = x.reshape(b, c, hh, k, ww, k)
    return x.sum(axis=(3, 5))


def _lp2_sq_mean(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """mean(lp_pool2d(x, norm=2, k)**2) == mean of window sums of x^2."""
    return jnp.mean(_sum_pool(x * x, k), axis=(1, 2, 3))


def _lp1_mean(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """mean(lp_pool2d(x, norm=1, k)) == mean of window sums."""
    return jnp.mean(_sum_pool(x, k), axis=(1, 2, 3))


_SOBEL = np.stack([
    np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32),
    np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32),
])
_LAP8 = np.array([[1, 1, 1], [1, -8, 1], [1, 1, 1]], np.float32)
_DCT = np.array([[1, 1, -1, -1], [1, 1, -1, -1],
                 [-1, -1, 1, 1], [-1, -1, 1, 1]], np.float32)


def _mis3_bank() -> np.ndarray:
    """9 kernels: center 1, one neighbor -1 each (center kernel zero)."""
    bank = np.zeros((9, 3, 3), np.float32)
    for i in range(9):
        bank[i, 1, 1] = 1.0
        bank[i, i // 3, i % 3] = bank[i, i // 3, i % 3] - 1.0
    bank[4] = 0.0  # reference sets the center kernel fully to 0
    return bank


def focus_features(frames: jnp.ndarray, kernel_size: int = 11) -> jnp.ndarray:
    """frames: [B, 3, H, W] uint8-range float (0..255) RGB.

    Returns [B, 6] feature matrix in FOCUS_FEATURE_NAMES order, matching
    generate_vars (LD_detector_gopros_train.py:177-194).
    """
    k = kernel_size
    x = frames.astype(jnp.float32)
    gray = (x[:, 0] * _GRAY[0] + x[:, 1] * _GRAY[1] + x[:, 2] * _GRAY[2]) / 255.0
    g = gray[:, None]  # [B, 1, H, W]

    # LAP1 (:144-150)
    lap = _conv1(g, _LAP8, 1)
    lap1 = _lp2_sq_mean(lap, k)

    # MIS3 (:118-132): |sum over 9 filter responses|... reference:
    # conv(frames, bank).abs().sum(dim=1)
    mis = jnp.abs(_conv1(g, _mis3_bank(), 1)).sum(axis=1, keepdims=True)
    mis3 = _lp1_mean(mis, k)

    # WAV1 (:152-159): sum |LH|+|HL|+|HH| of db6 level 1
    lh, hl, hh = dwt2_db6_detail(gray)
    wav1 = (jnp.abs(lh) + jnp.abs(hl) + jnp.abs(hh)).sum(axis=(1, 2))

    # GRA7 (:134-141): sobel magnitude minus local mean
    sx = _conv1(g, _SOBEL[0], "SAME")
    sy = _conv1(g, _SOBEL[1], "SAME")
    sob = jnp.sqrt(sx ** 2 + sy ** 2)
    gra7 = _lp2_sq_mean(sob - _avg_pool_same(sob, k), k)

    # STA3 (:161-167)
    sta3 = _lp2_sq_mean(g - _avg_pool_same(g, k), k)

    # DCT3 (:169-175): valid 4x4 block kernel, squared L1 pool
    dct = _conv1(g, _DCT, 0)
    dct3 = jnp.mean(_sum_pool(dct, k) ** 2, axis=(1, 2, 3))

    return jnp.stack([lap1, mis3, wav1, gra7, sta3, dct3], axis=1)
