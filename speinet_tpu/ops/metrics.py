"""PSNR / SSIM metrics with bit-parity to the reference conventions.

Two PSNR conventions coexist in the reference and both are kept:
- `psnr_shave`: train/eval PSNR on [0, rgb_range] float tensors with a
  4-pixel shave (util/utils.py:81-92).
- `psnr_uint8`: inference PSNR on uint8 images after a 4-pixel border crop
  (inference_SPEINet.py:484-500).
- `ssim_matlab`: MATLAB-equivalent SSIM, 11x11 Gaussian sigma 1.5, valid
  region, C1/C2 at 255 range (inference_SPEINet.py:502-543). The reference's
  3-channel path averages the per-channel map of the full color image; this
  implementation reproduces that exactly.

All functions are pure jnp and jit/vmap-safe, so full-video metric
evaluation runs batched on device instead of frame-by-frame on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr_shave(img1: jnp.ndarray, img2: jnp.ndarray, rgb_range: float = 1.0,
               shave: int = 4) -> jnp.ndarray:
    """Training-loop PSNR (parity: util/utils.py:81-92). [B?, C, H, W]."""
    a = img1[..., shave:-shave, shave:-shave] / rgb_range
    b = img2[..., shave:-shave, shave:-shave] / rgb_range
    mse = jnp.mean((a - b) ** 2)
    return jnp.where(mse == 0, 100.0, 20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


def psnr_uint8(img1: jnp.ndarray, img2: jnp.ndarray, crop_border: int = 4) -> jnp.ndarray:
    """Inference PSNR on [0,255] images, HWC or CHW (parity:
    inference_SPEINet.py:484-500). Border crop applied on the two leading
    spatial dims of HWC input."""
    a = img1[crop_border:-crop_border, crop_border:-crop_border].astype(jnp.float64)
    b = img2[crop_border:-crop_border, crop_border:-crop_border].astype(jnp.float64)
    mse = jnp.mean((a - b) ** 2)
    return jnp.where(mse == 0, jnp.inf, 20.0 * jnp.log10(255.0 / jnp.sqrt(mse)))


def _gaussian_window(ksize: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel-equivalent 1-D kernel (computed formula)."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def _filter_valid(img: jnp.ndarray, win1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation, valid region only. img: [H, W, C]."""
    c = img.shape[-1]
    x = img.transpose(2, 0, 1)[None]  # [1, C, H, W]
    kh = win1d.reshape(1, 1, -1, 1)
    kw = win1d.reshape(1, 1, 1, -1)
    kh = jnp.broadcast_to(kh, (c, 1, win1d.shape[0], 1))
    kw = jnp.broadcast_to(kw, (c, 1, 1, win1d.shape[0]))
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, kh.astype(x.dtype), (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw.astype(x.dtype), (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    return x[0].transpose(1, 2, 0)


def ssim_matlab(img1: jnp.ndarray, img2: jnp.ndarray, crop_border: int = 4) -> jnp.ndarray:
    """MATLAB-style SSIM on [0,255] HWC uint8/float images.

    Parity: inference_SPEINet.py:502-543 (including the reference's color
    behavior: the SSIM map of the full 3-channel image filtered per channel,
    averaged over every pixel and channel).
    """
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    a = img1.astype(jnp.float32)
    b = img2.astype(jnp.float32)
    win = jnp.asarray(_gaussian_window(), dtype=jnp.float32)
    mu1 = _filter_valid(a, win)
    mu2 = _filter_valid(b, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _filter_valid(a * a, win) - mu1_sq
    sigma2_sq = _filter_valid(b * b, win) - mu2_sq
    sigma12 = _filter_valid(a * b, win) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def psnr_uint8_host(img1: np.ndarray, img2: np.ndarray, crop_border: int = 4) -> float:
    """Bit-exact float64 host PSNR for the official inference logs."""
    a = img1[crop_border:-crop_border, crop_border:-crop_border].astype(np.float64)
    b = img2[crop_border:-crop_border, crop_border:-crop_border].astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


def postprocess_uint8(img: jnp.ndarray, rgb_range: float = 1.0) -> jnp.ndarray:
    """[C, H, W] float in [0, rgb_range] -> uint8 HWC (parity:
    inference_SPEINet.py:477-482 / util/utils.py:68-78)."""
    out = jnp.clip(jnp.round(img * (255.0 / rgb_range)), 0, 255).astype(jnp.uint8)
    return jnp.transpose(out, (1, 2, 0))
