"""Metric parity (PSNR/SSIM vs cv2-based reference formulas) and db6 DWT
filter-bank identities."""

import math

import cv2
import numpy as np
import jax.numpy as jnp

from speinet_tpu.ops import metrics
from speinet_tpu.ops.wavelet import DB6_DEC_LO, DB6_DEC_HI, dwt2_db6_detail


def ref_calc_psnr_uint8(img1, img2):
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    return 20 * math.log10(255.0 / math.sqrt(mse))


def ref_calc_ssim(img1, img2):
    """inference_SPEINet.py:502-543 formula, cv2-based."""
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return ssim_map.mean()


def test_psnr_uint8_parity(rng):
    a = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-20, 20, a.shape), 0, 255).astype(np.uint8)
    want = ref_calc_psnr_uint8(a[4:-4, 4:-4], b[4:-4, 4:-4])
    got = float(metrics.psnr_uint8(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-2          # float32 device path
    got64 = metrics.psnr_uint8_host(a, b)  # float64 host path: bit parity
    assert abs(got64 - want) < 1e-12


def test_psnr_shave_parity(rng):
    a = rng.random((1, 3, 40, 40)).astype(np.float32)
    b = (a + 0.05 * rng.standard_normal(a.shape).astype(np.float32)).clip(0, 1)
    mse = np.mean((a[..., 4:-4, 4:-4] - b[..., 4:-4, 4:-4]) ** 2)
    want = 20 * math.log10(1.0 / math.sqrt(mse))
    got = float(metrics.psnr_shave(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-3


def test_ssim_parity(rng):
    a = rng.integers(0, 256, (72, 80, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-25, 25, a.shape), 0, 255).astype(np.uint8)
    want = ref_calc_ssim(a[4:-4, 4:-4].astype(np.float64), b[4:-4, 4:-4].astype(np.float64))
    got = float(metrics.ssim_matlab(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 2e-4


def test_db6_filter_identities():
    lo, hi = DB6_DEC_LO, DB6_DEC_HI
    assert abs(lo.sum() - math.sqrt(2)) < 1e-10      # DC gain
    assert abs((lo * lo).sum() - 1.0) < 1e-10        # unit norm
    assert abs(hi.sum()) < 1e-10                     # zero mean
    for k in range(1, 6):                            # orthogonal at even shifts
        assert abs(np.dot(lo[2 * k :], lo[: -2 * k])) < 1e-10
    assert abs(np.dot(lo, hi[::-1] * 0 + hi)) < 1e-10  # lo ⊥ hi


def test_dwt2_shapes_and_energy(rng):
    x = rng.random((2, 33, 47)).astype(np.float32)
    lh, hl, hh = dwt2_db6_detail(jnp.asarray(x))
    # pywt zero-mode output length: floor((n + 11) / 2)
    assert lh.shape == (2, (33 + 11) // 2, (47 + 11) // 2)
    assert hl.shape == hh.shape == lh.shape
    # constant images have (near-)zero interior detail energy
    c = jnp.ones((1, 32, 32))
    lh, hl, hh = dwt2_db6_detail(c)
    interior = np.asarray(jnp.abs(lh[:, 6:-6, 6:-6])).max()
    assert interior < 1e-5
