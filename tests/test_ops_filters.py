"""Parity tests: ops.filters vs torch-CPU implementations of the reference
semantics (rcl.py:18-51 and the filter library)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from speinet_tpu.ops import filters


def torch_rl_per_channel(image, blur_kernel, num_iterations, lam):
    """Reference semantics of r_l_per_channel (rcl.py:22-51), CPU."""
    outs = []
    pad = blur_kernel.shape[-1] // 2
    lap = torch.tensor([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=torch.float32)[None, None]
    for ci in range(image.shape[1]):
        ch = image[:, ci : ci + 1]
        deb = ch.clone()
        for _ in range(num_iterations):
            blurred = F.conv2d(deb, blur_kernel, padding=pad)
            corr = ch / blurred
            corr[corr != corr] = 0.0
            corr[corr < 0] = 0.0
            reg = deb + lam * F.conv2d(deb, lap, padding=1)
            deb = corr * reg
        outs.append(deb)
    return torch.cat(outs, dim=1)


def test_richardson_lucy_matches_torch(rng):
    x = rng.random((2, 3, 24, 20), dtype=np.float64).astype(np.float32)
    k = filters.box_kernel(5)
    got = np.asarray(filters.richardson_lucy(jnp.asarray(x), k, 5, 0.01))
    tk = torch.ones((1, 1, 5, 5)) / 25.0
    want = torch_rl_per_channel(torch.from_numpy(x), tk, 5, 0.01).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_richardson_lucy_single_iter(rng):
    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    k = filters.box_kernel(5)
    got = np.asarray(filters.richardson_lucy(jnp.asarray(x), k, 1, 0.01))
    tk = torch.ones((1, 1, 5, 5)) / 25.0
    want = torch_rl_per_channel(torch.from_numpy(x), tk, 1, 0.01).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sobel_laplacian_mean(rng):
    x = rng.random((1, 2, 12, 14)).astype(np.float32)
    tx = torch.from_numpy(x)
    sob_x = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]])[None, None]
    sob_y = torch.tensor([[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]])[None, None]
    want_parts = []
    for c in range(2):
        gx = F.conv2d(tx[:, c : c + 1], sob_x, padding=1)
        gy = F.conv2d(tx[:, c : c + 1], sob_y, padding=1)
        want_parts.append(torch.sqrt(gx ** 2 + gy ** 2))
    want = torch.cat(want_parts, 1).numpy()
    got = np.asarray(filters.sobel_magnitude(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    lap = torch.tensor([[1.0, 1, 1], [1, -8, 1], [1, 1, 1]])[None, None]
    want = torch.cat([F.conv2d(tx[:, c : c + 1], lap, padding=1) for c in range(2)], 1).numpy()
    got = np.asarray(filters.laplacian_filter(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    mk = torch.ones((1, 1, 11, 11)) / 121.0
    want = torch.cat([F.conv2d(tx[:, c : c + 1], mk, padding=5) for c in range(2)], 1).numpy()
    got = np.asarray(filters.mean_filter(jnp.asarray(x), 11))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_wiener_identity_kernel(rng):
    # deconvolving with a delta kernel and tiny SNR returns ~the image
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    k = jnp.zeros((5, 5)).at[2, 2].set(1.0)
    got = np.asarray(filters.wiener_deconv(jnp.asarray(x), k, snr=1e-8))
    np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-4)


def test_box_blur_separable_matches_conv(rng):
    """Separable window-sum box blur == depthwise box conv (the TPU fast
    path used by the model's RL branch)."""
    x = jnp.asarray(rng.random((2, 3, 24, 31)).astype(np.float32))
    for k in (5, 11):
        ref = filters.depthwise_conv2d(x, filters.box_kernel(k))
        fast = filters.box_blur_separable(x, k)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                                   rtol=1e-5, atol=1e-6)


def test_richardson_lucy_box_path_matches_generic(rng):
    x = jnp.asarray((rng.random((1, 3, 20, 26)) * 0.9 + 0.05).astype(np.float32))
    k = filters.box_kernel(5)
    ref = filters.richardson_lucy(x, k, 5, 0.01)
    fast = filters.richardson_lucy(x, k, 5, 0.01, box_size=5)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                               rtol=2e-4, atol=1e-5)
