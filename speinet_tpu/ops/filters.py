"""Classical filter primitives, TPU-native (pure jnp, NCHW layout).

Capability parity with the reference's filter library `model/rcl.py`:
- `box_kernel` / `richardson_lucy`: the edge-information branch actually used
  by the model (rcl.py:18-51). The reference loops channels in Python and
  hardcodes `.cuda()`; here the whole thing is one fused depthwise-conv loop
  that XLA keeps on-chip.
- `sobel_magnitude` (rcl.py:54-72), `laplacian_filter` (rcl.py:76-104),
  `mean_filter` (util/utils.py:116-123), `wiener_deconv` (rcl.py:405-454):
  utility filters kept for parity.

All functions take float arrays shaped [B, C, H, W] (NCHW, matching the
reference's tensor convention) and are jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LAPLACIAN_RL = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float32)
_LAPLACIAN_8 = np.array([[1, 1, 1], [1, -8, 1], [1, 1, 1]], np.float32)
_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def box_kernel(kernel_size: int = 5, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized box blur kernel [k, k] (parity: rcl.py:18-20)."""
    k = jnp.ones((kernel_size, kernel_size), dtype=dtype)
    return k / (kernel_size ** 2)


def depthwise_conv2d(x: jnp.ndarray, kernel2d: jnp.ndarray, padding="SAME") -> jnp.ndarray:
    """Apply one 2-D kernel to every channel independently.

    x: [B, C, H, W]; kernel2d: [kh, kw]. Uses feature_group_count so all
    channels run in a single XLA conv (the reference loops channels in
    Python, rcl.py:27-48).
    """
    c = x.shape[1]
    k = jnp.broadcast_to(kernel2d[None, None], (c, 1, *kernel2d.shape)).astype(x.dtype)
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def box_blur_separable(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Uniform box blur via two 1-D window sums (zero 'SAME' padding).

    Exact same math as `depthwise_conv2d(x, box_kernel(k))` — a box kernel
    factorizes into row x column passes — but lowered to VPU window
    reductions instead of XLA's conv emitter (measured 16x slower than
    matmul peak on TPU for small channel counts)."""
    k = kernel_size
    p = k // 2
    zero = jnp.zeros((), x.dtype)
    y = jax.lax.reduce_window(x, zero, jax.lax.add, (1, 1, 1, k), (1, 1, 1, 1),
                              [(0, 0), (0, 0), (0, 0), (p, p)])
    y = jax.lax.reduce_window(y, zero, jax.lax.add, (1, 1, k, 1), (1, 1, 1, 1),
                              [(0, 0), (0, 0), (p, p), (0, 0)])
    return y / (k * k)


def _laplacian_rl_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[[0,-1,0],[-1,4,-1],[0,-1,0]] conv with zero 'SAME' padding as four
    shifted adds (VPU elementwise; same values as the depthwise conv)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    return (4.0 * x - xp[:, :, :-2, 1:-1] - xp[:, :, 2:, 1:-1]
            - xp[:, :, 1:-1, :-2] - xp[:, :, 1:-1, 2:])


def richardson_lucy(
    image: jnp.ndarray,
    kernel2d: jnp.ndarray,
    num_iterations: int = 1,
    regularization_strength: float = 0.01,
    box_size: int | None = None,
) -> jnp.ndarray:
    """Laplacian-regularized Richardson–Lucy-style deconvolution.

    Exact semantics of `r_l_per_channel` (rcl.py:22-51): per iteration
        blurred   = conv(deblurred, kernel)
        ratio     = image / blurred, with NaN -> 0 and negatives -> 0
        smoothed  = deblurred + lam * conv(deblurred, laplacian([[0,-1,0],...]))
        deblurred = ratio * smoothed
    but fused across channels and iterations as one XLA computation.

    image: [B, C, H, W] in [0, 1]. When `box_size` is given the kernel is
    declared to be the uniform `box_kernel(box_size)` (the only kernel the
    model uses, speinet.py:128) and the blur runs as a separable window
    reduction — same values, ~6x faster than the conv lowering on TPU.
    """
    lap = jnp.asarray(_LAPLACIAN_RL, dtype=image.dtype)

    def blur(t):
        if box_size is not None:
            return box_blur_separable(t, box_size)
        return depthwise_conv2d(t, kernel2d)

    def body(deblurred, _):
        blurred = blur(deblurred)
        ratio = image / blurred
        # NaN (0/0) -> 0, negatives -> 0; +/-inf survive division in the
        # reference too (x/0 with x>0 = inf), so only scrub NaN and negatives.
        ratio = jnp.where(jnp.isnan(ratio), 0.0, ratio)
        ratio = jnp.where(ratio < 0, 0.0, ratio)
        if box_size is not None:
            smoothed = deblurred + regularization_strength * _laplacian_rl_shift(deblurred)
        else:
            smoothed = deblurred + regularization_strength * depthwise_conv2d(deblurred, lap)
        return ratio * smoothed, None

    if num_iterations <= 3:  # unroll short loops for fusion
        out = image
        for _ in range(num_iterations):
            out, _ = body(out, None)
        return out
    out, _ = jax.lax.scan(body, image, None, length=num_iterations)
    return out


def sobel_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel Sobel gradient magnitude (parity: rcl.py:54-72)."""
    gx = depthwise_conv2d(x, jnp.asarray(_SOBEL_X, dtype=x.dtype))
    gy = depthwise_conv2d(x, jnp.asarray(_SOBEL_Y, dtype=x.dtype))
    return jnp.sqrt(gx ** 2 + gy ** 2)


def laplacian_filter(x: jnp.ndarray) -> jnp.ndarray:
    """8-neighbor Laplacian (parity: rcl.py:76-104)."""
    return depthwise_conv2d(x, jnp.asarray(_LAPLACIAN_8, dtype=x.dtype))


def mean_filter(x: jnp.ndarray, kernel_size: int = 11) -> jnp.ndarray:
    """Box mean filter (parity: util/utils.py:116-123)."""
    return depthwise_conv2d(x, box_kernel(kernel_size, dtype=x.dtype))


def wiener_deconv(image: jnp.ndarray, kernel2d: jnp.ndarray, snr: float = 0.01) -> jnp.ndarray:
    """FFT Wiener deconvolution per channel (capability parity: rcl.py:405-454).

    image: [B, C, H, W]; kernel2d: [kh, kw] PSF. Returns the Wiener estimate
    with the PSF centered at the origin (circular boundary).
    """
    h, w = image.shape[-2:]
    kh, kw = kernel2d.shape
    psf = jnp.zeros((h, w), dtype=image.dtype).at[:kh, :kw].set(kernel2d)
    psf = jnp.roll(psf, shift=(-(kh // 2), -(kw // 2)), axis=(0, 1))
    H = jnp.fft.fft2(psf)
    G = jnp.conj(H) / (jnp.abs(H) ** 2 + snr)
    F = jnp.fft.fft2(image)
    return jnp.real(jnp.fft.ifft2(F * G[None, None])).astype(image.dtype)
