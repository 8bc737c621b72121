"""Classical smoothing / deconvolution library (capability parity with the
reference's unused-by-model filter utilities in model/rcl.py).

- `l0_smoothing`     : FFT-based L0 gradient minimization (rcl.py:109-225)
- `ftvd`             : TV/L2 alternating-direction deconvolution
                       (rcl.py:529-711)
- `rl_deconv`        : multi-iteration RL module wrapper (rcl.py:462-523)
- `rtv_smooth`       : relative-total-variation smoothing (rcl.py:238-399);
                       host-side scipy sparse solve (the reference uses an
                       MKL pardiso solve) — not a TPU hot path.

The FFT methods are pure jnp (TPU-friendly); images are [B, C, H, W] or
[H, W, C] floats in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _psf2otf(psf: jnp.ndarray, shape) -> jnp.ndarray:
    h, w = shape
    kh, kw = psf.shape
    pad = jnp.zeros(shape, psf.dtype).at[:kh, :kw].set(psf)
    pad = jnp.roll(pad, shift=(-(kh // 2), -(kw // 2)), axis=(0, 1))
    return jnp.fft.fft2(pad)


def l0_smoothing(img: jnp.ndarray, lam: float = 2e-2, kappa: float = 2.0,
                 beta_max: float = 1e5) -> jnp.ndarray:
    """L0 gradient minimization (Xu et al.), semantics of rcl.py:109-225.

    img: [H, W, C] in [0, 1]. Alternates a hard-threshold on gradients with
    an FFT quadratic solve, beta *= kappa per iteration.
    """
    hh, ww, cc = img.shape
    fx = _psf2otf(jnp.asarray([[1.0, -1.0]]), (hh, ww))
    fy = _psf2otf(jnp.asarray([[1.0], [-1.0]]), (hh, ww))
    denom_grad = (jnp.abs(fx) ** 2 + jnp.abs(fy) ** 2)[..., None]
    normin1 = jnp.fft.fft2(img, axes=(0, 1))

    n_iter = int(np.ceil(np.log(beta_max / (2 * lam)) / np.log(kappa))) + 1

    def body(s, beta):
        gx = jnp.roll(s, -1, axis=1) - s
        gy = jnp.roll(s, -1, axis=0) - s
        mag = jnp.sum(gx ** 2 + gy ** 2, axis=2, keepdims=True)
        keep = mag >= lam / beta
        gx = jnp.where(keep, gx, 0.0)
        gy = jnp.where(keep, gy, 0.0)
        div = (jnp.roll(gx, 1, axis=1) - gx) + (jnp.roll(gy, 1, axis=0) - gy)
        num = normin1 + beta * jnp.fft.fft2(div, axes=(0, 1))
        s = jnp.real(jnp.fft.ifft2(num / (1.0 + beta * denom_grad), axes=(0, 1)))
        return s, beta * kappa

    s = img
    beta = 2 * lam
    for _ in range(n_iter):
        s, beta = body(s, beta)
        if beta > beta_max:
            break
    return s


def ftvd(blurred: jnp.ndarray, psf: jnp.ndarray, mu: float = 500.0,
         beta: float = 10.0, n_iter: int = 20) -> jnp.ndarray:
    """TV/L2 deconvolution by alternating direction (rcl.py:529-711 FTVd).

    blurred: [H, W] or [H, W, C]; psf: [kh, kw]. Solves
    min_u TV(u) + mu/2 ||K u - f||^2 with gradient-splitting.
    """
    squeeze = blurred.ndim == 2
    f = blurred[..., None] if squeeze else blurred
    hh, ww, cc = f.shape
    otf = _psf2otf(psf.astype(f.dtype), (hh, ww))[..., None]
    fx = _psf2otf(jnp.asarray([[1.0, -1.0]], f.dtype), (hh, ww))[..., None]
    fy = _psf2otf(jnp.asarray([[1.0], [-1.0]], f.dtype), (hh, ww))[..., None]
    ktf = jnp.conj(otf) * jnp.fft.fft2(f, axes=(0, 1))
    denom = jnp.abs(otf) ** 2 + (beta / mu) * (jnp.abs(fx) ** 2 + jnp.abs(fy) ** 2)

    def grad(u):
        return jnp.roll(u, -1, axis=1) - u, jnp.roll(u, -1, axis=0) - u

    def div(wx, wy):
        return (jnp.roll(wx, 1, axis=1) - wx) + (jnp.roll(wy, 1, axis=0) - wy)

    u = f
    for _ in range(n_iter):
        ux, uy = grad(u)
        # shrinkage (isotropic TV)
        mag = jnp.sqrt(ux ** 2 + uy ** 2)
        shrink = jnp.maximum(mag - 1.0 / beta, 0.0) / jnp.maximum(mag, 1e-12)
        wx, wy = ux * shrink, uy * shrink
        rhs = ktf + (beta / mu) * jnp.fft.fft2(div(wx, wy), axes=(0, 1))
        u = jnp.real(jnp.fft.ifft2(rhs / denom, axes=(0, 1)))
    return u[..., 0] if squeeze else u


def rl_deconv(image: jnp.ndarray, psf: jnp.ndarray, n_iter: int = 10) -> jnp.ndarray:
    """Standard Richardson-Lucy with kernel-flip correction
    (rcl.py:462-523 RL_Deconv module). image: [B, C, H, W]."""
    from speinet_tpu.ops.filters import depthwise_conv2d

    est = jnp.full_like(image, 0.5)
    psf_flip = psf[::-1, ::-1]
    for _ in range(n_iter):
        conv = depthwise_conv2d(est, psf)
        ratio = image / jnp.maximum(conv, 1e-12)
        est = est * depthwise_conv2d(ratio, psf_flip)
    return est


def rtv_smooth(img: np.ndarray, lam: float = 0.01, sigma: float = 3.0,
               sharpness: float = 0.02, n_iter: int = 4) -> np.ndarray:
    """Relative total variation smoothing (Xu et al. 2012), semantics of
    rcl.py:238-399 `tsmooth`. Host-side numpy/scipy (sparse solve).

    img: [H, W, C] float in [0, 1].
    """
    from scipy.ndimage import gaussian_filter1d
    from scipy.sparse import spdiags, csr_matrix
    from scipy.sparse.linalg import spsolve

    x = np.asarray(img, np.float64)
    h, w, c = x.shape
    n = h * w
    for _ in range(n_iter):
        # compute texture weights (computeTextureWeights)
        fx = np.diff(x, axis=1)
        fx = np.concatenate([fx, x[:, :1] - x[:, -1:]], axis=1)
        fy = np.diff(x, axis=0)
        fy = np.concatenate([fy, x[:1] - x[-1:]], axis=0)
        def lp_filter(v, axis):
            r = int(np.ceil(3 * sigma))
            out = gaussian_filter1d(v, sigma, axis=axis, mode="nearest")
            return out
        wto = np.maximum(
            np.sqrt((lp_filter(fx, 1).mean(2)) ** 2 + (lp_filter(fy, 0).mean(2)) ** 2),
            sharpness) ** -1
        fbx = np.abs(lp_filter(fx.mean(2), 1))
        fby = np.abs(lp_filter(fy.mean(2), 0))
        wtbx = np.maximum(fbx, 1e-3) ** -1
        wtby = np.maximum(fby, 1e-3) ** -1
        wx = (wtbx * wto).reshape(-1)
        wy = (wtby * wto).reshape(-1)
        # build the sparse 5-point system and solve per channel
        dx = lam * wx
        dy = lam * wy
        d = 1 + dx + dy + np.roll(dx, w) + np.roll(dy, 1)
        a = spdiags(np.vstack([-dx, -dy]), [-w, -1], n, n)
        mat = csr_matrix(a + a.T + spdiags(d, 0, n, n))
        out = np.empty_like(x)
        for ci in range(c):
            out[..., ci] = spsolve(mat, x[..., ci].reshape(-1)).reshape(h, w)
        x = out
    return x
