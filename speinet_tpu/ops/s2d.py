"""Space-to-depth conv transforms for TPU MXU utilization.

The encoder/decoder ResBlocks run 5x5 convs at 32 and 64 channels
(recons_video_ori.py:24-44). XLA's TPU conv emitter runs these at <10% of
matmul peak because the channel count underfills the 128-lane MXU. A 5x5
stride-1 conv on [H, W, C] is EXACTLY a 3x3 stride-1 conv on the
space-to-depth form [H/2, W/2, 4C] with a rearranged kernel: output pixel
(2r+p, 2s+q) reads input rows 2r+p+dy-2, and floor((p+dy-2)/2) spans only
{-1,0,1} — so every (output-quadrant, tap) pair lands in a 3x3 s2d
neighborhood. The transform quadruples channels (32 -> 128 fills the MXU)
for a 1.44x FLOP overhead (9*4/25) — measured ~5x net on TPU v5.

Quadrant ordering: s2d channel index = (p*2 + q)*C + c for input parity
(p, q) — a plain reshape/transpose both ways.

Same trick, stride 2: a 5x5 stride-2 conv (encoder downsampling,
recons_video_ori.py:33,43) consuming the s2d form is a 3x3 stride-1 conv
from 4*Ci channels on the s2d grid (which is already the output grid).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (quadrant-major channel order)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H/2, W/2, 4C] -> [B, H, W, C] (inverse of space_to_depth)."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def _tap_maps(k: int, parities: int):
    """For output parity p and tap dy (logical pad k//2): s2d row offset and
    input parity. Returns int arrays [parities, k] (offset in {-1,0,1},
    shifted by +1 for indexing a 3-tap kernel)."""
    pad = k // 2
    offs = np.zeros((parities, k), np.int64)
    pars = np.zeros((parities, k), np.int64)
    for p in range(parities):
        for dy in range(k):
            u = p + dy - pad
            offs[p, dy] = np.floor_divide(u, 2)
            pars[p, dy] = u - 2 * offs[p, dy]
    return offs, pars


@functools.lru_cache(maxsize=None)
def _s2d_dest_indices(k: int, ci: int, co: int):
    """Flat destination index in K2 [k2, k2, 4ci, 4co] for every source
    element of w broadcast to [2(p), 2(q), k(dy), k(dx), ci, co]."""
    offs, pars = _tap_maps(k, 2)
    lo = int(offs.min())
    k2 = int(offs.max()) - lo + 1
    p = np.arange(2)[:, None, None, None]
    q = np.arange(2)[None, :, None, None]
    dy = np.arange(k)[None, None, :, None]
    dx = np.arange(k)[None, None, None, :]
    ry = offs[p, dy] - lo
    py = pars[p, dy]
    rx = offs[q, dx] - lo
    qx = pars[q, dx]
    i = np.arange(ci)
    o = np.arange(co)
    base = (ry * k2 + rx)[..., None, None]
    cin = ((py * 2 + qx)[..., None, None] * ci + i[:, None])
    cout = ((p * 2 + q)[..., None, None] * co + o[None, :])
    dest = (base * (4 * ci) + cin) * (4 * co) + cout      # [2,2,k,k,ci,co]
    return k2, dest.reshape(-1)


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[k, k, Ci, Co] (odd k, logical stride 1, pad k//2) ->
    [k2, k2, 4Ci, 4Co] for the s2d grid (stride 1, pad k2//2); k2 = 3 for
    k = 5 (the model's ResBlock kernel size). One static scatter."""
    k, _, ci, co = w.shape
    k2, dest = _s2d_dest_indices(k, ci, co)
    src = jnp.broadcast_to(w[None, None], (2, 2, k, k, ci, co)).reshape(-1)
    flat = jnp.zeros((k2 * k2 * 4 * ci * 4 * co,), w.dtype).at[dest].set(src)
    return flat.reshape(k2, k2, 4 * ci, 4 * co)


@functools.lru_cache(maxsize=None)
def _consume_dest_indices(k: int, ci: int, co: int):
    pad = k // 2
    offs = np.floor_divide(np.arange(k) - pad, 2)
    pars = (np.arange(k) - pad) - 2 * offs
    lo = int(offs.min())
    k2 = int(offs.max()) - lo + 1
    dy = np.arange(k)[:, None]
    dx = np.arange(k)[None, :]
    ry = offs[dy] - lo
    py = pars[dy]
    rx = offs[dx] - lo
    qx = pars[dx]
    i = np.arange(ci)
    o = np.arange(co)
    base = (ry * k2 + rx)[..., None, None]
    cin = ((py * 2 + qx)[..., None, None] * ci + i[:, None])
    dest = (base * (4 * ci) + cin) * co + o[None, :]      # [k,k,ci,co]
    return k2, dest.reshape(-1)


def s2d_consume_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[k, k, Ci, Co] logical stride-2 pad-k//2 conv, consuming the s2d form
    of its input and producing a PLAIN map on the s2d grid (= the stride-2
    output grid): returns [k2, k2, 4Ci, Co], stride 1, pad k2//2."""
    k, _, ci, co = w.shape
    k2, dest = _consume_dest_indices(k, ci, co)
    flat = jnp.zeros((k2 * k2 * 4 * ci * co,), w.dtype).at[dest].set(w.reshape(-1))
    return flat.reshape(k2, k2, 4 * ci, co)


def s2d_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """[Co] -> [4Co] matching s2d_kernel's quadrant-major output ordering."""
    return jnp.tile(bias, 4)
