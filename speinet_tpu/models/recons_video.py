"""SRN-style hourglass encoder/decoder (parity: model/recons_video_ori.py).

Five-level structure exposed as six independently callable stages, because
SPEINet drives them piecemeal (speinet.py:82-83,125-131):
    in_block:       3 -> f     (5x5 conv + ReLU, then n_resblock ResBlocks)
    encoder_first:  f -> 2f    stride 2
    encoder_second: 2f -> 4f   stride 2
    decoder_second: 4f -> 2f   (ResBlocks then ConvT(k=3,s=2,p=1,op=1)+ReLU)
    decoder_first:  2f -> f
    out_block:      f -> out   (ResBlocks then 5x5 conv)
All NHWC.

TPU inference fast path: `encode_pyramid` chains the three encoder stages
in space-to-depth layout with Pallas shifted-matmul convs (ops/s2d.py +
ops/pallas_conv.py) — XLA's conv emitter runs the 32/64-channel 5x5 convs
at <10% of matmul peak, the s2d form at 4x the channels recovers it. The
decoder stages use the same trick per-stage. Same parameters, same math.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from speinet_tpu.models.blocks import (ConvParams, ConvTransposeTorch,
                                       ResBlock)
from speinet_tpu.ops.s2d import (depth_to_space, s2d_bias, s2d_consume_kernel,
                                 s2d_kernel, space_to_depth)

Dtype = Any


def use_fast_convs(x, train: bool) -> bool:
    """Pallas conv fast path: TPU inference with even spatial dims."""
    from speinet_tpu.models.swinir import _fused_enabled

    return (not train and _fused_enabled()
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)


def _subpixel_on() -> bool:
    """Decoder ConvT as dense subpixel conv (A/B knob, default on)."""
    import os

    return os.environ.get("SPEINET_CONVT_SUBPIXEL", "1") == "1"


class _ConvReLU(nn.Module):
    features: int
    kernel_size: int = 5
    stride: int = 1
    in_features: int | None = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.cp = ConvParams(self.features, self.kernel_size,
                             self.in_features, name="Conv_0")

    def params(self):
        return self.cp()

    def __call__(self, x):
        import jax

        kernel, bias = self.cp()
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.stride, self.stride),
            [(self.kernel_size // 2, self.kernel_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(x + bias.astype(self.dtype))


class _ResStack(nn.Module):
    features: int
    n_resblock: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.blocks = [ResBlock(self.features, self.kernel_size,
                                dtype=self.dtype, name=f"res{i}")
                       for i in range(self.n_resblock)]

    def __call__(self, x, train: bool = False):
        for blk in self.blocks:
            x = blk(x, train=train)
        return x

    def call_fast(self, x, train: bool = False, s2d: bool = False):
        for blk in self.blocks:
            x = blk.call_fast(x, train=train, s2d=s2d)
        return x


class ReconsVideo(nn.Module):
    """The six hourglass stages (parity: recons_video_ori.py:14-84)."""

    n_feat: int = 32
    n_resblock: int = 3
    out_channels: int = 3
    kernel_size: int = 5
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        f, k, d = self.n_feat, self.kernel_size, self.dtype
        self.in_conv = _ConvReLU(f, k, 1, self.in_channels, d)
        self.in_res = _ResStack(f, self.n_resblock, k, d)
        self.enc1_conv = _ConvReLU(f * 2, k, 2, f, d)
        self.enc1_res = _ResStack(f * 2, self.n_resblock, k, d)
        self.enc2_conv = _ConvReLU(f * 4, k, 2, f * 2, d)
        self.enc2_res = _ResStack(f * 4, self.n_resblock, k, d)
        self.dec2_res = _ResStack(f * 4, self.n_resblock, k, d)
        self.dec2_up = ConvTransposeTorch(f * 2, 3, 2, 1, 1, d)
        self.dec1_res = _ResStack(f * 2, self.n_resblock, k, d)
        self.dec1_up = ConvTransposeTorch(f, 3, 2, 1, 1, d)
        self.out_res = _ResStack(f, self.n_resblock, k, d)
        from speinet_tpu.models.blocks import torch_bias_init, torch_kernel_init
        self.out_conv = nn.Conv(self.out_channels, (k, k), padding=k // 2,
                                kernel_init=torch_kernel_init,
                                bias_init=torch_bias_init(k * k * f), dtype=d)

    def in_block(self, x, train=False):
        return self.in_res(self.in_conv(x), train=train)

    def encoder_first(self, x, train=False):
        return self.enc1_res(self.enc1_conv(x), train=train)

    def encoder_second(self, x, train=False):
        return self.enc2_res(self.enc2_conv(x), train=train)

    def encode_pyramid(self, x, train=False):
        """in_block -> encoder_first -> encoder_second, returning all three
        pyramid levels. On TPU inference the lv1/lv2 stages run in
        space-to-depth layout through the Pallas conv (same parameters,
        mathematically identical; see module docstring)."""
        if not (use_fast_convs(x, train)
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
            lv1 = self.in_block(x, train=train)
            lv2 = self.encoder_first(lv1, train=train)
            return lv1, lv2, self.encoder_second(lv2, train=train)
        from speinet_tpu.ops.pallas_conv import conv2d_mxu

        dt = self.dtype
        xs = space_to_depth(x.astype(dt))
        kin, bin_ = self.in_conv.params()
        h1 = conv2d_mxu(xs, s2d_kernel(kin).astype(dt), s2d_bias(bin_),
                        relu=True)
        h1 = self.in_res.call_fast(h1, train=train, s2d=True)   # s2d of lv1
        k1, b1 = self.enc1_conv.params()
        l2 = conv2d_mxu(h1, s2d_consume_kernel(k1).astype(dt), b1, relu=True)
        h2 = space_to_depth(l2)
        h2 = self.enc1_res.call_fast(h2, train=train, s2d=True)  # s2d of lv2
        k2, b2 = self.enc2_conv.params()
        l3 = conv2d_mxu(h2, s2d_consume_kernel(k2).astype(dt), b2, relu=True)
        l3 = self.enc2_res.call_fast(l3, train=train, s2d=False)
        return depth_to_space(h1), depth_to_space(h2), l3

    def decoder_second(self, x, train=False):
        if use_fast_convs(x, train):
            r = self.dec2_res.call_fast(x, train=train, s2d=False)
            return self.dec2_up(r, subpixel=_subpixel_on(), relu=True)
        r = self.dec2_res(x, train=train)
        return self.dec2_up(r, relu=True)

    def decoder_first(self, x, train=False):
        if use_fast_convs(x, train):
            r = depth_to_space(self.dec1_res.call_fast(
                space_to_depth(x.astype(self.dtype)), train=train, s2d=True))
            return self.dec1_up(r, subpixel=_subpixel_on(), relu=True)
        r = self.dec1_res(x, train=train)
        return self.dec1_up(r, relu=True)

    def out_block(self, x, train=False):
        if use_fast_convs(x, train):
            r = depth_to_space(self.out_res.call_fast(
                space_to_depth(x.astype(self.dtype)), train=train, s2d=True))
        else:
            r = self.out_res(x, train=train)
        return self.out_conv(r)

    def encode3(self, x, train=False):
        """in_block -> encoder_first -> encoder_second (the lv3 pyramid leg)."""
        return self.encode_pyramid(x, train=train)[2]

    def __call__(self, x, train: bool = False):
        """Full hourglass pass (standalone RECONS_VIDEO capability)."""
        lv1 = self.in_block(x, train)
        lv2 = self.encoder_first(lv1, train)
        lv3 = self.encoder_second(lv2, train)
        d2 = self.decoder_second(lv3, train)
        d1 = self.decoder_first(d2, train)
        return self.out_block(d1, train)
