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
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from speinet_tpu.models.blocks import ConvTransposeTorch, ResBlock

Dtype = Any


class _ConvReLU(nn.Module):
    features: int
    kernel_size: int = 5
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=self.kernel_size // 2, dtype=self.dtype)(x)
        return nn.relu(x)


class _ResStack(nn.Module):
    features: int
    n_resblock: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_resblock):
            x = ResBlock(self.features, self.kernel_size, dtype=self.dtype,
                         name=f"res{i}")(x, train=train)
        return x


class ReconsVideo(nn.Module):
    """The six hourglass stages (parity: recons_video_ori.py:14-84)."""

    n_feat: int = 32
    n_resblock: int = 3
    out_channels: int = 3
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    def setup(self):
        f, k, d = self.n_feat, self.kernel_size, self.dtype
        self.in_conv = _ConvReLU(f, k, 1, d)
        self.in_res = _ResStack(f, self.n_resblock, k, d)
        self.enc1_conv = _ConvReLU(f * 2, k, 2, d)
        self.enc1_res = _ResStack(f * 2, self.n_resblock, k, d)
        self.enc2_conv = _ConvReLU(f * 4, k, 2, d)
        self.enc2_res = _ResStack(f * 4, self.n_resblock, k, d)
        self.dec2_res = _ResStack(f * 4, self.n_resblock, k, d)
        self.dec2_up = ConvTransposeTorch(f * 2, 3, 2, 1, 1, d)
        self.dec1_res = _ResStack(f * 2, self.n_resblock, k, d)
        self.dec1_up = ConvTransposeTorch(f, 3, 2, 1, 1, d)
        self.out_res = _ResStack(f, self.n_resblock, k, d)
        self.out_conv = nn.Conv(self.out_channels, (k, k), padding=k // 2, dtype=d)

    def in_block(self, x, train=False):
        return self.in_res(self.in_conv(x), train=train)

    def encoder_first(self, x, train=False):
        return self.enc1_res(self.enc1_conv(x), train=train)

    def encoder_second(self, x, train=False):
        return self.enc2_res(self.enc2_conv(x), train=train)

    def decoder_second(self, x, train=False):
        return nn.relu(self.dec2_up(self.dec2_res(x, train=train)))

    def decoder_first(self, x, train=False):
        return nn.relu(self.dec1_up(self.dec1_res(x, train=train)))

    def out_block(self, x, train=False):
        return self.out_conv(self.out_res(x, train=train))

    def encode3(self, x, train=False):
        """in_block -> encoder_first -> encoder_second (the lv3 pyramid leg)."""
        return self.encoder_second(self.encoder_first(self.in_block(x, train), train), train)

    def __call__(self, x, train: bool = False):
        """Full hourglass pass (standalone RECONS_VIDEO capability)."""
        lv1 = self.in_block(x, train)
        lv2 = self.encoder_first(lv1, train)
        lv3 = self.encoder_second(lv2, train)
        d2 = self.decoder_second(lv3, train)
        d1 = self.decoder_first(d2, train)
        return self.out_block(d1, train)
