"""CNN building blocks (flax.linen, NHWC).

Re-designs the reference's `model/block.py` for TPU: NHWC layout (XLA's
preferred conv layout), fused channel/spatial attention, no Python-side
permute-contiguous churn. Semantics match:
- SEBlock (block.py:8-24): squeeze-excite, reduction 4
- AttentionGate (block.py:75-96): ZPool (max+mean over channel) -> k x k
  conv (2->1, no bias) -> BatchNorm -> multiplicative gate
- TripletAttention (block.py:108-124): the two permuted-axis gates summed
- ResBlock (block.py:127-141): two 5x5 convs -> SE + Triplet -> +identity
- BasicConv / conv_transpose with PyTorch ConvTranspose2d(k=3, s=2, p=1,
  output_padding=1) semantics for the decoder upsampling stages
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def conv_transpose_torch(x: jnp.ndarray, kernel: jnp.ndarray, bias, stride: int,
                         padding: int, output_padding: int) -> jnp.ndarray:
    """NHWC transposed conv matching torch.nn.ConvTranspose2d.

    kernel: [kh, kw, out_ch, in_ch] (flax transpose_kernel=True layout ==
    torch's [in, out, kh, kw] transposed + HW-flipped handled by lax).
    """
    k = kernel.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_transpose(
        x, kernel, strides=(stride, stride), padding=((lo, hi), (lo, hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )
    if bias is not None:
        y = y + bias
    return y


class ConvTransposeTorch(nn.Module):
    """ConvTranspose2d(k, stride, padding, output_padding) parity module."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        # match torch's default kaiming-uniform fan_in = in_ch * k * k
        init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform",
                                                in_axis=(0, 1, 3), out_axis=2)
        kernel = self.param("kernel", init, (k, k, self.features, in_ch), jnp.float32)
        bound = 1.0 / (in_ch * k * k) ** 0.5

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        bias = self.param("bias", bias_init, (self.features,))
        return conv_transpose_torch(x.astype(self.dtype), kernel.astype(self.dtype),
                                    bias.astype(self.dtype), self.stride,
                                    self.padding, self.output_padding)


class BasicConv(nn.Module):
    """conv/convT [+ BatchNorm] [+ ReLU] (parity: block.py:26-47)."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    norm: bool = False
    relu: bool = True
    transpose: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = self.use_bias and not self.norm
        if self.transpose:
            x = ConvTransposeTorch(self.features, self.kernel_size, self.stride,
                                   padding=self.kernel_size // 2 - 1,
                                   output_padding=0, dtype=self.dtype)(x)
        else:
            x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                        strides=(self.stride, self.stride),
                        padding=self.kernel_size // 2, use_bias=bias,
                        dtype=self.dtype)(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-5, dtype=jnp.float32)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SEBlock(nn.Module):
    """Channel squeeze-excite (parity: block.py:8-24)."""

    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))                      # [B, C]
        y = nn.Dense(c // self.reduction, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class AttentionGate(nn.Module):
    """conv(2->1, k, no bias) -> BatchNorm on an already-pooled plane.

    Parity: block.py:75-96 (AttentionGate1 k=7, AttentionGate2 k=5; the
    BasicConv1 there has relu=False so neither ReLU nor sigmoid applies —
    the gate is the raw batch-normed conv output). The ZPool happens in
    TripletAttention so that only the tiny pooled plane is convolved.
    """

    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled, train: bool = False):  # [B, A1, A2, 2]
        z = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=(self.kernel_size - 1) // 2, use_bias=False,
                    dtype=self.dtype)(pooled)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, dtype=jnp.float32)(z.astype(jnp.float32))
        return z


class TripletAttention(nn.Module):
    """Cross-dimension attention (parity: block.py:108-124, no_spatial=False).

    In the reference's NCHW terms, branch `cw` gates over the W axis with a
    7x7 conv on the (H, C) plane and branch `hc` gates over the H axis with
    a 5x5 conv on the (C, W) plane; outputs are summed. The reference
    permutes the FULL tensor twice per branch (block.py:118-119); since the
    gate depends only on the max/mean over the gated axis, pooling first
    shrinks everything downstream to a [B, A1, A2, 2] plane — no
    full-tensor transposes, and the two gated products collapse into one
    broadcast multiply-add.
    """

    dtype: Dtype = jnp.float32

    def setup(self):
        self.cw = AttentionGate(kernel_size=7, dtype=self.dtype)
        self.hc = AttentionGate(kernel_size=5, dtype=self.dtype)

    def __call__(self, x, train: bool = False):  # [B, H, W, C]
        xf = x.astype(jnp.float32)
        # cw: pool over W -> plane (H, C); gate broadcast over W
        pool_cw = jnp.stack([jnp.max(xf, axis=2), jnp.mean(xf, axis=2)],
                            axis=-1)                     # [B, H, C, 2]
        gate_cw = self.cw(pool_cw.astype(self.dtype), train=train)  # [B,H,C,1]
        # hc: pool over H -> plane (C, W); gate broadcast over H
        pool_hc = jnp.stack([jnp.max(xf, axis=1), jnp.mean(xf, axis=1)],
                            axis=-1)                     # [B, W, C, 2]
        pool_hc = pool_hc.transpose(0, 2, 1, 3)          # [B, C, W, 2]
        gate_hc = self.hc(pool_hc.astype(self.dtype), train=train)  # [B,C,W,1]
        g_cw = gate_cw[..., 0][:, :, None, :]            # [B, H, 1, C]
        g_hc = gate_hc[..., 0].transpose(0, 2, 1)[:, None, :, :]  # [B, 1, W, C]
        return x * (g_cw + g_hc).astype(x.dtype)


class ResBlock(nn.Module):
    """Residual block with dual attention (parity: block.py:127-141)."""

    features: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv1 = BasicConv(self.features, self.kernel_size, relu=True,
                               dtype=self.dtype)
        self.conv2 = BasicConv(self.features, self.kernel_size, relu=False,
                               dtype=self.dtype)
        self.se = SEBlock(dtype=self.dtype)
        self.te = TripletAttention(dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        x1 = self.conv2(self.conv1(x, train=train), train=train)
        x2 = self.te(x1, train=train)
        x3 = self.se(x1) + x2
        return x3 + x
