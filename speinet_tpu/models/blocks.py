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

TPU fast path (`call_fast` on ResBlock, `call_s2d` on SE/Triplet): the
reference's 5x5 convs at 32/64 channels underfill the 128-lane MXU, so the
XLA conv emitter runs them at <10% of matmul peak. On TPU the ResBlock
stack runs either directly through the Pallas shifted-matmul conv
(ops/pallas_conv.py, channels >= 128) or in space-to-depth layout
(ops/s2d.py, channels < 128) where the same parameters express the SAME
math as 3x3 convs at 4x the channels. SE/Triplet pool-planes are
reconstructed exactly from the s2d layout (equal-count means / maxes), so
the fast path is numerically equivalent up to f32-vs-bf16 accumulation
order.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from speinet_tpu.ops.s2d import s2d_kernel

Dtype = Any

# torch nn.Conv2d / nn.Linear default init: kaiming_uniform(a=sqrt(5)) ==
# variance_scaling(1/3, fan_in, uniform) (fan_in = k*k*in_ch for convs).
# The reference never calls its `weights_init` (block.py:100-106 is dead
# code), so torch defaults ARE the reference init — and they are what keeps
# the UNBOUNDED TripletAttention gates (block.py:61-68: relu=False skips
# both ReLU and sigmoid) stable at initialization: flax's lecun_normal is
# sqrt(3)x wider, which compounds through ~15 gated ResBlocks into a
# numerically exploding forward pass at init. Bias init: torch uses
# U(+-1/sqrt(fan_in)); every conv layer reproduces it — ConvParams /
# ConvTransposeTorch natively, plain nn.Conv sites via an explicit
# bias_init=torch_bias_init(k*k*in_ch) (the zero-bias deviation that round
# 3 documented was removed after the head-to-head early-convergence gap
# pointed at it; see docs/quality_evidence/head_to_head.md).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")


def torch_bias_init(fan_in: int):
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvParams(nn.Module):
    """Parameter holder with nn.Conv's tree layout ({kernel, bias}) so the
    same weights serve the XLA conv, the Pallas conv and the s2d-transformed
    Pallas conv. Instances are named "Conv_0" to keep checkpoint/converter
    compatibility with the previous nn.Conv submodule."""

    features: int
    kernel_size: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param("kernel", torch_kernel_init,
                            (k, k, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", torch_bias_init(k * k * self.in_features),
                          (self.features,)) if self.use_bias else None
        return kernel, bias


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


def convt_subpixel_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=3, s=2, p=1, op=1) as a subpixel conv: stored
    kernel [3, 3, out, in] -> K2 [2, 2, in, 4*out] such that

        convT(x) == depth_to_space(conv2d_valid(pad_rb(x, 1), K2))

    (phase-major output channels matching ops.s2d.depth_to_space). Output
    pixel p = 2q - 1 + r (stride 2, pad 1): even p reads one tap (r = 1 at
    q = p/2), odd p reads two (r = 0 at q0+1, r = 2 at q0). XLA lowers the
    reference form as an input-dilated 3x3 conv over the OUTPUT grid — 4x
    the FLOPs, 3/4 of them on zeros; this form is one dense 2x2 conv on
    the input grid at 4x the output channels, which tiles onto the MXU."""
    w = kernel.transpose(0, 1, 3, 2)          # W[r_h, r_w, in, out]
    c_in, c_out = w.shape[2], w.shape[3]
    k2 = jnp.zeros((2, 2, c_in, 4 * c_out), w.dtype)
    # (phase a, b) taps: dq = input-grid offset, r = kernel tap index
    taps = {
        (0, 0): [((0, 0), (1, 1))],
        (0, 1): [((0, 0), (1, 2)), ((0, 1), (1, 0))],
        (1, 0): [((0, 0), (2, 1)), ((1, 0), (0, 1))],
        (1, 1): [((0, 0), (2, 2)), ((0, 1), (2, 0)),
                 ((1, 0), (0, 2)), ((1, 1), (0, 0))],
    }
    for (a, b), entries in taps.items():
        ph = a * 2 + b
        for (dqh, dqw), (rh, rw) in entries:
            k2 = k2.at[dqh, dqw, :, ph * c_out:(ph + 1) * c_out].set(w[rh, rw])
    return k2


class ConvTransposeTorch(nn.Module):
    """ConvTranspose2d(k, stride, padding, output_padding) parity module.

    `subpixel=True` (k=3/s=2/p=1/op=1 only) runs the mathematically
    identical dense 2x2-conv + depth_to_space form (convt_subpixel_kernel)
    with the following ReLU fused before the space interleave — the TPU
    decoder fast path."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, subpixel: bool = False, relu: bool = False):
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
        if (subpixel and k == 3 and self.stride == 2 and self.padding == 1
                and self.output_padding == 1):
            from speinet_tpu.ops.s2d import depth_to_space

            k2 = convt_subpixel_kernel(kernel)
            xp = jnp.pad(x.astype(self.dtype), ((0, 0), (0, 1), (0, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, k2.astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + jnp.tile(bias, 4).astype(self.dtype)
            if relu:
                y = nn.relu(y)
            return depth_to_space(y)
        y = conv_transpose_torch(x.astype(self.dtype), kernel.astype(self.dtype),
                                 bias.astype(self.dtype), self.stride,
                                 self.padding, self.output_padding)
        return nn.relu(y) if relu else y


class BasicConv(nn.Module):
    """conv/convT [+ BatchNorm] [+ ReLU] (parity: block.py:26-47).

    With `in_features` set, the conv parameters live in a ConvParams holder
    (same tree layout) so `params()` can feed the Pallas fast paths."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    norm: bool = False
    relu: bool = True
    transpose: bool = False
    in_features: int | None = None
    dtype: Dtype = jnp.float32

    def setup(self):
        bias = self.use_bias and not self.norm
        if self.transpose:
            self.op = ConvTransposeTorch(self.features, self.kernel_size,
                                         self.stride,
                                         padding=self.kernel_size // 2 - 1,
                                         output_padding=0, dtype=self.dtype,
                                         name="ConvTransposeTorch_0")
        elif self.in_features is not None:
            self.cp = ConvParams(self.features, self.kernel_size,
                                 self.in_features, use_bias=bias,
                                 name="Conv_0")
        else:
            self.op = nn.Conv(self.features,
                              (self.kernel_size, self.kernel_size),
                              strides=(self.stride, self.stride),
                              padding=self.kernel_size // 2, use_bias=bias,
                              kernel_init=torch_kernel_init,
                              dtype=self.dtype, name="Conv_0")
        if self.norm:
            self.bn = nn.BatchNorm(use_running_average=True, momentum=0.99,
                                   epsilon=1e-5, dtype=jnp.float32,
                                   name="BatchNorm_0")

    def params(self):
        """(kernel, bias) for the Pallas conv paths."""
        return self.cp()

    def __call__(self, x, train: bool = False):
        if self.transpose or self.in_features is None:
            x = self.op(x)
        else:
            kernel, bias = self.cp()
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (self.stride, self.stride),
                [(self.kernel_size // 2, self.kernel_size // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bias is not None:
                x = x + bias.astype(self.dtype)
        if self.norm:
            x = self.bn(x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x


class FastConv(nn.Module):
    """nn.Conv-compatible stride-1 SAME conv (identical param tree:
    {kernel, bias} with torch-default inits) that dispatches odd k > 1
    convs to the Pallas shifted-matmul kernel (ops/pallas_conv.py) on TPU
    inference, with the following ReLU fused into the kernel epilogue.
    The decode-path 3x3 refinement convs at 32/64 channels
    (speinet.py:92-120 / model/speinet.py search convs) run at <10% of
    matmul peak through XLA's conv emitter; the shifted-matmul form with
    the k*k taps concatenated into one deep-K matmul recovers it. 1x1
    convs (plain matmuls) and training stay on the XLA lowering."""

    features: int
    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, relu: bool = False, train: bool = False):
        k = self.kernel_size
        kernel = self.param("kernel", torch_kernel_init,
                            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(k * k * x.shape[-1]),
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        from speinet_tpu.models.swinir import _fused_enabled

        # the Pallas path pads a private copy of x (row blocks + halo), so
        # route through it only when the WHOLE batch fits the transient
        # budget and fall back to XLA otherwise. Batch-chunking the Pallas
        # call was measured SLOWER than the XLA conv at bench shapes
        # (720p x batch 8 video mode: XLA 3.375 fps, chunked 3.230,
        # whole-batch single call 3.271) — the per-chunk pad copies and
        # output concat cost more than the conv-emitter inefficiency they
        # avoid, and these refinement convs have only 32-64 output
        # channels (25-50% MXU lane util) so the kcat matmul can't win
        # big. Pallas keeps the small-batch/direct-mode shapes where the
        # padded copy is cheap and the deep-K matmul measured faster.
        import os

        b, hh, ww, c = x.shape
        budget = int(os.environ.get("SPEINET_FASTCONV_MB", "256")) << 20
        per_sample = hh * ww * c * x.dtype.itemsize
        if (k > 1 and not train and b * per_sample <= budget
                and _fused_enabled()):
            from speinet_tpu.ops.pallas_conv import conv2d_mxu

            # bias pre-rounded to self.dtype so the f32 epilogue add and the
            # XLA fallback's self.dtype add see the same bias values across
            # the size-gated dispatch (ADVICE r3)
            kd = kernel.astype(self.dtype)
            bd = bias.astype(self.dtype).astype(jnp.float32)
            return conv2d_mxu(x, kd, bd, relu=relu, kcat=True)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(self.dtype)
        return nn.relu(y) if relu else y


class SEBlock(nn.Module):
    """Channel squeeze-excite (parity: block.py:8-24)."""

    features: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(self.features // self.reduction, dtype=self.dtype,
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(self.features),
                            name="Dense_0")
        self.fc2 = nn.Dense(self.features, dtype=self.dtype,
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(
                                self.features // self.reduction),
                            name="Dense_1")

    def _gate(self, y):  # [B, C] -> [B, C]
        return nn.sigmoid(self.fc2(nn.relu(self.fc1(y))))

    def __call__(self, x):  # [B, H, W, C]
        y = self._gate(jnp.mean(x, axis=(1, 2)))
        return x * y[:, None, None, :]

    def call_s2d(self, x):  # [B, H/2, W/2, 4C]
        """Same gate on the space-to-depth layout: the global mean per
        logical channel is the equal-count mean over the 4 quadrant copies;
        the per-channel scale broadcasts back over the quadrants."""
        b = x.shape[0]
        c = x.shape[-1] // 4
        y = jnp.mean(x, axis=(1, 2)).reshape(b, 4, c).mean(axis=1)
        g = self._gate(y)
        return x * jnp.tile(g, (1, 4))[:, None, None, :]


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
                    kernel_init=torch_kernel_init,
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

    def call_s2d(self, x, train: bool = False):  # [B, H/2, W/2, 4C]
        """Same two gates on the space-to-depth layout. The (H, C) and
        (C, W) pool planes are reconstructed exactly: a full-resolution row
        h = 2r + p lives in quadrant-row (r, p), so pooling over W pools
        over (W/2, q); means stay exact because quadrant counts are equal."""
        b, h2, w2, c4 = x.shape
        c = c4 // 4
        xf = x.astype(jnp.float32).reshape(b, h2, w2, 2, 2, c)
        # pool over W = over (w2, q): -> [B, h2, 2(p), C] -> [B, H, C]
        mx_w = jnp.max(xf, axis=(2, 4))
        mn_w = jnp.mean(xf, axis=(2, 4))
        pool_cw = jnp.stack([mx_w, mn_w], axis=-1).reshape(b, 2 * h2, c, 2)
        gate_cw = self.cw(pool_cw.astype(self.dtype), train=train)  # [B,H,C,1]
        # pool over H = over (h2, p): -> [B, w2, 2(q), C] -> [B, W, C] -> [B,C,W]
        mx_h = jnp.max(xf, axis=(1, 3))
        mn_h = jnp.mean(xf, axis=(1, 3))
        pool_hc = jnp.stack([mx_h, mn_h], axis=-1).reshape(b, 2 * w2, c, 2)
        pool_hc = pool_hc.transpose(0, 2, 1, 3)          # [B, C, W, 2]
        gate_hc = self.hc(pool_hc.astype(self.dtype), train=train)  # [B,C,W,1]
        # broadcast back onto quadrants: g_cw by (h2, p), g_hc by (w2, q)
        g_cw = gate_cw[..., 0].reshape(b, h2, 2, c)      # [B, h2, p, C]
        g_hc = gate_hc[..., 0].transpose(0, 2, 1).reshape(b, w2, 2, c)
        gsum = (g_cw[:, :, None, :, None, :]
                + g_hc[:, None, :, None, :, :])          # [B, h2, w2, p, q, C]
        out = x.reshape(b, h2, w2, 2, 2, c) * gsum.astype(x.dtype)
        return out.reshape(b, h2, w2, c4)


class ResBlock(nn.Module):
    """Residual block with dual attention (parity: block.py:127-141)."""

    features: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv1 = BasicConv(self.features, self.kernel_size, relu=True,
                               in_features=self.features, dtype=self.dtype)
        self.conv2 = BasicConv(self.features, self.kernel_size, relu=False,
                               in_features=self.features, dtype=self.dtype)
        self.se = SEBlock(self.features, dtype=self.dtype)
        self.te = TripletAttention(dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        x1 = self.conv2(self.conv1(x, train=train), train=train)
        x2 = self.te(x1, train=train)
        x3 = self.se(x1) + x2
        return x3 + x

    def call_fast(self, x, train: bool = False, s2d: bool = False):
        """TPU inference path via the Pallas shifted-matmul conv. With
        s2d=True, `x` is the space-to-depth form [B, H/2, W/2, 4C] and the
        convs run with s2d-transformed kernels (same parameters, same math,
        4x MXU lane utilization for C < 128)."""
        from speinet_tpu.ops.pallas_conv import conv2d_mxu

        k1, b1 = self.conv1.params()
        k2, b2 = self.conv2.params()
        if s2d:
            from speinet_tpu.ops.s2d import s2d_bias

            k1, k2 = s2d_kernel(k1), s2d_kernel(k2)
            b1, b2 = s2d_bias(b1), s2d_bias(b2)
        dt = self.dtype
        x1 = conv2d_mxu(x.astype(dt), k1.astype(dt), b1, relu=True)
        x1 = conv2d_mxu(x1, k2.astype(dt), b2, relu=False)
        if s2d:
            x2 = self.te.call_s2d(x1, train=train)
            x3 = self.se.call_s2d(x1) + x2
        else:
            x2 = self.te(x1, train=train)
            x3 = self.se(x1) + x2
        return x3 + x
