"""SPEINet: sharp-prior + edge-information video deblurring assembly.

Parity target: model/speinet.py. Input x: [B, 5, 3, H, W] float in
[0, rgb_range] — frames [t-1, t, t+1, pre-sharp, sub-sharp] (the dataset
appends the nearest preceding/following sharp frames, videodata_nfs.py:237-238,
zeroing the pre-sharp frame when >7 frames away, :254-255). Output:
[B, 3, H, W] restored center frame.

TPU-first redesign of the reference's data-dependent batch routing
(speinet.py:150-168): instead of host-side batch splitting into
`_forwardb` / `_forwardbs` programs, one jitted program computes the shared
trunk (encoders, RL edge branch, cross-frame Swin fusion) once per sample,
runs ONE correlation pass whose reference patches are selected per sample
(sharp frame when present, rotated self otherwise), and `where`-selects
between the two cheap texture-transfer paths. The routing flag replicates
the reference quirk of testing only frame[3] for all-zero (speinet.py:70-73,
151) while the sharp *reference* consumed is frame[4] (speinet.py:124).

All seven encoder legs (sharp pyramid, mid, RL(mid), neighbors, RL(n))
run as ONE batched pass, and both neighbor fusion passes as one batched
swin call — identical eval numerics, ~7x fewer traced encoder graphs.
(Train-mode BatchNorm statistics are computed over the stacked batch
rather than per-call as the reference does — a deliberate deviation that
only affects BN batch statistics during training.)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from speinet_tpu.config import Config
from speinet_tpu.models.recons_video import ReconsVideo
from speinet_tpu.models.swinir import SwinIRCross
from speinet_tpu.models.search_transfer import TransferUnit
from speinet_tpu.ops.filters import box_kernel, richardson_lucy
from speinet_tpu.ops.resize import bicubic_upsample_nhwc

Dtype = Any


def _up2(x_nhwc: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bicubic upsample on NHWC (torch F.interpolate parity); taps run
    as shifted slices over H/W with the channel axis fixed — no
    NCHW relayouts (f32 tap accumulation inside)."""
    return bicubic_upsample_nhwc(x_nhwc, scale)


class SPEINet(nn.Module):
    """Parity: model/speinet.py:28-168."""

    n_sequence: int = 3
    n_feat: int = 32
    n_resblock: int = 3
    out_channels: int = 3
    embed_dim: int = 256
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (8, 8, 8, 8, 8, 8)
    window_size: int = 5
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
    corr_chunk: int = 2048
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg: Config) -> "SPEINet":
        return cls(
            n_sequence=cfg.n_sequence, n_feat=cfg.n_feat,
            n_resblock=cfg.n_resblock, out_channels=cfg.n_colors,
            embed_dim=cfg.embed_dim, depths=tuple(cfg.depths),
            num_heads=tuple(cfg.num_heads), window_size=cfg.window_size,
            mlp_ratio=cfg.mlp_ratio, drop_path_rate=cfg.drop_path_rate,
            dtype=jnp.dtype(cfg.compute_dtype),
        )

    def setup(self):
        f, d = self.n_feat, self.dtype
        self.swin = SwinIRCross(embed_dim=self.embed_dim, depths=self.depths,
                                num_heads=self.num_heads,
                                window_size=self.window_size,
                                mlp_ratio=self.mlp_ratio,
                                drop_path_rate=self.drop_path_rate, dtype=d)
        self.recons_net = ReconsVideo(n_feat=f, n_resblock=self.n_resblock,
                                      out_channels=self.out_channels, dtype=d)
        self.transfer = TransferUnit(n_feat=f, chunk=self.corr_chunk, dtype=d)
        # fusion / refinement convs (speinet.py:55-66); torch-default
        # kernel init (see blocks.torch_kernel_init)
        from speinet_tpu.models.blocks import FastConv
        from speinet_tpu.models.blocks import torch_bias_init
        from speinet_tpu.models.blocks import torch_kernel_init as tki
        # kernel AND bias get torch-default init (U(+-1/sqrt(k*k*in_ch)));
        # the in_ch is passed explicitly because flax bias initializers
        # cannot see fan-in (round-3 head-to-head flagged zero-bias init as
        # the one documented deviation on these layers)
        conv = lambda feats, k, fin: nn.Conv(
            feats, (k, k), padding=k // 2, kernel_init=tki,
            bias_init=torch_bias_init(k * k * fin), dtype=d)
        n_nb = max(self.n_sequence - 1, 0)
        self.conv_lv1 = conv(f, 1, f * 2)
        self.conv_lv2 = conv(f * 2, 1, f * 4)
        self.conv_lv3 = conv(f * 4, 1, f * 8)
        self.fusion = conv(f * 4, 1, f * 4 * (1 + n_nb))
        # the 3x3 refinement convs run at 32/64 channels on 720p/360p maps —
        # FastConv (same param tree) routes them through the Pallas
        # shifted-matmul kernel with the ReLU fused at inference
        self.search3 = FastConv(f * 2, 3, dtype=d)
        self.search2 = conv(f * 2, 1, f * 4)
        self.search1 = conv(f * 2, 1, f * 4)
        self.search43 = FastConv(f, 3, dtype=d)
        self.search33 = FastConv(f, 3, dtype=d)
        self.search23 = conv(f, 1, f * 2)   # defined, unused (parity)
        self.search13 = conv(f, 1, f * 2)

    def _fuse(self, f_mid, neighbor_feats, deterministic):
        """Cross-frame Swin fusion (parity: speinet.py:75-90). All neighbor
        passes run as one batched swin call — same weights and same K/V
        stream f_mid, so numerics are identical to per-neighbor calls."""
        if not neighbor_feats:   # n_sequence == 1 (speinet.py:87-89)
            return f_mid + self.swin(f_mid, f_mid, deterministic=deterministic)
        b = f_mid.shape[0]
        x_in = jnp.concatenate([f_mid] * len(neighbor_feats), axis=0)
        y_in = jnp.concatenate(neighbor_feats, axis=0)
        f_trans = self.swin(x_in, y_in, deterministic=deterministic)
        parts = [f_mid] + [f_trans[k * b : (k + 1) * b]
                           for k in range(len(neighbor_feats))]
        return jnp.concatenate(parts, axis=-1)

    def _decode(self, f_fusion, weight_s, sharp_lv3, sharp_lv2, sharp_lv1, train):
        """Three-level decoder with S-weighted texture injection and
        multi-scale cross refinement (parity: speinet.py:92-120)."""
        r = self.recons_net
        sharp_v3 = self.conv_lv3(jnp.concatenate([f_fusion, sharp_lv3], -1)) * weight_s
        f_lv3 = f_fusion + sharp_v3
        decoder_v2 = r.decoder_second(f_lv3, train=train)
        w2 = _up2(weight_s, 2).astype(decoder_v2.dtype)
        f_v2 = self.conv_lv2(jnp.concatenate([decoder_v2, sharp_lv2], -1)) * w2
        f_lv2 = decoder_v2 + f_v2

        search_1 = _up2(f_lv3, 2).astype(f_lv3.dtype)
        search_1 = nn.relu(self.search1(search_1))
        search_2 = self.search3(f_lv2, relu=True, train=train)
        search_11 = nn.relu(self.search2(jnp.concatenate([decoder_v2, search_1], -1)))
        search_22 = nn.relu(self.search2(jnp.concatenate([f_lv2, search_2], -1)))
        f_v3 = decoder_v2 + search_11
        f_lv2 = f_lv2 + search_22

        decoder_v1 = r.decoder_first(f_lv2, train=train)
        w4 = _up2(weight_s, 4).astype(decoder_v1.dtype)
        f_v1 = self.conv_lv1(jnp.concatenate([decoder_v1, sharp_lv1], -1)) * w4
        f_lv1 = decoder_v1 + f_v1

        search_13 = nn.relu(self.search13(_up2(f_v3, 2).astype(f_v3.dtype)))
        search_23 = self.search33(_up2(f_lv2, 2).astype(f_lv2.dtype),
                                  relu=True, train=train)
        search_33 = self.search43(f_lv1, relu=True, train=train)
        search_113 = self.search33(jnp.concatenate([search_13, search_23], -1),
                                   relu=True, train=train)
        search_223 = self.search33(jnp.concatenate([search_13, search_33], -1),
                                   relu=True, train=train)
        search_323 = self.search33(jnp.concatenate([search_23, search_33], -1),
                                   relu=True, train=train)
        f_lv1 = f_lv1 + search_113 + search_223 + search_323
        return r.out_block(f_lv1, train=train)

    # ---- cached-video inference API (beyond-reference) -------------------
    # The reference re-encodes every frame once per sliding window (7
    # encoder legs/window, inference_SPEINet.py:393); in a stride-1 video
    # each frame participates in ~3 windows, so per-frame features are
    # reusable. These methods split __call__ into per-frame encoding and
    # from-features restoration with identical eval-mode numerics (the
    # encoder is a per-sample map outside of train-mode BatchNorm).

    def encode_window_legs(self, frames, train: bool = False):
        """frames: [F, 3, H, W] in [0, rgb_range] -> (M, N) lv3 features:
        M = enc(f) + enc(RL5(f))   (center leg, speinet.py:128-132)
        N = enc(f) + enc(RL1(f))   (neighbor leg, speinet.py:75-83)."""
        nhwc = frames.transpose(0, 2, 3, 1).astype(self.dtype)
        kernel = box_kernel(5, dtype=jnp.float32)
        f32 = frames.astype(jnp.float32)
        rl1 = richardson_lucy(f32, kernel, 1, 0.01, box_size=5)
        rl5 = richardson_lucy(f32, kernel, 5, 0.01, box_size=5)
        stack = jnp.concatenate(
            [nhwc, rl1.transpose(0, 2, 3, 1).astype(self.dtype),
             rl5.transpose(0, 2, 3, 1).astype(self.dtype)], axis=0)
        _, _, lv3 = self.recons_net.encode_pyramid(stack, train=train)
        n = frames.shape[0]
        e, e1, e5 = lv3[:n], lv3[n : 2 * n], lv3[2 * n :]
        return e + e5, e + e1

    def anchor_pyramid(self, frames, train: bool = False):
        """Sharp-anchor pyramid (speinet.py:125-127): [F, 3, H, W] ->
        (lv1, lv2, lv3) NHWC features."""
        nhwc = frames.transpose(0, 2, 3, 1).astype(self.dtype)
        return self.recons_net.encode_pyramid(nhwc, train=train)

    def restore_from_features(self, f_mid, neighbor_feats, sharp_lv1,
                              sharp_lv2, sharp_lv3, has_sharp,
                              train: bool = False, routing: str = "mixed"):
        """Fusion + transfer + decode from precomputed features; the tail
        of __call__ after the encoder legs. `routing` is the static
        host-known specialization of the batch's sharp/self split (see
        TransferUnit.__call__); 'mixed' handles any batch."""
        deterministic = not train
        f_fusion = self._fuse(f_mid, list(neighbor_feats), deterministic)
        f_fusion = self.fusion(f_fusion)
        weight_s, t_lv3, t_lv2, t_lv1 = self.transfer(
            f_fusion, sharp_lv1, sharp_lv2, sharp_lv3, has_sharp,
            routing=routing)
        out = self._decode(f_fusion, weight_s.astype(self.dtype), t_lv3,
                           t_lv2, t_lv1, train)
        return out.transpose(0, 3, 1, 2).astype(jnp.float32)

    def __call__(self, x, train: bool = False):
        """x: [B, 5, 3, H, W] -> [B, 3, H, W]."""
        deterministic = not train
        b = x.shape[0]
        # routing flag: frame[3] (pre-sharp) all-zero => self-transfer branch
        # (parity incl. quirk: speinet.py:70-73,151 tests only frame[3])
        has_sharp = ~jnp.all(x[:, 3] == 0, axis=(1, 2, 3))

        nhwc = x.transpose(0, 1, 3, 4, 2)  # [B, 5, H, W, 3]
        frame_list = [nhwc[:, i].astype(self.dtype) for i in range(self.n_sequence)]
        sharp_frame = nhwc[:, self.n_sequence + 1].astype(self.dtype)
        mid_i = self.n_sequence // 2
        neighbors = [i for i in range(self.n_sequence) if i != mid_i]

        # RL edge branches (speinet.py:128-129 mid x5; :81 neighbors x1),
        # neighbors batched into one call
        kernel = box_kernel(5, dtype=jnp.float32)
        mid = frame_list[mid_i]
        deb_mid = richardson_lucy(mid.transpose(0, 3, 1, 2).astype(jnp.float32),
                                  kernel, 5, 0.01,
                                  box_size=5).transpose(0, 2, 3, 1)
        deb_nb = []
        if neighbors:
            nb_stack = jnp.concatenate([frame_list[i] for i in neighbors], axis=0)
            deb_all = richardson_lucy(
                nb_stack.transpose(0, 3, 1, 2).astype(jnp.float32),
                kernel, 1, 0.01, box_size=5).transpose(0, 2, 3, 1)
            b = mid.shape[0]
            deb_nb = [deb_all[k * b : (k + 1) * b] for k in range(len(neighbors))]

        # ALL encoder legs in one batched pass (sharp pyramid + mid + RL(mid)
        # + each neighbor + RL(neighbor)); the reference runs 7 separate
        # encoder passes (speinet.py:82-83,125-131)
        r = self.recons_net
        b = mid.shape[0]
        stack = [sharp_frame, mid, deb_mid.astype(self.dtype)]
        for k, i in enumerate(neighbors):
            stack.append(frame_list[i])
            stack.append(deb_nb[k].astype(self.dtype))
        enc_in = jnp.concatenate(stack, axis=0)
        # one batched pyramid pass; on TPU inference this runs the lv1/lv2
        # stages in space-to-depth layout through the Pallas conv kernel
        lv1_all, lv2_all, lv3_all = r.encode_pyramid(enc_in, train=train)
        sharp_lv1 = lv1_all[:b]
        sharp_lv2 = lv2_all[:b]
        sharp_lv3 = lv3_all[:b]
        f_mid = lv3_all[b : 2 * b] + lv3_all[2 * b : 3 * b]
        neighbor_feats = [lv3_all[(3 + 2 * k) * b : (4 + 2 * k) * b]
                          + lv3_all[(4 + 2 * k) * b : (5 + 2 * k) * b]
                          for k in range(len(neighbors))]

        f_fusion = self._fuse(f_mid, neighbor_feats, deterministic)
        f_fusion = self.fusion(f_fusion)

        weight_s, t_lv3, t_lv2, t_lv1 = self.transfer(
            f_fusion, sharp_lv1, sharp_lv2, sharp_lv3, has_sharp)

        out = self._decode(f_fusion, weight_s.astype(self.dtype), t_lv3, t_lv2,
                           t_lv1, train)
        return out.transpose(0, 3, 1, 2).astype(jnp.float32)  # [B, 3, H, W]
