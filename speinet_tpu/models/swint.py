"""SWINT ablation model (parity: model/swint.py).

Same hourglass + cross-frame Swin fusion as SPEINet but without the
sharp-frame path, RL edge branch, or search/transfer attention. Takes
only the 3 frame window: x [B, n_sequence, 3, H, W] -> [B, 3, H, W].
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from speinet_tpu.config import Config
from speinet_tpu.models.recons_video import ReconsVideo
from speinet_tpu.models.swinir import SwinIRCross

Dtype = Any


class SWINT(nn.Module):
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
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg: Config) -> "SWINT":
        return cls(
            n_sequence=cfg.n_sequence, n_feat=cfg.n_feat,
            n_resblock=cfg.n_resblock, out_channels=cfg.n_colors,
            embed_dim=cfg.embed_dim, depths=tuple(cfg.depths),
            num_heads=tuple(cfg.num_heads), window_size=cfg.window_size,
            mlp_ratio=cfg.mlp_ratio, drop_path_rate=cfg.drop_path_rate,
            dtype=jnp.dtype(cfg.compute_dtype),
        )

    def setup(self):
        self.swin = SwinIRCross(embed_dim=self.embed_dim, depths=self.depths,
                                num_heads=self.num_heads,
                                window_size=self.window_size,
                                mlp_ratio=self.mlp_ratio,
                                drop_path_rate=self.drop_path_rate,
                                dtype=self.dtype)
        self.recons_net = ReconsVideo(n_feat=self.n_feat,
                                      n_resblock=self.n_resblock,
                                      out_channels=self.out_channels,
                                      dtype=self.dtype)
        from speinet_tpu.models.blocks import torch_bias_init, torch_kernel_init
        self.conv = nn.Conv(self.n_feat * 4, (1, 1),
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(
                                self.n_feat * 4 * max(self.n_sequence, 1)),
                            dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        deterministic = not train
        nhwc = x.transpose(0, 1, 3, 4, 2)
        frame_list = [nhwc[:, i].astype(self.dtype) for i in range(self.n_sequence)]
        r = self.recons_net
        f_mid = r.encode3(frame_list[self.n_sequence // 2], train=train)
        neighbors = [i for i in range(self.n_sequence) if i != self.n_sequence // 2]
        if not neighbors:
            f_fusion = f_mid + self.swin(f_mid, f_mid, deterministic=deterministic)
        else:
            feats = [r.encode3(frame_list[i], train=train) for i in neighbors]
            b = f_mid.shape[0]
            x_in = jnp.concatenate([f_mid] * len(neighbors), axis=0)
            y_in = jnp.concatenate(feats, axis=0)
            f_trans = self.swin(x_in, y_in, deterministic=deterministic)
            f_fusion = jnp.concatenate(
                [f_mid] + [f_trans[k * b : (k + 1) * b] for k in range(len(neighbors))],
                axis=-1)
        f_fusion = self.conv(f_fusion)
        out = r.out_block(r.decoder_first(r.decoder_second(f_fusion, train), train), train)
        return out.transpose(0, 3, 1, 2).astype(jnp.float32)
