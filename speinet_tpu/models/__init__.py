"""Model registry: name-based construction (parity: model/__init__.py:17-18).

The reference dynamically imports `model.<name>` and calls `make_model(args)`;
here names map to flax module factories.
"""

from __future__ import annotations

from speinet_tpu.config import Config


def make_model(cfg: Config):
    name = cfg.model.lower()
    if name == "speinet":
        from speinet_tpu.models.speinet import SPEINet

        return SPEINet.from_config(cfg)
    if name == "swint":
        from speinet_tpu.models.swint import SWINT

        return SWINT.from_config(cfg)
    if name == "recons_video":
        from speinet_tpu.models.recons_video import ReconsVideo

        return ReconsVideo(n_feat=cfg.n_feat, n_resblock=cfg.n_resblock,
                           out_channels=cfg.n_colors)
    raise NotImplementedError(f"Model [{cfg.model}] is not found")
