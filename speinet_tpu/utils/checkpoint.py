"""Orbax checkpointing with the reference's latest/best/epoch semantics.

Parity: model/__init__.py:43-84 (model_latest / model_best /
model_{epoch} + optimizer.pt) and log/log.py:55-61. One orbax checkpoint
holds {params, batch_stats, opt_state, step, lr} so resume restores the
optimizer exactly (the reference stores optimizer.pt separately).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, model_dir: str, save_middle: bool = False):
        self.model_dir = os.path.abspath(model_dir)
        self.save_middle = save_middle
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.model_dir, name)

    def save(self, state: Any, epoch: int, is_best: bool = False):
        tree = {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats, "opt_state": state.opt_state,
                "lr": state.lr}
        # loss-plugin (GAN discriminator) state rides the same checkpoint —
        # the reference persists its loss module incl. the discriminator's
        # optimizer in loss.pt (Loss/__init__.py:126-128)
        if getattr(state, "gan", None) is not None:
            tree["gan"] = state.gan
        tree = jax.tree.map(np.asarray, jax.device_get(tree))
        self._ckptr.save(self._path("model_latest"), tree, force=True)
        if is_best:
            self._ckptr.save(self._path("model_best"), tree, force=True)
        if self.save_middle:
            self._ckptr.save(self._path(f"model_{epoch}"), tree, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, state: Any, which: str = "model_latest") -> Optional[Any]:
        """Restore into the structure of `state`; None if absent."""
        path = self._path(which)
        if not os.path.exists(path):
            return None
        tree = {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats, "opt_state": state.opt_state,
                "lr": state.lr}
        has_gan = getattr(state, "gan", None) is not None
        if has_gan:
            tree["gan"] = state.gan
        try:
            restored = self._ckptr.restore(path, tree)
        except BaseException:
            if not has_gan:
                raise
            # pre-round-5 checkpoint without a gan subtree: restore the rest
            # and keep the freshly-initialized discriminator
            del tree["gan"]
            restored = self._ckptr.restore(path, tree)
        return state.replace(step=restored["step"], params=restored["params"],
                             batch_stats=restored["batch_stats"],
                             opt_state=restored["opt_state"], lr=restored["lr"],
                             gan=restored.get("gan", getattr(state, "gan", None)))

    def restore_params(self, like_params: Any, which: str = "model_best"):
        """Params-only restore (the reference's pre_train / test_only load,
        model/__init__.py:61-84)."""
        path = self._path(which)
        if not os.path.exists(path):
            return None
        tree = self._ckptr.restore(path)
        return tree["params"]
