"""Adversarial (GAN) loss plugin (the reference's dangling `loss.adversarial`).

Parity of intent: /root/reference/Loss/__init__.py:34-36,46-47 dispatches
any loss type containing "GAN" to `loss/adversarial.py` (missing in the
reference repo — SURVEY.md §2.3) and appends a 'DIS' log column for the
discriminator. The EDSR-lineage implementation it points at trains a conv
discriminator inside the loss object and returns the generator's
adversarial loss.

TPU-native design: the discriminator is a small norm-free conv net (flax),
its params + Adam state live in an explicit `gan` pytree threaded through
the jitted train step (TrainState.gan) — no hidden module state, so the
whole generator+discriminator update remains ONE compiled SPMD program.
Losses are the non-saturating BCE pair:

    L_G   = BCE(D(out), 1)
    L_DIS = BCE(D(gt), 1) + BCE(D(out.stop_grad), 0)

Inputs are NCHW in [0, rgb_range], normalized to [-1, 1] for D.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class Discriminator(nn.Module):
    """Norm-free patch discriminator: stride-2 conv pyramid + global mean
    logit. Works at any input size (the trainer's patch or eval frames)."""

    features: Tuple[int, ...] = (64, 128, 256)

    @nn.compact
    def __call__(self, x):                      # [B, H, W, 3] in [-1, 1]
        for f in self.features:
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding=1)(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(f, (3, 3), padding=1)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (3, 3), padding=1)(x)    # patch logits
        return jnp.mean(x, axis=(1, 2, 3))      # [B]


def _prep(x_nchw: jnp.ndarray, rgb_range: float) -> jnp.ndarray:
    return (x_nchw.transpose(0, 2, 3, 1).astype(jnp.float32)
            / rgb_range) * 2.0 - 1.0


def _bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    # mean BCE-with-logits against a constant target (0 or 1)
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * target
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


# lr-free Adam (scale_by_adam + sign flip): the current learning rate is
# applied per-step from TrainState.lr, so the discriminator follows the
# SAME config lr + StepLR decay schedule as the generator (the reference
# persists its loss-module optimizer alongside the model's,
# Loss/__init__.py:126-128, and both ride args.lr).
_DIS_TX = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))


def init_gan_state(rng: jax.Array, sample_nchw_shape,
                   rgb_range: float = 255.0) -> Dict[str, Any]:
    """{'params', 'opt'} pytree for TrainState.gan."""
    dis = Discriminator()
    b, c, h, w = sample_nchw_shape
    params = dis.init(rng, jnp.zeros((1, h, w, c), jnp.float32))["params"]
    return {"params": params, "opt": _DIS_TX.init(params)}


def generator_loss(gan: Dict[str, Any], out: jnp.ndarray,
                   rgb_range: float = 255.0) -> jnp.ndarray:
    """BCE(D(out), 1) with D's params frozen (they only update in
    discriminator_step)."""
    logits = Discriminator().apply(
        {"params": jax.lax.stop_gradient(gan["params"])},
        _prep(out, rgb_range))
    return _bce_logits(logits, 1.0)


def discriminator_step(gan: Dict[str, Any], out: jnp.ndarray,
                       gt: jnp.ndarray, rgb_range: float = 255.0,
                       lr: jnp.ndarray | float = 1e-4
                       ) -> Tuple[Dict[str, Any], jnp.ndarray]:
    """One Adam update of D on (gt -> 1, out.stop_grad -> 0) at rate `lr`
    (the trainer passes TrainState.lr so D shares the config schedule)."""
    dis = Discriminator()
    fake = jax.lax.stop_gradient(_prep(out, rgb_range))
    real = _prep(gt, rgb_range)

    def dis_loss(params):
        v = {"params": params}
        return (_bce_logits(dis.apply(v, real), 1.0)
                + _bce_logits(dis.apply(v, fake), 0.0))

    loss, grads = jax.value_and_grad(dis_loss)(gan["params"])
    updates, new_opt = _DIS_TX.update(grads, gan["opt"], gan["params"])
    updates = jax.tree.map(lambda u: u * lr, updates)
    new_params = optax.apply_updates(gan["params"], updates)
    return {"params": new_params, "opt": new_opt}, loss
