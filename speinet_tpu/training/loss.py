"""Loss system: spec-string parser + L1 / MSE / HEM, fully on device.

Parity: Loss/__init__.py (the '1*L1+2*HEM' weighted-sum spec parser,
:23-47) and Loss/hard_example_mining.py (HEM). The reference computes the
HEM mask on host NumPy inside `no_grad` — a device->host sync every
training step (hard_example_mining.py:14-40); here the mask (per-sample
top-50% residual threshold + exactly-10% random mask) is computed with
jnp.sort / PRNG on device, fused into the step.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def parse_loss_spec(spec: str) -> List[Tuple[float, str]]:
    """'1*L1+2*HEM' -> [(1.0, 'L1'), (2.0, 'HEM')] (Loss/__init__.py:23-26)."""
    out = []
    for part in spec.split("+"):
        weight, name = part.split("*")
        out.append((float(weight), name))
    return out


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def mse_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def hem_mask(x: jnp.ndarray, y: jnp.ndarray, rng: jax.Array,
             hard_p: float = 0.5, random_p: float = 0.1) -> jnp.ndarray:
    """Hard-example-mining mask (parity: hard_example_mining.py:14-40).

    x, y: [B, C, H, W]. Returns [B, 1, H, W] float mask: union of
    (per-sample residual > k-th largest residual, k = int(hard_p*H*W))
    and an exactly-int(random_p*H*W)-element random mask.
    """
    b, c, h, w = x.shape
    res = jnp.sum(jnp.abs(x - y), axis=1)            # [B, H, W]
    res_flat = res.reshape(b, h * w)
    k_hard = int(hard_p * h * w)
    sorted_desc = -jnp.sort(-res_flat, axis=1)
    thre = sorted_desc[:, k_hard]                     # reference indexes [k]
    hard = res_flat > thre[:, None]

    k_rand = int(random_p * h * w)
    u = jax.random.uniform(rng, (b, h * w))
    u_sorted = -jnp.sort(-u, axis=1)
    rand = u > u_sorted[:, k_rand][:, None]           # exactly k_rand ones a.s.

    mask = (hard | rand).astype(x.dtype)
    return mask.reshape(b, 1, h, w)


def hem_loss(x: jnp.ndarray, y: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """L1 over mask-weighted tensors, mean over ALL elements
    (parity: hard_example_mining.py:42-47 — nn.L1Loss on x*mask, y*mask)."""
    mask = jax.lax.stop_gradient(hem_mask(jax.lax.stop_gradient(x),
                                          jax.lax.stop_gradient(y), rng))
    return jnp.mean(jnp.abs(x * mask - y * mask))


class LossComputer:
    """Weighted multi-loss with per-component logging.

    total, components = computer(out, gt, rng) — `components` maps loss
    name -> weighted scalar (plus 'Total' when >1 component, matching the
    reference's log columns, Loss/__init__.py:48-49,69-84).

    Plugin branches (Loss/__init__.py:31-36): any name containing 'VGG'
    dispatches to the perceptual plugin (training/perceptual.py), any name
    containing 'GAN' to the adversarial plugin (training/adversarial.py).
    GAN specs add a 'DIS' log column (the discriminator's own loss,
    Loss/__init__.py:46-47) and require the discriminator state pytree to
    be passed as `gan=` (TrainState.gan — see make_train_step /
    create_train_state); its update happens in the train step via
    adversarial.discriminator_step.
    """

    def __init__(self, spec: str, rgb_range: float = 255.0):
        self.spec = parse_loss_spec(spec)
        self.rgb_range = rgb_range
        self.has_gan = any("GAN" in name for _, name in self.spec)
        self.names = [name for _, name in self.spec]
        if self.has_gan:
            self.names = self.names + ["DIS"]
        if len(self.spec) > 1:
            self.names = self.names + ["Total"]

    def __call__(self, out: jnp.ndarray, gt: jnp.ndarray, rng: jax.Array,
                 gan=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        comps: Dict[str, jnp.ndarray] = {}
        total = 0.0
        for weight, name in self.spec:
            if name == "L1":
                val = l1_loss(out, gt)
            elif name == "MSE":
                val = mse_loss(out, gt)
            elif name == "HEM":
                val = hem_loss(out, gt, rng)
            elif "VGG" in name:
                from speinet_tpu.training.perceptual import vgg_loss

                digits = "".join(ch for ch in name if ch.isdigit()) or "22"
                val = vgg_loss(out, gt, conv_index=digits,
                               rgb_range=self.rgb_range)
            elif "GAN" in name:
                from speinet_tpu.training.adversarial import generator_loss

                if gan is None:
                    raise ValueError(
                        f"loss spec '{name}' needs the discriminator state: "
                        "pass gan= (create_train_state builds it)")
                val = generator_loss(gan, out, rgb_range=self.rgb_range)
            else:
                raise NotImplementedError(f"Loss type [{name}] is not found")
            eff = weight * val
            comps[name] = eff
            total = total + eff
        if len(self.spec) > 1:
            comps["Total"] = total
        return total, comps
