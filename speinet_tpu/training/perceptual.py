"""VGG-style perceptual loss plugin (the reference's dangling `loss.vgg`).

Parity of intent: /root/reference/Loss/__init__.py:31-33 dispatches any
loss type containing "VGG" to `loss/vgg.py` — a module that does NOT exist
in the reference repo (SURVEY.md §2.3 lists it as a dangling import). The
conventional implementation it points at (EDSR/RCAN lineage) extracts
torchvision-VGG19 features up to relu2_2 ("22") or relu5_4 ("54") and
takes the MSE between the features of the output and the ground truth.

This TPU-native version reproduces that contract as a pure jittable
function over NCHW [0, rgb_range] tensors:

- feature extractor: the VGG19 conv topology (3x3 convs + 2x2 max pools,
  channel plan 64-64 / 128-128 / 256x4 / 512x4 / 512x4) up to the layer
  the spec names (VGG22 / VGG54, default 22).
- weights: loaded from `SPEINET_VGG_WEIGHTS` (an .npz of HWIO conv kernels
  named conv0, conv1, ... — e.g. converted torchvision weights) when set;
  otherwise a DETERMINISTIC He-initialized random bank (seed 0). Random
  VGG-topology features are a documented perceptual proxy (Ulyanov et al.,
  "Deep Image Prior"-style random nets carry usable image statistics) and
  keep the plugin dependency-free in this zero-egress environment.
- preprocessing: [0, rgb_range] -> [0, 1] -> ImageNet mean/std, matching
  torchvision's expected input distribution.

Everything is computed in f32 NHWC internally; weights are module-level
cached constants so repeated jit traces share them.
"""

from __future__ import annotations

import functools
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG19 feature plan: (out_channels, n_convs) per stage; a 2x2/2 max pool
# follows each stage. relu{s}_{c} = stage s (1-based), conv c within stage.
_VGG19_PLAN: Tuple[Tuple[int, int], ...] = (
    (64, 2), (128, 2), (256, 4), (512, 4), (512, 4))

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _layers_upto(conv_index: str) -> List[Tuple[int, int, bool]]:
    """[(in_ch, out_ch, pool_after), ...] for the convs up to relu{s}_{c}."""
    stage, last = int(conv_index[0]), int(conv_index[1])
    layers = []
    in_ch = 3
    for si, (ch, n_convs) in enumerate(_VGG19_PLAN[:stage], start=1):
        n = last if si == stage else n_convs
        for ci in range(1, n + 1):
            pool = si < stage and ci == n_convs
            layers.append((in_ch, ch, pool))
            in_ch = ch
    return layers


@functools.lru_cache(maxsize=4)
def _weights(conv_index: str) -> Tuple[Tuple[np.ndarray, np.ndarray], ...]:
    """((kernel HWIO, bias), ...) — from SPEINET_VGG_WEIGHTS or seeded He."""
    layers = _layers_upto(conv_index)
    path = os.environ.get("SPEINET_VGG_WEIGHTS", "")
    if path:
        data = np.load(path)
        out = []
        for i, (cin, cout, _) in enumerate(layers):
            k = np.asarray(data[f"conv{i}"], np.float32)
            assert k.shape == (3, 3, cin, cout), (i, k.shape)
            b = np.asarray(data.get(f"bias{i}", np.zeros(cout)), np.float32)
            out.append((k, b))
        return tuple(out)
    rng = np.random.default_rng(0)
    out = []
    for cin, cout, _ in layers:
        std = float(np.sqrt(2.0 / (9 * cin)))
        out.append((rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                    * std, np.zeros(cout, np.float32)))
    return tuple(out)


def vgg_features(x_nchw: jnp.ndarray, conv_index: str = "22",
                 rgb_range: float = 255.0) -> jnp.ndarray:
    """Features at relu{conv_index} of the (fixed-weight) VGG19 topology.
    x: [B, 3, H, W] in [0, rgb_range]. Returns NHWC feature map."""
    x = x_nchw.transpose(0, 2, 3, 1).astype(jnp.float32) / rgb_range
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    for (k, b), (_, _, pool) in zip(_weights(conv_index),
                                    _layers_upto(conv_index)):
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b)
        x = jax.nn.relu(x)
        if pool:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return x


def vgg_loss(out: jnp.ndarray, gt: jnp.ndarray, conv_index: str = "22",
             rgb_range: float = 255.0) -> jnp.ndarray:
    """MSE in VGG feature space (gt features are stop-gradient)."""
    f_out = vgg_features(out, conv_index, rgb_range)
    f_gt = jax.lax.stop_gradient(vgg_features(gt, conv_index, rgb_range))
    return jnp.mean((f_out - f_gt) ** 2)
