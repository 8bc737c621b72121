"""Convert torchvision VGG19 weights to the SPEINET_VGG_WEIGHTS npz format.

The VGG perceptual-loss plugin (speinet_tpu/training/perceptual.py) loads
real VGG19 features from an .npz of HWIO conv kernels named conv0..convN
(+ bias0..biasN) when SPEINET_VGG_WEIGHTS points at it; otherwise it uses
a deterministic random bank. This script produces that npz from a
torchvision checkpoint — run it OUTSIDE this zero-egress environment
(anywhere torchvision can download weights), then ship the npz.

Usage:
    python scripts/convert_vgg.py vgg19.npz            # downloads via torchvision
    python scripts/convert_vgg.py vgg19.npz --state-dict path/to/vgg19.pth

Layout notes: torchvision VGG19 `features` is a Sequential of
Conv2d/ReLU/MaxPool2d; the k-th Conv2d (in order) becomes conv{k}. Torch
kernels are OIHW; the plugin expects HWIO, so we transpose (2, 3, 1, 0).
The plugin slices the bank to the convs its spec needs (VGG22 -> 4 convs,
VGG54 -> 16), so converting the full 16-conv feature stack serves both.
"""

import argparse
import sys

import numpy as np


def convert(state_dict) -> dict:
    """torch state_dict (features.N.weight/bias) -> {convI, biasI} arrays."""
    arrays = {}
    # torchvision keys: features.0.weight, features.2.weight, ... — sort by
    # the integer layer index to get conv order
    conv_ids = sorted(
        {int(k.split(".")[1]) for k in state_dict
         if k.startswith("features.") and k.endswith(".weight")})
    for i, lid in enumerate(conv_ids):
        w = np.asarray(state_dict[f"features.{lid}.weight"], np.float32)
        b = np.asarray(state_dict[f"features.{lid}.bias"], np.float32)
        assert w.ndim == 4 and w.shape[2] == w.shape[3] == 3, (lid, w.shape)
        arrays[f"conv{i}"] = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        arrays[f"bias{i}"] = b
    return arrays


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", help="output .npz path")
    p.add_argument("--state-dict", default=None,
                   help="path to a saved VGG19 state_dict (skips download)")
    args = p.parse_args()

    import torch

    if args.state_dict:
        sd = torch.load(args.state_dict, map_location="cpu")
    else:
        from torchvision.models import vgg19

        sd = vgg19(weights="IMAGENET1K_V1").state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    arrays = convert(sd)
    np.savez(args.out, **arrays)
    print(f"wrote {args.out}: {len(arrays) // 2} convs "
          f"({', '.join(sorted(k for k in arrays if k.startswith('conv')))})")


if __name__ == "__main__":
    main()
