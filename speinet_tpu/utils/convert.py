"""PyTorch SPEINet checkpoint -> speinet_tpu params converter.

Maps the reference's `state_dict` (model/speinet.py module tree, possibly
with a DataParallel 'module.' prefix) onto this framework's flax param
tree. Layout conventions:
    torch Conv2d weight   [O, I, kh, kw]  -> flax Conv kernel [kh, kw, I, O]
    torch ConvTranspose2d [I, O, kh, kw]  -> ConvTransposeTorch kernel
                                             [kh, kw, O, I]
    torch Linear weight   [O, I]          -> flax Dense kernel [I, O]
    torch BatchNorm2d     weight/bias/running_mean/running_var
                                          -> scale/bias + batch_stats
    LayerNorm             weight/bias     -> scale/bias

Swin blocks: the reference names blocks
`swin.layers.{L}.residual_group.blocks.{i}.*`; this framework scans
W/SW block *pairs*, so block i maps to `swin/layer{L}/pairs/block_{w|sw}`
with a leading stacked axis of size depth//2 (pair index i//2).

The reference repo ships no .pt checkpoint (experiment/ is a placeholder),
so this converter is exercised by tests that build torch modules with the
same shapes and verify numerical equivalence of the converted forward.

Usage:
    from speinet_tpu.utils.convert import convert_state_dict
    params, batch_stats = convert_state_dict(torch_state_dict, flax_variables)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)           # OIHW -> HWIO


def conv_transpose_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)           # IOHW -> HW O I


def dense_kernel(w) -> np.ndarray:
    return _np(w).transpose(1, 0)                 # OI -> IO


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def _set(tree: dict, path: str, value: np.ndarray):
    keys = [k for k in path.split("/") if k]
    node = tree
    for k in keys[:-1]:
        node = node[k]
    leaf = keys[-1]
    if leaf not in node:
        raise KeyError(f"no flax leaf at {path}")
    expect = np.shape(node[leaf])
    if tuple(expect) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {path}: flax {expect} vs torch {value.shape}")
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def _copy_tree(t):
    if isinstance(t, dict):
        return {k: _copy_tree(v) for k, v in t.items()}
    return np.asarray(t)


# ---------------------------------------------------------------------------
# sub-converters


def convert_basicconv(sd, prefix, params, path):
    """reference BasicConv -> blocks.BasicConv {Conv_0|ConvTransposeTorch_0}."""
    if f"{prefix}.main.0.weight" in sd:
        w = sd[f"{prefix}.main.0.weight"]
        if w.ndim == 4 and f"{prefix}.main.0.bias" in sd:
            _set(params, f"{path}/Conv_0/kernel", conv_kernel(w))
            _set(params, f"{path}/Conv_0/bias", _np(sd[f"{prefix}.main.0.bias"]))


def convert_resblock(sd, prefix, params, bstats, path):
    """reference ResBlock (block.py:127-141) -> blocks.ResBlock."""
    # main.0 / main.1 are BasicConvs whose .main.0 is the Conv2d
    for ref_i, mine in [(0, "conv1"), (1, "conv2")]:
        _set(params, f"{path}/{mine}/Conv_0/kernel",
             conv_kernel(sd[_j(prefix, f"main.{ref_i}.main.0.weight")]))
        _set(params, f"{path}/{mine}/Conv_0/bias",
             _np(sd[_j(prefix, f"main.{ref_i}.main.0.bias")]))
    # SE: fc.0 / fc.2 Linears
    _set(params, f"{path}/se/Dense_0/kernel", dense_kernel(sd[_j(prefix, "se.fc.0.weight")]))
    _set(params, f"{path}/se/Dense_0/bias", _np(sd[_j(prefix, "se.fc.0.bias")]))
    _set(params, f"{path}/se/Dense_1/kernel", dense_kernel(sd[_j(prefix, "se.fc.2.weight")]))
    _set(params, f"{path}/se/Dense_1/bias", _np(sd[_j(prefix, "se.fc.2.bias")]))
    # Triplet gates: cw (k=7) / hc (k=5): BasicConv1 conv (no bias) + BN
    for ref_g, mine in [("cw", "cw"), ("hc", "hc")]:
        _set(params, f"{path}/te/{mine}/Conv_0/kernel",
             conv_kernel(sd[_j(prefix, f"te.{ref_g}.conv.conv.weight")]))
        _set(params, f"{path}/te/{mine}/BatchNorm_0/scale",
             _np(sd[_j(prefix, f"te.{ref_g}.conv.bn.weight")]))
        _set(params, f"{path}/te/{mine}/BatchNorm_0/bias",
             _np(sd[_j(prefix, f"te.{ref_g}.conv.bn.bias")]))
        _set(bstats, f"{path}/te/{mine}/BatchNorm_0/mean",
             _np(sd[_j(prefix, f"te.{ref_g}.conv.bn.running_mean")]))
        _set(bstats, f"{path}/te/{mine}/BatchNorm_0/var",
             _np(sd[_j(prefix, f"te.{ref_g}.conv.bn.running_var")]))


def convert_recons(sd, prefix, params, bstats, path, n_resblock=3):
    """reference RECONS_VIDEO -> models.recons_video.ReconsVideo."""
    stages = [
        ("inBlock", "in_conv", "in_res", 1, False),
        ("encoder_first", "enc1_conv", "enc1_res", 1, False),
        ("encoder_second", "enc2_conv", "enc2_res", 1, False),
        ("decoder_second", "dec2_res", "dec2_up", 0, True),
        ("decoder_first", "dec1_res", "dec1_up", 0, True),
        ("outBlock", "out_res", "out_conv", 0, True),
    ]
    for ref_name, a, b_, res_off, res_first in stages:
        p = f"{prefix}.{ref_name}" if prefix else ref_name
        if not res_first:
            # conv stage at index 0, then resblocks at 1..n
            _set(params, f"{path}/{a}/Conv_0/kernel",
                 conv_kernel(sd[f"{p}.0.0.weight"]))
            _set(params, f"{path}/{a}/Conv_0/bias", _np(sd[f"{p}.0.0.bias"]))
            for i in range(n_resblock):
                convert_resblock(sd, f"{p}.{i + 1}", params, bstats,
                                 f"{path}/{b_}/res{i}")
        elif ref_name == "outBlock":
            for i in range(n_resblock):
                convert_resblock(sd, f"{p}.{i}", params, bstats,
                                 f"{path}/{a}/res{i}")
            _set(params, f"{path}/{b_}/kernel",
                 conv_kernel(sd[f"{p}.{n_resblock}.weight"]))
            _set(params, f"{path}/{b_}/bias", _np(sd[f"{p}.{n_resblock}.bias"]))
        else:
            # decoder: resblocks 0..n-1 then Sequential(ConvT, ReLU) at n
            for i in range(n_resblock):
                convert_resblock(sd, f"{p}.{i}", params, bstats,
                                 f"{path}/{a}/res{i}")
            _set(params, f"{path}/{b_}/kernel",
                 conv_transpose_kernel(sd[f"{p}.{n_resblock}.0.weight"]))
            _set(params, f"{path}/{b_}/bias", _np(sd[f"{p}.{n_resblock}.0.bias"]))


def convert_swin_block(sd, prefix, stacked, pair_idx, which):
    """One reference SwinTransformerBlock -> stacked scan params slice.

    stacked: params dict at swin/layer{L}/pairs; which in {block_w, block_sw}.
    """
    def put(path, value):
        node = stacked
        keys = path.split("/")
        for k in keys[:-1]:
            node = node[k]
        arr = np.asarray(node[keys[-1]]).copy()
        arr[pair_idx] = value
        node[keys[-1]] = arr

    put(f"{which}/norm1/scale", _np(sd[f"{prefix}.norm1.weight"]))
    put(f"{which}/norm1/bias", _np(sd[f"{prefix}.norm1.bias"]))
    put(f"{which}/norm2/scale", _np(sd[f"{prefix}.norm2.weight"]))
    put(f"{which}/norm2/bias", _np(sd[f"{prefix}.norm2.bias"]))
    put(f"{which}/attn/qkv_x/kernel", dense_kernel(sd[f"{prefix}.attn.qkv_x.weight"]))
    put(f"{which}/attn/qkv_x/bias", _np(sd[f"{prefix}.attn.qkv_x.bias"]))
    put(f"{which}/attn/qkv_y/kernel", dense_kernel(sd[f"{prefix}.attn.qkv_y.weight"]))
    put(f"{which}/attn/qkv_y/bias", _np(sd[f"{prefix}.attn.qkv_y.bias"]))
    put(f"{which}/attn/proj/kernel", dense_kernel(sd[f"{prefix}.attn.proj.weight"]))
    put(f"{which}/attn/proj/bias", _np(sd[f"{prefix}.attn.proj.bias"]))
    put(f"{which}/attn/relative_position_bias_table",
        _np(sd[f"{prefix}.attn.relative_position_bias_table"]))
    put(f"{which}/mlp_fc1/kernel", dense_kernel(sd[f"{prefix}.mlp.fc1.weight"]))
    put(f"{which}/mlp_fc1/bias", _np(sd[f"{prefix}.mlp.fc1.bias"]))
    put(f"{which}/mlp_fc2/kernel", dense_kernel(sd[f"{prefix}.mlp.fc2.weight"]))
    put(f"{which}/mlp_fc2/bias", _np(sd[f"{prefix}.mlp.fc2.bias"]))


def _j(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def convert_swinir(sd, prefix, params, path, depths):
    def pp(name: str) -> str:
        return f"{path}/{name}" if path else name

    _set(params, pp("conv_first/kernel"), conv_kernel(sd[_j(prefix, "conv_first.weight")]))
    _set(params, pp("conv_first/bias"), _np(sd[_j(prefix, "conv_first.bias")]))
    _set(params, pp("conv_after_body/kernel"),
         conv_kernel(sd[_j(prefix, "conv_after_body.weight")]))
    _set(params, pp("conv_after_body/bias"), _np(sd[_j(prefix, "conv_after_body.bias")]))
    _set(params, pp("conv_last/kernel"), conv_kernel(sd[_j(prefix, "conv_last.weight")]))
    _set(params, pp("conv_last/bias"), _np(sd[_j(prefix, "conv_last.bias")]))
    _set(params, pp("norm/scale"), _np(sd[_j(prefix, "norm.weight")]))
    _set(params, pp("norm/bias"), _np(sd[_j(prefix, "norm.bias")]))
    if _j(prefix, "patch_embed.norm.weight") in sd:
        _set(params, pp("patch_embed_norm/scale"),
             _np(sd[_j(prefix, "patch_embed.norm.weight")]))
        _set(params, pp("patch_embed_norm/bias"),
             _np(sd[_j(prefix, "patch_embed.norm.bias")]))
    for li, depth in enumerate(depths):
        lp = _j(prefix, f"layers.{li}")
        _set(params, pp(f"layer{li}/conv/kernel"), conv_kernel(sd[f"{lp}.conv.weight"]))
        _set(params, pp(f"layer{li}/conv/bias"), _np(sd[f"{lp}.conv.bias"]))
        stacked = params
        for k in pp(f"layer{li}/pairs").split("/"):
            stacked = stacked[k]
        for i in range(depth):
            which = "block_w" if i % 2 == 0 else "block_sw"
            convert_swin_block(sd, f"{lp}.residual_group.blocks.{i}", stacked,
                               i // 2, which)


def convert_state_dict(sd: Dict[str, Any], variables: Dict[str, Any],
                       depths=(6, 6, 6, 6, 6, 6), n_resblock: int = 3
                       ) -> Tuple[Dict, Dict]:
    """Convert a full reference SPEINet state_dict into (params, batch_stats)
    shaped like `variables['params'] / ['batch_stats']`."""
    sd = strip_module_prefix(sd)
    params = _copy_tree(variables["params"])
    bstats = _copy_tree(variables.get("batch_stats", {}))

    convert_recons(sd, "recons_net", params, bstats, "recons_net", n_resblock)
    convert_swinir(sd, "swin", params, "swin", depths)
    for name in ["conv_lv1", "conv_lv2", "conv_lv3", "fusion", "search3",
                 "search2", "search1", "search43", "search33", "search23",
                 "search13"]:
        if f"{name}.weight" in sd and name in params:
            _set(params, f"{name}/kernel", conv_kernel(sd[f"{name}.weight"]))
            _set(params, f"{name}/bias", _np(sd[f"{name}.bias"]))
    # SelfTransfer convs (SearchTransfer.py:56-57) -> TransferUnit
    if "SelfTransfer.search1.weight" in sd:
        _set(params, "transfer/self_search1/kernel",
             conv_kernel(sd["SelfTransfer.search1.weight"]))
        _set(params, "transfer/self_search1/bias", _np(sd["SelfTransfer.search1.bias"]))
        _set(params, "transfer/self_search2/kernel",
             conv_kernel(sd["SelfTransfer.search2.weight"]))
        _set(params, "transfer/self_search2/bias", _np(sd["SelfTransfer.search2.bias"]))
    return params, bstats
