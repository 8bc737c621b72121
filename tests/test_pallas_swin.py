"""Pallas fused swin kernels vs the XLA path, interpret mode.

The TPU inference hot loop routes every SwinBlock through
`ops/pallas_swin.fused_window_cross_attention` + `fused_ln_mlp`
(models/swinir.py selects them whenever the backend is TPU). These tests
drive the SAME flax module down both paths — fused (interpret-mode Pallas)
and XLA — with identical parameters, covering no-shift, shifted, padded
(non-multiple H/W), multi-head and bfloat16 cases (VERDICT round-1 weak #2).
Parity target: the reference block semantics, swinir.py:115-281.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import speinet_tpu.models.swinir as swinir_mod
from speinet_tpu.models.swinir import SwinBlock


def _interp_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_swin as ps

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)   # Mosaic params not valid in interpret
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", interp)


def _run_block(h, w, c, heads, shift, dtype, rng, monkeypatch,
               window_size=5, batch=2):
    block = SwinBlock(dim=c, num_heads=heads, window_size=window_size,
                      shift_size=shift, mlp_ratio=2.0, dtype=dtype)
    x = jnp.asarray(rng.standard_normal((batch, h * w, c)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((batch, h * w, c)).astype(np.float32))
    x = x.astype(dtype)
    y = y.astype(dtype)
    variables = block.init(jax.random.PRNGKey(0), x, y, (h, w), True)

    monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: False)
    ref = block.apply(variables, x, y, (h, w), True)

    _interp_pallas(monkeypatch)
    monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: True)
    fused = block.apply(variables, x, y, (h, w), True)
    return np.asarray(ref, np.float32), np.asarray(fused, np.float32)


def test_swin_block_no_shift(rng, monkeypatch):
    ref, fused = _run_block(10, 15, 32, 4, 0, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_shifted(rng, monkeypatch):
    ref, fused = _run_block(10, 15, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_padded(rng, monkeypatch):
    """H, W not multiples of the window: the block zero-pads and masks."""
    ref, fused = _run_block(9, 13, 32, 4, 0, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_padded_shifted(rng, monkeypatch):
    ref, fused = _run_block(9, 13, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_multihead(rng, monkeypatch):
    """Model-scale head count (8 heads over 64 channels)."""
    ref, fused = _run_block(10, 10, 64, 8, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_bf16(rng, monkeypatch):
    """bfloat16 compute (inference dtype). Softmax/LN run f32 on both paths;
    tolerance reflects bf16 matmul rounding differences."""
    ref, fused = _run_block(10, 15, 32, 4, 2, jnp.bfloat16, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=0.05, atol=0.05)


def test_swin_block_group16(rng, monkeypatch):
    """SPEINET_SWIN_G=16 packs 16 windows per block-diagonal matmul (the
    default on v5e); same numerics as the XLA path."""
    monkeypatch.setenv("SPEINET_SWIN_G", "16")
    ref, fused = _run_block(10, 80, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_r_rows_gt1(rng, monkeypatch):
    """SPEINET_SWIN_R>1 processes several window-rows per grid step; the
    per-row mask indexing must still isolate each row."""
    monkeypatch.setenv("SPEINET_SWIN_FUSEBLOCK", "0")
    monkeypatch.setenv("SPEINET_SWIN_R", "2")
    ref, fused = _run_block(10, 15, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_split_kernels(rng, monkeypatch):
    """The two-kernel path (separate attention + LN/MLP) stays correct
    with whole-block fusion pinned off."""
    monkeypatch.setenv("SPEINET_SWIN_FUSEBLOCK", "0")
    ref, fused = _run_block(10, 15, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_single_batch(rng, monkeypatch):
    """batch=1: the whole-block kernel falls back to s_batch=1 (no
    cross-stream packing)."""
    ref, fused = _run_block(10, 15, 32, 4, 2, jnp.float32, rng, monkeypatch,
                            batch=1)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_block_stream_packing_isolates(rng, monkeypatch):
    """s_batch=2 block-diagonal stream packing must equal two independent
    single-sample runs (no cross-stream attention leakage)."""
    block = SwinBlock(dim=32, num_heads=4, window_size=5, shift_size=2,
                      mlp_ratio=2.0, dtype=jnp.float32)
    h = w = 10
    x = jnp.asarray(rng.standard_normal((2, h * w, 32)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, h * w, 32)).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x, y, (h, w), True)
    _interp_pallas(monkeypatch)
    monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: True)
    both = block.apply(variables, x, y, (h, w), True)
    one0 = block.apply(variables, x[:1], y[:1], (h, w), True)
    one1 = block.apply(variables, x[1:], y[1:], (h, w), True)
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(one0[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(both[1]), np.asarray(one1[0]),
                               rtol=2e-5, atol=2e-5)


def test_swin_block_dedup_mask_grid(rng, monkeypatch):
    """Shift masks are deduplicated to [2,2,gN,gN] selected by the index
    map (packed_mask_dedup); a grid with real interior rows AND several
    column groups must still match the XLA path exactly."""
    # h=20 -> 4 window rows (2 interior), w=80 -> 16 windows/row, g=8 ->
    # 2 column groups
    ref, fused = _run_block(20, 80, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_swin_attn_dedup_mask_grid(rng, monkeypatch):
    """Same grid through the attention-only kernel (FUSEBLOCK=0)."""
    monkeypatch.setenv("SPEINET_SWIN_FUSEBLOCK", "0")
    ref, fused = _run_block(20, 80, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_packed_mask_dedup_matches_full():
    """The 4 dedup blocks reproduce the full packed mask at every (row,
    colgroup) position (the property the index map relies on)."""
    from speinet_tpu.ops.pallas_swin import packed_mask, packed_mask_dedup

    hp, wp, ws, shift, g = 20, 80, 5, 2, 8
    full = packed_mask(hp, wp, ws, shift, 0, 0, g)
    ded = packed_mask_dedup(hp, wp, ws, shift, g)
    nr, nc = full.shape[:2]
    for i in range(nr):
        for j in range(nc):
            np.testing.assert_array_equal(
                full[i, j], ded[min(i // max(nr - 1, 1), 1),
                                min(j // max(nc - 1, 1), 1)])


def test_fused_ln_mlp_matches_xla(rng, monkeypatch):
    """The MLP half alone, against plain jnp math (swinir.py:279)."""
    _interp_pallas(monkeypatch)
    from speinet_tpu.ops.pallas_swin import fused_ln_mlp
    from speinet_tpu.models.swinir import layer_norm

    b, l, c, hdim = 2, 100, 32, 64
    x = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    lb = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, hdim)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(hdim).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((hdim, c)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    xm = layer_norm(x, ls, lb).astype(x.dtype)
    ref = x + jax.nn.gelu(xm @ w1 + b1, approximate=False) @ w2 + b2

    out = fused_ln_mlp(x, ls, lb, w1, b1, w2, b2, tl=64)
    # erf approximation inside the kernel: |err| < 1.5e-7 on erf, amplified
    # by the fc2 matmul
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-4)


def test_fused_path_group_gt1(rng, monkeypatch):
    """Wide image => pick_group packs >1 window per kernel step; the packed
    block-diagonal mask must keep windows independent."""
    from speinet_tpu.ops.pallas_swin import pick_group

    assert pick_group(8) > 1
    ref, fused = _run_block(5, 40, 32, 4, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=2e-5, atol=2e-5)


def test_compact_multigroup_multiquad(rng, monkeypatch):
    """Template-like compact geometry: 8 windows/step split into 2 column
    groups (GW=4) and 8 heads into 2 quads (QH=4) — exercises every loop of
    _attn_compact (groups_per_stream=2, n_groups=4, n_quads=2), shifted and
    unshifted."""
    monkeypatch.setenv("SPEINET_SWIN_COMPACT", "1")
    monkeypatch.setenv("SPEINET_SWIN_GW", "4")
    monkeypatch.setenv("SPEINET_SWIN_QH", "4")
    for shift in (0, 2):
        ref, fused = _run_block(10, 40, 64, 8, shift, jnp.float32, rng,
                                monkeypatch)
        np.testing.assert_allclose(ref, fused, rtol=3e-5, atol=3e-5)


def test_compact_matches_noncompact_padded(rng, monkeypatch):
    """Padded (non-window-multiple) case through the compact path vs XLA."""
    monkeypatch.setenv("SPEINET_SWIN_COMPACT", "1")
    ref, fused = _run_block(9, 38, 64, 8, 2, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(ref, fused, rtol=3e-5, atol=3e-5)
