"""On-hardware Pallas parity micro-tests (VERDICT r3 #6).

The interpret-mode suites prove kernel MATH; these prove the MOSAIC
LOWERING — the class of failure interpret mode cannot see (e.g. the
round-3 "wide" head-expansion path passed interpret parity but failed to
lower on chip). Tiny shapes keep each compile ~10-30 s on the relay.

Run:  SPEINET_TEST_TPU=1 python -m pytest tests/ -m tpu -q
(The default CPU suite skips these; conftest.py registers the marker.)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")


def test_fused_swin_block_lowered(rng, monkeypatch):
    """fused_swin_block (compact path) vs the XLA SwinBlock on chip, both
    shift parities, at multi-group/multi-quad geometry."""
    _require_tpu()
    import speinet_tpu.models.swinir as swinir_mod
    from speinet_tpu.models.swinir import SwinBlock

    h, w, c, heads = 10, 40, 64, 8
    for shift in (0, 2):
        block = SwinBlock(dim=c, num_heads=heads, window_size=5,
                          shift_size=shift, mlp_ratio=2.0, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, h * w, c)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, h * w, c)).astype(np.float32))
        variables = block.init(jax.random.PRNGKey(0), x, y, (h, w), True)
        monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: False)
        ref = np.asarray(block.apply(variables, x, y, (h, w), True))
        monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: True)
        fused = np.asarray(block.apply(variables, x, y, (h, w), True))
        # XLA TPU convolutions/matmuls default to bf16 mixed precision on
        # the reference path too; tolerance covers both paths' rounding
        np.testing.assert_allclose(ref, fused, rtol=2e-2, atol=2e-2)
        assert np.abs(ref - fused).mean() < 2e-3


def test_conv2d_mxu_lowered(rng):
    """Pallas shifted-matmul conv vs lax conv on chip (k=3, kcat path)."""
    _require_tpu()
    from speinet_tpu.ops.pallas_conv import conv2d_mxu

    x = jnp.asarray(rng.standard_normal((1, 16, 64, 32)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 32, 32)) * 0.1)
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    out = conv2d_mxu(x, w, b, relu=False, kcat=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-2, atol=2e-2)


def test_correlation_argmax_lowered(rng):
    """Pallas online correlation max/argmax vs the scan reference on chip."""
    _require_tpu()
    from speinet_tpu.models.search_transfer import correlation_argmax
    from speinet_tpu.ops.pallas_corr import correlation_argmax_pallas

    b, hw, ck = 1, 256, 288
    q = jnp.asarray(rng.standard_normal((b, hw, ck)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, ck, hw)).astype(np.float32))
    s_ref, i_ref = correlation_argmax(q, r, chunk=64)
    s_out, i_out = correlation_argmax_pallas(q, r)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_out),
                               rtol=2e-2, atol=2e-2)
    # argmax ties under bf16 rounding may differ on a few positions
    mismatch = np.mean(np.asarray(i_ref) != np.asarray(i_out))
    assert mismatch < 0.02


def test_correlation_argmax_ld_lowered(rng):
    """[B, D, Lr]-layout (raw-unfold) correlation kernel on chip."""
    _require_tpu()
    from speinet_tpu.models.search_transfer import correlation_argmax
    from speinet_tpu.ops.pallas_corr import correlation_argmax_pallas_ld

    b, d, hw = 1, 256, 288
    q = jnp.asarray(rng.standard_normal((b, d, hw)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, d, hw)).astype(np.float32))
    s_ref, i_ref = correlation_argmax(q, r.transpose(0, 2, 1), chunk=64)
    s_out, i_out = correlation_argmax_pallas_ld(q, r)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_out),
                               rtol=2e-2, atol=2e-2)
    mismatch = np.mean(np.asarray(i_ref) != np.asarray(i_out))
    assert mismatch < 0.02


def test_correlation_argmax_lds_lowered(rng):
    """In-kernel-scaled (lds) correlation kernel on chip: must equal the
    ld kernel run on a host-side scaled copy bit-for-bit (same dtype
    path; only the multiply moves inside the kernel)."""
    _require_tpu()
    from speinet_tpu.ops.pallas_corr import (correlation_argmax_pallas_ld,
                                             correlation_argmax_pallas_lds)

    b, d, hw = 1, 256, 288
    q = jnp.asarray(rng.standard_normal((b, d, hw)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, d, hw)).astype(np.float32))
    inv = jnp.asarray(0.1 + rng.random((b, hw)).astype(np.float32))
    s_ref, i_ref = correlation_argmax_pallas_ld(
        q, r * inv[:, None, :].astype(r.dtype))
    s_out, i_out = correlation_argmax_pallas_lds(q, r, inv)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_out),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_out))


def test_row_gather_lowered(rng):
    """Scalar-prefetch row_gather kernel on chip == take_along_axis.
    (Kept unwired — measured slower than XLA's gather, see
    ops/pallas_gather.py — but the lowering stays guarded.)"""
    _require_tpu()
    from speinet_tpu.ops.pallas_gather import row_gather

    b, t, r_ = 2, 64, 256
    rows = jnp.asarray(rng.standard_normal((b, t, r_)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, (b, 40)), jnp.int32)
    want = jnp.take_along_axis(rows, idx[:, :, None], axis=1)
    got = row_gather(rows, idx, k=8)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
