"""Pallas/s2d encoder-decoder fast path vs the XLA path (interpret mode).

The TPU inference path (`ReconsVideo.encode_pyramid` + decoder stages with
`use_fast_convs`) must be numerically equivalent to the plain XLA stages —
same flax parameters, s2d-transformed kernels, Pallas shifted-matmul conv
(VERDICT round-1 follow-up to the swin-kernel coverage gap).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import speinet_tpu.models.recons_video as rv_mod
from speinet_tpu.models.recons_video import ReconsVideo


@pytest.fixture
def fast_mode(monkeypatch):
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_conv as pc
    import speinet_tpu.ops.pallas_corr as pcorr
    import speinet_tpu.ops.pallas_swin as pswin
    import speinet_tpu.models.swinir as swinir_mod

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    for mod in (pc, pcorr, pswin):
        monkeypatch.setattr(mod.pl, "pallas_call", interp)
    monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: True)


def _model_and_input(rng, h=24, w=32, f=8):
    enc = ReconsVideo(n_feat=f, n_resblock=2, out_channels=3)
    x = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)   # full hourglass
    return enc, x, variables


def test_encode_pyramid_fast_matches_xla(rng, fast_mode, monkeypatch):
    enc, x, variables = _model_and_input(rng)

    monkeypatch.setattr(rv_mod, "use_fast_convs", lambda *_: False)
    ref = enc.apply(variables, x, method=lambda m, t: m.encode_pyramid(t))
    monkeypatch.setattr(rv_mod, "use_fast_convs", lambda *_: True)
    fast = enc.apply(variables, x, method=lambda m, t: m.encode_pyramid(t))

    for r, f_, name in zip(ref, fast, ["lv1", "lv2", "lv3"]):
        np.testing.assert_allclose(np.asarray(r), np.asarray(f_),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_encode_pyramid_kcat_matches_xla(rng, fast_mode, monkeypatch):
    """SPEINET_CONV_KCAT=1 contracts all k*k taps in one deep-K matmul;
    numerics must match the tap-by-tap accumulation and the XLA conv."""
    monkeypatch.setenv("SPEINET_CONV_KCAT", "1")
    enc, x, variables = _model_and_input(rng)

    monkeypatch.setattr(rv_mod, "use_fast_convs", lambda *_: False)
    ref = enc.apply(variables, x, method=lambda m, t: m.encode_pyramid(t))
    monkeypatch.setattr(rv_mod, "use_fast_convs", lambda *_: True)
    fast = enc.apply(variables, x, method=lambda m, t: m.encode_pyramid(t))

    for r, f_, name in zip(ref, fast, ["lv1", "lv2", "lv3"]):
        np.testing.assert_allclose(np.asarray(r), np.asarray(f_),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_decoder_stages_fast_match_xla(rng, fast_mode, monkeypatch):
    enc, x, variables = _model_and_input(rng)
    lv3 = enc.apply(variables, x, method=lambda m, t: m.encode_pyramid(t))[2]

    def decode(m, t):
        d2 = m.decoder_second(t)
        d1 = m.decoder_first(d2)
        return m.out_block(d1)

    monkeypatch.setattr(rv_mod, "use_fast_convs", lambda *_: False)
    ref = enc.apply(variables, lv3, method=decode)
    monkeypatch.setattr(rv_mod, "use_fast_convs", lambda *_: True)
    fast = enc.apply(variables, lv3, method=decode)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                               rtol=2e-5, atol=2e-5)


def test_encode_pyramid_odd_size_falls_back(rng, fast_mode, monkeypatch):
    """Non-%4 spatial dims must route to the XLA path, not crash."""
    enc = ReconsVideo(n_feat=8, n_resblock=1, out_channels=3)
    x = jnp.asarray(rng.standard_normal((1, 22, 30, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x,
                         method=lambda m, t: m.encode_pyramid(t))
    monkeypatch.setattr(rv_mod, "use_fast_convs",
                        lambda xx, train: xx.shape[1] % 2 == 0 and xx.shape[2] % 2 == 0)
    out = enc.apply(variables, x, method=lambda m, t: m.encode_pyramid(t))
    assert out[0].shape == (1, 22, 30, 8)


def test_full_speinet_fast_matches_xla(rng, fast_mode, monkeypatch):
    """End-to-end: the full SPEINet forward with every Pallas fast path on
    (s2d convs + fused swin + fused corr) vs the pure XLA forward."""
    from speinet_tpu.models.speinet import SPEINet

    model = SPEINet(n_feat=8, embed_dim=32, depths=(2,), num_heads=(4,),
                    window_size=5)
    x = np.full((2, 5, 3, 40, 40), 0.4, np.float32)
    x += 0.1 * rng.standard_normal(x.shape).astype(np.float32)
    x = jnp.asarray(np.clip(x, 0.05, 1.0))
    x = x.at[1, 3].set(0.0)    # one sample routed down the self-transfer path
    variables = model.init(jax.random.PRNGKey(0), x)

    import speinet_tpu.models.swinir as swinir_mod
    monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: False)
    ref = np.asarray(model.apply(variables, x, train=False))
    monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: True)
    fast = np.asarray(model.apply(variables, x, train=False))
    # the untrained random-init model amplifies activations ~1e9 and the
    # correlation argmax can tie-flip on near-equal scores, which swaps a
    # few gathered texture patches — so assert overwhelming elementwise
    # agreement rather than strict allclose (each compute path is already
    # strictly parity-tested in isolation above / in test_pallas_*.py)
    finite = np.isfinite(ref) & np.isfinite(fast)
    assert (np.isfinite(ref) == np.isfinite(fast)).mean() > 0.999
    rel = np.abs(ref[finite] - fast[finite]) / (np.abs(ref[finite]) + 1e-3)
    assert (rel < 1e-3).mean() > 0.99, f"agree={(rel < 1e-3).mean():.4f}"
    assert np.median(rel) < 1e-4


def test_fastconv_budget_gate_matches_across_paths(rng, fast_mode,
                                                   monkeypatch):
    """FastConv's transient budget gates the WHOLE batch through the
    Pallas kernel or falls back to XLA (batch-chunking measured slower
    at bench shapes); both dispatches agree numerically."""
    from speinet_tpu.models.blocks import FastConv

    conv = FastConv(8, 3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, 16, 24, 8)).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(3), x)

    one = np.asarray(conv.apply(variables, x, relu=True))
    # budget of 0 MB -> batch never fits -> XLA fallback
    monkeypatch.setenv("SPEINET_FASTCONV_MB", "0")
    xla = np.asarray(conv.apply(variables, x, relu=True))
    # batch 9 at 256 KB/sample = 2.25 MB > 1 MB budget -> XLA fallback
    x2 = jnp.asarray(rng.standard_normal((9, 64, 128, 8)).astype(np.float32))
    variables2 = conv.init(jax.random.PRNGKey(4), x2)
    monkeypatch.setenv("SPEINET_FASTCONV_MB", "1")
    fell_back = np.asarray(conv.apply(variables2, x2, relu=True))
    monkeypatch.delenv("SPEINET_FASTCONV_MB")
    full = np.asarray(conv.apply(variables2, x2, relu=True))

    np.testing.assert_allclose(one, xla, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(fell_back, full, rtol=2e-5, atol=2e-5)
