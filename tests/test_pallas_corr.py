"""Pallas correlation kernel vs the lax.scan reference, interpret mode
(real-TPU parity is exercised by bench/infer runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from speinet_tpu.models.search_transfer import _l2_normalize, correlation_argmax


def test_pallas_correlation_interpret(rng, monkeypatch):
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_corr as pc

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)

    b, d, l = 2, 32, 96
    lr = _l2_normalize(jnp.asarray(rng.random((b, d, l)).astype(np.float32)), 1)
    ref = _l2_normalize(jnp.asarray(rng.random((b, l, d)).astype(np.float32)), 2)
    s2, i2 = pc._corr_impl(lr, ref, tl=32, tk=32)
    s1, i1 = correlation_argmax(lr, ref, chunk=32)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_correlation_vjp_matches_scan(rng, monkeypatch):
    """Custom VJP == autodiff through the scan implementation."""
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_corr as pc

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)

    b, d, l = 1, 16, 48
    lr = _l2_normalize(jnp.asarray(rng.random((b, d, l)).astype(np.float32)), 1)
    ref = _l2_normalize(jnp.asarray(rng.random((b, l, d)).astype(np.float32)), 2)

    def loss_scan(a, r):
        s, _ = correlation_argmax(a, r, chunk=16)
        return jnp.sum(s ** 2)

    def loss_pallas(a, r):
        s, _ = pc.correlation_argmax_pallas(a, r)
        return jnp.sum(s ** 2)

    g1 = jax.grad(loss_scan, argnums=(0, 1))(lr, ref)
    g2 = jax.grad(loss_pallas, argnums=(0, 1))(lr, ref)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-5,
                               atol=1e-6)
