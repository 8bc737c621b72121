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
    s2, i2 = pc.correlation_argmax_pallas.__wrapped__(lr, ref, tl=32, tk=32)
    s1, i1 = correlation_argmax(lr, ref, chunk=32)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
