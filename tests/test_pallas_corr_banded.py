"""Banded correlation kernel (3 shifted C-deep matmuls + diagonal adds) vs
the unfold-based reference, interpret mode. Parity target:
SearchTransfer.py:26-34 semantics via correlation_argmax."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speinet_tpu.models.search_transfer import correlation_argmax
from speinet_tpu.ops.patch_ops import unfold


def _interp(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _ref_scores(f_map, g_map, inv_ref):
    """Unfold-form reference: S = max_q inv_q <unfold(G)[:, q], unfold(F)[:, p]>."""
    lr_u = unfold(f_map.transpose(0, 3, 1, 2), 3, 1, 1).astype(jnp.float32)
    ref_u = unfold(g_map.transpose(0, 3, 1, 2), 3, 1, 1).astype(jnp.float32)
    ref_sc = (ref_u * inv_ref[:, None, :]).transpose(0, 2, 1)
    return correlation_argmax(lr_u, ref_sc, chunk=64)


@pytest.mark.parametrize("shape", [((6, 7), (6, 7)), ((5, 9), (9, 5))])
def test_banded_matches_unfold_reference(rng, monkeypatch, shape):
    _interp(monkeypatch)
    import speinet_tpu.ops.pallas_corr as pc

    (h, w), (hr, wr) = shape
    b, c = 2, 8
    f = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, hr, wr, c)).astype(np.float32))
    inv = jnp.asarray(1.0 / (1.0 + rng.random((b, hr * wr)).astype(np.float32)))

    s1, i1 = _ref_scores(f, g, inv)
    s2, i2 = pc._corr_impl_banded(f, g, inv, tl=16, tk=16)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_banded_vjp_matches_unfold_autodiff(rng, monkeypatch):
    _interp(monkeypatch)
    import speinet_tpu.ops.pallas_corr as pc

    b, h, w, c = 1, 5, 6, 4
    f = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    inv = jnp.asarray(1.0 / (1.0 + rng.random((b, h * w)).astype(np.float32)))

    def loss_ref(f_, g_, inv_):
        s, _ = _ref_scores(f_, g_, inv_)
        return jnp.sum(s ** 2)

    def loss_banded(f_, g_, inv_):
        s, _ = pc.banded_corr_argmax(f_, g_, inv_)
        return jnp.sum(s ** 2)

    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(f, g, inv)
    g2 = jax.grad(loss_banded, argnums=(0, 1, 2))(f, g, inv)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)


def test_transfer_unit_banded_matches_unfold_kernel(rng, monkeypatch):
    """TransferUnit banded routing (SPEINET_CORR_BANDED=1, sharp/self) is
    output-equivalent to the raw-unfold lds kernel path."""
    from jax.experimental import pallas as pl
    import speinet_tpu.models.swinir as swinir_mod
    from speinet_tpu.models.search_transfer import TransferUnit

    _interp(monkeypatch)
    monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: True)
    monkeypatch.setenv("SPEINET_CORR_RAW", "1")
    monkeypatch.setenv("SPEINET_CORR_TL", "32")
    monkeypatch.setenv("SPEINET_CORR_TK", "32")
    monkeypatch.setenv("SPEINET_CORR_BTL", "32")
    monkeypatch.setenv("SPEINET_CORR_BTK", "32")

    nf = 4
    b, hh, ww = 2, 6, 8
    unit = TransferUnit(n_feat=nf, chunk=32, dtype=jnp.float32)
    f_fusion = jnp.asarray(
        rng.standard_normal((b, hh, ww, 4 * nf)).astype(np.float32))
    s1 = jnp.asarray(
        rng.standard_normal((b, 4 * hh, 4 * ww, nf)).astype(np.float32))
    s2 = jnp.asarray(
        rng.standard_normal((b, 2 * hh, 2 * ww, 2 * nf)).astype(np.float32))
    s3 = jnp.asarray(
        rng.standard_normal((b, hh, ww, 4 * nf)).astype(np.float32))
    variables = unit.init(jax.random.PRNGKey(0), f_fusion, s1, s2, s3,
                          jnp.asarray([True, False]))

    for routing, hs in (("sharp", jnp.asarray([True, True])),
                        ("self", jnp.asarray([False, False]))):
        monkeypatch.setenv("SPEINET_CORR_BANDED", "0")
        want = unit.apply(variables, f_fusion, s1, s2, s3, hs, routing)
        monkeypatch.setenv("SPEINET_CORR_BANDED", "1")
        got = unit.apply(variables, f_fusion, s1, s2, s3, hs, routing)
        for a, bb in zip(want, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-4, atol=2e-5)
