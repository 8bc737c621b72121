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


def test_pallas_correlation_ld_interpret(rng, monkeypatch):
    """[B, D, Lr]-layout kernel (raw-unfold path) == the scan reference."""
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_corr as pc

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)

    b, d, l = 2, 32, 96
    lr = _l2_normalize(jnp.asarray(rng.random((b, d, l)).astype(np.float32)), 1)
    ref_ld = _l2_normalize(
        jnp.asarray(rng.random((b, d, l)).astype(np.float32)), 1)
    s2, i2 = pc._corr_impl_ld(lr, ref_ld, tl=32, tk=32)
    s1, i1 = correlation_argmax(lr, ref_ld.transpose(0, 2, 1), chunk=32)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_correlation_ld_vjp_matches_scan(rng, monkeypatch):
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_corr as pc

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)

    b, d, l = 1, 16, 48
    lr = _l2_normalize(jnp.asarray(rng.random((b, d, l)).astype(np.float32)), 1)
    ref_ld = _l2_normalize(
        jnp.asarray(rng.random((b, d, l)).astype(np.float32)), 1)

    def loss_scan(a, r):
        s, _ = correlation_argmax(a, r.transpose(0, 2, 1), chunk=16)
        return jnp.sum(s ** 2)

    def loss_pallas(a, r):
        s, _ = pc.correlation_argmax_pallas_ld(a, r)
        return jnp.sum(s ** 2)

    g1 = jax.grad(loss_scan, argnums=(0, 1))(lr, ref_ld)
    g2 = jax.grad(loss_pallas, argnums=(0, 1))(lr, ref_ld)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-5,
                               atol=1e-6)


def test_patch_inv_norms_matches_unfold(rng):
    """Box-filter patch norms == column norms of unfold(x, 3, 1, 1)."""
    from speinet_tpu.ops.patch_ops import unfold
    from speinet_tpu.models.search_transfer import _patch_inv_norms

    b, h, w, c = 2, 7, 9, 5
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    u = unfold(x.transpose(0, 3, 1, 2), 3, 1, 1)       # [B, C*9, L]
    want = 1.0 / np.maximum(
        np.linalg.norm(np.asarray(u), axis=1), 1e-12)  # [B, L]
    got = np.asarray(_patch_inv_norms(x))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_transfer_unit_raw_path_matches_fallback(rng, monkeypatch):
    """TransferUnit raw-unfold kernel routing (SPEINET_CORR_RAW=1) is
    output-equivalent to the normalized fallback, all three routings."""
    from jax.experimental import pallas as pl
    import speinet_tpu.models.swinir as swinir_mod
    import speinet_tpu.ops.pallas_corr as pc
    from speinet_tpu.models.search_transfer import TransferUnit

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setenv("SPEINET_CORR_TL", "32")
    monkeypatch.setenv("SPEINET_CORR_TK", "32")

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
    has_sharp = jnp.asarray([True, False])
    variables = unit.init(jax.random.PRNGKey(0), f_fusion, s1, s2, s3,
                          has_sharp)

    for routing, hs in (("mixed", has_sharp),
                        ("sharp", jnp.asarray([True, True])),
                        ("self", jnp.asarray([False, False]))):
        monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: False)
        want = unit.apply(variables, f_fusion, s1, s2, s3, hs, routing)
        monkeypatch.setattr(swinir_mod, "_fused_enabled", lambda: True)
        monkeypatch.setenv("SPEINET_CORR_RAW", "1")
        got = unit.apply(variables, f_fusion, s1, s2, s3, hs, routing)
        for a, bb in zip(want, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-4, atol=2e-5)


def test_pallas_lds_scaled_matches_host_scale(rng, monkeypatch):
    """In-kernel row scale (lds) == host-side scaled-copy (ld) exactly."""
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_corr as pc

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)

    b, d, l = 2, 32, 96
    lr = jnp.asarray(rng.random((b, d, l)).astype(np.float32))
    ref = jnp.asarray(rng.random((b, d, l)).astype(np.float32))
    inv = jnp.asarray(0.1 + rng.random((b, l)).astype(np.float32))
    s1, i1 = pc._corr_impl_ld(lr, ref * inv[:, None, :], tl=32, tk=32)
    s2, i2 = pc._corr_impl_lds(lr, ref, inv, tl=32, tk=32)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_lds_vjp_matches_host_scale(rng, monkeypatch):
    """lds custom VJP == autodiff of ld with the scale applied outside."""
    from jax.experimental import pallas as pl
    import speinet_tpu.ops.pallas_corr as pc

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)

    b, d, l = 1, 16, 48
    lr = jnp.asarray(rng.random((b, d, l)).astype(np.float32))
    ref = jnp.asarray(rng.random((b, d, l)).astype(np.float32))
    inv = jnp.asarray(0.1 + rng.random((b, l)).astype(np.float32))

    def loss_ld(a, r, s):
        out, _ = pc.correlation_argmax_pallas_ld(a, r * s[:, None, :])
        return jnp.sum(out ** 2)

    def loss_lds(a, r, s):
        out, _ = pc.correlation_argmax_pallas_lds(a, r, s)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_ld, argnums=(0, 1, 2))(lr, ref, inv)
    g2 = jax.grad(loss_lds, argnums=(0, 1, 2))(lr, ref, inv)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5,
                                   atol=1e-6)
