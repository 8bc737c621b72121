"""AOT executable cache: roundtrip, key sensitivity, fail-open."""

import numpy as np
import jax
import jax.numpy as jnp

from speinet_tpu.utils.aot_cache import aot_cached


def test_roundtrip_uses_disk(tmp_path, rng):
    # a deserialized executable binds to ALL local devices (8 on the test
    # platform), so compile replicated over the full mesh — on the 1-chip
    # TPU target the default sharding is already correct
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("d",))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32)), rep)
    fn = lambda t: jnp.sin(t) @ t.T

    c1 = aot_cached(fn, (x,), tag="t1", cache_dir=str(tmp_path),
                    in_shardings=rep, out_shardings=rep)
    files = list(tmp_path.glob("*.aot"))
    assert len(files) == 1
    c2 = aot_cached(fn, (x,), tag="t1", cache_dir=str(tmp_path),
                    in_shardings=rep, out_shardings=rep)
    np.testing.assert_allclose(np.asarray(c1(x)), np.asarray(c2(x)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2(x)), np.sin(np.asarray(x)) @
                               np.asarray(x).T, rtol=1e-5, atol=1e-5)


def test_key_varies_with_tag_static_and_shape(tmp_path, rng):
    x = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    fn = lambda t: t * 2.0
    aot_cached(fn, (x,), tag="a", cache_dir=str(tmp_path))
    aot_cached(fn, (x,), tag="b", cache_dir=str(tmp_path))
    aot_cached(fn, (x,), tag="a", static="bf16", cache_dir=str(tmp_path))
    aot_cached(fn, (y,), tag="a", cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("*.aot"))) == 4


def test_corrupt_entry_fails_open(tmp_path, rng):
    x = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    fn = lambda t: t + 1.0
    aot_cached(fn, (x,), tag="c", cache_dir=str(tmp_path))
    p = next(tmp_path.glob("*.aot"))
    p.write_bytes(b"garbage")
    c = aot_cached(fn, (x,), tag="c", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(c(x)), np.asarray(x) + 1.0)


def test_env_disable(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("SPEINET_NO_AOT_CACHE", "1")
    x = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    c = aot_cached(lambda t: t - 1.0, (x,), tag="d", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(c(x)), np.asarray(x) - 1.0)
    assert not list(tmp_path.glob("*.aot"))
