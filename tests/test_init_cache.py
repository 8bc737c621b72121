"""utils/init_cache.cached_init: disk value-cache for model.init."""

import jax
import jax.numpy as jnp

from speinet_tpu.config import Config, set_template
from speinet_tpu.models.speinet import SPEINet
from speinet_tpu.utils.init_cache import cached_init


def _tiny_model():
    cfg = set_template(Config(template="SPEINet")).replace(
        n_feat=8, n_resblock=1, embed_dim=32, depths=[2], num_heads=[4])
    return SPEINet.from_config(cfg)


def test_cached_init_roundtrip(tmp_path):
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 5, 3, 40, 40), jnp.float32)
    v1 = cached_init(model, rng, x, cache_dir=str(tmp_path))
    files = list(tmp_path.glob("init-*.msgpack"))
    assert len(files) == 1
    v2 = cached_init(model, rng, x, cache_dir=str(tmp_path))  # cache hit
    ref = model.init(rng, x)
    for a, b, c in zip(jax.tree.leaves(v1), jax.tree.leaves(v2),
                       jax.tree.leaves(ref)):
        import numpy as np
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_cached_init_key_sensitivity(tmp_path):
    model = _tiny_model()
    x = jnp.zeros((1, 5, 3, 40, 40), jnp.float32)
    cached_init(model, jax.random.PRNGKey(0), x, cache_dir=str(tmp_path))
    cached_init(model, jax.random.PRNGKey(1), x, cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("init-*.msgpack"))) == 2
