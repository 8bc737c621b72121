"""Parity: pallas roll2d vs jnp.roll (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from speinet_tpu.ops.pallas_roll import roll2d


@pytest.mark.parametrize("sh,sw", [(2, 2), (0, 3), (3, 0), (178, 318),
                                   (5, 5), (0, 0), (1, 7)])
def test_roll2d_matches_jnp_roll(sh, sw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 8)), jnp.float32)
    H, W = 12, 16
    want = jnp.roll(x, (-sh, -sw), axis=(1, 2))
    got = roll2d(x, sh, sw, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_roll2d_negative_shift():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 4)), jnp.float32)
    want = jnp.roll(x, (2, 2), axis=(1, 2))          # un-roll direction
    got = roll2d(x, -2, -2, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_roll2d_bench_shape_tiny():
    # the swin SW-block shape family: H divisible by bh candidates
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 20, 24, 8)), jnp.bfloat16)
    want = jnp.roll(x, (-2, -2), axis=(1, 2))
    got = roll2d(x, 2, 2, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_roll2d_grad_is_inverse_roll():
    import jax

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    g = jax.grad(lambda t: jnp.sum(roll2d(t, 2, 3, True) * w))(x)
    want = jnp.roll(w, (2, 3), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-6)
