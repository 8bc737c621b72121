"""Space-to-depth conv transform correctness (ops/s2d.py): the transformed
3x3 conv on the s2d grid must reproduce the logical 5x5 conv exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from speinet_tpu.ops.s2d import (depth_to_space, s2d_consume_kernel,
                                 s2d_kernel, space_to_depth)


def _conv(x, w, stride=1):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_s2d_kernel_stride1(rng):
    """5x5 s1 conv == 3x3 s1 conv on s2d form with transformed kernel."""
    x = jnp.asarray(rng.random((2, 16, 20, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 5, 6, 7)).astype(np.float32))
    ref = _conv(x, w)
    got = depth_to_space(_conv(space_to_depth(x), s2d_kernel(w)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_s2d_consume_kernel_stride2(rng):
    """5x5 s2 conv == 3x3 s1 conv consuming the s2d form."""
    x = jnp.asarray(rng.random((2, 16, 20, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 5, 6, 9)).astype(np.float32))
    ref = _conv(x, w, stride=2)
    got = _conv(space_to_depth(x), s2d_consume_kernel(w))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_s2d_kernel_3x3(rng):
    """3x3 s1 conv transform (also 3 s2d taps -> exact)."""
    x = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))
    ref = _conv(x, w)
    got = depth_to_space(_conv(space_to_depth(x), s2d_kernel(w)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)
